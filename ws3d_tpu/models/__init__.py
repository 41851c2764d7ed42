from ws3d_tpu.models.detector import PointRCNN, build_model, init_model
from ws3d_tpu.models.rpn import RPN, rpn_from_config
from ws3d_tpu.models.rcnn import RCNNNet, rcnn_from_config
from ws3d_tpu.models.backbone import Pointnet2MSG
