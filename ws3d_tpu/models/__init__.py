from ws3d_tpu.models.detector import PointRCNN
from ws3d_tpu.models.rpn import RPN
from ws3d_tpu.models.rcnn import RCNNNet
from ws3d_tpu.models.backbone import Pointnet2MSG
