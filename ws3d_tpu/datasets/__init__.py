from ws3d_tpu.datasets.kitti_io import (Calibration, Object3d, KittiScene,
                                        KittiRaw, get_objects_from_label)
from ws3d_tpu.datasets.synthetic import SyntheticKitti
from ws3d_tpu.datasets.rpn_dataset import RPNDataset
