"""ws3d_tpu — TPU-native weakly-supervised 3D object detection framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of hlesmqh/WS3D
(ECCV 2020, "Weakly Supervised 3D Object Detection from Lidar Point Cloud"):
a two-stage (RPN -> RCNN + IOUN cascade) LiDAR detector for KITTI trained from
BEV center-click weak labels, doubling as an auto-annotator.

Everything in the compute path is fixed-shape, jit-compatible JAX designed for
the TPU MXU/VPU; host-side runtime pieces (rotated-IoU AP harness, greedy NMS
sweeps) additionally ship a native C++ backend (see ws3d_tpu/native).
"""

__version__ = "0.1.0"
