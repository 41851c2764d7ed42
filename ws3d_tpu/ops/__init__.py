from ws3d_tpu.ops.sampling import furthest_point_sample, gather_points
from ws3d_tpu.ops.grouping import ball_query, group_points, query_and_group
from ws3d_tpu.ops.interpolate import three_nn, three_interpolate
from ws3d_tpu.ops.boxes import (
    boxes3d_to_corners3d,
    boxes3d_to_bev,
    enlarge_box3d,
    rotate_points_along_y,
    rotation_matrix_y,
    points_in_rotated_boxes,
)
from ws3d_tpu.ops.iou3d import rotated_overlap_bev, boxes_iou_bev, boxes_iou3d
from ws3d_tpu.ops.nms import rotated_nms, radius_nms, score_threshold_topk
from ws3d_tpu.ops.roipool import roipool3d, cylinder_crop
from ws3d_tpu.ops.giou import (paired_iou3d, paired_giou3d, ious_3d_loss,
                               gious_3d_loss)
from ws3d_tpu.ops.grouping import ball_query_multi, first_k_true_indices
