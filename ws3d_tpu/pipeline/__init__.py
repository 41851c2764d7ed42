from ws3d_tpu.pipeline.inference import (rpn_propose, crop_for_rcnn,
                                         finalize_detections,
                                         make_two_stage_fn)
