from ws3d_tpu.pipeline.inference import (rpn_propose, crop_for_rcnn,
                                         finalize_detections,
                                         make_two_stage_fn)
from ws3d_tpu.pipeline.proposal_layer import make_proposal_fn
