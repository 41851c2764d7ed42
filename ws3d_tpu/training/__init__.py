from ws3d_tpu.training.optim import (onecycle_schedule, onecycle_momentum,
                                     build_optimizer, bn_momentum_schedule)
from ws3d_tpu.training.trainer import (TrainState, create_train_state,
                                       make_rpn_train_step,
                                       make_rcnn_train_step, Trainer)
from ws3d_tpu.training.checkpoint import (save_checkpoint, load_checkpoint,
                                          load_part_checkpoint,
                                          save_train_state,
                                          restore_train_state)
