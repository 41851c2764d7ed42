from ws3d_tpu.eval.kitti_ap import (get_official_eval_result, eval_class,
                                    get_label_annos, annos_from_objects,
                                    get_mAP, get_mAP_41point)
