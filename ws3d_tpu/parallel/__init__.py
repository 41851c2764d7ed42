from ws3d_tpu.parallel.mesh import (make_mesh, batch_sharding,
                                    replicated_sharding, shard_batch,
                                    shard_batch_multihost,
                                    data_parallel_jit,
                                    data_parallel_step,
                                    data_parallel_infer)
