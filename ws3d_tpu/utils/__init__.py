from ws3d_tpu.utils.profiling import Timer, ThroughputMeter, trace_context
