"""rawphotoforge_tpu.kernels"""
