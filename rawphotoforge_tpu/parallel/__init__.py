"""rawphotoforge_tpu.parallel"""
