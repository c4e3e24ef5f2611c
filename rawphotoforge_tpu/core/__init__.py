"""rawphotoforge_tpu.core"""
