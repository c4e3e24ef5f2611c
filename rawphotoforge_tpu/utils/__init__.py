"""rawphotoforge_tpu.utils"""
