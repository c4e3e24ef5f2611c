"""rawphotoforge_tpu.ops"""
