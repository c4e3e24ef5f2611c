"""rawphotoforge_tpu.native"""
