"""rawphotoforge_tpu.app"""
