"""rawphotoforge_tpu.io"""
