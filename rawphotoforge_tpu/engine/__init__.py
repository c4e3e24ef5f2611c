"""rawphotoforge_tpu.engine"""
