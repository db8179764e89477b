"""dilqr_tpu.parallel"""
