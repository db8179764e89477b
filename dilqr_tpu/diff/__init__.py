"""dilqr_tpu.diff"""
