"""dilqr_tpu.ops"""
