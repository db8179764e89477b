"""dilqr_tpu.utils"""
