"""dilqr_tpu.core"""
