"""dilqr_tpu.il"""
