"""dilqr_tpu.models"""
