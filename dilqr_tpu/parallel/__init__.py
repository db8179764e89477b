"""dilqr_tpu.parallel: device-mesh (single-controller) and multi-host
distribution utilities. See mesh.py (in-process sharded solve) and
multihost.py (jax.distributed clusters spanning hosts)."""
