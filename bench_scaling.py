"""Multi-device scaling check of the batch-sharded solve
(BASELINE.md target: >= 0.95 linear host scaling).

Real multi-chip hardware is not available in this container, and a virtual
CPU mesh adds devices WITHOUT adding compute, so wall-clock "scaling" there
is meaningless. Instead this script verifies the property that implies
linear scaling on real chips, where it can actually be checked:

 1. the compiled N-device program contains NO per-example collectives --
    examples are independent, so the only cross-device ops allowed are the
    scalar reductions of the solver's stopping rule;
 2. the sharded solve is numerically identical to the single-device solve.

Run with timing on a real pod slice via --timing (JAX_PLATFORMS unset).

    python bench_scaling.py [--devices 8] [--per-device 16] [--timing]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--per-device", type=int, default=16)
    ap.add_argument("--horizon", type=int, default=12)
    ap.add_argument("--timing", action="store_true",
                    help="also time (only meaningful on real chips)")
    args = ap.parse_args()

    if not args.timing:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    import jax

    if not args.timing:
        jax.config.update("jax_platforms", "cpu")

    import time

    import jax.numpy as jnp
    import numpy as np

    from dilqr_tpu import ILQRConfig, QuadCost, solve
    from dilqr_tpu.models import pendulum
    from dilqr_tpu.parallel.mesh import batch_mesh, batch_sharding

    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    devs = jax.devices()[: args.devices]
    n_dev = len(devs)
    B = args.per_device * n_dev
    rng = np.random.RandomState(0)
    th = rng.uniform(-2, 2, B).astype(np.float32)
    x0 = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)),
         jnp.zeros(B, jnp.float32)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=args.horizon, lqr_iter=8, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False,
        backprop=False, backend="xla",
    )

    def fn(x):
        return solve(cfg, x, QuadCost(jnp.diag(q), p), dyn, params=params,
                     u_lower=dyn.lower, u_upper=dyn.upper).u

    mesh = batch_mesh(devs)
    sh = batch_sharding(mesh)
    jitted = jax.jit(fn, in_shardings=sh, out_shardings=sh)

    # 1) collectives audit on the compiled N-device module
    from dilqr_tpu.parallel.audit import audit_collectives

    compiled = jitted.lower(jax.device_put(x0, sh)).compile()
    colls, big = audit_collectives(compiled.as_text(), B)
    print(f"devices={n_dev}  B={B}")
    print(f"collectives in compiled module: {len(colls)} "
          f"(large-operand: {len(big)})")
    assert not big, "unexpected per-example collective:\n" + "\n".join(big)

    # 2) sharded == single-device
    u_sharded = np.asarray(jitted(jax.device_put(x0, sh)))
    u_single = np.asarray(jax.jit(fn)(jax.device_put(x0, devs[0])))
    err = np.abs(u_sharded - u_single).max()
    print(f"sharded vs single-device max |du|: {err:.2e}")
    assert err < 1e-4  # f32 cross-device reduction-order noise

    if args.timing:
        out = jitted(jax.device_put(x0, sh))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [jitted(jax.device_put(x0, sh)) for _ in range(10)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 10
        print(f"{B / dt:,.0f} solves/s over {n_dev} devices "
              f"({B / dt / n_dev:,.0f} per device)")
    print("scaling structure OK: per-example work device-local; only "
          "scalar stopping-rule reductions cross devices")


if __name__ == "__main__":
    main()
