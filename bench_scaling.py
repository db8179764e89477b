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

    # 3) TRAINING-step partitioning overhead (the >=0.95-scaling north
    # star's single-host proxy). A virtual CPU mesh serializes all
    # devices onto the same cores, so the honest measurable quantity is
    # OVERHEAD, not speedup: the N-device shard_map'd train step runs the
    # same total work as the single-device step on the same global batch,
    # and any extra wall time is partitioning cost (collectives,
    # rematerialization, infeed) -- exactly what would break linear
    # scaling on real chips. Run with --timing on a pod for the real
    # scaling number (scripts/multihost_demo.py for multi-process).
    import dataclasses

    import optax

    from dilqr_tpu import BackwardMode
    from dilqr_tpu.parallel.multihost import multihost_train_step

    cfg_t = dataclasses.replace(
        cfg, lqr_iter=5, eps=1e-3, backprop=True,
        backward_mode=BackwardMode.IFT)
    opt = optax.rmsprop(1e-2, decay=0.5)
    step = multihost_train_step(mesh, cfg_t, dyn, opt, axis_name="batch")
    params_t = jnp.asarray([11.0, 1.2, 0.9])
    opt_state = opt.init(params_t)
    u_exp = jnp.zeros((B, args.horizon, 1), jnp.float32)

    def local_loss(pp, x, ue):
        res = solve(cfg_t, x, QuadCost(jnp.diag(q), p), dyn, params=pp,
                    u_lower=dyn.lower, u_upper=dyn.upper)
        return jnp.mean((res.u - ue) ** 2)

    @jax.jit
    def step_single(pp, st, x, ue):
        loss, g = jax.value_and_grad(local_loss)(pp, x, ue)
        upd, st = opt.update(g, st, pp)
        return optax.apply_updates(pp, upd), st, loss

    def timed(f, *a, n=5):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [f(*a) for _ in range(n)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / n, out

    x0d = jax.device_put(x0, sh)
    dt_mesh, out_m = timed(step, params_t, opt_state, x0d, u_exp, q, p)
    dt_one, out_s = timed(step_single, params_t, opt_state,
                          jax.device_put(x0, devs[0]),
                          jax.device_put(u_exp, devs[0]))
    dp = np.abs(np.asarray(out_m[0]) - np.asarray(out_s[0])).max()
    # the honest overhead denominator is n_dev SHARD-SIZED single-device
    # steps, not one global-batch step: a B/n_dev-sized program loses
    # some vectorization efficiency regardless of sharding (measured
    # 1.6x at B=128/8 shards on this host -- a small-batch effect that
    # any backend pays and that production per-chip batches of 1024+
    # never see), while collectives/infeed -- the things that would
    # break linear scaling on real chips -- show up as mesh time beyond
    # n_dev serialized shard-sized steps.
    B_sh = B // n_dev
    dt_shard, _ = timed(step_single, params_t, opt_state,
                        jax.device_put(x0[:B_sh], devs[0]),
                        jax.device_put(u_exp[:B_sh], devs[0]))
    overhead = dt_mesh / (n_dev * dt_shard)
    print(f"train step: {n_dev}-device mesh {dt_mesh*1e3:.1f} ms vs "
          f"{n_dev} x shard-sized single-device {dt_shard*1e3:.1f} ms "
          f"-> collective/infeed overhead {overhead:.2f}x; global-batch "
          f"single-device {dt_one*1e3:.1f} ms "
          f"(updated-params max diff {dp:.2e})")
    assert dp < 1e-4, "sharded train step diverged from single-device"
    assert overhead < 1.3, (
        f"shard_map train step pays {overhead:.2f}x beyond {n_dev} "
        "serialized shard-sized steps -- collectives/infeed would break "
        "linear scaling on chips")
    print("scaling structure OK: per-example work device-local; only "
          "scalar stopping-rule reductions cross devices")


if __name__ == "__main__":
    main()
