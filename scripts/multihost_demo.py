"""Multi-host launcher: runs the sharded solve + one distributed IL
training step under jax.distributed, verifying the distributed numerics
against a single-process reference computed locally.

Run the SAME command on every host/process (SURVEY.md section 2.4's
"jax.distributed.initialize + one Mesh axis spanning all chips"):

  TPU pod (one process per host, auto-coordination):
      python scripts/multihost_demo.py

  Local CPU test cluster (what tests/test_multihost.py spawns):
      python scripts/multihost_demo.py \
          --coordinator localhost:PORT --num-processes 2 --process-id I \
          --cpu-devices 2

Prints one line per process:  MULTIHOST OK ...  (exit 0) on success.
"""
import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument(
        "--cpu-devices", type=int, default=0,
        help="force N virtual CPU devices per process (local test cluster)",
    )
    ap.add_argument("--batch-per-process", type=int, default=8)
    ap.add_argument(
        "--batches", default=None,
        help="comma list of per-process batch sizes (uneven mode: "
        "exercises distribute_batch_padded + the heterogeneous-device "
        "strict path instead of the training step)",
    )
    args = ap.parse_args()

    if args.cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.cpu_devices}"
            ).strip()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    if args.cpu_devices:
        # the container's TPU plugin overrides JAX_PLATFORMS at interpreter
        # start; force the CPU backend via config (as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    # persistent compile cache, one dir PER RANK (concurrent writers to a
    # shared dir segfault -- CLAUDE.md) and keyed by a host-CPU
    # fingerprint (stale cross-machine XLA:CPU AOT entries load with
    # SIGILL warnings -- see tests/conftest.py): the cluster tests are
    # compile-dominated, ~3x faster warm
    import hashlib

    fp = "unknown"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fp = hashlib.md5(line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    rank = args.process_id if args.process_id is not None else 0
    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/jax_mh_cache_{fp}_r{rank}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dilqr_tpu.parallel import multihost as mh

    mh.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np
    import optax

    import dilqr_tpu
    from dilqr_tpu import BackwardMode, ILQRConfig, QuadCost
    from dilqr_tpu.models import pendulum

    pid, nproc = jax.process_index(), jax.process_count()
    n_dev = len(jax.devices())
    mesh = mh.global_batch_mesh()

    # --- problem: every process can build the FULL deterministic batch ---
    dyn, params0 = pendulum.make(), pendulum.default_params()
    q, p = pendulum.get_true_obj()
    if args.batches is not None:
        return uneven_mode(args, mesh, dyn, params0, q, p)
    Bl = args.batch_per_process
    Bg = Bl * nproc
    T = 8
    th = np.linspace(-1.2, 1.2, Bg)
    x_full = np.stack(
        [np.cos(th), np.sin(th), np.linspace(-0.5, 0.5, Bg)], axis=1
    ).astype(np.float32)
    u_expert_full = np.zeros((Bg, T, 1), np.float32)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=6, eps=1e-4,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False,
        backward_mode=BackwardMode.IFT,
        backend="xla",  # CPU cluster has no Pallas lowering
    )

    # --- single-process reference (local devices only, plain solve) ------
    ref = dilqr_tpu.solve(
        cfg, jnp.asarray(x_full), QuadCost(jnp.diag(q), p), dyn,
        params=params0, u_lower=dyn.lower, u_upper=dyn.upper,
    )
    ref_u = np.asarray(ref.u)

    # --- distributed solve: each process feeds only ITS local shard ------
    x_local = x_full[pid * Bl : (pid + 1) * Bl]
    res = mh.multihost_solve(
        mesh, cfg, x_local, QuadCost(jnp.diag(q), p), dyn,
        params=params0, u_lower=dyn.lower, u_upper=dyn.upper,
    )
    u_all = mh.gather(res.u)
    err_solve = float(np.abs(u_all - ref_u).max())
    assert err_solve <= 1e-6, f"distributed solve mismatch: {err_solve:.2e}"
    assert res.u.sharding.is_fully_addressable is (nproc == 1)

    # --- per-example kwargs: a [B_local, T, nu] warm start must travel as
    # a distributed jit ARGUMENT (closing it over would bake per-process
    # constants -> divergent HLO across processes; code review r3) ------
    rng_w = np.random.RandomState(17)
    u0_full = (0.05 * rng_w.randn(Bg, cfg.T, 1)).astype(np.float32)
    ref_w = dilqr_tpu.solve(
        cfg, jnp.asarray(x_full), QuadCost(jnp.diag(q), p), dyn,
        params=params0, u_init=jnp.asarray(u0_full),
        u_lower=dyn.lower, u_upper=dyn.upper,
    )
    res_w = mh.multihost_solve(
        mesh, cfg, x_local, QuadCost(jnp.diag(q), p), dyn,
        params=params0, u_init=jnp.asarray(u0_full[pid * Bl:(pid + 1) * Bl]),
        u_lower=dyn.lower, u_upper=dyn.upper,
    )
    err_warm = float(np.abs(mh.gather(res_w.u) - np.asarray(ref_w.u)).max())
    assert err_warm <= 1e-6, f"warm-start distributed solve: {err_warm:.2e}"

    # collectives audit (SURVEY 2.4: cross-process traffic limited to the
    # scalar stopping-rule / loss reductions): the compiled SPMD module
    # must contain no large-operand collectives -- per-example tensors
    # stay process-local
    def solve_u(xi):
        return dilqr_tpu.solve(
            cfg, xi, QuadCost(jnp.diag(q), p), dyn,
            params=params0, u_lower=dyn.lower, u_upper=dyn.upper,
        ).u

    from dilqr_tpu.parallel.audit import audit_collectives

    hlo = jax.jit(solve_u).lower(
        mh.distribute_batch(mesh, x_local)
    ).compile().as_text()
    colls, big = audit_collectives(hlo, Bg)
    assert not big, "per-example collective crossed hosts:\n" + "\n".join(big)
    n_colls = len(colls)

    # --- one distributed IL training step vs the local reference --------
    opt = optax.rmsprop(1e-2, decay=0.5)

    def local_step(params, opt_state, x, ue):
        def loss_fn(pp):
            r = dilqr_tpu.solve(
                cfg, x, QuadCost(jnp.diag(q), p), dyn, params=pp,
                u_lower=dyn.lower, u_upper=dyn.upper,
            )
            return jnp.mean((r.u - ue) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), loss

    params_ref, loss_ref = jax.jit(local_step)(
        params0, opt.init(params0), jnp.asarray(x_full),
        jnp.asarray(u_expert_full),
    )

    step = mh.multihost_train_step(mesh, cfg, dyn, opt)
    params_g = mh.replicate(mesh, params0)
    opt_state_g = mh.replicate(mesh, opt.init(params0))
    x_g = mh.distribute_batch(mesh, x_local)
    ue_g = mh.distribute_batch(mesh, u_expert_full[pid * Bl : (pid + 1) * Bl])
    q_g, p_g = mh.replicate(mesh, (q, p))
    params_new, _, loss = step(params_g, opt_state_g, x_g, ue_g, q_g, p_g)

    err_params = float(
        np.abs(np.asarray(params_new) - np.asarray(params_ref)).max()
    )
    err_loss = abs(float(loss) - float(loss_ref))
    assert err_params <= 1e-6, f"distributed train step params: {err_params:.2e}"
    assert err_loss <= 1e-7, f"distributed train step loss: {err_loss:.2e}"

    print(
        f"MULTIHOST OK proc {pid}/{nproc} devices={n_dev} "
        f"B_global={Bg} err_solve={err_solve:.2e} "
        f"err_params={err_params:.2e} loss={float(loss):.6f} "
        f"collectives={n_colls} (0 large-operand)",
        flush=True,
    )


def uneven_mode(args, mesh, dyn, params0, q, p):
    """Uneven per-process batches over a (possibly heterogeneous-device)
    mesh: distribute_batch_padded parity on every REAL example, the
    strict heterogeneous-share distribute_batch, and the collectives
    audit on that topology."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import dilqr_tpu
    from dilqr_tpu import BackwardMode, ILQRConfig, QuadCost
    from dilqr_tpu.parallel import multihost as mh
    from dilqr_tpu.parallel.audit import audit_collectives

    pid, nproc = jax.process_index(), jax.process_count()
    n_dev = mesh.devices.size
    counts = [int(s) for s in args.batches.split(",")]
    assert len(counts) == nproc, (counts, nproc)
    Bg, T = sum(counts), 8
    starts = np.concatenate([[0], np.cumsum(counts)])

    th = np.linspace(-1.2, 1.2, Bg)
    x_full = np.stack(
        [np.cos(th), np.sin(th), np.linspace(-0.5, 0.5, Bg)], axis=1
    ).astype(np.float32)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=6, eps=1e-4,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False,
        backward_mode=BackwardMode.IFT,
        backend="xla",
    )
    cost = QuadCost(jnp.diag(q), p)

    def ref_u(xi):
        return dilqr_tpu.solve(
            cfg, xi, cost, dyn, params=params0,
            u_lower=dyn.lower, u_upper=dyn.upper,
        ).u

    ref = np.asarray(jax.jit(ref_u)(jnp.asarray(x_full)))

    cost_g = QuadCost(*mh.replicate(mesh, tuple(cost)))
    params_g = mh.replicate(mesh, params0)
    kwargs = dict(u_lower=dyn.lower, u_upper=dyn.upper)

    # --- padded path: arbitrary uneven shards -------------------------
    x_local = x_full[starts[pid] : starts[pid + 1]]
    (xg,), valid, B = mh.distribute_batch_padded(mesh, (x_local,))
    assert B == Bg and xg.shape[0] % n_dev == 0, (B, xg.shape)
    res = mh._jit_solve(cfg, xg, cost_g, dyn, params_g, kwargs)
    u_all = mh.gather(res.u)[:Bg]  # [Bp, T, nu] -> real examples
    err_pad = float(np.abs(u_all - ref).max())
    assert err_pad <= 1e-6, f"padded uneven solve mismatch: {err_pad:.2e}"
    v = mh.gather(valid)
    assert v[:Bg].all() and not v[Bg:].any(), v

    # --- strict path: per-process share proportional to device count --
    n_local = sum(
        1 for d in mesh.devices.flat if d.process_index == pid
    )
    per_dev = 2
    xs_full = x_full[: per_dev * n_dev]
    # the stopping rule is batch-global, so the subset needs its own
    # same-batch reference
    ref2 = np.asarray(jax.jit(ref_u)(jnp.asarray(xs_full)))
    dev_start = sum(
        per_dev for d in mesh.devices.flat if d.process_index < pid
    )
    xs_local = xs_full[dev_start : dev_start + per_dev * n_local]
    xg2 = mh.distribute_batch(mesh, xs_local)
    res2 = mh._jit_solve(cfg, xg2, cost_g, dyn, params_g, kwargs)
    err_strict = float(np.abs(mh.gather(res2.u) - ref2).max())
    assert err_strict <= 1e-6, f"strict uneven solve: {err_strict:.2e}"

    # --- collectives audit on this topology ---------------------------
    hlo = jax.jit(ref_u).lower(xg).compile().as_text()
    colls, big = audit_collectives(hlo, Bg)
    assert not big, "per-example collective crossed hosts:\n" + "\n".join(big)

    print(
        f"MULTIHOST OK proc {pid}/{nproc} devices={n_dev} "
        f"B_global={Bg} (uneven {counts}) err_pad={err_pad:.2e} "
        f"err_strict={err_strict:.2e} collectives={len(colls)} "
        f"(0 large-operand)",
        flush=True,
    )


if __name__ == "__main__":
    main()
