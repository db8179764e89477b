"""Sharded-vs-single-device equality on the virtual 8-device CPU mesh
(SURVEY.md section 4 item 5), plus the multi-chip training-step dry run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dilqr_tpu
from dilqr_tpu import ILQRConfig, QuadCost
from dilqr_tpu.models import pendulum
from dilqr_tpu.parallel.mesh import batch_mesh, sharded_solve


def _problem(B=16, T=10):
    dyn, params = pendulum.make(), pendulum.default_params()
    q, p = pendulum.get_true_obj()
    rng = np.random.RandomState(3)
    th = rng.uniform(-1.5, 1.5, B)
    x_init = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), rng.uniform(-1, 1, B)], 1), jnp.float32
    )
    cfg = ILQRConfig(
        n_state=3,
        n_ctrl=1,
        T=T,
        lqr_iter=10,
        eps=1e-4,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False,
        detach_unconverged=False,
        backprop=False,
    )
    return cfg, dyn, params, QuadCost(jnp.diag(q), p), x_init


def test_sharded_solve_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    cfg, dyn, params, cost, x_init = _problem()

    ref = dilqr_tpu.solve(
        cfg, x_init, cost, dyn, params=params, u_lower=-2.0, u_upper=2.0
    )

    mesh = batch_mesh(jax.devices()[:8])
    res = sharded_solve(
        mesh,
        cfg,
        x_init,
        cost,
        dyn,
        params=params,
        u_lower=-2.0,
        u_upper=2.0,
    )
    # batch sharding must not change any example's solution
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), atol=1e-5)
    # outputs actually live sharded over the mesh
    assert len(res.u.sharding.device_set) == 8


def test_sharded_solve_cache_hygiene():
    """Fresh-but-identical Dynamics objects (new closures, same code) must
    hit one cached executable; content-different bound arrays must miss;
    the cache is LRU-bounded (VERDICT round-1 weakness #5)."""
    from dilqr_tpu.parallel import mesh as pmesh

    cfg, _, params, cost, x_init = _problem(B=8, T=6)
    mesh = batch_mesh(jax.devices()[:8])
    pmesh._SOLVE_CACHE.clear()

    for _ in range(5):
        dyn_fresh = pendulum.make()  # new lambdas each call
        sharded_solve(
            mesh, cfg, x_init, cost, dyn_fresh, params=params,
            u_lower=-2.0, u_upper=2.0,
        )
    assert len(pmesh._SOLVE_CACHE) == 1, (
        f"identical Dynamics should share one entry, got "
        f"{len(pmesh._SOLVE_CACHE)}"
    )

    # content-keyed arrays: a different bound is a different program...
    lb = np.full((1,), -2.0, np.float32)
    sharded_solve(
        mesh, cfg, x_init, cost, pendulum.make(), params=params,
        u_lower=jnp.asarray(lb), u_upper=2.0,
    )
    n_after_newbound = len(pmesh._SOLVE_CACHE)
    assert n_after_newbound == 2
    # ...and mutating the backing numpy array in place cannot silently
    # reuse the stale executable (the key hashes content, not id)
    lb2 = np.full((1,), -1.0, np.float32)
    sharded_solve(
        mesh, cfg, x_init, cost, pendulum.make(), params=params,
        u_lower=jnp.asarray(lb2), u_upper=2.0,
    )
    assert len(pmesh._SOLVE_CACHE) == 3
    pmesh._SOLVE_CACHE.clear()


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_train_step_shard_map_parity_and_audit():
    """multihost_train_step (the shard_map-wrapped distributed training
    step) must (a) reproduce the single-device step bit-near-exactly --
    per-device pmean-of-means equals the global mean at equal shards --
    and (b) compile to a module whose only collectives are scalar/param
    sized (no per-example tensor crosses devices in forward OR backward;
    round 3's plain-GSPMD step rematerialized loop-carried tensors)."""
    import dataclasses

    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dilqr_tpu.parallel.audit import audit_collectives
    from dilqr_tpu.parallel.multihost import multihost_train_step

    cfg, dyn, params, cost, x_init = _problem(B=16, T=8)
    # a REAL backward: _problem's backprop=False would stop-gradient the
    # solve and make both sides' grads identically zero (vacuous parity,
    # and the audited HLO would contain no differentiated solve at all)
    from dilqr_tpu import BackwardMode

    cfg = dataclasses.replace(
        cfg, backprop=True, backward_mode=BackwardMode.IFT, backend="xla"
    )
    q, p = pendulum.get_true_obj()
    opt = optax.rmsprop(1e-2, decay=0.5)
    B = x_init.shape[0]
    rng = np.random.RandomState(5)
    u_expert = jnp.asarray(
        0.1 * rng.randn(B, cfg.T, 1).astype(np.float32)
    )

    # single-device reference step
    def im_loss(pp, x, ue):
        r = dilqr_tpu.solve(cfg, x, QuadCost(jnp.diag(q), p), dyn,
                            params=pp, u_lower=dyn.lower, u_upper=dyn.upper)
        return jnp.mean((r.u - ue) ** 2)

    def ref_step(pp, st, x, ue):
        loss, grads = jax.value_and_grad(im_loss)(pp, x, ue)
        upd, st = opt.update(grads, st, pp)
        return optax.apply_updates(pp, upd), st, loss

    st0 = opt.init(params)
    p_ref, _, loss_ref = jax.jit(ref_step)(params, st0, x_init, u_expert)

    mesh = batch_mesh(jax.devices()[:8])
    dp = NamedSharding(mesh, P("batch"))
    rep = NamedSharding(mesh, P())
    step = multihost_train_step(mesh, cfg, dyn, opt)
    args = (
        jax.device_put(params, rep), jax.device_put(st0, rep),
        jax.device_put(x_init, dp), jax.device_put(u_expert, dp),
        jax.device_put(q, rep), jax.device_put(p, rep),
    )
    hlo = step.lower(*args).compile().as_text()
    colls, big = audit_collectives(hlo, B)
    assert not big, "per-example collective in train step:\n" + "\n".join(big)

    p_new, _, loss = step(*args)
    np.testing.assert_allclose(
        np.asarray(loss), np.asarray(loss_ref), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p_new), np.asarray(p_ref), rtol=1e-5, atol=1e-7
    )
    # the step must actually have trained (nonzero grads): a config that
    # stop-gradients the solve would make this whole test vacuous
    assert float(np.abs(np.asarray(p_new) - np.asarray(params)).max()) > 0

    # shard_map needs batch % mesh == 0; the wrapper must say so clearly
    # (before jax's own sharding machinery produces its opaque error)
    with pytest.raises(ValueError, match="distribute_batch_padded"):
        step(args[0], args[1], x_init[:15], u_expert[:15],
             args[4], args[5])


def test_entry_compiles():
    import sys

    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    u, costs = out
    assert np.isfinite(np.asarray(u)).all()


def test_audit_matches_tuple_shape_async_start():
    """Async collective -start ops have tuple-typed results whose shapes
    contain spaces; the definition anchor must still match them (ADVICE r2:
    a module whose only large shapes sit on the -start line must trip)."""
    from dilqr_tpu.parallel.audit import audit_collectives

    hlo = "\n".join([
        "  %ag = (f32[8,512]{1,0}, f32[64,512]{1,0}) "
        "all-gather-start(f32[8,512]{1,0} %p0), dimensions={0}",
        # consumer lines referencing a collective result must NOT count
        "  %u = f32[64,512]{1,0} fusion(f32[64,512]{1,0} %all-gather.2)",
        # a legit scalar reduction stays unflagged
        "  %ar = f32[16]{0} all-reduce(f32[16]{0} %loss)",
    ])
    colls, big = audit_collectives(hlo, batch=16)
    assert len(colls) == 2, colls  # the -start def + the scalar reduce
    assert len(big) == 1 and "all-gather-start" in big[0], big


def test_struct_key_sees_referenced_globals():
    """A cost/dynamics callable that reads a module-level variable the user
    mutates between calls must produce a DIFFERENT structural key (ADVICE
    r2: the old key omitted globals and silently reused stale executables)."""
    from dilqr_tpu.parallel.mesh import _struct_key

    ns = {"SCALE": 2.0}
    exec("def f(x):\n    return SCALE * x\n", ns)
    f = ns["f"]
    k1 = _struct_key(f, [])
    ns["SCALE"] = 3.0
    k2 = _struct_key(f, [])
    assert k1 != k2

    # fresh-but-identical functions (same code, same globals) still collide
    ns2 = {"SCALE": 3.0}
    exec("def f(x):\n    return SCALE * x\n", ns2)
    assert _struct_key(ns2["f"], []) == k2

    # mutually-recursive module functions terminate
    ns3 = {}
    exec("def a(x):\n    return b(x)\n\ndef b(x):\n    return a(x)\n", ns3)
    _struct_key(ns3["a"], [])


def test_sharded_solve_shard_map_path():
    """use_shard_map=True: each device runs the WHOLE solver on its local
    shard (the structure the fused Pallas kernel needs on a real
    multi-chip mesh -- GSPMD cannot partition a custom call). At eps=0
    the per-shard stopping rule cannot diverge from the global one, so
    results must match the GSPMD path exactly; n_iter comes back as the
    pmax over shards."""
    import dataclasses

    cfg, dyn, params, cost, x_init = _problem()
    cfg = dataclasses.replace(cfg, eps=0.0, backend="xla")
    mesh = batch_mesh(jax.devices()[:8])
    kw = dict(params=params, u_lower=-2.0, u_upper=2.0)
    a = sharded_solve(mesh, cfg, x_init, cost, dyn,
                      use_shard_map=False, **kw)
    b = sharded_solve(mesh, cfg, x_init, cost, dyn,
                      use_shard_map=True, **kw)
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(b.costs), np.asarray(a.costs), atol=1e-6)
    assert int(b.n_iter) == int(a.n_iter)
    assert len(b.u.sharding.device_set) == 8


def test_sharded_solve_shard_map_eps_cost_bound():
    """eps>0: the per-shard stopping rule may stop a shard earlier than
    the global rule, but per-example accepted cost stays equal-or-better
    (best-tracking; same argument as the kernel's per-tile rule)."""
    cfg, dyn, params, cost, x_init = _problem(B=16)
    mesh = batch_mesh(jax.devices()[:8])
    kw = dict(params=params, u_lower=-2.0, u_upper=2.0)
    a = sharded_solve(mesh, cfg, x_init, cost, dyn,
                      use_shard_map=False, **kw)
    b = sharded_solve(mesh, cfg, x_init, cost, dyn,
                      use_shard_map=True, **kw)
    assert np.all(np.asarray(b.costs) <= np.asarray(a.costs) + 1e-5)


def test_sharded_solve_shard_map_per_example_inputs():
    """Per-example cost (C [B,T,n,n], c [B,T,n]), batch-major LinDx
    (F [B,T-1,n,m], f [B,T-1,n]), and batch-shaped kwargs (u_init
    [B,T,nu]) must shard on their BATCH axis under the shard_map path.
    The first in_spec heuristic sharded LinDx's time axis and replicated
    per-example c; batch kwargs were closed over at global B -- all three
    crashed or mis-sharded inside the per-device body (code review r3)."""
    B, T, n, m = 16, 6, 3, 1
    rng = np.random.RandomState(5)
    cfg = ILQRConfig(
        n_state=n, n_ctrl=m, T=T, lqr_iter=6, eps=0.0,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
        backend="xla",
    )
    x_init = jnp.asarray(rng.randn(B, n).astype(np.float32))
    # per-example quadratic cost, batch-major
    q = 0.3 * rng.randn(B, T, n + m, n + m).astype(np.float32)
    C = jnp.asarray(np.einsum("btij,btkj->btik", q, q)
                    + 0.5 * np.eye(n + m, dtype=np.float32))
    c = jnp.asarray(0.1 * rng.randn(B, T, n + m).astype(np.float32))
    # per-example affine dynamics, batch-major (mildly stable)
    F = jnp.asarray(
        0.3 * rng.randn(B, T - 1, n, n + m).astype(np.float32))
    f = jnp.asarray(0.05 * rng.randn(B, T - 1, n).astype(np.float32))
    u0 = jnp.asarray(0.1 * rng.randn(B, T, m).astype(np.float32))

    from dilqr_tpu.types import LinDx

    cost = QuadCost(C, c)
    dyn = LinDx(F, f)
    mesh = batch_mesh(jax.devices()[:8])
    kw = dict(u_init=u0, u_lower=-2.0, u_upper=2.0)
    a = sharded_solve(mesh, cfg, x_init, cost, dyn,
                      use_shard_map=False, **kw)
    b = sharded_solve(mesh, cfg, x_init, cost, dyn,
                      use_shard_map=True, **kw)
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(b.costs), np.asarray(a.costs), rtol=1e-5)
    assert len(b.u.sharding.device_set) == 8


def test_struct_key_registry_cycle_terminates():
    """The registry pattern (a module dict holding the function that reads
    it) is cyclic reachability: fn -> globals dict -> fn. The key walk must
    terminate instead of RecursionError (code review r3)."""
    from dilqr_tpu.parallel.mesh import _struct_key

    ns = {}
    exec(
        "REGISTRY = {}\n"
        "def f(x):\n    return REGISTRY['f'](x)\n"
        "REGISTRY['f'] = f\n",
        ns,
    )
    k1 = _struct_key(ns["f"], [])
    assert k1 == _struct_key(ns["f"], [])  # deterministic


def test_sharded_solve_example_invariant_lindx_and_cache_stability():
    """(a) Example-invariant LinDx (F [T-1,n,m], T-1 not divisible by the
    mesh size) must REPLICATE, not shard its time axis (code review r3:
    unconditional batch device_put crashed before the solve ran) -- on
    both the GSPMD and shard_map paths. (b) Fresh same-shape per-example
    kwargs (an MPC loop's warm starts) must HIT the cached executable:
    they are jit arguments keyed by (name, shape, dtype), not content."""
    from dilqr_tpu.parallel import mesh as pmesh
    from dilqr_tpu.types import LinDx

    B, T, n, m = 16, 4, 3, 1  # T-1 = 3: not divisible by 8
    rng = np.random.RandomState(11)
    cfg = ILQRConfig(
        n_state=n, n_ctrl=m, T=T, lqr_iter=4, eps=0.0,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
        backend="xla",
    )
    x_init = jnp.asarray(rng.randn(B, n).astype(np.float32))
    C = jnp.asarray(np.eye(n + m, dtype=np.float32))
    c = jnp.asarray(0.1 * rng.randn(n + m).astype(np.float32))
    F = jnp.asarray(0.3 * rng.randn(T - 1, n, n + m).astype(np.float32))
    dyn = LinDx(F, None)
    mesh = batch_mesh(jax.devices()[:8])

    ref = dilqr_tpu.solve(cfg, x_init, QuadCost(C, c), dyn,
                          u_lower=-2.0, u_upper=2.0)
    for sm in (False, True):
        res = sharded_solve(mesh, cfg, x_init, QuadCost(C, c), dyn,
                            u_lower=-2.0, u_upper=2.0, use_shard_map=sm)
        np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                                   atol=1e-6, err_msg=f"shard_map={sm}")

    pmesh._SOLVE_CACHE.clear()
    for step in range(4):
        u0 = jnp.asarray(
            0.05 * rng.randn(B, T, m).astype(np.float32))  # fresh array
        sharded_solve(mesh, cfg, x_init, QuadCost(C, c), dyn,
                      u_init=u0, u_lower=-2.0, u_upper=2.0)
    assert len(pmesh._SOLVE_CACHE) == 1, len(pmesh._SOLVE_CACHE)
    pmesh._SOLVE_CACHE.clear()
