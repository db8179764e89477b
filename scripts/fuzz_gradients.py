"""Differential fuzz of the GRADIENT modes against the UNROLL oracle.

The forward fuzz (fuzz_vs_reference.py) found two real parity bugs in
round 4; this gives the differentiation path -- the reference paper's
entire contribution -- the same adversary. Random box-constrained MPC
problems spanning the feature matrix (bounds on/off, delta_u trust
regions, slew-rate penalty, warm starts, LinDx and all nonlinear envs)
are solved at f64 on CPU, and the implicit-gradient modes are compared
against plain reverse-mode autodiff through the unrolled solver
(cfg.unroll=True -- the oracle; the reference cannot do this cheaply,
SURVEY.md section 7.3):

  * BackwardMode.IFT vs UNROLL on nonlinear envs: at a converged fixed
    point the IFT adjoint IS the true derivative, so agreement <= 1e-4
    relative is required (config #4 of BASELINE.json).
  * BackwardMode.KKT vs UNROLL on LinDx problems: with constant (F, f)
    the module-KKT backward is exact, so the same bar applies. (On
    nonlinear envs KKT deliberately differentiates only the last LQR
    subproblem -- reference lqr_step.py:311-407 -- and is NOT expected
    to match the oracle; it is not asserted there.)

Excluded from the matrix: forward u_zero_I -- the backward freezes its
active set from the box bounds alone, reproducing the reference
(lqr_step.py:322-326), so zero-control-constrained coordinates are a
documented divergence from the unrolled derivative, not a bug.

Cases whose forward solve does not converge (max ||du|| >= 1e-3) are
re-rolled: the IFT premise is a fixed point, and an unconverged solve
compares solver-iteration derivatives instead (the reference guards the
same way with detach_unconverged, mpc.py:321-334).

    python scripts/fuzz_gradients.py --cases 100 [--seed 0]

One line per case; exit 1 on any mismatch.
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache + periodic live-executable clearing: every
# case compiles ~3 fresh UNROLL-sized programs, and accumulated live
# XLA:CPU executables OOM the process around case ~18 ("LLVM compilation
# error: Cannot allocate memory" -> SIGSEGV) -- the same failure mode
# tests/conftest.py bounds by clearing jax caches per module. The disk
# cache (host-CPU-fingerprinted, see conftest) keeps repeats cheap.
from dilqr_tpu.utils.platform import cpu_cache_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_fuzz_cache_{cpu_cache_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

from dilqr_tpu import BackwardMode, ILQRConfig, LinDx, QuadCost, solve  # noqa: E402
from dilqr_tpu.models import cartpole, pendulum  # noqa: E402

F64 = jnp.float64


def sample_case(rng):
    env = rng.choice(["pendulum", "pendulum-complex", "cartpole", "lindx"])
    T = int(rng.choice([4, 5, 6, 8]))
    B = int(rng.choice([2, 3]))
    lqr_iter = int(rng.choice([8, 10, 12]))
    bounded = bool(rng.rand() < 0.7)
    warm = bool(rng.rand() < 0.4)
    slew = bool(rng.rand() < 0.25) and env != "lindx"
    delta_u = (float(rng.uniform(0.5, 2.0))
               if (bounded and rng.rand() < 0.3) else None)
    return dict(env=env, T=T, B=B, lqr_iter=lqr_iter, bounded=bounded,
                warm=warm, slew=slew, delta_u=delta_u)


def build_problem(case, rng):
    env, T, B = case["env"], case["T"], case["B"]
    if env == "lindx":
        nx, nu = int(rng.choice([3, 4])), int(rng.choice([1, 2]))
        n = nx + nu
        A = np.eye(nx) + 0.1 * rng.randn(nx, nx)
        A *= 0.95 / max(1.0, np.max(np.abs(np.linalg.eigvals(A))))
        Bm = 0.5 * rng.randn(nx, nu)
        # batch-major layouts, as the public solve() expects
        F = np.broadcast_to(
            np.concatenate([A, Bm], 1), (B, T - 1, nx, n)).copy()
        f = 0.05 * rng.randn(B, T - 1, nx)
        L = rng.randn(n, n)
        Cq = L @ L.T / n + np.eye(n)
        C = np.broadcast_to(Cq, (B, T, n, n)).copy()
        c = 0.3 * rng.randn(B, T, n)
        x0 = 0.5 * rng.randn(B, nx)
        return dict(nx=nx, nu=nu, dyn=None, params=None,
                    C=jnp.asarray(C), c=jnp.asarray(c),
                    F=jnp.asarray(F), f=jnp.asarray(f),
                    x0=jnp.asarray(x0), lo=-1.0, hi=1.0)
    if env == "cartpole":
        dyn = cartpole.make()
        params = cartpole.default_params().astype(F64)
        q, p = cartpole.get_true_obj()
        th = rng.uniform(-0.6, 0.6, B)
        x0 = np.stack([0.3 * rng.randn(B), 0.2 * rng.randn(B),
                       np.cos(th), np.sin(th), 0.2 * rng.randn(B)], 1)
    else:
        simple = env == "pendulum"
        dyn = pendulum.make(simple=simple)
        params = pendulum.default_params(simple=simple).astype(F64)
        if not simple:
            params = params.at[3].set(0.05).at[4].set(0.1)
        q, p = pendulum.get_true_obj()
        th = rng.uniform(-1.2, 1.2, B)
        x0 = np.stack([np.cos(th), np.sin(th), 0.3 * rng.randn(B)], 1)
    return dict(nx=dyn.n_state, nu=dyn.n_ctrl, dyn=dyn, params=params,
                q=q.astype(F64), p=p.astype(F64),
                x0=jnp.asarray(x0, F64), lo=float(dyn.lower),
                hi=float(dyn.upper))


def grad_for_mode(case, prob, mode, gx, gu, u0, prev):
    """Gradient of a fixed linear loss w.r.t. the differentiable inputs."""
    env, T = case["env"], case["T"]
    nx, nu = prob["nx"], prob["nu"]
    unroll = mode is BackwardMode.UNROLL
    dyn = prob["dyn"]
    cfg = ILQRConfig(
        n_state=nx, n_ctrl=nu, T=T, lqr_iter=case["lqr_iter"], eps=0.0,
        linesearch_decay=dyn.linesearch_decay if dyn else 0.2,
        max_linesearch_iter=dyn.max_linesearch_iter if dyn else 5,
        exit_unconverged=False, detach_unconverged=False,
        backward_mode=mode, unroll=unroll, backend="xla",
        slew_rate_penalty=1e-2 if case["slew"] else None,
        qp_solver="auto",
    )
    kw = {}
    if case["bounded"]:
        kw.update(u_lower=prob["lo"], u_upper=prob["hi"])
        if case["delta_u"] is not None:
            kw["delta_u"] = case["delta_u"]
    if u0 is not None:
        kw["u_init"] = u0
    if case["slew"]:
        kw["prev_ctrl"] = prev

    if env == "lindx":
        def loss(leaves):
            C, c, x0 = leaves
            res = solve(cfg, x0, QuadCost(C, c),
                        LinDx(prob["F"], prob["f"]), **kw)
            return jnp.sum(gx * res.x) + jnp.sum(gu * res.u)

        leaves = (prob["C"], prob["c"], prob["x0"])
    else:
        def loss(leaves):
            params, p, x0 = leaves
            res = solve(cfg, x0, QuadCost(jnp.diag(prob["q"]), p),
                        dyn, params=params, **kw)
            return jnp.sum(gx * res.x) + jnp.sum(gu * res.u)

        leaves = (prob["params"], prob["p"], prob["x0"])

    g = jax.grad(loss)(leaves)
    # convergence probe from the same forward
    cfg_f = ILQRConfig(
        n_state=nx, n_ctrl=nu, T=T, lqr_iter=case["lqr_iter"], eps=0.0,
        linesearch_decay=cfg.linesearch_decay,
        max_linesearch_iter=cfg.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
        backend="xla", slew_rate_penalty=cfg.slew_rate_penalty,
    )
    if env == "lindx":
        res = solve(cfg_f, prob["x0"], QuadCost(prob["C"], prob["c"]),
                    LinDx(prob["F"], prob["f"]), **kw)
    else:
        res = solve(cfg_f, prob["x0"],
                    QuadCost(jnp.diag(prob["q"]), prob["p"]), dyn,
                    params=prob["params"], **kw)
    return g, float(jnp.max(res.full_du_norm))


def rel_err(ga, gb):
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        na = float(jnp.linalg.norm(a - b))
        nb = float(jnp.linalg.norm(b))
        worst = max(worst, na / (nb + 1e-9))
    return worst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tol", type=float, default=1e-4)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    failures = 0
    done = 0
    rerolls = 0
    t_start = time.time()
    while done < args.cases:
        if done % 5 == 4:
            jax.clear_caches()  # bound live-executable memory (see top)
        case = sample_case(rng)
        prob = build_problem(case, rng)
        T, B = case["T"], case["B"]
        nx, nu = prob["nx"], prob["nu"]
        gx = jnp.asarray(0.3 * rng.randn(B, T, nx))
        gu = jnp.asarray(0.3 * rng.randn(B, T, nu))
        u0 = (jnp.asarray(0.1 * rng.randn(B, T, nu))
              if case["warm"] else None)
        prev = jnp.asarray(0.1 * rng.randn(B, nu))

        mode = (BackwardMode.KKT if case["env"] == "lindx"
                else BackwardMode.IFT)
        try:
            g_o, du = grad_for_mode(case, prob, BackwardMode.UNROLL,
                                    gx, gu, u0, prev)
            if du >= 1e-3:
                rerolls += 1
                if rerolls > 3 * args.cases:
                    raise RuntimeError("too many unconverged re-rolls")
                continue
            g_m, _ = grad_for_mode(case, prob, mode, gx, gu, u0, prev)
        except Exception as e:  # noqa: BLE001
            failures += 1
            done += 1
            print(f"[{done:3d}] ERROR {case}: {e!r}")
            continue
        if case["env"] == "lindx":
            # dC cotangent convention: the KKT backward returns the
            # SYMMETRIZED gradient -1/2 (dtau tau^T + tau dtau^T)
            # (reference lqr_step.py:346-351); autodiff returns the raw
            # full-matrix cotangent. On the symmetric-C manifold both
            # are valid (<G, dC> == <sym(G), dC> for symmetric dC), so
            # compare symmetrized. dc and dx_init need no projection
            # (verified exact to 1e-16 either way).
            sym = lambda M: 0.5 * (M + jnp.swapaxes(M, -1, -2))
            g_m = (sym(g_m[0]),) + tuple(g_m[1:])
            g_o = (sym(g_o[0]),) + tuple(g_o[1:])
        err = rel_err(g_m, g_o)
        ok = err <= args.tol
        failures += 0 if ok else 1
        done += 1
        tag = "ok " if ok else "FAIL"
        print(f"[{done:3d}] {tag} {mode.name:4s} vs UNROLL "
              f"rel_err={err:.2e} du={du:.1e} "
              f"{case['env']:16s} T={T} B={B} "
              f"bounded={int(case['bounded'])} warm={int(case['warm'])} "
              f"slew={int(case['slew'])} "
              f"delta_u={case['delta_u'] is not None}")
        sys.stdout.flush()
    dt = time.time() - t_start
    print(f"\n{done - failures}/{done} passed, {rerolls} unconverged "
          f"re-rolls, {dt:.0f}s")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
