"""Generate golden fixtures by RUNNING the PyTorch reference at
/root/reference (read-only). The resulting .npz files are committed under
tests/goldens/ so the test suite never needs torch or the reference checkout.

Run from the repo root:  python scripts/make_goldens.py
"""
import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
os.makedirs(OUT, exist_ok=True)

# rocket.py does `from casadi import *` at import time but only uses casadi
# in a plotting helper (rocket.py:996-1011); stub it out.
sys.modules.setdefault("casadi", types.ModuleType("casadi"))
sys.path.insert(0, REF)

import torch  # noqa: E402

torch.manual_seed(0)
torch.set_default_dtype(torch.float64)  # goldens in f64; tests compare at f32 tol


def save(name, **arrs):
    np.savez(
        os.path.join(OUT, name + ".npz"),
        **{k: np.asarray(v) for k, v in arrs.items()},
    )
    print("wrote", name, {k: tuple(np.shape(v)) for k, v in arrs.items()})


def golden_pnqp():
    from pnqp import pnqp

    torch.manual_seed(1)
    B, n = 16, 3
    A = torch.randn(B, n, n)
    H = A @ A.transpose(1, 2) + 0.1 * torch.eye(n)
    q = torch.randn(B, n)
    lower = -torch.ones(B, n) * 0.5
    upper = torch.ones(B, n) * 0.5
    x, H_, If, i = pnqp(H, q, lower, upper, n_iter=20)
    save("pnqp", H=H, q=q, lower=lower, upper=upper, x=x, If=If, n_iter=i)

    # warm-started variant
    x0 = torch.randn(B, n) * 0.3
    x2, _, If2, i2 = pnqp(H, q, lower, upper, x_init=x0.clone(), n_iter=20)
    save("pnqp_warm", x_init=x0, x=x2, If=If2, n_iter=i2)

    # n == 1 scalar path
    torch.manual_seed(2)
    H1 = torch.rand(B, 1, 1) + 0.5
    q1 = torch.randn(B, 1)
    l1, u1 = -torch.ones(B, 1), torch.ones(B, 1)
    x1, _, If1, i1 = pnqp(H1, q1, l1, u1, n_iter=20)
    save("pnqp_n1", H=H1, q=q1, lower=l1, upper=u1, x=x1, If=If1)


def golden_lqr_lindx():
    """Exact time-varying LQR with LinDx dynamics (unconstrained + boxed)."""
    import mpc as ref_mpc

    torch.manual_seed(3)
    T, B, nx, nu = 10, 8, 3, 2
    n = nx + nu
    A = torch.randn(T, B, n, n)
    C = A @ A.transpose(2, 3) + 0.5 * torch.eye(n)
    c = torch.randn(T, B, n)
    F = torch.randn(T - 1, B, nx, n) * 0.3
    F[..., :nx] += torch.eye(nx)  # stable-ish
    f = torch.randn(T - 1, B, nx) * 0.1
    x_init = torch.randn(B, nx)

    for tag, bounds in [("unc", None), ("box", 0.5)]:
        kw = {}
        if bounds is not None:
            kw = dict(u_lower=-bounds, u_upper=bounds)
        solver = ref_mpc.MPC(
            nx,
            nu,
            T,
            lqr_iter=10,
            verbose=-1,
            exit_unconverged=False,
            detach_unconverged=False,
            n_batch=B,
            eps=1e-7,
            **kw,
        )
        x, u, objs = solver(
            x_init, ref_mpc.QuadCost(C, c), ref_mpc.LinDx(F, f)
        )
        save(
            f"lqr_lindx_{tag}",
            C=C,
            c=c,
            F=F,
            f=f,
            x_init=x_init,
            x=x.detach(),
            u=u.detach(),
            objs=objs.detach(),
        )


def golden_lqr_grad():
    """Module-KKT backward gradients on a LinDx problem
    (reference lqr_step.py:311-407)."""
    import mpc as ref_mpc

    torch.manual_seed(4)
    T, B, nx, nu = 8, 4, 3, 2
    n = nx + nu
    A = torch.randn(T, B, n, n)
    C = (A @ A.transpose(2, 3) + 0.5 * torch.eye(n)).requires_grad_(True)
    c = torch.randn(T, B, n, requires_grad=True)
    F0 = torch.randn(T - 1, B, nx, n) * 0.3
    F0[..., :nx] += torch.eye(nx)
    F = F0.requires_grad_(True)
    f = (torch.randn(T - 1, B, nx) * 0.1).requires_grad_(True)
    x_init = torch.randn(B, nx, requires_grad=True)

    torch.manual_seed(5)
    gx = torch.randn(T, B, nx)
    gu = torch.randn(T, B, nu)

    for tag, bounds in [("unc", None), ("box", 0.5)]:
        kw = {}
        if bounds is not None:
            kw = dict(u_lower=-bounds, u_upper=bounds)
        solver = ref_mpc.MPC(
            nx,
            nu,
            T,
            lqr_iter=10,
            verbose=-1,
            exit_unconverged=False,
            detach_unconverged=False,
            n_batch=B,
            eps=1e-7,
            **kw,
        )
        x, u, _ = solver(x_init, ref_mpc.QuadCost(C, c), ref_mpc.LinDx(F, f))
        loss = (x * gx).sum() + (u * gu).sum()
        grads = torch.autograd.grad(loss, [x_init, C, c, F, f])
        save(
            f"lqr_grad_problem_{tag}",
            C=C.detach(),
            c=c.detach(),
            F=F.detach(),
            f=f.detach(),
            x_init=x_init.detach(),
        )
        save(
            f"lqr_grad_{tag}",
            gx=gx,
            gu=gu,
            x=x.detach(),
            u=u.detach(),
            dx_init=grads[0],
            dC=grads[1],
            dc=grads[2],
            dF=grads[3],
            df=grads[4],
        )


def _env_mpc_golden(env_name, T, B, lqr_iter, seed, dtype=torch.float32):
    """Replicates IL_Env.mpc (il_env.py:153-188) on the true env.

    Generated at both f32 (the reference's native precision; comparisons
    are tolerance-limited by f32 rounding amplified through the chaotic
    iteration) and f64 (where our solver tracks the reference to ~1e-13 on
    cartpole, demonstrating exact semantic parity of every discrete
    line-search/active-set/best-tracking decision)."""
    sys.path.insert(0, os.path.join(REF, "env_dx"))
    from mpc_explicit import MPC as ExMPC
    from mpc_explicit import GradMethods, QuadCost
    from env_dx import pendulum, cartpole

    torch.set_default_dtype(dtype)
    torch.manual_seed(seed)
    if env_name == "pendulum":
        dx = pendulum.PendulumDx()
        th = torch.rand(B) * np.pi - np.pi / 2
        thdot = torch.rand(B) * 2 - 1
        xinit = torch.stack((torch.cos(th), torch.sin(th), thdot), dim=1)
    else:
        dx = cartpole.CartpoleDx()
        xinit = torch.zeros(B, 5)
        th = torch.ones(B) * (np.pi / 1.05)
        xinit[:, 2] = torch.cos(th)
        xinit[:, 3] = torch.sin(th)
    xinit = xinit.to(dtype)
    dx.params = dx.params.detach().to(dtype)
    q, p = dx.get_true_obj()
    q, p = q.to(dtype), p.to(dtype)
    Q = torch.diag(q).unsqueeze(0).unsqueeze(0).repeat(T, B, 1, 1)
    pT = p.unsqueeze(0).repeat(T, B, 1)
    x, u, objs = ExMPC(
        dx.n_state,
        dx.n_ctrl,
        T,
        u_lower=dx.lower,
        u_upper=dx.upper,
        lqr_iter=lqr_iter,
        verbose=-1,
        exit_unconverged=False,
        detach_unconverged=False,
        linesearch_decay=dx.linesearch_decay,
        max_linesearch_iter=dx.max_linesearch_iter,
        grad_method=GradMethods.ANALYTIC,
        eps=dx.mpc_eps,
    )(xinit, QuadCost(Q, pT), dx)
    torch.set_default_dtype(torch.float64)
    suffix = "" if dtype == torch.float32 else "_f64"
    save(
        f"mpc_{env_name}{suffix}",
        x_init=xinit,
        q=q.detach(),
        p=p.detach(),
        x=x.detach(),
        u=u.detach(),
        objs=objs.detach(),
    )


def golden_env_forwards():
    """Env step functions + analytic Jacobians at random points."""
    sys.path.insert(0, os.path.join(REF, "env_dx"))
    from env_dx import pendulum, cartpole, rocket

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(7)
    B = 32

    pend = pendulum.PendulumDx()
    pend.params = pend.params.double()
    x = torch.randn(B, 3)
    x[:, :2] /= x[:, :2].norm(dim=1, keepdim=True)
    u = torch.rand(B, 1) * 4 - 2
    xp = pend(x, u)
    D = pend.get_linear_dyn(x, u)
    save("env_pendulum", x=x, u=u, x_next=xp.detach(), D=D.detach())

    cart = cartpole.CartpoleDx()
    cart.params = cart.params.double()
    x = torch.randn(B, 5)
    x[:, 2:4] /= x[:, 2:4].norm(dim=1, keepdim=True)
    u = torch.rand(B, 1) * 100 - 50
    xp = cart(x, u)
    D = cart.get_linear_dyn(x, u)
    save("env_cartpole", x=x, u=u, x_next=xp.detach(), D=D.detach())

    rock = rocket.RocketDx()
    rock.params = rock.params.detach().double()
    x = torch.randn(B, 13) * 0.5
    x[:, 6:10] /= x[:, 6:10].norm(dim=1, keepdim=True)
    u = torch.rand(B, 3) * 20 - 10
    xp = rock(x, u)
    D = rock.get_linear_dyn(x, u)
    q, p = rock.get_true_obj()
    save(
        "env_rocket",
        x=x,
        u=u,
        x_next=xp.detach(),
        D=D.detach(),
        q=q.detach(),
        p=p.detach(),
    )





def golden_slew_rate():
    """Slew-rate penalty path (mpc.py:339-445) on the pendulum, f64."""
    sys.path.insert(0, os.path.join(REF, "env_dx"))
    import mpc as ref_mpc
    from env_dx import pendulum

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(21)
    T, B = 10, 4
    dx = pendulum.PendulumDx()
    dx.params = dx.params.detach().double()
    th = torch.rand(B) * 2 - 1
    xinit = torch.stack((torch.cos(th), torch.sin(th), torch.rand(B) - 0.5), dim=1)
    q, p = dx.get_true_obj()
    Q = torch.diag(q.double()).unsqueeze(0).unsqueeze(0).repeat(T, B, 1, 1)
    pT = p.double().unsqueeze(0).repeat(T, B, 1)
    prev_u = torch.full((1, B, 1), 0.3)
    solver = ref_mpc.MPC(
        3, 1, T,
        u_lower=-2.0, u_upper=2.0,
        lqr_iter=12, verbose=-1,
        exit_unconverged=False, detach_unconverged=False,
        linesearch_decay=0.2, max_linesearch_iter=5,
        grad_method=ref_mpc.GradMethods.ANALYTIC,
        eps=1e-4,
        slew_rate_penalty=1.0,
        prev_ctrl=prev_u,
    )
    # mpc.py ANALYTIC is incompatible with the new env grad_input signature;
    # monkey-patch the old 2-arg API onto the env via autograd
    def grad_input(x, u):
        xs = x.detach().requires_grad_(True)
        us = u.detach().requires_grad_(True)
        out = dx.forward(xs, us)
        R, S = [], []
        for j in range(3):
            gx, gu = torch.autograd.grad(out[:, j].sum(), [xs, us], retain_graph=True)
            R.append(gx); S.append(gu)
        return torch.stack(R, dim=1), torch.stack(S, dim=1)
    dx.grad_input = grad_input
    x, u, objs = solver(xinit, ref_mpc.QuadCost(Q, pT), dx)
    save("mpc_slew_pendulum_f64", x_init=xinit, q=q.detach(), p=p.detach(),
         prev_u=prev_u[0], x=x.detach(), u=u.detach(), objs=objs.detach())


def golden_u_zero_delta_u():
    """u_zero_I zero-control constraints and delta_u trust region on a
    LinDx problem (lqr_step.py:99-127, 200-213), f64."""
    import mpc as ref_mpc

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(22)
    T, B, nx, nu = 8, 4, 3, 2
    n = nx + nu
    A = torch.randn(T, B, n, n)
    C = A @ A.transpose(2, 3) + 0.5 * torch.eye(n)
    c = torch.randn(T, B, n)
    F = torch.randn(T - 1, B, nx, n) * 0.3
    F[..., :nx] += torch.eye(nx)
    f = torch.randn(T - 1, B, nx) * 0.1
    x_init = torch.randn(B, nx)

    uz = torch.rand(T, B, nu) < 0.3
    solver = ref_mpc.MPC(
        nx, nu, T, u_zero_I=uz, lqr_iter=8, verbose=-1, n_batch=B,
        exit_unconverged=False, detach_unconverged=False, eps=1e-7)
    x, u, objs = solver(x_init, ref_mpc.QuadCost(C, c), ref_mpc.LinDx(F, f))
    save("lqr_uzero_f64", C=C, c=c, F=F, f=f, x_init=x_init,
         u_zero_I=uz.numpy(), x=x.detach(), u=u.detach(), objs=objs.detach())

    solver = ref_mpc.MPC(
        nx, nu, T, u_lower=-0.5, u_upper=0.5, delta_u=0.2, lqr_iter=8,
        verbose=-1, n_batch=B, exit_unconverged=False,
        detach_unconverged=False, eps=1e-7)
    x, u, objs = solver(x_init, ref_mpc.QuadCost(C, c), ref_mpc.LinDx(F, f))
    save("lqr_delta_u_f64", C=C, c=c, F=F, f=f, x_init=x_init,
         x=x.detach(), u=u.detach(), objs=objs.detach())


def golden_nn_dynamics():
    """NNDynamics MLP forward + analytic grad_input (dynamics.py:15-130)."""
    from dynamics import NNDynamics

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(23)
    net = NNDynamics(3, 2, hidden_sizes=[16], activation="sigmoid",
                     passthrough=True).double()
    B = 8
    x = torch.randn(B, 3)
    u = torch.randn(B, 2)
    xp = net(x, u)
    R, S = net.grad_input(x, u)
    Ws = [fc.weight.detach().numpy() for fc in net.fcs]
    bs = [fc.bias.detach().numpy() for fc in net.fcs]
    save("nn_dynamics", x=x, u=u, x_next=xp.detach(), R=R.detach(),
         S=S.detach(), W0=Ws[0], b0=bs[0], W1=Ws[1], b1=bs[1])


def golden_module_cost():
    """Callable (nn.Module) cost path: approximate_cost quadraticization
    (mpc.py:447-487) inside the full solver, f64."""
    import mpc as ref_mpc
    from torch import nn

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(24)
    T, B, nx, nu = 8, 4, 3, 1
    n = nx + nu
    w = torch.rand(n) + 0.5
    target = torch.randn(n) * 0.3

    class Cost(nn.Module):
        def forward(self, tau):
            d = tau - target
            return 0.5 * (w * d * d).sum(dim=-1) + 0.1 * (d ** 4).sum(dim=-1)

    F = torch.randn(T - 1, B, nx, n) * 0.3
    F[..., :nx] += torch.eye(nx)
    f = torch.randn(T - 1, B, nx) * 0.1
    x_init = torch.randn(B, nx)
    solver = ref_mpc.MPC(
        nx, nu, T, lqr_iter=10, verbose=-1, n_batch=B,
        exit_unconverged=False, detach_unconverged=False, eps=1e-6)
    x, u, objs = solver(x_init, Cost(), ref_mpc.LinDx(F, f))
    save("mpc_module_cost_f64", w=w, target=target, F=F, f=f, x_init=x_init,
         x=x.detach(), u=u.detach(), objs=objs.detach())


def golden_slew_lindx():
    """Slew-rate penalty with LinDx dynamics (reference mpc.py:381-395
    builds the augmented _F0/_F1 blocks for LinDx too), f64.

    The reference path is BROKEN as shipped: solve_lqr_subproblem sets
    _dynamics = None for LinDx (mpc.py:414-416) and lqr_forward then calls
    true_dynamics(...) -> TypeError (lqr_step.py:224). The augmented
    blocks _F/_f it builds ARE the rollout dynamics, so the golden is
    generated with the one-line repair of passing LinDx(_F, _f) through --
    the unambiguous intent of mpc.py:381-395."""
    import mpc as ref_mpc

    orig_LQRStep = ref_mpc.LQRStep

    def fixed_LQRStep(**kw):
        if kw.get("true_dynamics", "sentinel") is None:

            def call(x_init, C, c, F, f):
                kw2 = dict(kw)
                kw2["true_dynamics"] = ref_mpc.LinDx(F, f)
                return orig_LQRStep(**kw2)(x_init, C, c, F, f)

            return call
        return orig_LQRStep(**kw)

    ref_mpc.LQRStep = fixed_LQRStep

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(41)
    T, B, nx, nu = 10, 4, 3, 2
    n = nx + nu
    A = torch.randn(T, B, n, n)
    C = A @ A.transpose(2, 3) + 0.5 * torch.eye(n)
    c = torch.randn(T, B, n)
    F = torch.randn(T - 1, B, nx, n) * 0.3
    F[..., :nx] += torch.eye(nx)
    f = torch.randn(T - 1, B, nx) * 0.1
    x_init = torch.randn(B, nx)
    prev_u = torch.full((1, B, nu), 0.2)

    solver = ref_mpc.MPC(
        nx, nu, T,
        u_lower=-0.5, u_upper=0.5,
        lqr_iter=10, verbose=-1, n_batch=B,
        exit_unconverged=False, detach_unconverged=False,
        eps=1e-7,
        slew_rate_penalty=1.5,
        prev_ctrl=prev_u,
    )
    x, u, objs = solver(x_init, ref_mpc.QuadCost(C, c), ref_mpc.LinDx(F, f))
    ref_mpc.LQRStep = orig_LQRStep
    save("lqr_slew_lindx_f64", C=C, c=c, F=F, f=f, x_init=x_init,
         prev_u=prev_u[0], x=x.detach(), u=u.detach(), objs=objs.detach())


def _rocket_xinit(B):
    torch.manual_seed(31)
    xinit = torch.zeros(B, 13)
    xinit[:, 0] = torch.rand(B) * 2 + 2        # altitude (x is vertical)
    xinit[:, 1:3] = torch.randn(B, 2) * 0.5    # lateral offset
    xinit[:, 3:6] = torch.randn(B, 3) * 0.2    # velocity
    quat = torch.randn(B, 4) * 0.05
    quat[:, 0] += 1.0
    xinit[:, 6:10] = quat / quat.norm(dim=1, keepdim=True)
    xinit[:, 10:] = torch.randn(B, 3) * 0.05   # body rates
    return xinit


def golden_rocket_mpc():
    """Rocket solver-level parity: mpc_explicit.py, f64, box +-20, both
    quaternion-normalization behaviors (the reference computes the
    normalized quaternion into new_x_out but returns the unnormalized
    new_x, rocket.py:158-164; the 'norm' variant patches the return to
    new_x_out to pin our normalize_quat=True flag)."""
    sys.path.insert(0, os.path.join(REF, "env_dx"))
    from mpc_explicit import MPC as ExMPC
    from mpc_explicit import GradMethods, QuadCost
    from env_dx import rocket

    torch.set_default_dtype(torch.float64)
    T, B = 10, 4
    xinit = _rocket_xinit(B)

    for tag, normalize in [("", False), ("_norm", True)]:
        dx = rocket.RocketDx()
        dx.params = dx.params.detach().double()
        if normalize:
            orig = rocket.RocketDx.forward

            def norm_forward(self, x, u, _orig=orig):
                out = _orig(self, x, u)
                q = out[..., 6:10]
                nq = q / (q.norm(dim=-1, keepdim=True) + 1e-8)
                out = out.clone()
                out[..., 6:10] = nq
                return out

            dx.forward = norm_forward.__get__(dx)
        q, p = dx.get_true_obj()
        Q = torch.diag(q.double()).unsqueeze(0).unsqueeze(0).repeat(T, B, 1, 1)
        pT = p.double().unsqueeze(0).repeat(T, B, 1)
        x, u, objs = ExMPC(
            dx.n_state, dx.n_ctrl, T,
            # scalar bounds: mpc_explicit's get_bound time-indexes any
            # tensor bound (lqr_step_explicit.py:270-274), so the [nu]
            # dx.lower/upper tensors cannot be passed through verbatim
            u_lower=-20.0, u_upper=20.0,
            lqr_iter=20, verbose=-1,
            exit_unconverged=False, detach_unconverged=False,
            linesearch_decay=dx.linesearch_decay,
            max_linesearch_iter=dx.max_linesearch_iter,
            grad_method=GradMethods.ANALYTIC if not normalize
            else GradMethods.AUTO_DIFF,
            eps=dx.mpc_eps,
        )(xinit, QuadCost(Q, pT), dx)
        save(f"mpc_rocket{tag}_f64", x_init=xinit, q=q.detach(),
             p=p.detach(), x=x.detach(), u=u.detach(), objs=objs.detach())


def golden_rocket_receding():
    """Receding-horizon rocket segment with the demo's warm-start shift
    u_init <- cat(u[1:], u[-1:]) (rocket.py:1120-1140), f64,
    unconstrained, 5 closed-loop steps."""
    sys.path.insert(0, os.path.join(REF, "env_dx"))
    from mpc_explicit import MPC as ExMPC
    from mpc_explicit import GradMethods, QuadCost
    from env_dx import rocket

    torch.set_default_dtype(torch.float64)
    T, steps = 20, 5
    dx = rocket.RocketDx()
    dx.params = dx.params.detach().double()
    q, p = dx.get_true_obj()
    Q = torch.diag(q.double()).unsqueeze(0).unsqueeze(0).repeat(T, 1, 1, 1)
    pT = p.double().unsqueeze(0).repeat(T, 1, 1)
    x = _rocket_xinit(1)
    u_init = None
    xs, us = [x.clone()], []
    for _ in range(steps):
        nx_, nu_, _objs = ExMPC(
            dx.n_state, dx.n_ctrl, T,
            u_init=u_init,
            u_lower=None, u_upper=None,
            lqr_iter=30, verbose=-1,
            exit_unconverged=False, detach_unconverged=False,
            linesearch_decay=dx.linesearch_decay,
            max_linesearch_iter=dx.max_linesearch_iter,
            grad_method=GradMethods.ANALYTIC,
            eps=1e-2,
        )(x, QuadCost(Q, pT), dx)
        next_action = nu_[0]
        us.append(next_action.clone())
        u_init = torch.cat((nu_[1:], nu_[-1:]), dim=0)
        x = dx(x, next_action)
        xs.append(x.clone())
    save("rocket_receding_f64",
         x_init=xs[0], q=q.detach(), p=p.detach(),
         xs=torch.stack(xs).detach()[:, 0],
         us=torch.stack(us).detach()[:, 0])


def golden_populate_data2():
    """populate_data2 receding-horizon expert generator incl. the
    warm-start shift with the u_init[-2] = u_init[-3] quirk
    (il_env.py:96-151, shift at :139), f64 pendulum."""
    sys.modules.setdefault("setproctitle", types.ModuleType("setproctitle"))
    sys.modules["setproctitle"].setproctitle = lambda *a, **k: None
    sys.modules.setdefault("gym", types.ModuleType("gym"))
    import il_env

    torch.set_default_dtype(torch.float64)
    env = il_env.IL_Env("pendulum", lqr_iter=10, mpc_T=10)
    env.true_dx.params = env.true_dx.params.detach().double()
    env.populate_data2(2, 1, 1, seed=0)
    save("populate_data2_pendulum_f64",
         train=env.train_data.detach(),
         val=env.val_data.detach(),
         test=env.test_data.detach())


def golden_kkt_nonlinear():
    """Nonlinear-env module-KKT gradient golden: mpc.py AUTO_DIFF forward +
    lqr_step.py KKT backward on the pendulum, chaining through the
    diff=True linearization to the dynamics params
    (mpc.py:308-319 + lqr_step.py:311-407)."""
    sys.path.insert(0, os.path.join(REF, "env_dx"))
    import mpc as ref_mpc
    from env_dx import pendulum

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(51)
    T, B = 10, 4
    dx = pendulum.PendulumDx()
    dx.params = dx.params.detach().double().requires_grad_(True)
    th = torch.rand(B) * 2 - 1
    xinit = torch.stack(
        (torch.cos(th), torch.sin(th), torch.rand(B) - 0.5), dim=1
    ).requires_grad_(True)
    q, p = dx.get_true_obj()
    C = (
        torch.diag(q.double()).unsqueeze(0).unsqueeze(0).repeat(T, B, 1, 1)
    ).requires_grad_(True)
    c = (p.double().unsqueeze(0).repeat(T, B, 1)).requires_grad_(True)
    gx = torch.randn(T, B, 3)
    gu = torch.randn(T, B, 1)

    x, u, _ = ref_mpc.MPC(
        3, 1, T,
        u_lower=-2.0, u_upper=2.0,
        lqr_iter=12, verbose=-1,
        exit_unconverged=False, detach_unconverged=False,
        linesearch_decay=dx.linesearch_decay,
        max_linesearch_iter=dx.max_linesearch_iter,
        grad_method=ref_mpc.GradMethods.AUTO_DIFF,
        eps=1e-5,
    )(xinit, ref_mpc.QuadCost(C, c), dx)
    loss = (x * gx).sum() + (u * gu).sum()
    dparams, dC, dc, dx_init = torch.autograd.grad(
        loss, [dx.params, C, c, xinit]
    )
    save("kkt_nonlinear_pendulum_f64",
         x_init=xinit.detach(), C=C.detach(), c=c.detach(),
         gx=gx, gu=gu, x=x.detach(), u=u.detach(),
         dparams=dparams, dC=dC, dc=dc, dx_init=dx_init)


if __name__ == "__main__":
    if "r2" in sys.argv[1:]:
        golden_slew_lindx()
        golden_rocket_mpc()
        golden_rocket_receding()
        golden_populate_data2()
        golden_kkt_nonlinear()
        print("round-2 goldens written")
        sys.exit(0)
    golden_pnqp()
    golden_lqr_lindx()
    golden_lqr_grad()
    golden_env_forwards()
    _env_mpc_golden("pendulum", T=20, B=16, lqr_iter=20, seed=11)
    _env_mpc_golden("cartpole", T=20, B=16, lqr_iter=20, seed=12)
    _env_mpc_golden("pendulum", T=20, B=16, lqr_iter=20, seed=11, dtype=torch.float64)
    _env_mpc_golden("cartpole", T=20, B=16, lqr_iter=20, seed=12, dtype=torch.float64)
    golden_slew_rate()
    golden_u_zero_delta_u()
    golden_nn_dynamics()
    golden_module_cost()
    golden_slew_lindx()
    golden_rocket_mpc()
    golden_rocket_receding()
    golden_populate_data2()
    golden_kkt_nonlinear()
    print("all goldens written")
