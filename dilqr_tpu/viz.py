"""Rendering hooks for the physics environments.

Mirrors the reference's matplotlib renderers -- pendulum.get_frame
(env_dx/pendulum.py:97-115), cartpole.get_frame (env_dx/cartpole.py:841-857)
and the rocket 3-D trajectory animation (env_dx/rocket.py:825-994) -- as
optional utilities (matplotlib imported lazily; the solver never depends on
this module).
"""
from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def pendulum_frame(x, ax=None):
    """Draw one pendulum state (cos th, sin th, th_dot). Reference
    pendulum.py:97-115 (rod of length l from the pivot)."""
    plt = _mpl()
    x = np.asarray(x)
    cos_th, sin_th = float(x[0]), float(x[1])
    if ax is None:
        _, ax = plt.subplots(figsize=(4, 4))
    ax.plot((0.0, sin_th), (0.0, cos_th), color="k", lw=4)
    ax.set_xlim(-1.2, 1.2)
    ax.set_ylim(-1.2, 1.2)
    ax.set_aspect("equal")
    return ax


def cartpole_frame(x, length: float = 0.5, ax=None):
    """Draw one cartpole state (p, p_dot, cos th, sin th, th_dot).
    Reference cartpole.py:841-857 (cart marker + pole of length 2l)."""
    plt = _mpl()
    from matplotlib import patches

    x = np.asarray(x)
    p, cos_th, sin_th = float(x[0]), float(x[2]), float(x[3])
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 3))
    cart_w, cart_h = 0.4, 0.2
    ax.add_patch(
        patches.Rectangle(
            (p - cart_w / 2, -cart_h / 2), cart_w, cart_h, color="k"
        )
    )
    ax.plot(
        (p, p + 2 * length * sin_th),
        (0.0, 2 * length * cos_th),
        color="tab:blue",
        lw=3,
    )
    ax.set_xlim(p - 2.5, p + 2.5)
    ax.set_ylim(-1.5, 1.5)
    ax.set_aspect("equal")
    return ax


def rocket_trajectory(xs, us=None, path: str = None):
    """3-D soft-landing trajectory plot for the 13-state rocket
    (r, v, q, w). Simplified equivalent of the reference's animation
    (rocket.py:825-994): position track + thrust vectors. ``xs`` [T, 13]
    (or [T, B, 13]; batch element 0 is drawn). Saves to ``path`` if given,
    else returns the figure."""
    plt = _mpl()
    xs = np.asarray(xs)
    if xs.ndim == 3:
        xs = xs[:, 0]
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    # reference draws x up: state is (rx=altitude, ry, rz, ...)
    ax.plot(xs[:, 1], xs[:, 2], xs[:, 0], "-o", ms=2, color="tab:blue")
    if us is not None:
        us = np.asarray(us)
        if us.ndim == 3:
            us = us[:, 0]
        n = min(len(us), len(xs))
        ax.quiver(
            xs[:n, 1], xs[:n, 2], xs[:n, 0],
            -us[:n, 1], -us[:n, 2], -us[:n, 0],
            length=0.05, color="tab:red", normalize=False,
        )
    ax.set_xlabel("y")
    ax.set_ylabel("z")
    ax.set_zlabel("altitude x")
    if path is not None:
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path
    return fig


def save_frames(frames_fn, xs, prefix: str):
    """Render a trajectory to numbered PNGs (reference il_exp-style frame
    dumps). frames_fn: pendulum_frame or cartpole_frame."""
    plt = _mpl()
    paths = []
    for i, x in enumerate(np.asarray(xs)):
        ax = frames_fn(x)
        p = f"{prefix}_{i:03d}.png"
        ax.figure.savefig(p, dpi=100)
        plt.close(ax.figure)
        paths.append(p)
    return paths
