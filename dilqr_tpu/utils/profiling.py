"""Profiling helpers (SURVEY.md section 5: the reference has only vestigial
kernprof decorators and disabled wall-clock prints, lqr_step.py:313,406;
here: jax.profiler traces + a throughput/roofline summary).

    with trace("/tmp/ilqr_trace"):
        run_solves()
    # -> open in XProf / tensorboard-plugin-profile

    report = throughput_report(fn, args, flops_per_example=...)
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional

import jax

# v5e-class single-chip VPU f32 throughput (8x128 lanes x 4 ALUs x ~940MHz);
# used only to contextualize the roofline percentage in reports
VPU_F32_FLOPS = 3.9e12


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (device + host timelines)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, n: int = 20, warmup: int = 1):
    """Pipelined steady-state wall time of a jitted callable (submit n,
    sync once) -- the measurement bench.py uses; per-call sync would
    measure the host<->device round-trip instead."""
    f = jax.jit(fn) if not hasattr(fn, "lower") else fn
    for _ in range(max(warmup, 1)):  # always compile before timing
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def throughput_report(
    fn: Callable,
    *args,
    batch: int,
    flops_per_example: Optional[float] = None,
    n: int = 20,
) -> dict:
    """Measure a batched solve and report solves/s (+ optional share of
    VPU f32 peak when a per-example FLOP estimate is supplied)."""
    dt = timeit(fn, *args, n=n)
    rep: dict[str, Any] = {
        "wall_s_per_call": dt,
        "examples_per_s": batch / dt,
    }
    if flops_per_example is not None:
        rep["achieved_flops"] = batch * flops_per_example / dt
        rep["vpu_f32_fraction"] = rep["achieved_flops"] / VPU_F32_FLOPS
    return rep


def device_kernel_ms(fn: Callable, *args, n: int = 10,
                     match: str = "ilqr") -> dict:
    """Profiler-derived per-call device time: capture a jax.profiler
    trace of ``n`` pipelined calls of a jitted fn, parse the XProf
    trace.json.gz, and return device-side durations in ms/call --
    ``matched_ms`` (events whose name contains ``match``, e.g. the
    Mosaic kernel), ``top`` (the 5 longest device events), and
    ``device_busy_ms`` (all device events). Unlike the wall-clock MFU
    this excludes host gaps, dispatch, and the tunnel round-trip, so
    matched_ms is the number an MFU claim should divide by."""
    import glob
    import gzip
    import json as _json
    import tempfile

    out = fn(*args)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as d:
        jax.profiler.start_trace(d)
        outs = [fn(*args) for _ in range(n)]
        jax.block_until_ready(outs)
        jax.profiler.stop_trace()
        paths = glob.glob(d + "/**/*.trace.json.gz", recursive=True)
        events = []
        for p in paths:
            with gzip.open(p, "rt") as f:
                events.extend(_json.load(f).get("traceEvents", []))

    # device timeline pids announce themselves via process_name metadata
    dev_pids = {
        e.get("pid")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and any(k in str(e.get("args", {}).get("name", ""))
                for k in ("TPU", "/device", "Chip", "TensorCore"))
    }
    durs: dict = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        durs[name] = durs.get(name, 0.0) + float(e.get("dur", 0.0))
    matched = sum(v for k, v in durs.items() if match in k.lower())
    total = sum(durs.values())
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:5]
    return {
        "matched_ms": matched / 1e3 / n,
        "device_busy_ms": total / 1e3 / n,
        "top": [(k, v / 1e3 / n) for k, v in top],
    }


def ilqr_flops_per_example(T: int, nx: int, nu: int, lqr_iter: int,
                           ls_trials: int = 2) -> float:
    """Rough per-example FLOP count of one fused iLQR solve (rollout +
    n-probe linearization + Riccati + line search), for roofline context."""
    n = nx + nu
    step = 8 * nx  # envs are a few dozen elementwise ops
    lin = n * 2 * step
    ric = 2 * (nx * n * nx + n * n * nx) + 4 * n * n
    obj = 2 * n * n
    trial = nu * nx * 2 + step + obj
    per_iter = T * (step + obj + lin + ric + ls_trials * trial)
    return float(lqr_iter * per_iter)
