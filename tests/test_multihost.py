"""Multi-host distribution test: a REAL 2-process jax.distributed cluster
(SURVEY.md section 2.4 "jax.distributed.initialize + one Mesh axis spanning
all chips"; BASELINE.md host-scaling north star).

Spawns two subprocesses running scripts/multihost_demo.py against a
port-coordinated local coordinator, each contributing 2 virtual CPU
devices (4 global). The demo itself asserts distributed-solve and
distributed-train-step numerics match a single-process reference on every
example; the test asserts both processes exit 0 with MULTIHOST OK.
"""
import os
import socket
import subprocess
import sys

import pytest



def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cluster(device_counts, extra_args=()):
    """Spawn one multihost_demo.py process per entry of device_counts
    (each with that many virtual CPU devices) against a fresh local
    coordinator; assert every process prints MULTIHOST OK and exits 0."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "multihost_demo.py")
    port = _free_port()
    nproc = len(device_counts)

    env = dict(os.environ)
    # each worker configures its own virtual CPU devices; drop the
    # parent suite's 8-device XLA_FLAGS and any stale distributed state
    env.pop("XLA_FLAGS", None)
    for k in list(env):
        if k.startswith(("JAX_COORDINATOR", "JAX_NUM_PROCESSES", "JAX_PROCESS")):
            env.pop(k)

    procs = [
        subprocess.Popen(
            [
                sys.executable, script,
                "--coordinator", f"localhost:{port}",
                "--num-processes", str(nproc),
                "--process-id", str(i),
                "--cpu-devices", str(device_counts[i]),
                *extra_args,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
        assert "MULTIHOST OK" in out, f"process {i} no OK line:\n{out[-4000:]}"
    return outs


def test_two_process_cpu_cluster():
    _run_cluster([2, 2])


@pytest.mark.slow
def test_four_process_uneven_cluster():
    """4 processes with HETEROGENEOUS device counts (1+2+1+2 = 6 mesh
    devices) and uneven per-process batches 3+5+2+3 = 13 examples:
    exercises distribute_batch_padded (remainder padding + validity
    mask), the strict heterogeneous-share distribute_batch, and the
    collectives audit on that topology."""
    _run_cluster([1, 2, 1, 2], ("--batches", "3,5,2,3"))
