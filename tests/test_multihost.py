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



def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "multihost_demo.py")
    port = _free_port()

    env = dict(os.environ)
    # each worker configures its own 2 virtual CPU devices; drop the
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
                "--num-processes", "2",
                "--process-id", str(i),
                "--cpu-devices", "2",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for i in range(2)
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
