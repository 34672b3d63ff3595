"""Two-OS-process ``jax.distributed`` execution of the hybrid-mesh solve.

Everything else in the suite runs the "multi-host" layout inside ONE
process on a virtual device mesh; this test is the only place the actual
multi-process branch of ``multihost.initialize`` (the
``jax.distributed.initialize`` wrapper, ``parallel/multihost.py``)
executes: two coordinated CPU processes, 2 local devices each, forming a
(dcn=2, ici=2) mesh whose DCN axis really does cross a process boundary.
The reference has no distributed code at all (SURVEY §2.8) — this guards
OUR blueprint's scale-out contract.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_hybrid_solve_parity():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)          # worker pins cpu itself
    env.pop("XLA_FLAGS", None)              # worker sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"[proc {pid}] OK" in out
