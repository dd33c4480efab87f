"""2-process `jax.distributed` smoke test (VERDICT r4 #6): subprocess-launch
two workers, coordinator on localhost, gloo CPU collectives; each builds the
global mesh via `make_multihost_mesh` and runs one sharded MSM whose
cross-process all_gather must produce the host-oracle result on BOTH ranks.

The reference has no distributed backend at all (SURVEY §2.4); this pins the
actual `jax.distributed.initialize` orchestration path, not just the
single-process simulated mesh the other parallel tests use.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_msm():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=root)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, f"rank {pid} output:\n{out[-4000:]}"
    # both ranks computed the same replicated point
    line0 = [l for l in outs[0].splitlines() if l.startswith("MULTIHOST_OK")][0]
    line1 = [l for l in outs[1].splitlines() if l.startswith("MULTIHOST_OK")][0]
    assert line0 == line1
