"""Multi-process (multi-host) execution: 2 OS processes, jax.distributed
coordinator, one global 4-device mesh, one product sharded launch — the
existence proof of the DCN path (round-2 verdict #8). The reference is
single-process/single-GPU (template/precomp.h:1316-1318); this is the
framework's scale-out axis (SURVEY.md §5 'Distributed communication
backend')."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_launch():
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out (coordinator deadlock?)")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    lines = [
        next(l for l in out.splitlines() if l.startswith("MULTIHOST_OK"))
        for out in outs
    ]
    # both processes computed the SAME psum'd global counts
    tails = [l.split("process=")[1].split(" ", 1)[1] for l in lines]
    assert tails[0] == tails[1], lines
    assert "total=" in tails[0] and int(tails[0].split("total=")[1].split()[0]) > 0
