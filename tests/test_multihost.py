"""Multi-host execution test: two real JAX processes on localhost.

The standard single-process virtual-mesh tests (conftest.py) exercise
collectives but not process sharding. Here two subprocesses initialize
jax.distributed (Gloo CPU collectives), build the global mesh, load only
their own partition slots, and run the partition-parallel and halo train
steps for several synchronized updates — the same code path a multi-host
TPU pod runs over ICI x DCN (parallel/distributed.py).
"""
import os
import re
import socket
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
TOOL = os.path.join(ROOT, "tools", "multihost_dryrun.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(extra=()):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES")}
    procs = [subprocess.Popen(
        [sys.executable, TOOL, "--process_id", str(i), "--num_processes",
         "2", "--coordinator", f"localhost:{port}", "--local_devices", "2",
         *extra],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=ROOT) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def _check(procs, outs):
    lines = []
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        m = re.search(r"DRYRUN_OK .*loss_first=([\d.]+) loss_last=([\d.]+)",
                      out)
        assert m, out[-3000:]
        lines.append((float(m.group(1)), float(m.group(2))))
    # both processes observed the SAME synchronized trajectory
    assert lines[0] == pytest.approx(lines[1], rel=1e-6)
    assert lines[0][1] < lines[0][0]


@pytest.mark.slow
def test_multihost_parallel_two_processes():
    procs, outs = _run_pair()
    _check(procs, outs)


@pytest.mark.slow
def test_multihost_halo_two_processes():
    procs, outs = _run_pair(extra=("--halo",))
    _check(procs, outs)
