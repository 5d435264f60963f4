"""Multi-host execution of the distributed path (SURVEY.md §4 test plan (e)):
two real OS processes under jax.distributed (gloo CPU collectives), with the
'coeff' mesh axis spanning the process boundary — the DCN-analog of the
multi-host claim that the same shard_map programs run unchanged."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dist_ntt():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for pr in procs:
            out, err = pr.communicate(timeout=540)
            outs.append((pr.returncode, out, err))
    finally:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
        assert "WORKER_OK" in out


def test_two_process_whole_program_and_hybrid():
    """Multi-host breadth (VERDICT r4 missing #5): the GSPMD-sharded WHOLE
    PROGRAM (compiled arithmetic example, jit_exec mesh path) and the
    HYBRID distributed mul+relin both cross a real 2-process gloo
    boundary, bit-identical to their single-device references."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker2.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for pr in procs:
            out, err = pr.communicate(timeout=540)
            outs.append((pr.returncode, out, err))
    finally:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
        assert "WHOLE_PROGRAM_OK" in out
        assert "HYBRID_OK" in out
        assert "WORKER_OK" in out
