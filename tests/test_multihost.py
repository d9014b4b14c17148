"""True multi-process test of the TP serving story (VERDICT r3 next #7:
"no test ever runs two JAX processes").

Spawns TWO separate Python processes, each a JAX process with 4 virtual
CPU devices, coordinated via jax.distributed.initialize on localhost —
the same process topology a 2-host TPU pod slice uses (coordinator over
DCN, mesh spanning both hosts' chips). The overlap-TP forward runs over
the global 2×4 (data × model) mesh; each process verifies its
addressable output shards against the single-process golden reference.

What this proves that the in-process 8-device tests cannot: the forward
and its shardings work when no process can address the other host's
devices — weight scatter via make_array_from_callback, cross-process
collectives, per-process shard-local verification.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_overlap_tp():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # worker sets its own device count
    # keep the tunneled-TPU plugin out of the workers
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={i}" in out, out[-3000:]
        assert "devices=8" in out
