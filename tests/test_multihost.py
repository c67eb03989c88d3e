"""Multi-host distributed path (SURVEY.md §2.7: 'initialized via
jax.distributed.initialize for multi-host pods'). A real 2-process CPU
cluster (TCP coordinator + gloo collectives, 4 virtual devices per process)
is launched as subprocesses; each joins through
eoe_tpu.parallel.mesh.init_distributed, builds the global 8-device mesh, and
verifies gradient parity of a batch-sharded CNN32+HSC step against the
single-process computation (see tests/multihost_worker.py)."""

import os
import os.path as pt
import socket
import subprocess
import sys
import warnings

import pytest

WORKER = pt.join(pt.dirname(pt.abspath(__file__)), "multihost_worker.py")
REPO = pt.dirname(pt.dirname(pt.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cluster_gradient_parity():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the worker sets its own JAX_PLATFORMS/XLA_FLAGS/EOE_TPU_* env
    for k in ("XLA_FLAGS", "EOE_TPU_DISTRIBUTED", "EOE_TPU_COORD_ADDR",
              "EOE_TPU_NUM_PROCESSES", "EOE_TPU_PROCESS_ID"):
        env.pop(k, None)
    procs = [subprocess.Popen([sys.executable, WORKER, str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"{i} PARITY-OK" in out, out[-4000:]


def test_init_distributed_failure_warns(monkeypatch):
    """A misconfigured pod must warn loudly, not silently fall back to
    single-process (parallel/mesh.py init_distributed)."""
    from eoe_tpu.parallel import mesh as meshlib

    monkeypatch.setattr(meshlib, "_distributed_initialized", False)
    monkeypatch.setenv("EOE_TPU_DISTRIBUTED", "1")

    def boom(**kwargs):
        raise RuntimeError("no coordinator")

    monkeypatch.setattr(meshlib.jax.distributed, "initialize", boom)
    with pytest.warns(RuntimeWarning, match="continuing single-process"):
        meshlib.init_distributed()


def test_init_distributed_noop_without_flag(monkeypatch):
    from eoe_tpu.parallel import mesh as meshlib

    monkeypatch.setattr(meshlib, "_distributed_initialized", False)
    monkeypatch.delenv("EOE_TPU_DISTRIBUTED", raising=False)

    def boom(**kwargs):  # pragma: no cover - must not be called
        raise AssertionError("initialize must not run without the env gate")

    monkeypatch.setattr(meshlib.jax.distributed, "initialize", boom)
    meshlib.init_distributed()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        meshlib.init_distributed()
