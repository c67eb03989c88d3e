"""Worker process for tests/test_multihost.py: joins a 2-process CPU
cluster through eoe_tpu.parallel.mesh.init_distributed (the SURVEY.md §2.7
multi-host deliverable), builds the GLOBAL 8-device mesh, and runs one
batch-sharded CNN32+HSC gradient step whose result must match the
single-process full-batch computation exactly (XLA inserts the cross-process
all-reduce over gloo; BatchNorm statistics span the global batch).

Invoked as:  python multihost_worker.py <process_id> <coordinator_port> [mode]
where mode is "grad" (default: one-step gradient parity) or "trainer"
(a REAL ``Trainer.run`` over the global mesh: each process feeds its local
batch shards and the run's results.json must match the single-process run).
Prints PARITY-OK (grad) / TRAINER-OK {json} (trainer) on success."""

import os
import sys


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "grad"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # oneDNN picks different matmul kernels for the 8-row local vs 16-row
    # reference shapes, adding shape-dependent noise on top of the expected
    # psum reassociation; disable it so the parity tolerance can stay tight
    os.environ["TF_ENABLE_ONEDNN_OPTS"] = "0"
    os.environ["EOE_TPU_DISTRIBUTED"] = "1"
    os.environ["EOE_TPU_COORD_ADDR"] = f"localhost:{port}"
    os.environ["EOE_TPU_NUM_PROCESSES"] = "2"
    os.environ["EOE_TPU_PROCESS_ID"] = str(pid)

    import jax
    jax.config.update("jax_platforms", "cpu")  # a sitecustomize may force TPU

    from eoe_tpu.parallel import mesh as meshlib
    meshlib.init_distributed()

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    if mode == "trainer":
        return run_trainer(pid)
    if mode == "vmapseeds":
        return run_vmapseeds(pid)

    import jax.numpy as jnp
    import numpy as np

    from eoe_tpu.models.cnn import CNN32
    from eoe_tpu.ops.losses import hsc_loss

    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=8, model=1))

    model = CNN32(rep_dim=32)
    # seed 7: seed 0 put one post-BN activation exactly on the leaky-relu
    # kink, where a 1-ulp difference in the psum'd batch stats flips the
    # subgradient (a deterministic 4e-3 jump in one bias grad element)
    X = np.random.default_rng(7).normal(size=(16, 32, 32, 3)).astype(np.float32)
    labels = np.asarray([0, 1] * 8, np.int64)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)

    def loss_fn(params, batch_stats, x, y):
        feats, _ = model.apply({"params": params, "batch_stats": batch_stats},
                               x, train=True, mutable=["batch_stats"])
        return hsc_loss(feats, y, None)

    grad = jax.jit(jax.grad(loss_fn))

    # each process feeds only its local half of the global batch
    local = X[pid * 8:(pid + 1) * 8]
    local_l = labels[pid * 8:(pid + 1) * 8]
    xsh = meshlib.batch_sharding(mesh, 4)
    Xg = jax.make_array_from_process_local_data(xsh, local)
    Lg = jax.make_array_from_process_local_data(meshlib.batch_sharding(mesh, 1), local_l)
    rep = meshlib.replicated(mesh)
    params_g = jax.device_put(variables["params"], rep)
    stats_g = jax.device_put(variables["batch_stats"], rep)
    g_sharded = grad(params_g, stats_g, Xg, Lg)

    # single-process reference over the full batch (deterministic data)
    g_ref = jax.jit(jax.grad(loss_fn))(variables["params"], variables["batch_stats"],
                                       jnp.asarray(X), jnp.asarray(labels))

    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_sharded)[0],
            jax.tree_util.tree_flatten_with_path(g_ref)[0]):
        # cross-process psum reassociates the f32 reductions (BN stats, grad
        # all-reduce), so bit-exactness is not expected — only closeness
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-4, err_msg=str(path))
    print(f"{pid} PARITY-OK", flush=True)


def run_trainer(pid: int):
    """A REAL ``Trainer.run`` under 2 processes over the global 8-device mesh
    (SURVEY.md §2.7/§5.8: trainer-level multi-host): fake CIFAR data (identical
    on both processes — the datasets are deterministic), one class, one seed.
    Each process executes the same SPMD program; the host feed builds GLOBAL
    arrays (each process uploads only its addressable shards). Prints
    TRAINER-OK {json} with the final mean AUC + per-epoch losses, which the
    pytest parent compares against its own single-process run."""
    import json

    import jax

    from eoe_tpu.parallel import mesh as meshlib

    os.environ["EOE_TPU_FAKE_DATA"] = "1"
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=8, model=1))

    from eoe_tpu.models.cnn import CNN32
    from eoe_tpu.training import TRAINER
    from eoe_tpu.utils.logger import Logger

    logdir = os.environ["EOE_TPU_TRAINER_LOGDIR"]
    logger = Logger(logdir, comment=f"mh_p{pid}")
    trainer = TRAINER["hsc"](
        model=CNN32(rep_dim=64),
        train_specs=[{"op": "random_hflip"}, "normalize"],
        test_specs=["normalize"],
        dataset="cifar10", oe_dataset="cifar100",
        datapath=os.environ["EOE_TPU_TRAINER_DATAPATH"],
        logger=logger, epochs=2, lr=1e-3, wdk=0.0, milestones=[1],
        batch_size=32, mesh=mesh)
    _, results = trainer.run(run_classes=[0], run_seeds=1)
    losses = [round(v, 6) for _, v in
              logger._scalars.get("training_cls0_seed0_loss", [])]
    print("TRAINER-OK " + json.dumps({
        "pid": pid, "mean_auc": results["mean_auc"], "losses": losses,
        "logdir": logger.dir}), flush=True)


def run_vmapseeds(pid: int):
    """The seed-vmapped grid under jax.process_count()==2 (round-4 review:
    it used to fall back to sequential on pods): 8 seeds of one class train
    as ONE vmapped program with the seed axis sharded over the global
    8-device data mesh. Prints VMAPSEEDS-OK {json} with per-seed AUCs; the
    pytest parent asserts both processes agree and match its own
    single-process vmapped run."""
    import json

    from eoe_tpu.parallel import mesh as meshlib

    os.environ["EOE_TPU_FAKE_DATA"] = "1"
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=8, model=1))

    from eoe_tpu.models.cnn import CNN32
    from eoe_tpu.training import TRAINER
    from eoe_tpu.utils.logger import Logger

    logger = Logger(os.environ["EOE_TPU_TRAINER_LOGDIR"], comment=f"vs_p{pid}")
    trainer = TRAINER["hsc"](
        model=CNN32(rep_dim=32),
        train_specs=["normalize"], test_specs=["normalize"],
        dataset="cifar10", oe_dataset="cifar100",
        datapath=os.environ["EOE_TPU_TRAINER_DATAPATH"],
        logger=logger, epochs=2, lr=1e-3, wdk=0.0, milestones=[],
        batch_size=16, mesh=mesh)
    _, results = trainer.run(run_classes=[0], run_seeds=8, vmap_seeds=True)
    assert trainer._last_grid_vmapped, "vmapped grid must run under 2 processes"
    assert trainer._last_vmap_sharded, "seed axis must shard over the data mesh"
    print("VMAPSEEDS-OK " + json.dumps({
        "pid": pid, "aucs": [round(float(a), 6) for a in results["cls_aucs"][0]],
    }), flush=True)


if __name__ == "__main__":
    main()
