"""Multi-device sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4:
the standard JAX substitute for multi-chip tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from eoe_tpu.parallel import mesh as meshlib


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return meshlib.make_mesh(meshlib.MeshConfig(data=8, model=1))


def test_mesh_shape(mesh8):
    assert mesh8.shape == {"data": 8, "model": 1}


def test_mesh_config_resolution():
    assert meshlib.MeshConfig(data=-1, model=2).resolve(8) == (4, 2)
    with pytest.raises(ValueError):
        meshlib.MeshConfig(data=8, model=2).resolve(8)


def test_shard_batch_places_on_devices(mesh8):
    batch = {"x": np.zeros((16, 8, 8, 3)), "y": np.zeros((16,))}
    out = meshlib.shard_batch(mesh8, batch)
    assert len(out["x"].sharding.device_set) == 8
    assert out["x"].sharding.spec == P("data", None, None, None)


def test_data_parallel_gradients_match_single_device(mesh8):
    """A batch-sharded jitted loss must produce the same gradients as the
    unsharded computation (XLA inserts the all-reduce)."""
    w = jnp.ones((12, 4))
    x = np.random.default_rng(0).normal(size=(16, 12)).astype(np.float32)

    def loss(w, x):
        return jnp.sum((x @ w) ** 2) / x.shape[0]

    g_ref = jax.grad(loss)(w, jnp.array(x))

    xs = jax.device_put(x, meshlib.batch_sharding(mesh8, 2))
    ws = jax.device_put(w, meshlib.replicated(mesh8))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), rtol=1e-5)


def test_trainer_with_mesh_runs(tmp_path, mesh8):
    from tests.test_trainer import make_trainer
    trainer = make_trainer(tmp_path, "hsc", epochs=1, mesh=mesh8)
    _, res = trainer.run(run_classes=[0], run_seeds=1)
    assert np.isfinite(res["mean_auc"])


def test_param_shardings_tp_rules(mesh8):
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=4, model=2))
    params = {"block": {"mlp_up": {"kernel": np.zeros((64, 128))},
                        "mlp_down": {"kernel": np.zeros((128, 64))},
                        "other": {"kernel": np.zeros((64, 64))}}}
    shardings = meshlib.param_shardings(mesh, params)
    assert shardings["block"]["mlp_up"]["kernel"].spec == P(None, "model")
    assert shardings["block"]["mlp_down"]["kernel"].spec == P("model", None)
    assert shardings["block"]["other"]["kernel"].spec == P()


def _tiny_clip_trainer(tmp_path, mesh):
    """Tiny CLIP + combined normal/OE arrays, mirroring the driver dryrun
    config but smaller; widths divisible by a model axis of 2."""
    from eoe_tpu.datasets.bases import ArraySource, CombinedDataset, GenericADDataset
    from eoe_tpu.models.clip import CLIP, ClipConfig
    from eoe_tpu.training import Trainer
    from eoe_tpu.utils.logger import Logger

    rng = np.random.default_rng(7)
    HW, B, n = 16, 8, 32
    cfg = ClipConfig(embed_dim=32, image_resolution=HW, vision_layers=1,
                     vision_width=64, vision_patch_size=8, context_length=16,
                     vocab_size=64, transformer_width=32, transformer_heads=2,
                     transformer_layers=1, vision_heads_override=2)
    specs = [{"op": "random_hflip"}, {"op": "clip_pil_preprocessing", "resolution": HW},
             {"op": "clip_tensor_preprocessing"}]
    kw = dict(root="", train_specs=specs, test_specs=specs[1:], n_classes=2,
              raw_shape=(HW, HW, 3))
    xtr = rng.integers(0, 256, (n, HW, HW, 3), np.uint8)
    xte = rng.integers(0, 256, (2 * B, HW, HW, 3), np.uint8)
    xoe = rng.integers(0, 256, (n, HW, HW, 3), np.uint8)
    yte = np.array([0, 1] * B, np.int64)
    normal = GenericADDataset(ArraySource(xtr, np.zeros(n, np.int64)),
                              ArraySource(xte, yte), normal_classes=(0,),
                              nominal_label=0, **kw)
    oe = GenericADDataset(ArraySource(xoe, np.ones(n, np.int64)), None,
                          normal_classes=(1,), nominal_label=1, **kw)
    ds = CombinedDataset(normal, oe)
    trainer = Trainer(model=CLIP(cfg), objective="hsc", train_specs=specs,
                      test_specs=specs[1:], dataset="cifar10", oe_dataset="cifar100",
                      datapath="/tmp", logger=Logger(str(tmp_path), active=False),
                      epochs=2, lr=1e-3, wdk=0.0, milestones=[], batch_size=B, mesh=mesh)
    trainer.ds = ds
    return trainer, ds


def test_tp_train_matches_single_device(tmp_path):
    """A data=4 x model=2 (DP+TP) CLIP training run must reproduce the
    single-device run bit-for-bit up to reduction order: same final params,
    same train/eval AUC. This certifies that the Megatron qkv/mlp shardings
    are numerics-preserving, not just that the specs look right."""
    import contextlib

    results = {}
    for name, mesh in (("single", None),
                       ("tp", meshlib.make_mesh(meshlib.MeshConfig(data=4, model=2)))):
        trainer, ds = _tiny_clip_trainer(tmp_path / name, mesh)
        with (mesh if mesh is not None else contextlib.nullcontext()):
            state, roc = trainer.train_cls(ds, 0, "t", 0, jax.random.key(0))
            eroc, _ = trainer.eval_cls(state, ds, 0, "t", 0)
        results[name] = (jax.tree_util.tree_map(np.asarray, state.params),
                        roc.auc, eroc.auc)
    p_ref, tauc_ref, eauc_ref = results["single"]
    p_tp, tauc_tp, eauc_tp = results["tp"]
    leaves_ref = jax.tree_util.tree_leaves(p_ref)
    leaves_tp = jax.tree_util.tree_leaves(p_tp)
    assert len(leaves_ref) == len(leaves_tp)
    for a, b in zip(leaves_ref, leaves_tp):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
    assert abs(tauc_ref - tauc_tp) < 0.01
    assert abs(eauc_ref - eauc_tp) < 0.01


def test_batchnorm_global_stats_under_sharding(mesh8):
    """flax BatchNorm reduces over the GLOBAL batch even when the batch is
    sharded over the mesh: XLA lowers the mean/var reduction to a cross-chip
    psum. The sharded batch stats must equal the unsharded ones."""
    import flax.linen as nn

    class BNNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5)(x)

    model = BNNet()
    x = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)

    def stats(xin):
        _, mut = jax.jit(lambda v, x: model.apply(v, x, train=True,
                                                  mutable=["batch_stats"]))(variables, xin)
        return jax.tree_util.tree_map(np.asarray, mut["batch_stats"])

    ref = stats(jnp.asarray(x))
    xs = jax.device_put(x, meshlib.batch_sharding(mesh8, 2))
    sharded = stats(xs)
    for a, b in zip(jax.tree_util.tree_leaves(sharded), jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_fused_attention_partitions_over_data_axis(mesh8):
    """The fused QKV attention kernel carries custom_partitioning rules:
    under a data-sharded batch it must run per-shard (no global gather) and
    reproduce the unsharded forward and gradient exactly."""
    from jax.sharding import NamedSharding
    from eoe_tpu.ops.attention import fused_qkv_attention

    rng = np.random.default_rng(0)
    n, s, h, d = 16, 18, 2, 64
    D = h * d
    qkv = jnp.asarray(rng.normal(size=(n, s, 3 * D)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(n, s, D)), jnp.float32)

    ref = fused_qkv_attention(qkv, h, False)
    ref_grad = jax.grad(lambda x: (fused_qkv_attention(x, h, False) * g).sum())(qkv)

    batch_sh = NamedSharding(mesh8, P("data", None, None))
    qkv_sh = jax.device_put(qkv, batch_sh)
    g_sh = jax.device_put(g, batch_sh)

    fwd = jax.jit(lambda x: fused_qkv_attention(x, h, False),
                  in_shardings=(batch_sh,))
    out = fwd(qkv_sh)
    assert out.sharding.spec[0] == "data", out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    grad = jax.jit(jax.grad(lambda x: (fused_qkv_attention(x, h, False)
                                       * g_sh).sum()),
                   in_shardings=(batch_sh,))(qkv_sh)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad), atol=1e-4)


def test_seed_sharded_vmap_matches_single_shard(tmp_path, mesh8):
    """SURVEY §2.7(b): on a data mesh the seed-vmapped grid shards the SEED
    axis across devices (each chip trains its share of the seeds; no
    collectives). Results must match the unsharded vmapped grid."""
    from test_trainer import make_trainer
    aucs = {}
    for name, mesh in (("single", None), ("sharded", mesh8)):
        trainer = make_trainer(tmp_path / name, "hsc", epochs=2, mesh=mesh)
        _, r = trainer.run(run_classes=[0], run_seeds=8, vmap_seeds=True)
        aucs[name] = r["cls_aucs"][0]
        if mesh is not None:
            assert trainer._last_vmap_sharded, "seed axis should shard on the data mesh"
    np.testing.assert_allclose(aucs["sharded"], aucs["single"], atol=2e-3)


def test_seed_shard_skips_on_indivisible_grid(tmp_path, mesh8):
    """Seed counts that don't divide the data axis keep the single-shard path."""
    from test_trainer import make_trainer
    trainer = make_trainer(tmp_path, "hsc", epochs=1, mesh=mesh8)
    _, r = trainer.run(run_classes=[0], run_seeds=3, vmap_seeds=True)
    assert len(r["cls_aucs"][0]) == 3
    assert trainer._last_vmap_sharded is False


def test_evolve_candidates_shard_over_mesh(tmp_path, mesh8):
    """SURVEY §2.7(b): full candidate chunks shard across the data mesh;
    fitness must match the single-shard vmapped evaluation (same seeds)."""
    import argparse
    from eoe_tpu.evolve.vmapped import VmappedEvaluator
    from eoe_tpu.main import evolve_trainer
    from eoe_tpu.models.cnn import CNN32

    args = argparse.Namespace(classes=[0], iterations=1)
    fits = {}
    for name, mesh in (("single", None), ("sharded", mesh8)):
        trainer, oeds, _ = evolve_trainer(
            "hsc", "", "cifar10", "cifar100", 1, 1e-3, 0.0, [], 16, "one_vs_rest",
            None, CNN32(rep_dim=32), [], [], classes=[0],
            dataset_path=str(tmp_path / name), superdir=str(tmp_path / name))
        trainer.mesh = mesh
        ev = VmappedEvaluator(trainer, args, chunk=8)
        rng = np.random.default_rng(5)
        inds = [[int(rng.integers(0, len(oeds)))] for _ in range(8)]
        fits[name] = ev.evaluate_population(inds)
    np.testing.assert_allclose(fits["sharded"], fits["single"], atol=2e-3)
