"""Model shape/behavior tests (reference: src/eoe/models/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoe_tpu.models.ae import AE32
from eoe_tpu.models.cbam import CBAM
from eoe_tpu.models.cnn import CNN28, CNN32
from eoe_tpu.models.resnet import WideResNet


def init_and_apply(model, x, train=False):
    variables = model.init(jax.random.key(0), x, train=False)
    if train:
        return model.apply(variables, x, train=True, mutable=["batch_stats"])
    return model.apply(variables, x, train=False)


def test_cnn28_shapes():
    x = jnp.zeros((4, 28, 28, 1))
    out = init_and_apply(CNN28(), x)
    assert out.shape == (4, 32)
    out = init_and_apply(CNN28(clf=True), x)
    assert out.shape == (4, 1)


def test_cnn32_shapes():
    x = jnp.zeros((4, 32, 32, 3))
    out = init_and_apply(CNN32(), x)
    assert out.shape == (4, 256)
    out = init_and_apply(CNN32(clf=True), x)
    assert out.shape == (4, 1)


def test_cnn32_param_count_matches_reference():
    """Parameter count must match the torch CNN32 (models/cnn.py:44-86):
    convs 5x5 (3->32->64->128) + fc 2048->512 -> rep 256 (+BN affine)."""
    model = CNN32(bias=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    ref = ((5 * 5 * 3 * 32 + 32) + (5 * 5 * 32 * 64 + 64) + (5 * 5 * 64 * 128 + 128)
           + (2048 * 512 + 512) + (512 * 256 + 256)
           + 2 * (32 + 64 + 128 + 512))  # BN scale+bias
    assert n == ref


def test_batchnorm_updates_running_stats():
    model = CNN32()
    x = jnp.ones((8, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(after, before))


def test_wideresnet_shapes():
    x = jnp.zeros((2, 224, 224, 3))
    out = init_and_apply(WideResNet(rep_dim=256), x)
    assert out.shape == (2, 256)
    out = init_and_apply(WideResNet(clf=True), x)
    assert out.shape == (2, 1)


def test_cbam_preserves_shape():
    x = jnp.ones((2, 8, 8, 32))
    model = CBAM(32, 16)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == x.shape


def test_cbam_spatial_bn_zero_init():
    # zero-initialized SpatialGate BN scale -> sigmoid(0)=0.5 gate at init
    # (reference resnet.py:60-62)
    x = jnp.ones((2, 8, 8, 32))
    model = CBAM(32, 16)
    variables = model.init(jax.random.key(0), x, train=False)
    scale = variables["params"]["spatial_gate"]["spatial_bn"]["scale"]
    np.testing.assert_array_equal(np.asarray(scale), 0.0)


def test_ae32_reconstruction_shape():
    x = jnp.zeros((4, 32, 32, 3))
    out = init_and_apply(AE32(), x)
    assert out.shape == (4, 32, 32, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_models_jit_and_grad():
    model = CNN32(clf=False)
    x = jnp.ones((4, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)

    @jax.jit
    def loss_fn(params):
        feats, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                               x, train=True, mutable=["batch_stats"])
        return (feats ** 2).sum()

    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(p)).all() for p in jax.tree_util.tree_leaves(g))


def test_wide_resnet50_shapes_and_converter():
    """WideResNet50Pretrained (torchvision wide_resnet50_2 architecture,
    reference resnet.py:8-21): param-count parity with torch and converter
    structural roundtrip from a synthetic torchvision-layout state dict."""
    import numpy as np
    from eoe_tpu.models.resnet50 import (WideResNet50Pretrained,
                                         load_torchvision_state_dict)

    model = WideResNet50Pretrained(rep_dim=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 16)

    # trunk parameter count == torchvision wide_resnet50_2 minus its fc
    # (66,834,240 conv/bn params; the 2048x1000 fc is replaced)
    n = sum(int(np.prod(p.shape)) for k, p in
            jax.tree_util.tree_flatten_with_path(variables["params"])[0]
            if "fc" not in jax.tree_util.keystr(k))
    assert n == 66_834_240, n

    # synthetic torchvision-layout state dict -> converter -> same tree paths
    rng = np.random.default_rng(0)
    sd = {}

    def add_bn(key, c):
        sd[key + ".weight"] = np.ones(c, np.float32)
        sd[key + ".bias"] = np.zeros(c, np.float32)
        sd[key + ".running_mean"] = np.zeros(c, np.float32)
        sd[key + ".running_var"] = np.ones(c, np.float32)

    sd["conv1.weight"] = rng.normal(0, .01, (64, 3, 7, 7)).astype(np.float32)
    add_bn("bn1", 64)
    inp = 64
    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
        base = 64 * 2 ** (stage - 1)
        planes, outp = base * 2, base * 4
        for b in range(blocks):
            pfx = f"layer{stage}.{b}"
            sd[pfx + ".conv1.weight"] = rng.normal(0, .01, (planes, inp, 1, 1)).astype(np.float32)
            add_bn(pfx + ".bn1", planes)
            sd[pfx + ".conv2.weight"] = rng.normal(0, .01, (planes, planes, 3, 3)).astype(np.float32)
            add_bn(pfx + ".bn2", planes)
            sd[pfx + ".conv3.weight"] = rng.normal(0, .01, (outp, planes, 1, 1)).astype(np.float32)
            add_bn(pfx + ".bn3", outp)
            if b == 0:
                sd[pfx + ".downsample.0.weight"] = rng.normal(0, .01, (outp, inp, 1, 1)).astype(np.float32)
                add_bn(pfx + ".downsample.1", outp)
            inp = outp
    trunk = load_torchvision_state_dict(sd)
    # converted trunk params match the init tree structure (minus head)
    def paths(t):
        return {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(t)[0]}
    init_trunk = {k: v for k, v in variables["params"].items() if k != "fc"}
    assert paths(trunk["params"]) == paths(init_trunk)
    # and the model runs with them
    params = dict(trunk["params"], fc=variables["params"]["fc"])
    out2 = model.apply({"params": params, "batch_stats": trunk["batch_stats"]},
                       x, train=False)
    assert np.isfinite(np.asarray(out2)).all()


def test_customnet_freeze_zeroes_feature_updates(tmp_path):
    """--custom-model-freeze: the feature-model subtree gets zero updates while
    the prediction head still trains (reference custom_base.py:35-40)."""
    import numpy as np
    import optax
    from eoe_tpu.models.custom import WideResNetCustom
    from eoe_tpu.training.trainer import Trainer
    from eoe_tpu.utils.logger import Logger

    model = WideResNetCustom(feature_dim=16, prediction_head=True, freeze=True)
    trainer = Trainer(
        model=model, objective="hsc", train_specs=[], test_specs=[],
        dataset="cifar10", oe_dataset=None, datapath="/tmp",
        logger=Logger(str(tmp_path), active=False), epochs=1, lr=1e-2, wdk=0.0,
        milestones=[], batch_size=4)
    tx = trainer.make_optimizer(1)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    params = variables["params"]
    opt = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt, params)
    feat_updates = jax.tree_util.tree_leaves(updates["feature_model"])
    head_updates = jax.tree_util.tree_leaves(updates["final_linear"])
    assert all(np.all(np.asarray(u) == 0) for u in feat_updates)
    assert any(np.any(np.asarray(u) != 0) for u in head_updates)
