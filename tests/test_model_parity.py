"""Differential numeric parity of the from-scratch Flax models vs the
REFERENCE torch modules (loaded straight from /root/reference, torchvision
stubbed). Weights are copied torch->Flax (OIHW->HWIO, NCHW-flatten
permutation for the first post-conv fc) and forward (train and eval mode)
plus input-gradients must match. This is the strongest available evidence for
the +-0.5pt AUROC-parity claim without real datasets (PARITY.md §2.3):
references src/eoe/models/cnn.py, cbam.py, resnet.py:25-154.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/src/eoe/models"


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_models():
    # resnet.py imports torchvision (absent here) and eoe.models.cbam at module
    # level: stub the former, alias the latter to the directly-loaded module
    stubbed = "torchvision" not in sys.modules
    if stubbed:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")

        def _no_tv(*a, **k):
            raise RuntimeError("torchvision stubbed out for parity tests")

        tvm.wide_resnet50_2 = _no_tv
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    cnn = _load_ref_module("_ref_cnn", f"{REF}/cnn.py")
    cbam = _load_ref_module("_ref_cbam", f"{REF}/cbam.py")
    sys.modules.setdefault("eoe", types.ModuleType("eoe"))
    sys.modules.setdefault("eoe.models", types.ModuleType("eoe.models"))
    sys.modules["eoe.models.cbam"] = cbam
    resnet = _load_ref_module("_ref_resnet", f"{REF}/resnet.py")
    yield cnn, cbam, resnet
    # the spec-less stub poisons later importlib.util.find_spec("torchvision")
    # probes in the same session (ValueError: __spec__ is None — e.g.
    # transformers' availability check during test_clip): remove it once the
    # reference modules (which hold direct references) are done with it.
    if stubbed:
        sys.modules.pop("torchvision", None)
        sys.modules.pop("torchvision.models", None)


# -------------------------------------------------------------- harness


def _assert_tree_shapes_match(built, target):
    flat_b = jax.tree_util.tree_flatten_with_path(built)[0]
    flat_t = {jax.tree_util.keystr(p): np.shape(l)
              for p, l in jax.tree_util.tree_flatten_with_path(target)[0]}
    assert {jax.tree_util.keystr(p) for p, _ in flat_b} == set(flat_t)
    for p, leaf in flat_b:
        assert np.shape(leaf) == flat_t[jax.tree_util.keystr(p)], jax.tree_util.keystr(p)


def _compare(model, variables, tm, x_nchw, rtol, atol):
    """Forward (train + eval mode) and input-grad parity for copied weights."""
    xj = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))

    tm.train()
    xt = torch.tensor(x_nchw, requires_grad=True)
    out_t = tm(xt)
    (out_t.double() ** 2).sum().backward()
    g_t = xt.grad.numpy()

    def loss_fn(xin):
        out, _ = model.apply(variables, xin, train=True, mutable=["batch_stats"])
        return (out.astype(jnp.float64) ** 2).sum(), out

    def as_torch_layout(a):
        a = np.asarray(a)
        return a.transpose(0, 3, 1, 2) if a.ndim == 4 else a  # NHWC -> NCHW

    (_, out_j), g_j = jax.value_and_grad(loss_fn, has_aux=True)(xj)
    np.testing.assert_allclose(as_torch_layout(out_j), out_t.detach().numpy(),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(g_j).transpose(0, 3, 1, 2), g_t,
                               rtol=rtol, atol=atol * 10)

    tm.eval()
    with torch.no_grad():
        out_te = tm(torch.tensor(x_nchw)).numpy()
    out_je = model.apply(variables, xj, train=False)
    np.testing.assert_allclose(as_torch_layout(out_je), out_te, rtol=rtol, atol=atol)


# ------------------------------------------------------------------ CNNs


@pytest.mark.parametrize("bias", [False, True])
def test_cnn32_matches_reference(ref_models, bias):
    """Also exercises the product converter (eoe_tpu.models.torch_import)."""
    from eoe_tpu.models.cnn import CNN32
    from eoe_tpu.models.torch_import import cnn_variables_from_torch
    ref_cnn, _, _ = ref_models
    torch.manual_seed(0)
    tm = ref_cnn.CNN32(rep_dim=64, bias=bias, clf=True)

    variables = cnn_variables_from_torch(tm.state_dict())
    model = CNN32(rep_dim=64, bias=bias, clf=True)
    x = np.random.default_rng(0).normal(size=(4, 3, 32, 32)).astype(np.float32)
    ref_vars = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    _assert_tree_shapes_match(variables["params"], ref_vars["params"])
    _compare(model, variables, tm, x, rtol=1e-4, atol=1e-4)


def test_cnn28_matches_reference(ref_models):
    from eoe_tpu.models.cnn import CNN28
    from eoe_tpu.models.torch_import import cnn_variables_from_torch
    ref_cnn, _, _ = ref_models
    torch.manual_seed(1)
    tm = ref_cnn.CNN28(rep_dim=32, bias=True, clf=False)

    variables = cnn_variables_from_torch(tm.state_dict())
    model = CNN28(rep_dim=32, bias=True, clf=False)
    x = np.random.default_rng(1).normal(size=(4, 1, 28, 28)).astype(np.float32)
    ref_vars = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 1)), train=False)
    _assert_tree_shapes_match(variables["params"], ref_vars["params"])
    _compare(model, variables, tm, x, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------ CBAM


def test_cbam_matches_reference(ref_models):
    from eoe_tpu.models.cbam import CBAM
    from eoe_tpu.models.torch_import import cbam_variables_from_torch
    _, ref_cbam, _ = ref_models
    torch.manual_seed(2)
    tm = ref_cbam.CBAM(32, 16)
    # non-trivial BN stats/affine so eval mode is a real check
    with torch.no_grad():
        bn = tm.SpatialGate.spatial.bn
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-0.2, 0.2)
        bn.running_mean.uniform_(-0.1, 0.1)
        bn.running_var.uniform_(0.8, 1.2)

    params, stats = cbam_variables_from_torch(tm.state_dict())
    model = CBAM(32, 16)
    x = np.random.default_rng(2).normal(size=(4, 32, 8, 8)).astype(np.float32)
    _compare(model, {"params": params, "batch_stats": stats}, tm, x,
             rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ WideResNet


def test_wideresnet_cbam_matches_reference(ref_models):
    from eoe_tpu.models.resnet import WideResNet
    from eoe_tpu.models.torch_import import wideresnet_variables_from_torch
    _, _, ref_resnet = ref_models
    torch.manual_seed(3)
    tm = ref_resnet.WideResNet(rep_dim=32, clf=False)

    variables = wideresnet_variables_from_torch(tm.state_dict())
    model = WideResNet(rep_dim=32, clf=False)
    x = np.random.default_rng(3).normal(size=(2, 3, 224, 224)).astype(np.float32)
    ref_vars = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)
    _assert_tree_shapes_match(variables["params"], ref_vars["params"])
    # 18 BN/conv layers deep: accumulated f32 reduction-order error is larger
    _compare(model, variables, tm, x, rtol=1e-3, atol=1e-3)


# ------------------------------------------------- torch snapshot import


def test_import_reference_snapshot_roundtrip(ref_models, tmp_path):
    """A reference EOE-style snapshot {net, opt, sched, epoch, ds_statistics}
    (logger.py:318-338) converts to an eoe_tpu msgpack snapshot that the
    Trainer loads: params land, epoch + ds_statistics survive, and --load
    style eval works (ad_trainer.py:552-615 role)."""
    from eoe_tpu.main.import_snapshot import main as import_main
    from eoe_tpu.models.cnn import CNN32
    from tests.test_trainer import make_trainer

    ref_cnn, _, _ = ref_models
    torch.manual_seed(4)
    tm = ref_cnn.CNN32(rep_dim=64, bias=True, clf=False)
    pt_path = tmp_path / "snapshot_cls0_it0.pt"
    torch.save({"net": tm.state_dict(), "opt": None, "sched": None, "epoch": 7,
                "ds_statistics": {"mean": torch.tensor([0.5, 0.5, 0.5]),
                                  "std": torch.tensor([0.2, 0.2, 0.2])}}, pt_path)

    out = import_main([str(pt_path), str(tmp_path / "snap.msgpack")])

    trainer = make_trainer(tmp_path / "run", epochs=7,
                           model=CNN32(rep_dim=64, bias=True, clf=False))
    assert trainer.load_epochs_only(out) == 7
    stats = trainer.load_ds_statistics(out)
    assert stats["mean"] == pytest.approx([0.5, 0.5, 0.5])
    assert stats["std"] == pytest.approx([0.2, 0.2, 0.2])
    # epochs == snapshot epoch -> eval-only resume through Trainer.load,
    # exercising the full grid machinery on the imported snapshot
    _, res = trainer.run(run_classes=[0], run_seeds=1, load=[[out]])
    assert np.isfinite(res["mean_auc"])
    # and the stored params really are the torch weights
    from flax import serialization
    with open(out, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    assert payload["epoch"] == 7
    np.testing.assert_allclose(payload["params"]["fc2"]["kernel"],
                               tm.fc2.weight.detach().numpy().T, rtol=1e-6)


def test_import_torchvision_resnet50_checkpoint(tmp_path):
    """A bare torchvision (wide_)resnet50-family state dict (the reference's
    WideResNet50Pretrained backbone, resnet.py:8-21) imports through the same
    import_snapshot CLI as a trunk-only snapshot: the trainer restores the
    trunk and keeps a fresh head init (the reference replaces fc too,
    resnet.py:17-19)."""
    from eoe_tpu.main.import_snapshot import main as import_main
    from eoe_tpu.models.resnet50 import WideResNet50Pretrained
    from eoe_tpu.training.trainer import TrainState
    from tests.test_trainer import make_trainer

    # tiny two-stage bottleneck layout; the sniffer reads it from the keys
    rng = np.random.default_rng(0)
    sd, inp = {}, 64

    def add_bn(key, c):
        sd[key + ".weight"] = torch.ones(c)
        sd[key + ".bias"] = torch.zeros(c)
        sd[key + ".running_mean"] = torch.zeros(c)
        sd[key + ".running_var"] = torch.ones(c)

    sd["conv1.weight"] = torch.randn(64, 3, 7, 7) * 0.01
    add_bn("bn1", 64)
    for stage in (1, 2):
        base = 64 * 2 ** (stage - 1)
        planes, outp = base * 2, base * 4
        pfx = f"layer{stage}.0"
        sd[pfx + ".conv1.weight"] = torch.randn(planes, inp, 1, 1) * 0.01
        add_bn(pfx + ".bn1", planes)
        sd[pfx + ".conv2.weight"] = torch.randn(planes, planes, 3, 3) * 0.01
        add_bn(pfx + ".bn2", planes)
        sd[pfx + ".conv3.weight"] = torch.randn(outp, planes, 1, 1) * 0.01
        add_bn(pfx + ".bn3", outp)
        sd[pfx + ".downsample.0.weight"] = torch.randn(outp, inp, 1, 1) * 0.01
        add_bn(pfx + ".downsample.1", outp)
        inp = outp
    sd["fc.weight"] = torch.randn(1000, inp)  # torchvision clf head: ignored
    sd["fc.bias"] = torch.zeros(1000)

    pt_path = tmp_path / "wide_resnet50_2.pt"
    torch.save(sd, pt_path)
    out = import_main([str(pt_path), str(tmp_path / "snap.msgpack")])

    model = WideResNet50Pretrained(rep_dim=8, layers=(1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=None, step=jnp.zeros((), jnp.int32))
    trainer = make_trainer(tmp_path / "run", model=model)
    loaded, epoch = trainer.load(str(out), state)
    assert epoch == 0
    # trunk params are the torch weights (OIHW->HWIO)
    np.testing.assert_allclose(
        np.asarray(loaded.params["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded.params["layer2_0"]["conv3"]["kernel"]),
        sd["layer2.0.conv3.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    # head stays at the fresh init
    np.testing.assert_array_equal(np.asarray(loaded.params["fc"]["kernel"]),
                                  np.asarray(variables["params"]["fc"]["kernel"]))
    # and the model runs with the merged tree
    out_feats = model.apply({"params": loaded.params,
                             "batch_stats": loaded.batch_stats}, x, train=False)
    assert np.isfinite(np.asarray(out_feats)).all()
