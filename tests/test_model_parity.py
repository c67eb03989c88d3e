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
    if "torchvision" not in sys.modules:
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
    return cnn, cbam, resnet


# ------------------------------------------------------------ weight copy


def t2j(t):
    return np.asarray(t.detach().cpu().numpy())


def conv_k(w):  # torch OIHW -> flax HWIO
    return t2j(w).transpose(2, 3, 1, 0)


def lin_k(w):  # torch (out, in) -> flax (in, out)
    return t2j(w).T


def flat_lin_k(w, c, h, ww):
    """First fc after an NCHW flatten: torch input index is c*h*w-major,
    flax (NHWC flatten) is h*w*c-major — permute accordingly."""
    out = w.shape[0]
    return t2j(w).reshape(out, c, h, ww).transpose(2, 3, 1, 0).reshape(h * ww * c, out)


def bn_p(bn):
    return {"scale": t2j(bn.weight), "bias": t2j(bn.bias)}


def bn_s(bn):
    return {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}


def cbam_variables(tc):
    """torch CBAM module -> (params, batch_stats) subtrees for eoe_tpu CBAM."""
    params = {
        "channel_gate": {
            "mlp_hidden": {"kernel": lin_k(tc.ChannelGate.mlp[1].weight),
                           "bias": t2j(tc.ChannelGate.mlp[1].bias)},
            "mlp_out": {"kernel": lin_k(tc.ChannelGate.mlp[3].weight),
                        "bias": t2j(tc.ChannelGate.mlp[3].bias)},
        },
        "spatial_gate": {
            "spatial_conv": {"kernel": conv_k(tc.SpatialGate.spatial.conv.weight)},
            "spatial_bn": bn_p(tc.SpatialGate.spatial.bn),
        },
    }
    stats = {"spatial_gate": {"spatial_bn": bn_s(tc.SpatialGate.spatial.bn)}}
    return params, stats


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
    from eoe_tpu.models.cnn import CNN32
    ref_cnn, _, _ = ref_models
    torch.manual_seed(0)
    tm = ref_cnn.CNN32(rep_dim=64, bias=bias, clf=True)

    params = {}
    for i in (1, 2, 3):
        conv = getattr(tm, f"conv{i}")
        params[f"conv{i}"] = {"kernel": conv_k(conv.weight)}
        if bias:
            params[f"conv{i}"]["bias"] = t2j(conv.bias)
    stats = {f"bn2d{i}": bn_s(getattr(tm, f"bn2d{i}")) for i in (1, 2, 3)}
    stats["bn1d1"] = bn_s(tm.bn1d1)
    if bias:
        for i in (1, 2, 3):
            params[f"bn2d{i}"] = bn_p(getattr(tm, f"bn2d{i}"))
        params["bn1d1"] = bn_p(tm.bn1d1)
    params["fc1"] = {"kernel": flat_lin_k(tm.fc1.weight, 128, 4, 4)}
    params["fc2"] = {"kernel": lin_k(tm.fc2.weight)}
    if bias:
        params["fc1"]["bias"] = t2j(tm.fc1.bias)
        params["fc2"]["bias"] = t2j(tm.fc2.bias)
    params["linear"] = {"kernel": lin_k(tm.linear.weight), "bias": t2j(tm.linear.bias)}

    model = CNN32(rep_dim=64, bias=bias, clf=True)
    x = np.random.default_rng(0).normal(size=(4, 3, 32, 32)).astype(np.float32)
    ref_vars = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    variables = {"params": params, "batch_stats": stats}
    _assert_tree_shapes_match(variables["params"], ref_vars["params"])
    _compare(model, variables, tm, x, rtol=1e-4, atol=1e-4)


def test_cnn28_matches_reference(ref_models):
    from eoe_tpu.models.cnn import CNN28
    ref_cnn, _, _ = ref_models
    torch.manual_seed(1)
    tm = ref_cnn.CNN28(rep_dim=32, bias=True, clf=False)

    params = {
        "conv1": {"kernel": conv_k(tm.conv1.weight), "bias": t2j(tm.conv1.bias)},
        "conv2": {"kernel": conv_k(tm.conv2.weight), "bias": t2j(tm.conv2.bias)},
        "bn2d1": bn_p(tm.bn2d1), "bn2d2": bn_p(tm.bn2d2), "bn1d1": bn_p(tm.bn1d1),
        "fc1": {"kernel": flat_lin_k(tm.fc1.weight, 32, 7, 7), "bias": t2j(tm.fc1.bias)},
        "fc2": {"kernel": lin_k(tm.fc2.weight), "bias": t2j(tm.fc2.bias)},
    }
    stats = {"bn2d1": bn_s(tm.bn2d1), "bn2d2": bn_s(tm.bn2d2), "bn1d1": bn_s(tm.bn1d1)}

    model = CNN28(rep_dim=32, bias=True, clf=False)
    x = np.random.default_rng(1).normal(size=(4, 1, 28, 28)).astype(np.float32)
    ref_vars = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 1)), train=False)
    variables = {"params": params, "batch_stats": stats}
    _assert_tree_shapes_match(variables["params"], ref_vars["params"])
    _compare(model, variables, tm, x, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------ CBAM


def test_cbam_matches_reference(ref_models):
    from eoe_tpu.models.cbam import CBAM
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

    params, stats = cbam_variables(tm)
    model = CBAM(32, 16)
    x = np.random.default_rng(2).normal(size=(4, 32, 8, 8)).astype(np.float32)
    _compare(model, {"params": params, "batch_stats": stats}, tm, x,
             rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ WideResNet


def test_wideresnet_cbam_matches_reference(ref_models):
    from eoe_tpu.models.resnet import WideResNet
    _, _, ref_resnet = ref_models
    torch.manual_seed(3)
    tm = ref_resnet.WideResNet(rep_dim=32, clf=False)

    params = {"conv1": {"kernel": conv_k(tm.conv1.weight)}, "bn1": bn_p(tm.bn1),
              "fc": {"kernel": lin_k(tm.fc.weight), "bias": t2j(tm.fc.bias)}}
    stats = {"bn1": bn_s(tm.bn1)}
    for s in (1, 2, 3, 4):
        layer = getattr(tm, f"layer{s}")
        for b, blk in enumerate(layer):
            name = f"layer{s}_block{b}"
            p = {"conv1": {"kernel": conv_k(blk.conv1.weight)},
                 "conv2": {"kernel": conv_k(blk.conv2.weight)},
                 "bn1": bn_p(blk.bn1), "bn2": bn_p(blk.bn2)}
            st = {"bn1": bn_s(blk.bn1), "bn2": bn_s(blk.bn2)}
            if blk.downsample is not None:
                p["down_conv"] = {"kernel": conv_k(blk.downsample[0].weight)}
                p["down_bn"] = bn_p(blk.downsample[1])
                st["down_bn"] = bn_s(blk.downsample[1])
            if blk.cbam is not None:
                p["cbam"], st_cbam = cbam_variables(blk.cbam)
                st["cbam"] = st_cbam
            params[name] = p
            stats[name] = st

    model = WideResNet(rep_dim=32, clf=False)
    x = np.random.default_rng(3).normal(size=(2, 3, 224, 224)).astype(np.float32)
    ref_vars = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)
    variables = {"params": params, "batch_stats": stats}
    _assert_tree_shapes_match(variables["params"], ref_vars["params"])
    # 18 BN/conv layers deep: accumulated f32 reduction-order error is larger
    _compare(model, variables, tm, x, rtol=1e-3, atol=1e-3)
