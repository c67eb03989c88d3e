"""max_pool custom-VJP: values match flax.linen.max_pool, gradients match
torch.nn.MaxPool2d (incl. first-argmax routing under ties — ReLU feature maps
tie at 0 constantly, so tie semantics are not a corner case)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoe_tpu.ops.pool import max_pool, max_pool_2x2_s2, max_pool_3x3_s2_p1


@pytest.fixture
def rng():
    return np.random.default_rng(7)


CASES = [
    ((2, 112, 112, 8), (3, 3), (2, 2), ((1, 1), (1, 1))),
    ((2, 15, 15, 4), (3, 3), (2, 2), ((1, 1), (1, 1))),
    ((2, 16, 16, 4), (2, 2), (2, 2), ((0, 0), (0, 0))),
    ((1, 7, 9, 3), (3, 3), (1, 1), ((1, 1), (1, 1))),
    ((1, 8, 8, 2), (2, 2), (2, 2), ((1, 0), (0, 1))),
]


@pytest.mark.parametrize("shape,win,strides,pad", CASES)
def test_forward_matches_flax(rng, shape, win, strides, pad):
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    got = max_pool(x, win, strides, pad)
    want = nn.max_pool(x, win, strides=strides, padding=pad)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shape,win,strides,pad", CASES)
def test_gradient_matches_flax_no_ties(rng, shape, win, strides, pad):
    # continuous random values: no ties, so any argmax convention agrees
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, max_pool(x, win, strides, pad).shape),
                    jnp.float32)
    got = jax.grad(lambda x: (max_pool(x, win, strides, pad) * g).sum())(x)
    want = jax.grad(lambda x: (nn.max_pool(x, win, strides=strides, padding=pad)
                               * g).sum())(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("case", [0, 1, 2])
def test_gradient_matches_torch_with_ties(rng, case):
    torch = pytest.importorskip("torch")
    shape, win, strides, pad = CASES[case]
    assert pad[0][0] == pad[0][1] and pad[1][0] == pad[1][1]
    # ReLU-like inputs: ~half exact zeros -> massive tie rate inside windows
    x_np = np.maximum(rng.normal(0, 1, shape), 0.0).astype(np.float32)
    g_np = rng.normal(0, 1, max_pool(jnp.asarray(x_np), win, strides, pad).shape
                      ).astype(np.float32)

    got = jax.grad(lambda x: (max_pool(x, win, strides, pad)
                              * jnp.asarray(g_np)).sum())(jnp.asarray(x_np))

    xt = torch.tensor(x_np.transpose(0, 3, 1, 2), requires_grad=True)
    mp = torch.nn.MaxPool2d(win, strides, (pad[0][0], pad[1][0]))
    mp(xt).backward(torch.tensor(g_np.transpose(0, 3, 1, 2)))
    want = xt.grad.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_convenience_wrappers(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 4)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3_s2_p1(x)),
        np.asarray(nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))))
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2_s2(x)),
        np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))))


def test_bf16_roundtrip(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 8)), jnp.bfloat16)
    got = max_pool(x, (3, 3), (2, 2), ((1, 1), (1, 1)))
    want = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
