"""Convolutional autoencoder for 32x32 RGB images (companion to the 'ae'
objective).

Behavioral parity target: /root/reference/src/eoe/models/ae.py:7-41 — CNN32
encoder, then BN -> reshape to (8, 4, 4) -> four 5x5 deconvs with x2 nearest
upsampling between them -> sigmoid. Note the reference constructs its encoder
as ``CNN32(bias)`` which (by positional-arg mixup) sets rep_dim=bias; together
with ``BatchNorm1d(128)`` the intended latent width is 128, which we use.
The AE trainer exists in the reference but is not registered
(training/__init__.py:8-11); here it is a first-class 'ae' objective.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from eoe_tpu.models.cnn import CNN32, xavier_normal, _LEAKY_GAIN


def _upsample2x(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")


class AE32(nn.Module):
    bias: bool = True
    rep_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True):
        z = CNN32(rep_dim=self.rep_dim, bias=self.bias, name="encoder")(x, train)
        z = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-4,
                         use_bias=self.bias, use_scale=self.bias, name="bn1d")(z)
        x = nn.leaky_relu(z.reshape(z.shape[0], 4, 4, self.rep_dim // 16))
        x = nn.ConvTranspose(128, (5, 5), padding=2, use_bias=self.bias,
                             kernel_init=xavier_normal(_LEAKY_GAIN), name="deconv1")(x)
        x = _upsample2x(nn.leaky_relu(nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-4,
            use_bias=self.bias, use_scale=self.bias, name="bn2d4")(x)))
        x = nn.ConvTranspose(64, (5, 5), padding=2, use_bias=self.bias,
                             kernel_init=xavier_normal(_LEAKY_GAIN), name="deconv2")(x)
        x = _upsample2x(nn.leaky_relu(nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-4,
            use_bias=self.bias, use_scale=self.bias, name="bn2d5")(x)))
        x = nn.ConvTranspose(32, (5, 5), padding=2, use_bias=self.bias,
                             kernel_init=xavier_normal(_LEAKY_GAIN), name="deconv3")(x)
        x = _upsample2x(nn.leaky_relu(nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-4,
            use_bias=self.bias, use_scale=self.bias, name="bn2d6")(x)))
        x = nn.ConvTranspose(3, (5, 5), padding=2, use_bias=self.bias,
                             kernel_init=xavier_normal(_LEAKY_GAIN), name="deconv4")(x)
        return nn.sigmoid(x)
