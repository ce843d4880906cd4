"""CycleGAN generator + PatchGAN discriminator.

Capability-parity rebuild of the generator the reference applies offline
(rightLaneNetwork/utils/sim2real_convert.py:17-82, GeneratorResNet:
reflection-pad 7x7 conv stem, two stride-2 downsamples, N residual blocks
with InstanceNorm, two nearest-2x upsamples, 7x7 tanh head), as flax NHWC.

Used by the ``sim2real_convert`` CLI to restyle every ``**/input/*.png``
in a database — here batched and jitted on TPU rather than per-image.

``Discriminator`` (70x70 PatchGAN, the family this generator was trained
against upstream) goes beyond the reference: it shipped only pretrained-
generator *application*; here train/cyclegan.py trains the full cycle
natively so the CycleGAN regime of the adaptation study runs end-to-end
without external weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.dtypes import DTypePolicy, DEFAULT_POLICY


def reflect_pad(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d defaults: eps 1e-5, no affine, no running stats."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class ResidualBlock(nn.Module):
    features: int
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        h = reflect_pad(x, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID",
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(h)
        h = InstanceNorm()(h)
        h = nn.relu(h)
        h = reflect_pad(h, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID",
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(h)
        h = InstanceNorm()(h)
        return x + h


class GeneratorResNet(nn.Module):
    channels: int = 3
    num_residual_blocks: int = 9
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.policy.compute_dtype)
        feat = 64
        x = reflect_pad(x, self.channels)
        x = nn.Conv(feat, (7, 7), padding="VALID",
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(x)
        x = nn.relu(InstanceNorm()(x))

        for _ in range(2):
            feat *= 2
            x = nn.Conv(feat, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.policy.compute_dtype,
                        param_dtype=self.policy.param_dtype)(x)
            x = nn.relu(InstanceNorm()(x))

        for _ in range(self.num_residual_blocks):
            x = ResidualBlock(feat, self.policy)(x)

        for _ in range(2):
            feat //= 2
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")
            x = nn.Conv(feat, (3, 3), padding=1,
                        dtype=self.policy.compute_dtype,
                        param_dtype=self.policy.param_dtype)(x)
            x = nn.relu(InstanceNorm()(x))

        x = reflect_pad(x, self.channels)
        x = nn.Conv(self.channels, (7, 7), padding="VALID",
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    """70x70 PatchGAN: C64-C128-C256-C512 4x4 stride-2 convs (no norm on
    the first), LeakyReLU 0.2, then a 1-channel 4x4 head — emits a grid
    of per-patch real/fake scores (LSGAN targets 1/0)."""
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.policy.compute_dtype)
        for i, feat in enumerate((64, 128, 256, 512)):
            x = nn.Conv(feat, (4, 4), strides=(2, 2), padding=1,
                        dtype=self.policy.compute_dtype,
                        param_dtype=self.policy.param_dtype)(x)
            if i > 0:
                x = InstanceNorm()(x)
            x = nn.leaky_relu(x, 0.2)
        # asymmetric (top-left) zero pad before the head, as in the
        # upstream PatchGAN this generator family is trained against
        x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        x = nn.Conv(1, (4, 4), padding=1,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(x)
        return x.astype(jnp.float32)
