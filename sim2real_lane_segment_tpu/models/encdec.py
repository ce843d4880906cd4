"""Legacy encoder-decoder segmentation CNN (flax, NHWC).

Capability-parity rebuild of the reference's first-phase model
(rightLaneNetwork/models/EncDecNet.py:52-113): per level
conv(+activation+BN+dropout) -> maxpool(stride 2) on the way down,
conv -> bilinear 2x upsample on the way up, and a 1x1 softmax classifier
head (2 classes).  The reference reached >98% binary test accuracy with
nFeat=64, nLevels=3, kernelSize=7 (~15M params, BASELINE.md).

Note the reference's module order is conv -> activation -> BN -> dropout
(EncDecNet.py:29-36) — BN *after* the nonlinearity — which is preserved.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.dtypes import DTypePolicy, DEFAULT_POLICY

ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "prelu": None,  # handled as a module below
    "leakyRelu": lambda x: nn.leaky_relu(x, 0.01),
    "sigmoid": nn.sigmoid,
    "tanh": jnp.tanh,
    "none": lambda x: x,
}


class ConvBlock(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    activation: str = "relu"
    batch_norm: bool = True
    dropout: float = 0.3
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, *, train: bool):
        if not (0 <= self.dropout < 1):
            raise ValueError(f"dropout must be in [0,1), got {self.dropout}")
        k = self.kernel_size
        x = nn.Conv(self.features, (k, k), strides=(self.stride, self.stride),
                    padding=k // 2, dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(x)
        if self.activation == "prelu":
            alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), ())
            x = jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        else:
            x = ACTIVATIONS[self.activation](x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=self.policy.param_dtype)(x)
            x = x.astype(self.policy.compute_dtype)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def upsample_bilinear_2x(x):
    """torch nn.UpsamplingBilinear2d(scale_factor=2) == align_corners=True."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


class EncDecNet(nn.Module):
    n_features: int = 64
    n_levels: int = 3
    kernel_size: int = 3
    activation: str = "relu"
    batch_norm: bool = True
    dropout: float = 0.3
    n_classes: int = 2
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, *, train: bool = False, use_softmax: bool = True):
        if self.n_features < 1 or self.n_levels < 1:
            raise ValueError("n_features and n_levels must be >= 1")
        if self.activation not in ACTIVATIONS:
            raise ValueError(f"unknown activation {self.activation!r}")
        x = x.astype(self.policy.compute_dtype)

        feat = self.n_features
        for i in range(self.n_levels):
            x = ConvBlock(feat, self.kernel_size, activation=self.activation,
                          batch_norm=self.batch_norm, dropout=self.dropout,
                          policy=self.policy, name=f"enc{i}")(x, train=train)
            # torch MaxPool2d(kernelSize, stride=2, padding=kernelSize//2)
            k, p = self.kernel_size, self.kernel_size // 2
            x = nn.max_pool(x, (k, k), strides=(2, 2),
                            padding=((p, p), (p, p)))
            feat *= 2
        feat //= 2
        for i in range(self.n_levels):
            x = ConvBlock(feat, self.kernel_size, activation=self.activation,
                          batch_norm=self.batch_norm, dropout=self.dropout,
                          policy=self.policy, name=f"dec{i}")(x, train=train)
            x = upsample_bilinear_2x(x)
            feat = max(feat // 2, 1)

        x = nn.Conv(self.n_classes, (1, 1), dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype, name="classifier")(x)
        x = x.astype(jnp.float32)
        return jax.nn.softmax(x, axis=-1) if use_softmax else x
