"""FC-DenseNet ("Tiramisu") segmentation CNN — flax, NHWC, TPU-first.

Re-designs the reference architecture
(rightLaneNetwork/models/FCDenseNet/tiramisu.py, layers.py) for TPU:

- NHWC layout (XLA's native conv layout on TPU) instead of torch NCHW.
- bf16 compute / f32 params via a dtype policy; convs land on the MXU.
- The split into a FeatureExtractor (with L2-normalized output features,
  reference tiramisu.py:105) and a temperature-scaled softmax Classifier
  (reference tiramisu.py:113-125, T=0.05) is preserved — it is the
  cosine-similarity formulation required by the MME domain-adaptation
  regime.
- ``grad_reverse`` (reference tiramisu.py:7-18) is a jax.custom_vjp that
  negates the cotangent.

Architecture semantics preserved exactly (reference layers.py:5-86):
- DenseLayer      = BN -> ReLU -> 3x3 conv(bias) -> Dropout2d(0.2)
  (channelwise dropout: one mask per (sample, channel)).
- DenseBlock      = concat growth; the ``upsample`` variant returns only
  the newly produced features.
- TransitionDown  = BN -> ReLU -> 1x1 conv -> Dropout2d -> maxpool2 (floor).
- TransitionUp    = 3x3 stride-2 VALID transposed conv -> center-crop to the
  skip's spatial size -> concat with skip.
- BatchNorm: torch defaults (momentum 0.1 -> flax momentum 0.9, eps 1e-5).

At the reference's 160x120 input the spatial ladder is
120->60->30->15->7->3 down and (2x+1 conv-transpose then crop) back up,
reproducing the odd-size bookkeeping noted in SURVEY.md §7.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.dtypes import DTypePolicy, DEFAULT_POLICY


# ---------------------------------------------------------------------------
# gradient reversal
# ---------------------------------------------------------------------------

@jax.custom_vjp
def grad_reverse(x):
    """Identity forward; negated gradient backward (GradReverse)."""
    return x


def _gr_fwd(x):
    return x, None


def _gr_bwd(_, g):
    return (jax.tree_util.tree_map(lambda t: -t, g),)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

class DenseLayer(nn.Module):
    growth_rate: int
    policy: DTypePolicy = DEFAULT_POLICY
    dropout_rate: float = 0.2  # reference layers.py Dropout2d(0.2)

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.policy.param_dtype)(x)
        x = nn.relu(x)
        x = x.astype(self.policy.compute_dtype)
        x = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=True,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(x)
        # Dropout2d: drop whole channels per sample (noise over H, W shared).
        x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        return x


class DenseBlock(nn.Module):
    growth_rate: int
    n_layers: int
    upsample: bool = False
    policy: DTypePolicy = DEFAULT_POLICY
    dropout_rate: float = 0.2

    # ``train`` is positional-or-keyword (not keyword-only) so the remat
    # variant can mark it static via jax.checkpoint's static_argnums
    @nn.compact
    def __call__(self, x, train: bool):
        new_features = []
        for _ in range(self.n_layers):
            out = DenseLayer(self.growth_rate, self.policy,
                             self.dropout_rate)(x, train=train)
            x = jnp.concatenate([x, out.astype(x.dtype)], axis=-1)
            new_features.append(out)
        if self.upsample:
            return jnp.concatenate(new_features, axis=-1)
        return x


class TransitionDown(nn.Module):
    policy: DTypePolicy = DEFAULT_POLICY
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool):
        features = x.shape[-1]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.policy.param_dtype)(x)
        x = nn.relu(x)
        x = x.astype(self.policy.compute_dtype)
        x = nn.Conv(features, (1, 1), padding=0, use_bias=True,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(x)
        x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # VALID -> floor division
        return x


def center_crop(x, h, w):
    """Crop (N, H, W, C) to (N, h, w, C) around the center (floor offsets)."""
    y0 = (x.shape[1] - h) // 2
    x0 = (x.shape[2] - w) // 2
    return x[:, y0:y0 + h, x0:x0 + w, :]


class TransitionUp(nn.Module):
    features: int
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, skip):
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             padding="VALID", use_bias=True,
                             dtype=self.policy.compute_dtype,
                             param_dtype=self.policy.param_dtype)(x)
        x = center_crop(x, skip.shape[1], skip.shape[2])
        return jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# feature extractor / classifier split
# ---------------------------------------------------------------------------

class FCDenseNetFeatureExtractor(nn.Module):
    down_blocks: Sequence[int] = (5, 5, 5, 5, 5)
    up_blocks: Sequence[int] = (5, 5, 5, 5, 5)
    bottleneck_layers: int = 5
    growth_rate: int = 16
    out_chans_first_conv: int = 48
    policy: DTypePolicy = DEFAULT_POLICY
    # rematerialize dense blocks in the backward pass: the concat topology
    # re-reads every growing activation from HBM during backprop, so
    # recomputing blocks from their inputs trades cheap MXU flops for the
    # dominant HBM traffic (bandwidth-bound at these shapes)
    remat: bool = False
    dropout_rate: float = 0.2

    @property
    def feature_channels(self) -> int:
        # channel bookkeeping mirrors reference tiramisu.py:27-87
        cur = self.out_chans_first_conv
        skips = []
        for n in self.down_blocks:
            cur += self.growth_rate * n
            skips.insert(0, cur)
        prev = self.growth_rate * self.bottleneck_layers
        for i, n in enumerate(self.up_blocks[:-1]):
            cur = prev + skips[i]
            prev = self.growth_rate * n
        cur = prev + skips[-1]
        cur += self.growth_rate * self.up_blocks[-1]
        return cur

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # static_argnums=(2,): (self, x, train) — train is a Python bool
        dense = (nn.remat(DenseBlock, static_argnums=(2,)) if self.remat
                 else DenseBlock)
        x = x.astype(self.policy.compute_dtype)
        out = nn.Conv(self.out_chans_first_conv, (3, 3), padding=1,
                      use_bias=True, dtype=self.policy.compute_dtype,
                      param_dtype=self.policy.param_dtype, name="firstconv")(x)

        skips = []
        for i, n in enumerate(self.down_blocks):
            out = dense(self.growth_rate, n, upsample=False,
                        policy=self.policy, dropout_rate=self.dropout_rate,
                        name=f"denseDown{i}")(out, train)
            skips.append(out)
            out = TransitionDown(self.policy, self.dropout_rate,
                                 name=f"transDown{i}")(out, train=train)

        out = dense(self.growth_rate, self.bottleneck_layers, upsample=True,
                    policy=self.policy, dropout_rate=self.dropout_rate,
                    name="bottleneck")(out, train)

        for i, n in enumerate(self.up_blocks):
            skip = skips.pop()
            out = TransitionUp(out.shape[-1], self.policy,
                               name=f"transUp{i}")(out, skip)
            out = dense(self.growth_rate, n, upsample=(i < len(self.up_blocks) - 1),
                        policy=self.policy, dropout_rate=self.dropout_rate,
                        name=f"denseUp{i}")(out, train)

        # L2-normalize feature vectors per pixel (reference tiramisu.py:105,
        # torch F.normalize: x / max(||x||_2, 1e-12)).
        out = out.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True))
        out = out / jnp.maximum(norm, 1e-12)
        return out


class FCDenseNetClassifier(nn.Module):
    n_classes: int
    temperature: float = 0.05
    kernel_size: int = 1
    policy: DTypePolicy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, *, use_softmax: bool = True):
        x = x.astype(self.policy.compute_dtype)
        x = nn.Conv(self.n_classes, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, use_bias=True,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype, name="finalConv")(x)
        x = x.astype(jnp.float32) / self.temperature
        if use_softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x


class FCDenseNet(nn.Module):
    """Feature extractor + classifier, reference tiramisu.py:128-147."""
    n_classes: int = 12
    down_blocks: Sequence[int] = (5, 5, 5, 5, 5)
    up_blocks: Sequence[int] = (5, 5, 5, 5, 5)
    bottleneck_layers: int = 5
    growth_rate: int = 16
    out_chans_first_conv: int = 48
    kernel_size: int = 1
    policy: DTypePolicy = DEFAULT_POLICY
    remat: bool = False
    dropout_rate: float = 0.2

    def setup(self):
        self.featureExtractor = FCDenseNetFeatureExtractor(
            down_blocks=self.down_blocks, up_blocks=self.up_blocks,
            bottleneck_layers=self.bottleneck_layers, growth_rate=self.growth_rate,
            out_chans_first_conv=self.out_chans_first_conv, policy=self.policy,
            remat=self.remat, dropout_rate=self.dropout_rate)
        self.classifier = FCDenseNetClassifier(
            n_classes=self.n_classes, kernel_size=self.kernel_size,
            policy=self.policy)

    def __call__(self, x, *, train: bool = False, use_softmax: bool = True):
        x = self.featureExtractor(x, train=train)
        x = self.classifier(x, use_softmax=use_softmax)
        return x


# ---------------------------------------------------------------------------
# factories (reference tiramisu.py:150-194)
# ---------------------------------------------------------------------------

def fcdensenet57(n_classes, kernel_size=1, policy=DEFAULT_POLICY):
    return FCDenseNet(n_classes=n_classes, down_blocks=(4,) * 5, up_blocks=(4,) * 5,
                      bottleneck_layers=4, growth_rate=12, out_chans_first_conv=48,
                      kernel_size=kernel_size, policy=policy)


def fcdensenet67(n_classes, policy=DEFAULT_POLICY, remat=False):
    return FCDenseNet(n_classes=n_classes, down_blocks=(5,) * 5, up_blocks=(5,) * 5,
                      bottleneck_layers=5, growth_rate=16, out_chans_first_conv=48,
                      policy=policy, remat=remat)


def fcdensenet103(n_classes, policy=DEFAULT_POLICY):
    return FCDenseNet(n_classes=n_classes, down_blocks=(4, 5, 7, 10, 12),
                      up_blocks=(12, 10, 7, 5, 4), bottleneck_layers=15,
                      growth_rate=16, out_chans_first_conv=48, policy=policy)


def fcdensenet57_base_classifier(n_classes, policy=DEFAULT_POLICY):
    base = FCDenseNetFeatureExtractor(down_blocks=(4,) * 5, up_blocks=(4,) * 5,
                                      bottleneck_layers=4, growth_rate=12,
                                      out_chans_first_conv=48, policy=policy)
    clf = FCDenseNetClassifier(n_classes=n_classes, policy=policy)
    return base, clf


def fcdensenet67_base_classifier(n_classes, policy=DEFAULT_POLICY):
    base = FCDenseNetFeatureExtractor(down_blocks=(5,) * 5, up_blocks=(5,) * 5,
                                      bottleneck_layers=5, growth_rate=16,
                                      out_chans_first_conv=48, policy=policy)
    clf = FCDenseNetClassifier(n_classes=n_classes, policy=policy)
    return base, clf
