"""CycleGAN training — the native completion of the reference's 5th
adaptation regime.

The reference only *applied* an externally-trained CycleGAN generator
(rightLaneNetwork/utils/sim2real_convert.py loads a torch checkpoint
produced by an out-of-repo training run); its README's comparison table
nevertheless reports a "CycleGAN" regime.  This module trains the full
unpaired cycle (two GeneratorResNet, two PatchGAN discriminators) as one
jitted TPU step, so the regime runs end-to-end in-framework:

- LSGAN objectives (MSE to 1/0 patch targets),
- cycle-consistency L1 (lambda_cyc = 10) and identity L1
  (lambda_id = 5), the standard recipe for this generator family,
- Adam(0.5, 0.999) lr 2e-4 for both sides,
- a host-side 50-image replay pool feeding the discriminator step
  (fakes enter the jitted step as plain inputs, so no stop-gradient
  gymnastics are needed).

Generator (G_AB) weights are saved as the same flax ``{"params": ...}``
msgpack tree ``cli/sim2real_convert.py`` loads, so a trained run plugs
straight into the existing conversion/eval pipeline.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..core.dtypes import DTypePolicy, F32_POLICY
from ..models.cyclegan import Discriminator, GeneratorResNet


class CycleGANState(struct.PyTreeNode):
    g_ab: Any
    g_ba: Any
    d_a: Any
    d_b: Any
    opt_g: Any
    opt_d: Any


def _mse(x, target: float) -> jax.Array:
    return jnp.mean((x - target) ** 2)


def _l1(x, y) -> jax.Array:
    return jnp.mean(jnp.abs(x - y))


class ImagePool:
    """50-image replay buffer (host side): with p=0.5 the discriminator
    sees a historical fake instead of the newest one — the standard
    stabilizer for this recipe."""

    def __init__(self, size: int = 50, seed: int = 0):
        self.size = size
        self.items: list[np.ndarray] = []
        self.rng = np.random.default_rng(seed)

    def query(self, fakes: np.ndarray) -> np.ndarray:
        if self.size == 0:
            return fakes
        out = []
        for img in fakes:
            if len(self.items) < self.size:
                self.items.append(img)
                out.append(img)
            elif self.rng.random() < 0.5:
                i = int(self.rng.integers(self.size))
                out.append(self.items[i])
                self.items[i] = img
            else:
                out.append(img)
        return np.stack(out)


class CycleGANTrainer:
    """Owns the four networks and the jitted train step.

    Float32 by default: LSGAN + InstanceNorm statistics are noticeably
    less stable in bf16 and the nets are small enough that the MXU is
    not the bottleneck at study scale.
    """

    def __init__(self, *, num_residual_blocks: int = 9, lr: float = 2e-4,
                 lambda_cyc: float = 10.0, lambda_id: float = 5.0,
                 policy: DTypePolicy = F32_POLICY):
        self.gen = GeneratorResNet(num_residual_blocks=num_residual_blocks,
                                   policy=policy)
        self.dis = Discriminator(policy=policy)
        self.lambda_cyc = lambda_cyc
        self.lambda_id = lambda_id
        self.tx_g = optax.adam(lr, b1=0.5, b2=0.999)
        self.tx_d = optax.adam(lr, b1=0.5, b2=0.999)

    def init_state(self, key: jax.Array, height: int = 120,
                   width: int = 160) -> CycleGANState:
        kg1, kg2, kd1, kd2 = jax.random.split(key, 4)
        x = jnp.zeros((1, height, width, 3), jnp.float32)
        g_ab = jax.jit(self.gen.init)(kg1, x)["params"]
        g_ba = jax.jit(self.gen.init)(kg2, x)["params"]
        d_a = jax.jit(self.dis.init)(kd1, x)["params"]
        d_b = jax.jit(self.dis.init)(kd2, x)["params"]
        return CycleGANState(
            g_ab=g_ab, g_ba=g_ba, d_a=d_a, d_b=d_b,
            opt_g=self.tx_g.init({"g_ab": g_ab, "g_ba": g_ba}),
            opt_d=self.tx_d.init({"d_a": d_a, "d_b": d_b}))

    # -- one fused step -------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: CycleGANState, real_a: jax.Array,
                   real_b: jax.Array, pool_fake_a: jax.Array,
                   pool_fake_b: jax.Array):
        """Inputs in [-1, 1] float32 NHWC.  Returns (new_state,
        (fake_a, fake_b), logs); the caller routes the returned fakes
        through the ImagePool into the next step's pool_fake_*."""

        def g_loss_fn(g_params):
            fake_b = self.gen.apply({"params": g_params["g_ab"]}, real_a)
            fake_a = self.gen.apply({"params": g_params["g_ba"]}, real_b)
            # identity: each generator leaves its own domain alone
            loss_id = 0.5 * (_l1(self.gen.apply(
                {"params": g_params["g_ab"]}, real_b), real_b) + _l1(
                self.gen.apply({"params": g_params["g_ba"]}, real_a),
                real_a))
            loss_gan = 0.5 * (_mse(self.dis.apply(
                {"params": state.d_b}, fake_b), 1.0) + _mse(
                self.dis.apply({"params": state.d_a}, fake_a), 1.0))
            loss_cyc = 0.5 * (_l1(self.gen.apply(
                {"params": g_params["g_ba"]}, fake_b), real_a) + _l1(
                self.gen.apply({"params": g_params["g_ab"]}, fake_a),
                real_b))
            total = (loss_gan + self.lambda_cyc * loss_cyc +
                     self.lambda_id * loss_id)
            return total, (fake_a, fake_b, loss_gan, loss_cyc, loss_id)

        g_params = {"g_ab": state.g_ab, "g_ba": state.g_ba}
        (g_total, (fake_a, fake_b, l_gan, l_cyc, l_id)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(g_params)
        g_up, opt_g = self.tx_g.update(g_grads, state.opt_g, g_params)
        g_params = optax.apply_updates(g_params, g_up)

        def d_loss_fn(d_params):
            la = 0.5 * (_mse(self.dis.apply(
                {"params": d_params["d_a"]}, real_a), 1.0) + _mse(
                self.dis.apply({"params": d_params["d_a"]}, pool_fake_a),
                0.0))
            lb = 0.5 * (_mse(self.dis.apply(
                {"params": d_params["d_b"]}, real_b), 1.0) + _mse(
                self.dis.apply({"params": d_params["d_b"]}, pool_fake_b),
                0.0))
            return 0.5 * (la + lb), (la, lb)

        d_params = {"d_a": state.d_a, "d_b": state.d_b}
        (d_total, (l_da, l_db)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params)
        d_up, opt_d = self.tx_d.update(d_grads, state.opt_d, d_params)
        d_params = optax.apply_updates(d_params, d_up)

        new_state = state.replace(
            g_ab=g_params["g_ab"], g_ba=g_params["g_ba"],
            d_a=d_params["d_a"], d_b=d_params["d_b"],
            opt_g=opt_g, opt_d=opt_d)
        logs = {"loss_G": g_total, "loss_D": d_total, "loss_gan": l_gan,
                "loss_cyc": l_cyc, "loss_id": l_id}
        return new_state, (fake_a, fake_b), logs


def fit_cyclegan(trainer: CycleGANTrainer, state: CycleGANState,
                 images_a: np.ndarray, images_b: np.ndarray, *,
                 epochs: int = 30, batch_size: int = 4, seed: int = 42,
                 log_every: int = 0, log=None):
    """Unpaired training loop over two [-1,1] float32 image stacks.

    Each epoch independently shuffles both domains and walks
    min(len) // batch_size steps, maintaining the replay pools."""
    rng = np.random.default_rng(seed)
    pool_a, pool_b = ImagePool(seed=seed), ImagePool(seed=seed + 1)
    n_steps = min(len(images_a), len(images_b)) // batch_size
    if n_steps == 0:
        raise ValueError("not enough images for one batch")
    history = []
    for epoch in range(epochs):
        ia = rng.permutation(len(images_a))
        ib = rng.permutation(len(images_b))
        for s in range(n_steps):
            a = images_a[ia[s * batch_size:(s + 1) * batch_size]]
            b = images_b[ib[s * batch_size:(s + 1) * batch_size]]
            if epoch == 0 and s == 0:
                # pools start empty: seed them with the untrained
                # generators' fakes (no parameter update)
                apply = jax.jit(trainer.gen.apply)
                pfa = np.asarray(apply({"params": state.g_ba}, b))
                pfb = np.asarray(apply({"params": state.g_ab}, a))
            # D sees the previous step's (pooled) fakes — one step stale,
            # which the replay pool makes irrelevant
            state, (fa, fb), logs = trainer.train_step(
                state, a, b, pool_a.query(pfa), pool_b.query(pfb))
            pfa, pfb = np.asarray(fa), np.asarray(fb)
        row = {k: float(v) for k, v in logs.items()}
        row["epoch"] = epoch
        history.append(row)
        if log is not None and (log_every and epoch % log_every == 0
                                or epoch == epochs - 1):
            log.info("cyclegan epoch %d: G %.4f D %.4f cyc %.4f",
                     epoch, row["loss_G"], row["loss_D"], row["loss_cyc"])
    return state, history
