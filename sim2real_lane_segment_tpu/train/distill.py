"""Knowledge distillation: FCDenseNet67 teacher -> LaneNetLite student.

One jitted step: augment batch on device, teacher eval-mode forward
(frozen), student train-mode forward, loss = alpha * KL(teacher_T ||
student_T) * T^2 + (1 - alpha) * class-weighted CE on the real labels.
Serves the 10k fps north star: the student runs serving, the teacher
remains the accuracy reference.

Target-domain distillation (``train_step_unl``): for an ADAPTED teacher
(S&T/HM/CycleGAN/MME) the student must be distilled on target-looking
inputs, or it learns to match the teacher only on the source appearance
and gives the adaptation back at test time — measured as a ~10-IoU
student-vs-teacher gap on the regimes whose training tree stays
source-styled (RESULTS.md round-2 distillation table; the HM student
carried precisely because histogram matching restyles the tree itself).
KD needs no labels, so the step takes the MME-style batch
``((x_lab, y), x_unl)`` (data/modules.TwoDomainMMEDataModule) and
applies the KD term to the unlabelled TARGET frames as well, CE to the
labelled rows only — same data budget each regime already used
(MME/HM/CycleGAN consumed target/unlabelled; S&T its labelled subset).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.dtypes import DTypePolicy, DEFAULT_POLICY
from ..models.lanenet_lite import LaneNetLite
from ..ops.augment import AugmentConfig, augment_batch, eval_batch
from ..ops.metrics import evaluate_outputs
from . import optim
from .losses import cross_entropy, weighted_cross_entropy
from .schedules import cosine_annealing


class DistillState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


class DistillTrainer:
    def __init__(self, *, teacher_model, teacher_params, teacher_batch_stats,
                 num_cls: int = 4, lr: float = 1e-3, decay: float = 1e-4,
                 lr_ratio: float = 1e3, temperature: float = 2.0,
                 alpha: float = 0.7, height: int = 120, width: int = 160,
                 augment: bool = True, policy: DTypePolicy = DEFAULT_POLICY,
                 student_model=None, t_max: int = 25):
        self.teacher = teacher_model
        self.teacher_vars = {"params": teacher_params,
                             "batch_stats": teacher_batch_stats}
        self.student = student_model or LaneNetLite(n_classes=num_cls,
                                                    policy=policy)
        self.num_cls = num_cls
        self.lr, self.decay, self.lr_ratio = lr, decay, lr_ratio
        self.t_max = t_max
        self.temperature, self.alpha = temperature, alpha
        self.augment = augment
        self.cfg = AugmentConfig(height=height, width=width,
                                 min_crop_height=height // 2,
                                 max_crop_height=height * 4)
        self.tx = optim.adamw(decay)

    def init_state(self, key: jax.Array) -> DistillState:
        x = jnp.zeros((1, self.cfg.height, self.cfg.width, 3), jnp.float32)
        variables = jax.jit(self.student.init)(key, x)
        return DistillState(params=variables["params"],
                            batch_stats=variables.get("batch_stats", {}),
                            opt_state=self.tx.init(variables["params"]))

    def lr_at(self, epoch: int) -> float:
        # t_max should match the fit budget: torch-semantics cosine
        # RISES back toward lr0 past t_max (schedules.cosine_annealing),
        # which made epochs 26-40 of the round-2 40-epoch distillations
        # train on an increasing lr (visibly noisy val trajectories)
        return cosine_annealing(self.lr, self.lr / self.lr_ratio,
                                self.t_max, epoch)

    def default_step_fn(self, state, batch, key, epoch):
        if len(batch) == 2 and isinstance(batch[0], tuple):
            # MME-style ((x_lab, y), x_unl): distill on target appearance
            (images, labels), images_unl = batch
            return self.train_step_unl(state, images, labels, images_unl,
                                       key, self.lr_at(epoch))
        images, labels = batch
        return self.train_step(state, images, labels, key, self.lr_at(epoch))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: DistillState, images: jax.Array,
                   labels: jax.Array, key: jax.Array, lr: jax.Array):
        k_aug, k_drop = jax.random.split(key)
        if self.augment:
            x, y = augment_batch(k_aug, images, labels, self.cfg)
        else:
            x, y = eval_batch(images, labels, self.cfg)
        return self._step_impl(state, x, y, x.shape[0], k_drop, lr)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step_unl(self, state: DistillState, images: jax.Array,
                       labels: jax.Array, images_unl: jax.Array,
                       key: jax.Array, lr: jax.Array):
        """KD over [labelled ; unlabelled-target], CE over labelled only
        (module docstring: target-domain distillation)."""
        k_aug_l, k_aug_u, k_drop = jax.random.split(key, 3)
        if self.augment:
            x_lab, y = augment_batch(k_aug_l, images, labels, self.cfg)
            x_unl, _ = augment_batch(k_aug_u, images_unl, None, self.cfg,
                                     with_labels=False)
        else:
            x_lab, y = eval_batch(images, labels, self.cfg)
            x_unl, _ = eval_batch(images_unl, None, self.cfg,
                                  with_labels=False)
        x = jnp.concatenate([x_lab, x_unl], axis=0)
        return self._step_impl(state, x, y, x_lab.shape[0], k_drop, lr)

    def _step_impl(self, state, x, y, n_lab, k_drop, lr):
        # teacher logits (frozen, eval mode, pre-softmax)
        t_logits = self.teacher.apply(self.teacher_vars, x, train=False,
                                      use_softmax=False)
        T = self.temperature
        t_soft = jax.nn.softmax(t_logits / T, axis=-1)

        def loss_fn(params):
            out, mut = self.student.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, use_softmax=False,
                rngs={"dropout": k_drop}, mutable=["batch_stats"])
            s_logp = jax.nn.log_softmax(out / T, axis=-1)
            kd = -jnp.mean(jnp.sum(t_soft * s_logp, axis=-1)) * T * T
            ce = weighted_cross_entropy(out[:n_lab], y, self.num_cls)
            loss = self.alpha * kd + (1.0 - self.alpha) * ce
            return loss, (out, mut["batch_stats"], kd, ce)

        (loss, (out, new_bs, kd, ce)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optim.apply_updates(state.params, updates, lr)
        logs = {"tr_loss": loss, "tr_kd": kd, "tr_ce": ce}
        return state.replace(params=new_params, batch_stats=new_bs,
                             opt_state=new_opt), logs

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: DistillState, images: jax.Array,
                  labels: jax.Array):
        x, y = eval_batch(images, labels, self.cfg)
        out = self.student.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, use_softmax=True)
        loss = cross_entropy(out, y)
        return evaluate_outputs(out, y, loss, self.num_cls)
