"""MME semi-supervised domain adaptation — both optimizer phases in ONE
jitted step.

The reference (MMETrainingModule.py:14-38) let Lightning alternate two
optimizers per batch:

  phase G (optimizer_idx 0): SGD(momentum .9, nesterov, per-group lrs —
    featureExtractor lr/3, classifier lr) on the adversarial entropy of the
    *unlabelled* batch routed featureExtractor -> grad_reverse ->
    classifier, λ=0.1;
  phase F (optimizer_idx 1): AdamW on class-weighted CE of the *labelled*
    batch, computed on the post-phase-G parameters.

Both optimizers cover ALL parameters (an inheritance quirk the reference
kept — MMETrainingModule.py:16-20); both LRs follow
CosineAnnealingLR(T_max=25, eta_min=lr*1e-3) per epoch, where eta_min is
absolute (the feature-extractor group anneals lr/3 -> lr*1e-3, so it is
not a constant factor of the classifier lr — hence two separate scalars
into the step).  Both phases run train-mode forwards, so BatchNorm stats
update twice per batch, exactly like Lightning did.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.dtypes import DTypePolicy, DEFAULT_POLICY
from ..models.tiramisu import FCDenseNet, fcdensenet67, grad_reverse
from ..ops.augment import augment_batch, eval_batch
from ..ops.metrics import evaluate_outputs
from . import optim
from .losses import adentropy, cross_entropy, weighted_cross_entropy
from .schedules import cosine_annealing
from .supervised import SupervisedTrainer, TrainState


class MMETrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state_g: Any   # SGD (entropy max phase)
    opt_state_f: Any   # AdamW (supervised phase)
    lr_mask_fe: Any    # 1.0 on featureExtractor leaves, 0.0 elsewhere
    epoch: int = struct.field(pytree_node=False, default=0)


class MMETrainer(SupervisedTrainer):
    def __init__(self, *, lamda: float = 0.1, **kw):
        super().__init__(**kw)
        self.lamda = lamda
        # Weight decay is applied INSIDE the step (see _mme_train_step_impl)
        # so it can enter as a traced scalar like the lrs: the HPO sweep
        # (cli/tune.py) varies decay per trial, and a decay baked into the
        # optax chain is an HLO constant — every trial would recompile the
        # full train step cold (~10 min/trial through the dev tunnel).
        # wd=0.0 keeps the opt-state pytree structure identical to the
        # decay-baked chains, so checkpoints are unaffected.
        self.tx_g = optim.sgd_nesterov(0.0, momentum=0.9)
        self.tx_f = optim.adamw(0.0)

    # -- state --------------------------------------------------------------

    def init_state(self, key: jax.Array) -> MMETrainState:
        x = jnp.zeros((1, self.cfg.height, self.cfg.width, 3), jnp.float32)
        variables = jax.jit(self.model.init)(key, x)
        params = variables["params"]
        mask = optim.lr_factor_tree(
            params, lambda path: 1.0 if "featureExtractor" in path[0] else 0.0)
        return MMETrainState(params=params,
                             batch_stats=variables.get("batch_stats", {}),
                             opt_state_g=self.tx_g.init(params),
                             opt_state_f=self.tx_f.init(params),
                             lr_mask_fe=mask)

    def from_pretrained(self, state: TrainState) -> MMETrainState:
        """Start from baseline weights (reference train.py:58)."""
        fresh = self.init_state(jax.random.key(0))
        return fresh.replace(params=state.params, batch_stats=state.batch_stats)

    def lrs_at(self, epoch: int) -> tuple[float, float, float]:
        """(sgd lr for featureExtractor, sgd lr for classifier, adamw lr)."""
        eta_min = self.lr * 1e-3
        return (cosine_annealing(self.lr / 3, eta_min, 25, epoch),
                cosine_annealing(self.lr, eta_min, 25, epoch),
                cosine_annealing(self.lr, eta_min, 25, epoch))

    # -- forward pieces -----------------------------------------------------

    def _forward_adversarial(self, params, batch_stats, x, k_drop):
        """featureExtractor -> grad_reverse -> classifier (train mode)."""
        feats, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            rngs={"dropout": k_drop}, mutable=["batch_stats"],
            method=lambda m, x, train: m.featureExtractor(x, train=train))
        feats = grad_reverse(feats)
        probs = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, feats,
            method=lambda m, f: m.classifier(f, use_softmax=True))
        return probs, mut["batch_stats"]

    # -- step ---------------------------------------------------------------

    def default_step_fn(self, state, batch, key, epoch):
        (x_lab, y), x_unl = batch
        lr_g_fe, lr_g_cls, lr_f = self.lrs_at(epoch)
        return self.mme_train_step(state, x_lab, y, x_unl, key,
                                   lr_g_fe, lr_g_cls, lr_f)

    def run_scan_chunk(self, state, arrays, idx_chunk, key, epoch):
        """MME scan dispatch: ``arrays`` = (labelled images, labels,
        unlabelled images) device-resident; ``idx_chunk`` [K, 2, B] pairs
        each step's labelled row (0) with its unlabelled row (1) — the
        ParallelDataset pairing in index form."""
        lab_img, lab_lab, unl_img = arrays
        lr_g_fe, lr_g_cls, lr_f = (jnp.float32(v) for v in self.lrs_at(epoch))
        return self.mme_train_steps_scan(state, lab_img, lab_lab, unl_img,
                                         jnp.asarray(idx_chunk), key,
                                         lr_g_fe, lr_g_cls, lr_f)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def mme_train_steps_scan(self, state: MMETrainState,
                             lab_images: jax.Array, lab_labels: jax.Array,
                             unl_images: jax.Array, idx: jax.Array,
                             key: jax.Array, lr_g_fe: jax.Array,
                             lr_g_cls: jax.Array, lr_f: jax.Array):
        """K MME steps in one dispatch (same shape as the supervised
        train_steps_scan, supervised.py): idx [K, 2, B] gathers the
        labelled/unlabelled batches on device; the key chain replicates K
        sequential split(key) draws."""
        def body(carry, idx_b):
            st, k = carry
            k, k_step = jax.random.split(k)
            st, logs = self._mme_train_step_impl(
                st, self._constrain_batch(jnp.take(lab_images, idx_b[0], axis=0)),
                self._constrain_batch(jnp.take(lab_labels, idx_b[0], axis=0)),
                self._constrain_batch(jnp.take(unl_images, idx_b[1], axis=0)),
                k_step, lr_g_fe, lr_g_cls, lr_f)
            return (st, k), logs

        (state, key), logs = jax.lax.scan(body, (state, key), idx)
        return state, key, logs

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def mme_train_step(self, state: MMETrainState,
                       images_lab: jax.Array, labels: jax.Array,
                       images_unl: jax.Array, key: jax.Array,
                       lr_g_fe: jax.Array, lr_g_cls: jax.Array,
                       lr_f: jax.Array, decay: jax.Array | None = None):
        return self._mme_train_step_impl(state, images_lab, labels,
                                         images_unl, key, lr_g_fe, lr_g_cls,
                                         lr_f, decay)

    def _mme_train_step_impl(self, state: MMETrainState,
                             images_lab: jax.Array, labels: jax.Array,
                             images_unl: jax.Array, key: jax.Array,
                             lr_g_fe: jax.Array, lr_g_cls: jax.Array,
                             lr_f: jax.Array, decay: jax.Array | None = None):
        # decay=None (every pre-existing caller): the constructor value is
        # baked into the program as a constant — one compile per decay
        # value, bit-identical to the old optax-chain behavior.  Passing
        # decay as a jnp scalar instead makes it a runtime operand, so
        # sweeps over decay share ONE compiled step (cli/tune.py).
        if decay is None:
            decay = jnp.float32(self.decay)
        k_aug_l, k_aug_u, k_drop_g, k_drop_f = jax.random.split(key, 4)
        if self.augment:
            x_lab, y = augment_batch(k_aug_l, images_lab, labels, self.cfg)
            x_unl, _ = augment_batch(k_aug_u, images_unl, None, self.cfg,
                                     with_labels=False)
        else:
            x_lab, y = eval_batch(images_lab, labels, self.cfg)
            x_unl, _ = eval_batch(images_unl, None, self.cfg, with_labels=False)

        # ---- phase G: entropy maximization on unlabelled (optimizer_idx 0)
        def loss_g(params):
            if self.pallas_train:
                from ..models.tiramisu_train_pallas import pallas_apply_train
                probs, new_bs = pallas_apply_train(
                    self.model,
                    {"params": params, "batch_stats": state.batch_stats},
                    x_unl, k_drop_g, reverse_features=True)
            elif self.fast_train:
                from ..models.tiramisu_fast import fast_apply_train
                probs, new_bs = fast_apply_train(
                    self.model,
                    {"params": params, "batch_stats": state.batch_stats},
                    x_unl, k_drop_g, reverse_features=True)
            else:
                probs, new_bs = self._forward_adversarial(
                    params, state.batch_stats, x_unl, k_drop_g)
            return adentropy(probs, self.lamda), new_bs

        (loss0, bs1), grads0 = jax.value_and_grad(loss_g, has_aux=True)(state.params)
        # torch SGD applies weight decay to the gradient BEFORE the momentum
        # buffer (g' = g + wd*p; reference MMETrainingModule.py:17-20) —
        # exactly what optax.add_decayed_weights did at the head of the old
        # chain; tx_g is now wd=0 so decay can be a traced operand.
        grads0 = jax.tree_util.tree_map(lambda g, p: g + decay * p,
                                        grads0, state.params)
        upd0, new_og = self.tx_g.update(grads0, state.opt_state_g, state.params)
        lr_tree = jax.tree_util.tree_map(
            lambda m: lr_g_fe * m + lr_g_cls * (1.0 - m), state.lr_mask_fe)
        params1 = jax.tree_util.tree_map(
            lambda p, u, l: p - l * u.astype(p.dtype), state.params, upd0, lr_tree)

        # ---- phase F: weighted CE on labelled (optimizer_idx 1)
        def loss_f(params):
            if self.pallas_train:
                from ..models.tiramisu_train_pallas import pallas_apply_train
                out, new_bs = pallas_apply_train(
                    self.model, {"params": params, "batch_stats": bs1},
                    x_lab, k_drop_f)
            elif self.fast_train:
                from ..models.tiramisu_fast import fast_apply_train
                out, new_bs = fast_apply_train(
                    self.model, {"params": params, "batch_stats": bs1},
                    x_lab, k_drop_f)
            else:
                out, mut = self.model.apply(
                    {"params": params, "batch_stats": bs1}, x_lab, train=True,
                    rngs={"dropout": k_drop_f}, mutable=["batch_stats"])
                new_bs = mut["batch_stats"]
            return weighted_cross_entropy(out, y, self.num_cls), new_bs

        (loss1, bs2), grads1 = jax.value_and_grad(loss_f, has_aux=True)(params1)
        upd1, new_of = self.tx_f.update(grads1, state.opt_state_f, params1)
        # torch AdamW adds wd*p to the UPDATE after the adam moment math
        # (reference SimpleTrain.py:28) — the add_decayed_weights tail of
        # the old tx_f chain, applied here with decay as a traced operand.
        upd1 = jax.tree_util.tree_map(lambda u, p: u + decay * p,
                                      upd1, params1)
        params2 = optim.apply_updates(params1, upd1, lr_f)

        logs = {"tr_loss_adent": loss0, "tr_loss": loss1}
        return state.replace(params=params2, batch_stats=bs2,
                             opt_state_g=new_og, opt_state_f=new_of), logs
