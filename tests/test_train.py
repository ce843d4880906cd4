"""Training-layer tests: losses, supervised step learns, MME step updates,
full fit loop with checkpointing on synthetic data (tiny model, CPU)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sim2real_lane_segment_tpu.train import losses
from sim2real_lane_segment_tpu.train.mme import MMETrainer
from sim2real_lane_segment_tpu.train.supervised import SupervisedTrainer

from helpers import make_sim_tree, make_simreal_tree, tiny_model

torch = pytest.importorskip("torch")

H, W = 24, 32


def small_trainer(**kw):
    defaults = dict(num_cls=4, height=H, width=W, augment=False,
                    model=tiny_model())
    defaults.update(kw)
    return SupervisedTrainer(**defaults)


# ---------------------------------------------------------------------------
# losses vs torch
# ---------------------------------------------------------------------------

def test_class_weight_matches_reference_semantics(rng):
    y = rng.integers(0, 3, (2, 8, 8))  # class 3 absent
    w = np.asarray(losses.get_class_weight(jnp.asarray(y), 4))
    counts = np.bincount(y.reshape(-1), minlength=4)
    for c in range(3):
        np.testing.assert_allclose(w[c], 1.0 / counts[c], rtol=1e-6)
    assert w[3] == 0.0  # torch had inf; never used — see losses.py


def test_cross_entropy_matches_torch(rng):
    out = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    y = rng.integers(0, 4, (2, 8, 8))
    got = float(losses.cross_entropy(jnp.asarray(out), jnp.asarray(y)))
    t = torch.nn.functional.cross_entropy(
        torch.tensor(out).permute(0, 3, 1, 2), torch.tensor(y))
    np.testing.assert_allclose(got, float(t), rtol=1e-5)


def test_weighted_cross_entropy_matches_torch(rng):
    out = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    y = rng.integers(0, 4, (2, 8, 8))
    got = float(losses.weighted_cross_entropy(jnp.asarray(out), jnp.asarray(y), 4))
    counts = torch.bincount(torch.tensor(y).reshape(-1), minlength=4).float()
    w = torch.reciprocal(counts)
    t = torch.nn.functional.cross_entropy(
        torch.tensor(out).permute(0, 3, 1, 2), torch.tensor(y), weight=w)
    np.testing.assert_allclose(got, float(t), rtol=1e-5)


def test_adentropy_matches_torch(rng):
    p = rng.random((2, 8, 8, 4)).astype(np.float32)
    p = p / p.sum(-1, keepdims=True)
    got = float(losses.adentropy(jnp.asarray(p), 0.1))
    tp = torch.tensor(p).permute(0, 3, 1, 2)
    want = 0.1 * torch.mean(torch.sum(tp * torch.log(tp + 1e-5), 1))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


# ---------------------------------------------------------------------------
# steps
# ---------------------------------------------------------------------------

def synthetic_batch(rng, n=4):
    img = rng.integers(0, 80, (n, H, W, 3), dtype=np.uint8)
    img[:, :, W // 2:, 1] += 120
    y = np.zeros((n, H, W), np.uint8)
    y[:, :, W // 2:] = 1
    return img, y


@pytest.mark.slow
def test_supervised_step_learns(rng):
    tr = small_trainer()
    state = tr.init_state(jax.random.key(0))
    img, y = synthetic_batch(rng)
    key = jax.random.key(1)
    first_loss = last_loss = None
    for i in range(30):
        key, k = jax.random.split(key)
        state, logs = tr.train_step(state, img, y, k, tr.lr_at(0))
        if first_loss is None:
            first_loss = float(logs["tr_loss"])
        last_loss = float(logs["tr_loss"])
    assert last_loss < first_loss * 0.7, (first_loss, last_loss)
    # eval metrics after training should beat chance
    out = tr.eval_step(state, img, y)
    acc = float(out["acc"]) / float(out["weight"])
    assert acc > 0.8


def test_eval_step_weighting(rng):
    tr = small_trainer()
    state = tr.init_state(jax.random.key(0))
    img, y = synthetic_batch(rng, n=3)
    out = tr.eval_step(state, img, y)
    assert float(out["weight"]) == 3.0


def test_predict_step_shapes(rng):
    tr = small_trainer()
    state = tr.init_state(jax.random.key(0))
    img, _ = synthetic_batch(rng, n=2)
    pred = np.asarray(tr.predict_step(state, img))
    assert pred.shape == (2, H, W) and pred.dtype == np.uint8
    assert set(np.unique(pred)) <= {0, 1, 2, 3}


def test_mme_decay_operand_matches_baked(rng):
    """decay passed as a traced scalar == decay baked at construction.

    The HPO sweep passes decay as a step operand so all trials share one
    compiled program (cli/tune.py, train/mme.py); this gates that the
    operand path is bit-identical to the legacy constructor-baked path
    for a nontrivial decay.
    """
    img, y = synthetic_batch(rng, n=2)
    img_u, _ = synthetic_batch(rng, n=2)

    def one_step(decay_operand):
        tr = MMETrainer(num_cls=4, height=H, width=W, augment=False,
                        decay=3e-3, model=tiny_model())
        state = tr.init_state(jax.random.key(0))
        lrs = tr.lrs_at(0)
        extra = (jnp.float32(tr.decay),) if decay_operand else ()
        state, logs = tr.mme_train_step(state, img, y, img_u,
                                        jax.random.key(1), *lrs, *extra)
        return state, logs

    s_baked, l_baked = one_step(False)
    s_arg, l_arg = one_step(True)
    assert float(l_baked["tr_loss"]) == float(l_arg["tr_loss"])
    for a, b in zip(jax.tree_util.tree_leaves(s_baked.params),
                    jax.tree_util.tree_leaves(s_arg.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s_baked.opt_state_g) +
                    jax.tree_util.tree_leaves(s_baked.opt_state_f),
                    jax.tree_util.tree_leaves(s_arg.opt_state_g) +
                    jax.tree_util.tree_leaves(s_arg.opt_state_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_mme_step_runs_and_updates(rng):
    tr = MMETrainer(num_cls=4, height=H, width=W, augment=False,
                    model=tiny_model())
    state = tr.init_state(jax.random.key(0))
    img, y = synthetic_batch(rng)
    img_u, _ = synthetic_batch(rng)
    p_before = jax.tree_util.tree_leaves(state.params)[0].copy()
    lr_g_fe, lr_g_cls, lr_f = tr.lrs_at(0)
    state, logs = tr.mme_train_step(state, img, y, img_u, jax.random.key(1),
                                    lr_g_fe, lr_g_cls, lr_f)
    p_after = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p_before), np.asarray(p_after))
    assert np.isfinite(float(logs["tr_loss"]))
    assert np.isfinite(float(logs["tr_loss_adent"]))


def test_mme_lr_groups():
    tr = MMETrainer(num_cls=4, height=H, width=W, model=tiny_model())
    lr_fe, lr_cls, lr_f = tr.lrs_at(0)
    assert lr_fe == pytest.approx(tr.lr / 3)
    assert lr_cls == pytest.approx(tr.lr)
    # at T_max both groups reach the same absolute eta_min
    lr_fe25, lr_cls25, _ = tr.lrs_at(25)
    assert lr_fe25 == pytest.approx(tr.lr * 1e-3)
    assert lr_cls25 == pytest.approx(tr.lr * 1e-3)


@pytest.mark.slow
def test_grad_reverse_direction(rng):
    """Phase G must push featureExtractor and classifier in *opposing*
    directions on the entropy objective (the MME minimax)."""
    tr = MMETrainer(num_cls=4, height=H, width=W, augment=False,
                    model=tiny_model())
    state = tr.init_state(jax.random.key(0))
    img_u, _ = synthetic_batch(rng)
    from sim2real_lane_segment_tpu.ops.augment import eval_batch
    x, _ = eval_batch(img_u, None, tr.cfg, with_labels=False)

    def loss_rev(params):
        probs, _ = tr._forward_adversarial(params, state.batch_stats, x,
                                           jax.random.key(0))
        return losses.adentropy(probs, 0.1)

    def loss_norev(params):
        feats, _ = tr.model.apply(
            {"params": params, "batch_stats": state.batch_stats}, x,
            train=True, rngs={"dropout": jax.random.key(0)},
            mutable=["batch_stats"],
            method=lambda m, x, train: m.featureExtractor(x, train=train))
        probs = tr.model.apply(
            {"params": params, "batch_stats": state.batch_stats}, feats,
            method=lambda m, f: m.classifier(f, use_softmax=True))
        return losses.adentropy(probs, 0.1)

    g_rev = jax.grad(loss_rev)(state.params)
    g_nor = jax.grad(loss_norev)(state.params)
    # classifier grads identical; featureExtractor grads negated
    cls_r = jax.tree_util.tree_leaves(g_rev["classifier"])
    cls_n = jax.tree_util.tree_leaves(g_nor["classifier"])
    for a, b in zip(cls_r, cls_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    fe_r = jax.tree_util.tree_leaves(g_rev["featureExtractor"])
    fe_n = jax.tree_util.tree_leaves(g_nor["featureExtractor"])
    for a, b in zip(fe_r, fe_n):
        np.testing.assert_allclose(np.asarray(a), -np.asarray(b), atol=1e-6)


# ---------------------------------------------------------------------------
# fit loop
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_fit_loop_end_to_end(tmp_path, rng):
    from sim2real_lane_segment_tpu.data.modules import SimulatorDataModule
    from sim2real_lane_segment_tpu.train.loop import fit
    from sim2real_lane_segment_tpu.train import checkpoint as ckpt

    root = make_sim_tree(tmp_path, rng)
    dm = SimulatorDataModule(data_path=root, batch_size=4)
    dm.setup()
    tr = small_trainer()
    state = tr.init_state(jax.random.key(0))
    out_dir = str(tmp_path / "results")
    best_state, best_iou, _ = fit(tr, state, dm, max_epochs=2,
                                  out_dir=out_dir, log_every=1)
    assert best_iou >= 0
    # orbax manager layout: <dir>/<epoch step>/ with retention k=1
    ckpt_root = os.path.join(out_dir, "checkpoints")
    steps = [d for d in os.listdir(ckpt_root) if d.isdigit()]
    assert len(steps) == 1, steps
    assert os.path.exists(os.path.join(out_dir, "best_weights.msgpack"))
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))

    # round-trip the checkpoint (best step restored)
    fresh = tr.init_state(jax.random.key(7))
    restored, meta = ckpt.load_checkpoint(ckpt_root, fresh)
    a = jax.tree_util.tree_leaves(best_state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "val_iou" in meta["metrics"]


@pytest.mark.slow
def test_train_steps_scan_matches_sequential_steps(rng):
    """One train_steps_scan dispatch == K sequential train_step calls:
    same batches (gathered by idx), same key-split chain, equal state and
    per-step logs up to float-reassociation noise (the scan body is a
    different XLA program, so fusion order differs at the ~1e-8 level;
    train/supervised.py train_steps_scan)."""
    import jax.numpy as jnp

    tr = small_trainer(augment=True)
    images = jnp.asarray(rng.integers(0, 255, (10, H, W, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (10, H, W), dtype=np.uint8))
    idx = jnp.asarray(np.array([[0, 3, 9, 1], [2, 2, 7, 4], [5, 8, 6, 0]],
                               np.int32))
    lr = jnp.float32(1e-3)
    key = jax.random.key(11)

    s_scan = tr.init_state(jax.random.key(0))
    s_seq = jax.device_get(s_scan)  # independent copy (scan donates)
    s_scan, key_out, logs = tr.train_steps_scan(
        s_scan, images, labels, idx, key, lr)

    k = key
    seq_logs = []
    for row in np.asarray(idx):
        k, k_step = jax.random.split(k)
        s_seq, lg = tr.train_step(s_seq, jnp.take(images, jnp.asarray(row), 0),
                                  jnp.take(labels, jnp.asarray(row), 0),
                                  k_step, lr)
        seq_logs.append(jax.device_get(lg))

    # Discrimination lives in the LOGS: a matched scan reproduces each
    # step's loss/acc to <1e-6 (same batch, same augment key), while a
    # wrong key or wrong batch shifts the loss by >5e-4 (negative control
    # below).  Params are NOT a sharp signal: AdamW normalizes gradients
    # by sqrt(v), so for noise-dominated gradient elements the update is
    # the sign of float-reassociation noise — matched runs still drift
    # apart at the ~lr*K scale there; bound loosely.
    def max_diff(p, q):
        return max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                   for a, b in zip(jax.tree_util.tree_leaves(p),
                                   jax.tree_util.tree_leaves(q)))

    assert max_diff(s_scan.params, s_seq.params) < 1e-3  # ~lr * K
    logs = jax.device_get(logs)
    for i, lg in enumerate(seq_logs):
        for name in lg:
            np.testing.assert_allclose(logs[name][i], lg[name],
                                       rtol=1e-5, atol=1e-5)

    # negative control: a different key shifts per-step losses visibly,
    # so the tolerance above would catch wrong keys/batches
    s_alt = tr.init_state(jax.random.key(0))
    s_alt, _, logs_alt = tr.train_steps_scan(s_alt, images, labels, idx,
                                             jax.random.key(99), lr)
    logs_alt = jax.device_get(logs_alt)
    alt_diff = max(abs(float(logs_alt["tr_loss"][i]) -
                       float(seq_logs[i]["tr_loss"])) for i in range(len(idx)))
    assert alt_diff > 1e-4, alt_diff
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(key_out)),
                                  np.asarray(jax.random.key_data(k)))


@pytest.mark.slow
def test_fit_scan_dispatch_matches_per_batch_path(tmp_path, rng, monkeypatch):
    """fit() with device_cache (scanned-epoch dispatch) reproduces the
    per-batch path (same batches/keys; float-reassociation tolerance) —
    including across a _SCAN_CHUNK boundary (chunk forced to 1 step so
    the key/state carry crosses dispatches)."""
    from sim2real_lane_segment_tpu.data.modules import SimulatorDataModule
    from sim2real_lane_segment_tpu.train import loop
    from sim2real_lane_segment_tpu.train.loop import fit

    root = make_sim_tree(tmp_path, rng)

    def run(cache: bool, out: str, chunk: int | None):
        if chunk is not None:
            monkeypatch.setattr(loop, "_SCAN_CHUNK", chunk)
        dm = SimulatorDataModule(data_path=root, batch_size=4,
                                 device_cache=cache)
        dm.setup()
        # augment=False keeps compiles cheap; the augmented key-chain
        # equivalence is covered by the unit-level scan test above
        tr = small_trainer(augment=False)
        best, iou, _ = fit(tr, tr.init_state(jax.random.key(0)), dm,
                           max_epochs=2, out_dir=str(tmp_path / out),
                           log_every=1)
        return jax.device_get(best), iou

    ref_state, ref_iou = run(False, "per_batch", None)
    for chunk, out in ((32, "scan32"), (1, "scan1")):
        st, iou = run(True, out, chunk)
        assert iou == pytest.approx(ref_iou, rel=1e-3, abs=1e-3)
        md = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                 for a, b in zip(jax.tree_util.tree_leaves(st.params),
                                 jax.tree_util.tree_leaves(ref_state.params)))
        assert md < 5e-3, md  # AdamW noise drift only (~lr * n_steps)

    # same train-loss stream step for step (same steps logged)
    def losses(out):
        import json
        with open(tmp_path / out / "metrics.jsonl") as f:
            return [(j["step"], j["train/tr_loss"]) for j in map(json.loads, f)
                    if "train/tr_loss" in j]
    for out in ("scan32", "scan1"):
        got, ref = losses(out), losses("per_batch")
        assert [s for s, _ in got] == [s for s, _ in ref]
        np.testing.assert_allclose([v for _, v in got], [v for _, v in ref],
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_mme_scan_matches_sequential_steps(rng):
    """mme_train_steps_scan == K sequential mme_train_step calls (same
    [K,2,B] index pairing, same key chain); logs are the sharp signal
    (see the supervised twin test above)."""
    import jax.numpy as jnp
    from sim2real_lane_segment_tpu.train.mme import MMETrainer

    tr = MMETrainer(num_cls=4, height=H, width=W, augment=True,
                    model=tiny_model())
    lab_img = jnp.asarray(rng.integers(0, 255, (8, H, W, 3), dtype=np.uint8))
    lab_lab = jnp.asarray(rng.integers(0, 4, (8, H, W), dtype=np.uint8))
    unl_img = jnp.asarray(rng.integers(0, 255, (12, H, W, 3), dtype=np.uint8))
    idx = jnp.asarray(np.array([[[0, 3, 7, 1], [2, 11, 5, 0]],
                                [[2, 2, 6, 4], [9, 1, 1, 3]]], np.int32))
    lrs = tuple(jnp.float32(v) for v in tr.lrs_at(0))
    key = jax.random.key(5)

    s_scan = tr.init_state(jax.random.key(0))
    s_seq = jax.device_get(s_scan)
    s_scan, _, logs = tr.mme_train_steps_scan(
        s_scan, lab_img, lab_lab, unl_img, idx, key, *lrs)

    k = key
    seq_logs = []
    for pair in np.asarray(idx):
        k, ks = jax.random.split(k)
        li, ui = jnp.asarray(pair[0]), jnp.asarray(pair[1])
        s_seq, lg = tr.mme_train_step(
            s_seq, jnp.take(lab_img, li, 0), jnp.take(lab_lab, li, 0),
            jnp.take(unl_img, ui, 0), ks, *lrs)
        seq_logs.append(jax.device_get(lg))

    logs = jax.device_get(logs)
    for i, lg in enumerate(seq_logs):
        for name in lg:
            np.testing.assert_allclose(logs[name][i], lg[name],
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fit_mme_scan_dispatch_matches_per_batch_path(tmp_path, rng,
                                                      monkeypatch):
    """fit() on the MME regime with device_cache takes the scanned path
    and reproduces the per-batch loss streams (same steps logged, float
    tolerance)."""
    import json
    from sim2real_lane_segment_tpu.data.modules import TwoDomainMMEDataModule
    from sim2real_lane_segment_tpu.train import loop
    from sim2real_lane_segment_tpu.train.loop import fit
    from sim2real_lane_segment_tpu.train.mme import MMETrainer

    monkeypatch.setattr(loop, "_SCAN_CHUNK", 2)
    root = make_simreal_tree(tmp_path, rng)

    def run(cache: bool, out: str):
        dm = TwoDomainMMEDataModule(data_path=root, batch_size=4,
                                    device_cache=cache)
        dm.setup()
        tr = MMETrainer(num_cls=4, height=H, width=W, augment=False,
                        model=tiny_model())
        _, iou, _ = fit(tr, tr.init_state(jax.random.key(0)), dm,
                        max_epochs=2, out_dir=str(tmp_path / out),
                        log_every=1)
        return iou

    iou_scan = run(True, "mme_scan")
    iou_ref = run(False, "mme_per_batch")
    assert iou_scan == pytest.approx(iou_ref, rel=1e-3, abs=1e-3)

    def losses(out):
        with open(tmp_path / out / "metrics.jsonl") as f:
            return [(j["step"], j["train/tr_loss"], j.get("train/tr_loss_adent"))
                    for j in map(json.loads, f) if "train/tr_loss" in j]
    got, ref = losses("mme_scan"), losses("mme_per_batch")
    assert [g[0] for g in got] == [r[0] for r in ref]
    np.testing.assert_allclose([g[1] for g in got], [r[1] for r in ref],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose([g[2] for g in got], [r[2] for r in ref],
                               rtol=1e-3, atol=1e-3)


def test_fit_resume_continues_from_checkpoint(tmp_path, rng):
    from sim2real_lane_segment_tpu.data.modules import SimulatorDataModule
    from sim2real_lane_segment_tpu.train.loop import fit

    root = make_sim_tree(tmp_path, rng)
    dm = SimulatorDataModule(data_path=root, batch_size=4)
    dm.setup()
    tr = small_trainer()
    out_dir = str(tmp_path / "results")
    s1, iou1, _ = fit(tr, tr.init_state(jax.random.key(0)), dm,
                      max_epochs=1, out_dir=out_dir, log_every=1)

    # resume with max_epochs == saved epoch + 1: zero new epochs run, so
    # the checkpointed state must come back verbatim — a fresh key(9)
    # init would otherwise give different params and metrics
    s2, iou2, _ = fit(tr, tr.init_state(jax.random.key(9)), dm,
                      max_epochs=1, out_dir=out_dir, resume=True)
    assert iou2 == pytest.approx(iou1, abs=1e-6)
    a = jax.tree_util.tree_leaves(s1.params)[0]
    b = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # with a larger budget the resumed run trains only the remaining
    # epoch and the best-val_iou watermark never regresses
    _, iou3, _ = fit(tr, tr.init_state(jax.random.key(9)), dm,
                     max_epochs=2, out_dir=out_dir, resume=True)
    assert iou3 >= iou1 - 1e-6


@pytest.mark.slow
def test_fit_resume_trajectory_matches_uninterrupted(tmp_path, rng):
    """Resume-fidelity gate (VERDICT r03 weak #3): a run killed MID-EPOCH
    and resumed must reproduce the uninterrupted run's training math
    exactly — same per-epoch val metrics, bitwise-equal final weights.

    Why this should hold by construction: every epoch's randomness is
    ``fold_in(key(seed), epoch)`` (loop.py), samplers are pure functions
    of (seed, epoch) (samplers.py), and the latest-channel checkpoint
    restores the FULL train state (params + opt moments + BN stats) at
    an epoch boundary, so a resumed run replays the interrupted epoch
    with identical inputs and keys.  The one permitted divergence is the
    metrics.jsonl *step axis*: global_step restarts at the last logged
    step, so a mid-epoch crash's partial train logs shift subsequent
    step indices (logging only — no math reads global_step).  Values
    are compared per epoch, not per step index.
    """
    import json
    from sim2real_lane_segment_tpu.data.modules import SimulatorDataModule
    from sim2real_lane_segment_tpu.train import loop

    root = make_sim_tree(tmp_path, rng)
    dm = SimulatorDataModule(data_path=root, batch_size=4)
    dm.setup()
    epochs = 4

    def val_rows(out_dir):
        with open(os.path.join(out_dir, "metrics.jsonl")) as f:
            return [(j["val/iou"], j["val/loss"], j["val/acc"])
                    for j in map(json.loads, f) if "val/iou" in j]

    # A: uninterrupted, explicit step fn so both runs take the same
    # (per-batch) path — scan-vs-per-batch parity has its own gate
    tr = small_trainer()
    full_dir = str(tmp_path / "full")
    s_full, iou_full, _ = loop.fit(
        tr, tr.init_state(jax.random.key(0)), dm, max_epochs=epochs,
        out_dir=full_dir, log_every=1, train_step_fn=tr.default_step_fn)

    # B: identical recipe, killed by an uncaught error mid-epoch 2 (the
    # third epoch) — the non-transient raise propagates like a process
    # death; checkpoints hold epoch 1, the crashed epoch's partial train
    # logs are already in metrics.jsonl
    res_dir = str(tmp_path / "resumed")
    tr2 = small_trainer()
    calls = {"e2": 0}

    def dying_step(state, batch, key, epoch):
        if epoch == 2:
            calls["e2"] += 1
            if calls["e2"] == 2:  # mid-epoch: step 1 already ran and logged
                raise RuntimeError(
                    "simulated SIGKILL: process died mid-epoch")
        return tr2.default_step_fn(state, batch, key, epoch)

    with pytest.raises(RuntimeError, match="simulated SIGKILL"):
        loop.fit(tr2, tr2.init_state(jax.random.key(0)), dm,
                 max_epochs=epochs, out_dir=res_dir, log_every=1,
                 train_step_fn=dying_step)
    # resume from the wreckage: fresh process == fresh trainer + a
    # decoy init key, all real state must come from the checkpoints
    tr3 = small_trainer()
    s_res, iou_res, _ = loop.fit(
        tr3, tr3.init_state(jax.random.key(99)), dm, max_epochs=epochs,
        out_dir=res_dir, resume=True, log_every=1,
        train_step_fn=tr3.default_step_fn)

    assert iou_res == pytest.approx(iou_full, abs=1e-6)
    full_vals = val_rows(full_dir)
    res_vals = val_rows(res_dir)
    # resumed log = epochs 0,1 + (partial epoch 2: no val) + epochs 2,3
    assert len(full_vals) == epochs and len(res_vals) == epochs
    np.testing.assert_allclose(np.asarray(res_vals), np.asarray(full_vals),
                               rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_background_batches_releases_producer_on_abandon():
    import threading
    import time as _time
    from sim2real_lane_segment_tpu.data.prefetch import background_batches

    produced = []

    def infinite():
        i = 0
        while True:
            produced.append(i)
            yield i
            i += 1

    it = background_batches(infinite, size=2)
    assert next(it) == 0
    it.close()  # abandon mid-stream (what an epoch retry does)
    _time.sleep(1.5)
    n = len(produced)
    _time.sleep(1.0)
    # producer must have stopped — a blocked q.put would keep it alive
    assert len(produced) == n


def test_fit_retries_transient_backend_error(tmp_path, rng, monkeypatch):
    from sim2real_lane_segment_tpu.data.modules import SimulatorDataModule
    from sim2real_lane_segment_tpu.train import loop

    monkeypatch.setattr(loop, "_RETRY_SLEEP_S", 0.01)
    root = make_sim_tree(tmp_path, rng)
    dm = SimulatorDataModule(data_path=root, batch_size=4)
    dm.setup()
    tr = small_trainer()
    calls = {"n": 0}

    def flaky_step(state, batch, key, epoch):
        calls["n"] += 1
        if calls["n"] == 2:  # mid-epoch, after the state was donated once
            raise ValueError("RESOURCE_EXHAUSTED: TPU backend error "
                             "(ResourceExhausted)")
        images, labels = batch
        return tr.train_step(state, images, labels, key, tr.lr_at(epoch))

    _, best_iou, _ = loop.fit(tr, tr.init_state(jax.random.key(0)), dm,
                              max_epochs=1, out_dir=str(tmp_path / "r"),
                              train_step_fn=flaky_step)
    assert best_iou >= 0
    assert calls["n"] >= 3  # first attempt died and the epoch was replayed


def test_fit_releases_device_cache_on_repeated_oom(tmp_path, rng,
                                                   monkeypatch):
    """Two RESOURCE_EXHAUSTED failures in one epoch must free the
    device-resident dataset caches (HBM relief valve) and the run must
    finish on host reads (loop._fit_epochs + modules.release_device_cache)."""
    from sim2real_lane_segment_tpu.data.modules import SimulatorDataModule
    from sim2real_lane_segment_tpu.train import loop

    monkeypatch.setattr(loop, "_RETRY_SLEEP_S", 0.01)
    root = make_sim_tree(tmp_path, rng)
    dm = SimulatorDataModule(data_path=root, batch_size=4, device_cache=True)
    dm.setup()
    tr = small_trainer()
    calls = {"n": 0}

    def oom_while_cached(state, batch, key, epoch):
        calls["n"] += 1
        if dm.device_cache and calls["n"] >= 2:
            raise ValueError("RESOURCE_EXHAUSTED: TPU backend error "
                             "(ResourceExhausted)")
        images, labels = batch
        return tr.train_step(state, images, labels, key, tr.lr_at(epoch))

    assert dm.train_scan_inputs(0) is not None  # caches resident
    _, best_iou, _ = loop.fit(tr, tr.init_state(jax.random.key(0)), dm,
                              max_epochs=1, out_dir=str(tmp_path / "r"),
                              train_step_fn=oom_while_cached)
    assert best_iou >= 0
    assert not dm.device_cache          # relief valve fired
    assert dm.train_scan_inputs(0) is None
    assert dm._views == {}


def test_fit_falls_back_to_per_batch_on_scan_compile_failure(
        tmp_path, rng, monkeypatch):
    """A non-transient failure of the scanned dispatch (observed: the
    remote compile helper dying on the big scanned graph) must replay the
    epoch on the per-batch path instead of crashing the run."""
    from sim2real_lane_segment_tpu.data.modules import SimulatorDataModule
    from sim2real_lane_segment_tpu.train import loop

    root = make_sim_tree(tmp_path, rng)
    dm = SimulatorDataModule(data_path=root, batch_size=4, device_cache=True)
    dm.setup()
    tr = small_trainer()
    attempts = {"scan": 0}

    def broken_scan(state, arrays, idx_chunk, key, epoch):
        attempts["scan"] += 1
        raise RuntimeError("INTERNAL: remote_compile: HTTP 500: "
                           "tpu_compile_helper subprocess exit code 1")

    monkeypatch.setattr(type(tr), "run_scan_chunk",
                        lambda self, *a: broken_scan(*a))
    _, best_iou, _ = loop.fit(tr, tr.init_state(jax.random.key(0)), dm,
                              max_epochs=2, out_dir=str(tmp_path / "r"),
                              log_every=1)
    assert best_iou >= 0
    assert attempts["scan"] == 1  # tried once, then disabled for the run


def test_fit_does_not_retry_real_errors(tmp_path, rng):
    from sim2real_lane_segment_tpu.data.modules import SimulatorDataModule
    from sim2real_lane_segment_tpu.train.loop import fit

    root = make_sim_tree(tmp_path, rng)
    dm = SimulatorDataModule(data_path=root, batch_size=4)
    dm.setup()
    tr = small_trainer()

    def broken_step(state, batch, key, epoch):
        raise RuntimeError("a genuine bug")

    with pytest.raises(RuntimeError, match="genuine bug"):
        fit(tr, tr.init_state(jax.random.key(0)), dm, max_epochs=1,
            out_dir=str(tmp_path / "r"), train_step_fn=broken_step)


def test_restore_prefers_latest_channel(tmp_path):
    from sim2real_lane_segment_tpu.train.checkpoint import TrainCheckpointManager
    from sim2real_lane_segment_tpu.train.loop import _restore_for_resume

    tr = small_trainer()
    s_best = tr.init_state(jax.random.key(0))
    s_latest = tr.init_state(jax.random.key(1))
    out_dir = str(tmp_path / "run")
    best_mgr = TrainCheckpointManager(os.path.join(out_dir, "checkpoints"))
    latest_mgr = TrainCheckpointManager(
        os.path.join(out_dir, "checkpoints_latest"), monitor="epoch")
    best_mgr.save(0, s_best, metrics={"val_iou": 41.5})
    latest_mgr.save(3, s_latest, metrics={"epoch": 3.0})
    best_mgr.wait()
    latest_mgr.wait()

    state, best_iou, best_state, start_epoch, step = _restore_for_resume(
        best_mgr, latest_mgr, out_dir, tr.init_state(jax.random.key(7)),
        -1.0, None, 0)
    assert start_epoch == 4  # trained furthest wins for the live state
    assert best_iou == pytest.approx(41.5)

    def leaf(s):
        return np.asarray(jax.tree_util.tree_leaves(s.params)[0])

    np.testing.assert_array_equal(leaf(state), leaf(s_latest))
    np.testing.assert_array_equal(leaf(best_state), leaf(s_best))
    best_mgr.close()
    latest_mgr.close()
