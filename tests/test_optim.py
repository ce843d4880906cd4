"""Optimizer/schedule parity vs torch: identical params+grads must produce
identical trajectories (the update rules the reference trained with)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sim2real_lane_segment_tpu.train import optim
from sim2real_lane_segment_tpu.train.schedules import cosine_annealing

torch = pytest.importorskip("torch")


def run_torch(opt_name, p0, grads, lr, wd):
    p = torch.nn.Parameter(torch.tensor(p0.copy()))
    if opt_name == "adamw":
        opt = torch.optim.AdamW([p], lr=lr, weight_decay=wd)
    else:
        opt = torch.optim.SGD([p], lr=lr, weight_decay=wd,
                              momentum=0.9, nesterov=True)
    traj = []
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
        traj.append(p.detach().numpy().copy())
    return traj


def run_ours(tx, p0, grads, lr):
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    traj = []
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optim.apply_updates(params, updates, lr)
        traj.append(np.asarray(params["w"]))
    return traj


@pytest.mark.parametrize("opt_name", ["adamw", "sgd"])
def test_optimizer_matches_torch(opt_name, rng):
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(6)]
    lr, wd = 1e-2, 1e-3
    tx = optim.adamw(wd) if opt_name == "adamw" else optim.sgd_nesterov(wd)
    ours = run_ours(tx, p0, grads, lr)
    theirs = run_torch(opt_name, p0, grads, lr, wd)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_cosine_matches_torch():
    lr0, ratio, t_max, epochs = 1e-3, 1e3, 25, 60
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr0)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, t_max, eta_min=lr0 / ratio)
    for epoch in range(epochs):
        want = opt.param_groups[0]["lr"]
        got = cosine_annealing(lr0, lr0 / ratio, t_max, epoch)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        sched.step()


def test_lr_factor_tree():
    params = {"featureExtractor": {"a": jnp.zeros(2)},
              "classifier": {"b": jnp.zeros(2)}}
    mask = optim.lr_factor_tree(
        params, lambda path: 1.0 if "featureExtractor" in path[0] else 0.0)
    assert float(mask["featureExtractor"]["a"]) == 1.0
    assert float(mask["classifier"]["b"]) == 0.0
