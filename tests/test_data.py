"""Data layer: directory contracts, sampler semantics, shard disjointness."""
import numpy as np
import pytest

from sim2real_lane_segment_tpu.data import samplers
from sim2real_lane_segment_tpu.data.datasets import RightLaneDataset
from sim2real_lane_segment_tpu.data.modules import (
    SimulatorDataModule, TwoDomainDataModule, TwoDomainMMEDataModule)

from helpers import make_sim_tree, make_simreal_tree, write_split


def test_dataset_contract(tmp_path, rng):
    root = make_sim_tree(tmp_path, rng)
    ds = RightLaneDataset(root + "/train", True)
    assert len(ds) == 8
    x, y = ds[0]
    assert x.shape == (48, 64, 3) and x.dtype == np.uint8
    assert y.shape == (48, 64)
    xb, yb = ds.read_batch([0, 1, 2])
    assert xb.shape == (3, 48, 64, 3) and yb.shape == (3, 48, 64)


def test_dataset_missing_dirs(tmp_path):
    with pytest.raises(ValueError):
        RightLaneDataset(str(tmp_path / "nope"), True)


def test_dataset_count_mismatch(tmp_path, rng):
    root = make_sim_tree(tmp_path, rng)
    import os
    os.remove(root + "/train/label/000000.png")
    with pytest.raises(FileNotFoundError):
        RightLaneDataset(root + "/train", True)


def test_dataset_setitem_roundtrip(tmp_path, rng):
    root = make_sim_tree(tmp_path, rng)
    ds = RightLaneDataset(root + "/train", False)
    new = np.full((48, 64, 3), 7, np.uint8)
    ds[0] = new
    x, _ = ds[0]
    np.testing.assert_array_equal(x, new)


def test_preload_matches_disk(tmp_path, rng):
    root = make_sim_tree(tmp_path, rng)
    ds1 = RightLaneDataset(root + "/train", True)
    ds2 = RightLaneDataset(root + "/train", True, load_into_memory=True)
    for i in range(len(ds1)):
        np.testing.assert_array_equal(ds1[i][0], ds2[i][0])
        np.testing.assert_array_equal(ds1[i][1], ds2[i][1])


def test_shuffle_epoch_deterministic():
    a = samplers.shuffle_epoch(100, 42, 3)
    b = samplers.shuffle_epoch(100, 42, 3)
    np.testing.assert_array_equal(a, b)
    c = samplers.shuffle_epoch(100, 42, 4)
    assert not np.array_equal(a, c)
    assert sorted(a) == list(range(100))


def test_two_domain_balance():
    """50/50 domain draws regardless of domain sizes (ref dataModules.py:74-85)."""
    idx = samplers.two_domain_epoch(1000, 100, seed=0, epoch=0)
    assert len(idx) == 1100
    frac_target = (idx >= 1000).mean()
    assert 0.45 < frac_target < 0.55
    assert idx.min() >= 0 and idx.max() < 1100


def test_mme_modulo_pairing():
    lab, unl = samplers.mme_epoch(30, 10, 50, seed=1, epoch=0)
    np.testing.assert_array_equal(unl, lab % 50)


def test_shard_disjoint_and_complete():
    idx = np.arange(64)
    shards = [samplers.shard(idx, s, 4, 4) for s in range(4)]
    allv = np.concatenate(shards)
    assert len(allv) == 64
    assert len(np.unique(allv)) == 64  # disjoint cover


def test_shard_drops_ragged_tail():
    idx = np.arange(70)
    shards = [samplers.shard(idx, s, 4, 4) for s in range(4)]
    assert all(len(s) == 16 for s in shards)  # 64 used, 6 dropped


def test_simulator_module_batches(tmp_path, rng):
    root = make_sim_tree(tmp_path, rng)
    dm = SimulatorDataModule(data_path=root, batch_size=4)
    dm.setup()
    batches = list(dm.train_batches(0))
    assert len(batches) == 2
    x, y = batches[0]
    assert x.shape == (4, 48, 64, 3) and y.shape == (4, 48, 64)
    # deterministic across re-iteration
    again = list(dm.train_batches(0))
    np.testing.assert_array_equal(batches[0][0], again[0][0])


def test_two_domain_module(tmp_path, rng):
    root = make_simreal_tree(tmp_path, rng)
    dm = TwoDomainDataModule(data_path=root, batch_size=4)
    dm.setup()
    batches = list(dm.train_batches(0))
    assert len(batches) == (8 + 4) // 4
    # val == test == target/test
    vx = [b for b in dm.val_batches()]
    tx = [b for b in dm.test_batches()]
    np.testing.assert_array_equal(vx[0][0], tx[0][0])


def test_mme_module(tmp_path, rng):
    root = make_simreal_tree(tmp_path, rng)
    dm = TwoDomainMMEDataModule(data_path=root, batch_size=4)
    dm.setup()
    for (x_lab, y), x_unl in dm.train_batches(0):
        assert x_lab.shape == (4, 48, 64, 3)
        assert y.shape == (4, 48, 64)
        assert x_unl.shape == (4, 48, 64, 3)


def test_mme_asserts_unlabelled_size(tmp_path, rng):
    root = make_simreal_tree(tmp_path, rng, n_unlabelled=2)
    dm = TwoDomainMMEDataModule(data_path=root, batch_size=4)
    with pytest.raises(AssertionError):
        dm.setup()


# -- device-resident cache (data/device_cache.py) ---------------------------

def _np(b):
    x, y = b
    return np.asarray(x), (np.asarray(y) if y is not None else None)


def test_device_cache_simulator_equivalence(tmp_path, rng):
    root = make_sim_tree(tmp_path, rng)
    host = SimulatorDataModule(data_path=root, batch_size=4)
    dev = SimulatorDataModule(data_path=root, batch_size=4, device_cache=True)
    host.setup(), dev.setup()
    for hb, db in zip(host.train_batches(3), dev.train_batches(3)):
        hx, hy = hb
        dx, dy = _np(db)
        np.testing.assert_array_equal(hx, dx)
        np.testing.assert_array_equal(hy, dy)
    for hb, db in zip(host.val_batches(), dev.val_batches()):
        np.testing.assert_array_equal(hb[0], _np(db)[0])


def test_device_cache_two_domain_equivalence(tmp_path, rng):
    root = make_simreal_tree(tmp_path, rng)
    host = TwoDomainDataModule(data_path=root, batch_size=4)
    dev = TwoDomainDataModule(data_path=root, batch_size=4, device_cache=True)
    host.setup(), dev.setup()
    for hb, db in zip(host.train_batches(1), dev.train_batches(1)):
        np.testing.assert_array_equal(hb[0], _np(db)[0])
        np.testing.assert_array_equal(hb[1], _np(db)[1])
    # val == test share one device view (keyed by dataset identity)
    list(dev.val_batches()), list(dev.test_batches())
    assert len(dev._views) == 2  # labelled-concat + the aliased eval split


def test_device_cache_mme_equivalence(tmp_path, rng):
    root = make_simreal_tree(tmp_path, rng)
    host = TwoDomainMMEDataModule(data_path=root, batch_size=4)
    dev = TwoDomainMMEDataModule(data_path=root, batch_size=4,
                                 device_cache=True)
    host.setup(), dev.setup()
    for ((hx, hy), hu), ((dx, dy), du) in zip(host.train_batches(0),
                                              dev.train_batches(0)):
        np.testing.assert_array_equal(hx, np.asarray(dx))
        np.testing.assert_array_equal(hy, np.asarray(dy))
        np.testing.assert_array_equal(hu, np.asarray(du))


def test_device_cache_host_fallback(tmp_path, rng):
    # after a (simulated) device-memory failure the view serves identical
    # batches from host reads in the same concat index space
    root = make_simreal_tree(tmp_path, rng)
    dm = TwoDomainDataModule(data_path=root, batch_size=4, device_cache=True)
    dm.setup()
    view = dm._view(dm.datasets["source"], dm.datasets["targetTrain"])
    idx = np.array([0, len(dm.datasets["source"]), 1, 2])
    dx, dy = view.gather(idx)
    view.images = view.labels = None  # simulate ResourceExhausted fallback
    hx, hy = view.gather(idx)
    np.testing.assert_array_equal(np.asarray(dx), hx)
    np.testing.assert_array_equal(np.asarray(dy), hy)
