"""Streaming inference service tests (serving.py): batch aggregation,
bucket padding, and the ZMQ round trip."""
import threading
import time

import numpy as np
import pytest

from sim2real_lane_segment_tpu.serving import (BatchingEngine,
                                               SegmentationClient, _bucket,
                                               serve_inference)

H, W = 12, 16


def make_engine(calls, **kw):
    def predict(frames):
        calls.append(frames.shape[0])
        return frames[..., 0]  # deterministic per-frame "mask"

    kw.setdefault("max_batch", 8)
    kw.setdefault("max_wait_ms", 30.0)
    return BatchingEngine(predict, height=H, width=W, **kw)


def rand_frames(n, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (n, H, W, 3), dtype=np.uint8)


def test_bucket_sizes():
    assert [_bucket(n, 64) for n in (1, 2, 3, 5, 64, 100)] == \
        [1, 2, 4, 8, 64, 64]


def test_engine_single_and_batch():
    calls = []
    eng = make_engine(calls)
    try:
        f = rand_frames(3)
        out = eng.predict(f)
        assert out.shape == (3, H, W)
        np.testing.assert_array_equal(out, f[..., 0])
        # single unbatched frame keeps its rank through submit
        one = eng.predict(f[0])
        np.testing.assert_array_equal(one[0], f[0, :, :, 0])
        # every device call was a power-of-two bucket
        assert all(c in (1, 2, 4, 8) for c in calls)
    finally:
        eng.close()


def test_engine_aggregates_concurrent_requests():
    calls = []
    eng = make_engine(calls)
    try:
        frames = rand_frames(8, seed=1)
        outs = [None] * 8

        def one(i):
            outs[i] = eng.predict(frames[i])

        threads = [threading.Thread(target=one, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            np.testing.assert_array_equal(outs[i][0], frames[i, :, :, 0])
        # 8 concurrent 1-frame requests must have shared device batches
        assert len(calls) < 8
        assert sum(calls) >= 8
    finally:
        eng.close()


def test_engine_overflow_is_held_for_next_batch():
    calls = []
    eng = make_engine(calls, max_batch=4)
    try:
        a = eng.submit(rand_frames(3, seed=2))
        b = eng.submit(rand_frames(3, seed=3))
        a.wait(10)
        b.wait(10)
        # 3 + 3 > max_batch=4 -> two separate device batches
        assert len(calls) == 2
    finally:
        eng.close()


def test_engine_rejects_bad_shapes():
    eng = make_engine([])
    try:
        with pytest.raises(ValueError):
            eng.submit(np.zeros((1, H + 1, W, 3), np.uint8))
        with pytest.raises(ValueError):
            eng.submit(np.zeros((9, H, W, 3), np.uint8))  # > max_batch
    finally:
        eng.close()


def test_engine_surfaces_predict_errors():
    def boom(frames):
        raise RuntimeError("device on fire")

    eng = BatchingEngine(boom, height=H, width=W, max_batch=4,
                         max_wait_ms=5.0)
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            eng.predict(rand_frames(1))
    finally:
        eng.close()


def test_zmq_round_trip():
    zmq = pytest.importorskip("zmq")
    calls = []
    eng = make_engine(calls)
    # reserve then free a port for the server (tiny race is fine locally)
    res = zmq.Context.instance().socket(zmq.REP)
    port = res.bind_to_random_port("tcp://127.0.0.1")
    res.close(0)
    time.sleep(0.05)
    ready = threading.Event()
    srv = threading.Thread(
        target=serve_inference,
        kwargs=dict(engine=eng, host="127.0.0.1", port=port, ready=ready,
                    warmup=False), daemon=True)
    srv.start()
    assert ready.wait(10)
    cli = SegmentationClient("127.0.0.1", port, timeout_s=30)
    try:
        frames = rand_frames(4, seed=5)
        masks = cli.predict(frames)
        np.testing.assert_array_equal(masks, frames[..., 0])
        single = cli.predict(frames[0])
        np.testing.assert_array_equal(single, frames[0, :, :, 0])
        stats = cli.stats()
        assert stats["ok"] and stats["frames"] >= 5
        assert stats["mean_batch"] >= 1.0
    finally:
        assert cli.close_server()["ok"]
        srv.join(timeout=10)
        cli.close()
        eng.close()


def test_zmq_port_reservation_closes():
    # companion to the round-trip test: reserving sockets must not leak
    zmq = pytest.importorskip("zmq")
    s = zmq.Context.instance().socket(zmq.REP)
    p = s.bind_to_random_port("tcp://127.0.0.1")
    s.close(0)
    assert p > 0
