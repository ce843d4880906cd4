"""ZMQ gym-server + robot bridge (reference launcher.py / duckiebot_env.py).

The reference exposed two network seams:
- a headless gym server publishing observations and pulling commands over
  ZMQ (launcher.py:44-84, duckietown-start-gym console script), and
- ``DuckiebotEnv``, driving a physical robot at ``akira.local:7777`` with
  numpy-array-over-zmq framing (duckiebot_env.py:31-38).

Both are host-side I/O shims around the TPU sim/compute path, rebuilt here
with the same wire shape: JSON header + raw buffer per numpy array.
"""
from __future__ import annotations

import json
import logging
import os

import numpy as np

log = logging.getLogger(__name__)


def send_array(socket, arr: np.ndarray, flags: int = 0) -> None:
    """numpy-over-zmq: JSON metadata frame then the raw buffer."""
    header = dict(dtype=str(arr.dtype), shape=arr.shape)
    socket.send_json(header, flags | __import__("zmq").SNDMORE)
    socket.send(np.ascontiguousarray(arr), flags, copy=False)


def recv_array(socket, flags: int = 0) -> np.ndarray:
    header = socket.recv_json(flags)
    msg = socket.recv(flags)
    arr = np.frombuffer(msg, dtype=header["dtype"])
    return arr.reshape(header["shape"])


def serve(env, *, host: str = "0.0.0.0", port: int = 8902) -> None:
    """Blocking command/observation loop: REP socket — recv action JSON,
    step, reply with the observation array + reward/done metadata."""
    import zmq

    ctx = zmq.Context()
    sock = ctx.socket(zmq.REP)
    sock.bind(f"tcp://{host}:{port}")
    log.info("gym server listening on %s:%d", host, port)
    obs = env.reset()
    while True:
        msg = sock.recv_json()
        cmd = msg.get("cmd", "step")
        if cmd == "reset":
            obs = env.reset()
            reward, done, info = 0.0, False, {}
        elif cmd == "close":
            sock.send_json({"ok": True})
            break
        else:
            obs, reward, done, info = env.step(np.asarray(msg["action"]))
            if done:
                obs = env.reset()
        sock.send_json({"reward": float(reward), "done": bool(done)},
                       zmq.SNDMORE)
        send_array(sock, np.asarray(obs))


class DuckiebotEnv:
    """Physical-robot env over ZMQ (duckiebot_env.py:40 analog): actions
    out, camera frames in; same gym-ish reset/step surface."""

    def __init__(self, server_addr: str | None = None, server_port: int = 7777):
        import zmq

        addr = server_addr or os.environ.get("DUCKIEBOT_ADDR", "akira.local")
        ctx = zmq.Context()
        self.sock = ctx.socket(zmq.REQ)
        self.sock.connect(f"tcp://{addr}:{server_port}")
        log.info("connected to duckiebot at %s:%d", addr, server_port)

    def step(self, action):
        import zmq

        self.sock.send_json({"cmd": "step", "action": np.asarray(action).tolist()})
        meta = self.sock.recv_json(zmq.RCVMORE)
        obs = recv_array(self.sock)
        return obs, meta.get("reward", 0.0), meta.get("done", False), meta

    def reset(self):
        import zmq

        self.sock.send_json({"cmd": "reset"})
        self.sock.recv_json(zmq.RCVMORE)
        return recv_array(self.sock)

    def close(self):
        self.sock.send_json({"cmd": "close"})
        self.sock.recv()


def main(args=None) -> None:
    """``duckietown-start-gym`` analog: env-var-configured headless server
    (launcher.py:14-84)."""
    logging.basicConfig(level=logging.INFO)
    from .env import DuckietownEnv

    env = DuckietownEnv(
        map_name=os.environ.get("DTG_MAP", "small_loop"),
        domain_rand=os.environ.get("DTG_DOMAIN_RAND", "1") == "1")
    serve(env, port=int(os.environ.get("DTG_PORT", "8902")))


if __name__ == "__main__":
    main()
