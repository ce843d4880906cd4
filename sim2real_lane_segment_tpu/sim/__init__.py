"""TPU-native Duckietown data-generation stack.

Replaces the reference's pyglet/OpenGL simulator
(rightLaneDatagen/gym_duckietown/) with a JAX ray-cast renderer: the tile
world is a texture-atlas gather over per-pixel ground-plane ray hits — a
pure vectorized memory-bound workload that batches over frames/agents and
runs on TPU.  The fork's core capability — pixel-aligned (normal,
annotated) frame pairs — is structural here: both frames share the exact
same rays and domain-randomization parameters, only the texture atlas
differs (the reference needed a `_perturb(use_last_noise=True)` replay
trick for this, simulator.py:759-781).
"""
from .maps import Map, load_map, builtin_map
from .env import Simulator, DuckietownEnv
