"""sim2real_lane_segment_tpu — a TPU-native sim-to-real lane-segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
timurlenk07/sim2real_lane_segment (reference layout described in
/root/repo/SURVEY.md):

- ``models``   — FC-DenseNet (Tiramisu) family, EncDecNet, CycleGAN generator
                 as flax modules (NHWC, bf16-compute friendly).
- ``ops``      — the kernel layer that replaces cv2 / OpenGL / cuDNN surfaces:
                 bit-exact morphology + label extraction, on-device
                 augmentation, resize, histogram matching, metrics.
- ``data``     — host-side data pipeline: directory-contract readers,
                 deterministic shard-aware samplers, double-buffered device
                 prefetch.
- ``train``    — jitted train/eval steps (supervised + MME adversarial),
                 optimizers and schedules with reference-parity semantics.
- ``core``     — mesh/runtime utilities: device mesh, dtype policy, PRNG
                 plumbing, orbax checkpointing.
- ``sim``      — TPU-native Duckietown data-generation (JAX rasterizer
                 replacing the reference's pyglet/OpenGL renderer).
"""

__version__ = "0.1.0"
