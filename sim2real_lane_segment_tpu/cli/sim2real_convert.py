"""CycleGAN domain-transfer CLI — the reference ``utils/sim2real_convert.py``.

Same interface (reference sim2real_convert.py:133-143): ``--dataPath``,
``--modelWeightsPath``, ``--batch_size``, ``--overwriteData`` (accepted,
unused — like the reference).  Applies a pretrained CycleGAN generator to
every ``**/input/*.png`` in place: bicubic-resize to 120x160, normalize
to [-1,1], generate, un-normalize, LANCZOS4-upscale back to 640x480.

Weights: either a flax msgpack tree or a torch ``.pt`` state dict (the
reference's format) converted via models/torch_import.py.
"""
from __future__ import annotations

import argparse
import glob
import logging
import math
import os

import cv2
import numpy as np

from . import common

log = logging.getLogger(__name__)


def main(args=None) -> int:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataPath", type=str, required=True)
    p.add_argument("--overwriteData", action="store_true", help="Currently unused.")
    p.add_argument("--modelWeightsPath", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_residual_blocks", type=int, default=9,
                   help="reference GeneratorResNet used 9 (sim2real_convert.py:90)")
    args = p.parse_args(args)
    common.setup_runtime()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..models.cyclegan import GeneratorResNet

    model = GeneratorResNet(num_residual_blocks=args.num_residual_blocks)

    x0 = jnp.zeros((1, 120, 160, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0)
    if args.modelWeightsPath.endswith((".pt", ".pth")):
        from ..models.torch_import import import_cyclegan_state_dict
        variables = {"params": import_cyclegan_state_dict(
            args.modelWeightsPath, variables["params"])}
    else:
        with open(args.modelWeightsPath, "rb") as f:
            variables = serialization.from_bytes(variables, f.read())

    @jax.jit
    def generate(batch_u8):
        # torch pipeline: ToTensor (RGB /255) then Normalize(.5,.5,.5)
        x = batch_u8.astype(jnp.float32) / 255.0
        x = (x - 0.5) / 0.5
        y = model.apply(variables, x)
        return jnp.clip((y + 1.0) / 2.0 * 255.0, 0, 255).astype(jnp.uint8)

    imgs = sorted(glob.glob(os.path.join(args.dataPath, "**", "input", "*.png"),
                            recursive=True))
    print(f"Found images length: {len(imgs)}")

    n_batches = math.ceil(len(imgs) / args.batch_size)
    for b in range(n_batches):
        paths = imgs[b * args.batch_size:(b + 1) * args.batch_size]
        batch = []
        for path in paths:
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            # torch path: cv2 BGR -> PIL bicubic resize; keep BGR order
            # end-to-end exactly like the reference did.
            img = cv2.resize(img, (160, 120), interpolation=cv2.INTER_CUBIC)
            batch.append(img)
        out = np.asarray(generate(np.stack(batch)))
        for path, img in zip(paths, out):
            up = cv2.resize(img, (640, 480), interpolation=cv2.INTER_LANCZOS4)
            cv2.imwrite(path, up)
        if (b + 1) % 20 == 0:
            log.info("batch %d/%d", b + 1, n_batches)
    return len(imgs)


if __name__ == "__main__":
    main()
