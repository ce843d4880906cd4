"""torch→flax weight-layout conversion parity.

Validates the layout converters in models/torch_import.py by comparing a
torch conv's output against a flax conv carrying the converted weights —
the primitive every imported reference checkpoint relies on.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from sim2real_lane_segment_tpu.models import torch_import as TI

torch = pytest.importorskip("torch")


def test_conv_kernel_layout(rng):
    x = rng.normal(size=(2, 9, 11, 5)).astype(np.float32)  # NHWC
    tconv = torch.nn.Conv2d(5, 7, 3, padding=1)
    with torch.no_grad():
        want = tconv(torch.tensor(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()

    fconv = nn.Conv(7, (3, 3), padding=1)
    params = {
        "kernel": jnp.asarray(TI.conv_kernel(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    got = np.asarray(fconv.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv_kernel_stride2(rng):
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1)
    with torch.no_grad():
        want = tconv(torch.tensor(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    fconv = nn.Conv(6, (3, 3), strides=(2, 2), padding=1)
    params = {
        "kernel": jnp.asarray(TI.conv_kernel(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    got = np.asarray(fconv.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_import_cyclegan_small(tmp_path, rng):
    """End-to-end import: a small torch generator-like Sequential's convs
    land in creation order on a same-shape flax tree."""
    tmodel = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, padding=1), torch.nn.ReLU(),
        torch.nn.Conv2d(8, 3, 3, padding=1))
    path = tmp_path / "w.pt"
    torch.save(tmodel.state_dict(), str(path))

    class FMini(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(8, (3, 3), padding=1)(x))
            return nn.Conv(3, (3, 3), padding=1)(x)

    fmodel = FMini()
    x = rng.normal(size=(1, 6, 6, 3)).astype(np.float32)
    template = fmodel.init(jax.random.key(0), jnp.asarray(x))["params"]
    imported = TI.import_cyclegan_state_dict(str(path), template)

    got = np.asarray(fmodel.apply({"params": imported}, jnp.asarray(x)))
    with torch.no_grad():
        want = tmodel(torch.tensor(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)
