"""LPIPS-VGG16 vs a plain-torch replica of the reference network
(the reference module itself requires torchvision downloads; its forward is
reference stylegan2/external_models/lpips.py:60-78)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.metrics import lpips as jlp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _torch_replica(params):
    """Build torch conv weights from the jax params for an exact oracle."""
    convs = {}
    for idx, p in params["convs"].items():
        w = torch.from_numpy(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)).copy())
        b = torch.from_numpy(np.asarray(p["b"]).copy())
        convs[int(idx)] = (w, b)
    heads = [torch.from_numpy(np.asarray(h).copy()) for h in params["heads"]]

    shift = torch.tensor([-.030, -.088, -.188]).view(1, -1, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, -1, 1, 1)

    def slice_apply(x, conv_ids, pre_pool):
        if pre_pool:
            x = F.max_pool2d(x, 2, 2)
        for ci in conv_ids:
            w, b = convs[ci]
            x = F.relu(F.conv2d(x, w, b, padding=1))
        return x

    def forward(x0, x1, eps=1e-8):
        x0 = (x0 - shift) / scale
        x1 = (x1 - shift) / scale
        dist = torch.zeros(x0.shape[0])
        for (conv_ids, pre_pool), head in zip(jlp._SLICES, heads):
            x0 = slice_apply(x0, conv_ids, pre_pool)
            x1 = slice_apply(x1, conv_ids, pre_pool)
            n0 = x0 * torch.rsqrt((x0 ** 2).sum(1, keepdim=True) + eps)
            n1 = x1 * torch.rsqrt((x1 ** 2).sum(1, keepdim=True) + eps)
            sq = ((n0 - n1) ** 2).mean(dim=[-1, -2])
            dist = dist + sq @ head
        return dist

    return forward


def test_lpips_matches_torch_replica():
    params = jlp.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x0 = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    x1 = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    fwd = _torch_replica(params)
    with torch.no_grad():
        want = fwd(torch.from_numpy(x0), torch.from_numpy(x1)).numpy()
    got = np.asarray(jax.jit(lambda p, a, b: jlp.lpips(p, a, b))(
        params, jnp.asarray(x0), jnp.asarray(x1)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_lpips_properties():
    params = jlp.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (2, 3, 32, 32)),
                    jnp.float32)
    d_same = np.asarray(jlp.lpips(params, x, x))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    y = jnp.flip(x, axis=-1)
    assert (np.asarray(jlp.lpips(params, x, y)) > 0).all()


def test_lpips_pixel_range_rescale():
    params = jlp.init(jax.random.PRNGKey(4))
    rng = np.random.default_rng(5)
    x01 = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)), jnp.float32)
    y01 = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)), jnp.float32)
    a = jlp.lpips(params, x01, y01, pixel_min=0.0, pixel_max=1.0)
    b = jlp.lpips(params, x01 * 2 - 1, y01 * 2 - 1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
