"""Perceptual Path Length.

Behavioral reference: stylegan2/metrics/ppl.py — epsilon-perturbed latent
pairs (lerp in W / slerp in Z, full- or end-sampling, 148-163), perceptual
distance of the two synthesized images divided by epsilon^2, with 1st/99th
percentile filtering (225-229).

Distance is pluggable like FID (reference uses LPIPS-VGG16; the in-framework
default is the CLIP image tower's squared feature distance).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from clip_glass_tpu.models.stylegan2 import model as sg2


def lerp(a, b, t):
    return a + (b - a) * t


def slerp(a, b, t):
    """Spherical interpolation (reference stylegan2/utils.py:117-145)."""
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a_n * b_n, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1.0, 1.0))
    c = b_n - d * a_n
    c = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-10)
    return (a_n * jnp.cos(p) + c * jnp.sin(p)) * jnp.linalg.norm(
        a, axis=-1, keepdims=True)


class PPL:
    def __init__(self, g_params, model_cfg: sg2.SG2Config,
                 distance_fn: Callable, num_samples: int = 2048,
                 batch_size: int = 16, epsilon: float = 1e-4,
                 use_dlatent: bool = True, full_sampling: bool = True,
                 seed: int = 0):
        self.g_params = g_params
        self.cfg = model_cfg
        self.distance_fn = distance_fn
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.epsilon = epsilon
        self.use_dlatent = use_dlatent
        self.full_sampling = full_sampling
        self.seed = seed
        # jit ONCE: a fresh jax.jit wrapper per evaluate() would retrace
        # and recompile the full mapping+synthesis graph on every call
        # (seconds-to-minutes when registered as a per-checkpoint metric)
        self._jit_batch = jax.jit(self._batch_distances)

    def _batch_distances(self, key) -> jnp.ndarray:
        cfg = self.cfg
        B = self.batch_size
        k1, k2, kt, kn = jax.random.split(key, 4)
        z0 = jax.random.normal(k1, (B, cfg.latent_size))
        z1 = jax.random.normal(k2, (B, cfg.latent_size))
        t = (jax.random.uniform(kt, (B, 1)) if self.full_sampling
             else jnp.zeros((B, 1)))

        if self.use_dlatent:
            w0 = sg2.mapping_apply(self.g_params["mapping"], z0, cfg)
            w1 = sg2.mapping_apply(self.g_params["mapping"], z1, cfg)
            a = lerp(w0, w1, t)
            b = lerp(w0, w1, t + self.epsilon)
        else:
            za = slerp(z0, z1, t)
            zb = slerp(z0, z1, t + self.epsilon)
            a = sg2.mapping_apply(self.g_params["mapping"], za, cfg)
            b = sg2.mapping_apply(self.g_params["mapping"], zb, cfg)

        dl = jnp.concatenate([
            jnp.repeat(a[:, None, :], cfg.num_latents, axis=1),
            jnp.repeat(b[:, None, :], cfg.num_latents, axis=1)], axis=0)
        imgs = sg2.synthesis_apply(self.g_params["synthesis"], dl, cfg,
                                   noise="random", noise_key=kn)
        imgs01 = jnp.clip((imgs + 1.0) / 2.0, 0.0, 1.0)
        d = self.distance_fn(imgs01[:B], imgs01[B:])
        return d / (self.epsilon ** 2)

    def evaluate(self) -> float:
        key = jax.random.PRNGKey(self.seed)
        fn = self._jit_batch
        dists = []
        for _ in range(max(1, self.num_samples // self.batch_size)):
            key, sub = jax.random.split(key)
            dists.append(np.asarray(fn(sub)))
        d = np.concatenate(dists)
        # percentile filter (reference stylegan2/metrics/ppl.py:225-229)
        lo, hi = np.percentile(d, 1), np.percentile(d, 99)
        return float(d[(d >= lo) & (d <= hi)].mean())
