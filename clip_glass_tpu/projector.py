"""Latent-space projector: gradient-based inversion of a target image.

Behavioral reference: stylegan2/project.py — dlatent statistics from N
mapping samples (60-97), Adam on (dlatent, per-layer noise) with LPIPS
distance + multiscale noise regularization + per-step noise renormalization
(239-295), cosine-ramped learning rate with initial noise amplitude ramp
(245-251). This is the reference's gradient-based alternative to the GA
(unused by its run.py but part of the framework surface).

TPU-native: the whole optimization step (loss, grads, Adam update, noise
renorm) is one jitted function; `num_steps` iterations run as host-driven
jit calls so progress is observable.

The perceptual distance is pluggable: the reference uses LPIPS-VGG16
(stylegan2/external_models/lpips.py) whose pretrained weights cannot be
fetched here; the default `downsampled_l2` distance keeps the projector
functional end-to-end, and `metrics.lpips.LPIPS` can be passed when converted
weights are available.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from clip_glass_tpu.models.stylegan2 import model as sg2


def downsampled_l2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Default stand-in distance: L2 on 4x-downsampled images, per sample."""
    def down(x):
        B, C, H, W = x.shape
        x = x.reshape(B, C, H // 4, 4, W // 4, 4).mean(axis=(3, 5))
        return x
    d = down(a) - down(b)
    return jnp.mean(jnp.square(d), axis=(1, 2, 3))


@dataclasses.dataclass
class ProjectorConfig:
    num_steps: int = 1000
    dlatent_samples: int = 10000   # stats draw (reference project.py:60-97)
    initial_lr: float = 0.1
    lr_rampdown: float = 0.25
    lr_rampup: float = 0.05
    initial_noise_factor: float = 0.05
    noise_ramp: float = 0.75
    regularize_noise_weight: float = 1e5
    seed: int = 0


def lpips_distance(lpips_params, policy=None):
    """Projector-compatible perceptual distance from LPIPS-VGG16 params
    (reference project.py:166-168 builds exactly this: LPIPS eval on
    [0, 1]-range images). Pass the converted pretrained params — or
    random-init params from metrics.lpips.init for integration testing."""
    from clip_glass_tpu.core.dtypes import FP32
    from clip_glass_tpu.metrics.lpips import lpips

    pol = policy or FP32

    def distance(a, b):
        return lpips(lpips_params, a, b, pixel_min=0.0, pixel_max=1.0,
                     policy=pol)

    return distance


class Projector:
    def __init__(self, g_params, model_cfg: sg2.SG2Config,
                 distance: Optional[Callable] = None,
                 cfg: ProjectorConfig = None, lpips_params=None):
        """`lpips_params` switches the perceptual distance to LPIPS-VGG16
        (the reference's, stylegan2/project.py:239-295); otherwise
        `distance` or the downsampled-L2 stand-in is used."""
        self.g_params = g_params
        self.model_cfg = model_cfg
        self.cfg = cfg or ProjectorConfig()
        if lpips_params is not None:
            distance = lpips_distance(lpips_params)
        self.distance = distance or downsampled_l2

        # dlatent statistics (reference project.py:60-97)
        key = jax.random.PRNGKey(self.cfg.seed)
        z = jax.random.normal(key, (self.cfg.dlatent_samples,
                                    model_cfg.latent_size))
        w = jax.jit(lambda p, a: sg2.mapping_apply(p["mapping"], a, model_cfg))(
            g_params, z)
        self.dlatent_avg = jnp.mean(w, axis=0)
        self.dlatent_std = jnp.sqrt(
            jnp.sum(jnp.square(w - self.dlatent_avg)) / self.cfg.dlatent_samples)

        self._step_fn = jax.jit(self._build_step())

    def _lr_schedule(self, t: jnp.ndarray) -> jnp.ndarray:
        """Cosine rampdown + linear rampup (reference project.py:245-251)."""
        cfg = self.cfg
        ramp_down = jnp.minimum(1.0, (1.0 - t) / cfg.lr_rampdown)
        ramp_down = 0.5 - 0.5 * jnp.cos(ramp_down * math.pi)
        ramp_up = jnp.minimum(1.0, t / cfg.lr_rampup)
        return cfg.initial_lr * ramp_down * ramp_up

    def _noise_strength(self, t: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        return (self.dlatent_std * cfg.initial_noise_factor
                * jnp.square(jnp.maximum(0.0, 1.0 - t / cfg.noise_ramp)))

    def _build_step(self):
        cfg = self.cfg
        mcfg = self.model_cfg

        def synth(dlatents, noises):
            # s2d=False: the projector differentiates through synthesis
            # (see synthesis_apply docstring on domains under autodiff)
            return sg2.synthesis_apply(self.g_params["synthesis"], dlatents,
                                       mcfg, noise=list(noises), s2d=False)

        def noise_reg(noises):
            """Multiscale shift-correlation penalty (reference project.py:274-286)."""
            reg = 0.0
            for n in noises:
                n = n[None, None]  # [1,1,H,W]
                while True:
                    reg = reg + jnp.mean(n * jnp.roll(n, 1, axis=3)) ** 2 \
                              + jnp.mean(n * jnp.roll(n, 1, axis=2)) ** 2
                    if n.shape[3] <= 8:
                        break
                    B, C, H, W = n.shape
                    n = n.reshape(B, C, H // 2, 2, W // 2, 2).mean(axis=(3, 5))
            return reg

        def loss_fn(opt_vars, target, key, t):
            dlatents, noises = opt_vars
            noise_jitter = self._noise_strength(t) * jax.random.normal(
                key, dlatents.shape)
            imgs = synth(dlatents + noise_jitter, noises)
            imgs01 = jnp.clip((imgs + 1.0) / 2.0, 0.0, 1.0)
            dist = jnp.sum(self.distance(imgs01, target))
            reg = noise_reg(noises) * cfg.regularize_noise_weight
            return dist + reg, dist

        optim = optax.adam(1.0, b1=0.9, b2=0.999)  # lr folded via scale below

        def step(opt_vars, opt_state, target, key, t):
            # t = fraction of the TOTAL run in [0, 1), computed by the
            # caller from the actual step count so a project(num_steps=N)
            # override still completes the lr/noise schedules
            lr = self._lr_schedule(t)
            (loss, dist), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                opt_vars, target, key, t)
            updates, opt_state = optim.update(grads, opt_state, opt_vars)
            updates = jax.tree.map(lambda u: u * lr, updates)
            opt_vars = optax.apply_updates(opt_vars, updates)
            # per-step noise renormalization (reference project.py:288-295)
            dlatents, noises = opt_vars
            noises = [
                (n - jnp.mean(n)) / jnp.maximum(jnp.std(n), 1e-8) for n in noises]
            return (dlatents, noises), opt_state, loss, dist

        self._optim = optim
        return step

    def project(self, target01: jnp.ndarray, num_steps: Optional[int] = None,
                verbose: bool = False):
        """target01: [B, 3, H, W] in [0, 1]. Returns (dlatents, images01)."""
        cfg = self.cfg
        num_steps = num_steps or cfg.num_steps
        B = target01.shape[0]
        key = jax.random.PRNGKey(cfg.seed + 1)
        dlatents = jnp.broadcast_to(
            self.dlatent_avg[None, None, :],
            (B, self.model_cfg.num_latents, self.model_cfg.latent_size))
        k_noise, key = jax.random.split(key)
        noises = [jax.random.normal(k, s) for k, s in zip(
            jax.random.split(k_noise, len(self.model_cfg.noise_shapes())),
            self.model_cfg.noise_shapes())]
        opt_vars = (dlatents, noises)
        opt_state = self._optim.init(opt_vars)
        for i in range(num_steps):
            key, sub = jax.random.split(key)
            opt_vars, opt_state, loss, dist = self._step_fn(
                opt_vars, opt_state, target01, sub, jnp.float32(i / num_steps))
            if verbose and (i + 1) % max(1, num_steps // 10) == 0:
                print(f"project step {i + 1}/{num_steps} "
                      f"loss={float(loss):.4f} dist={float(dist):.4f}")
        dlatents, noises = opt_vars
        imgs = sg2.synthesis_apply(self.g_params["synthesis"], dlatents,
                                   self.model_cfg, noise=list(noises))
        return dlatents, jnp.clip((imgs + 1.0) / 2.0, 0.0, 1.0)
