"""GAN losses + regularizers for StyleGAN2 training.

Behavioral reference: stylegan2/loss_fns.py — non-saturating/saturating
logistic and WGAN generator losses (57-78, 251-260), logistic/WGAN(+GP)
discriminator losses (81-98, 263-347), R1/R2 gradient penalties (106-190),
and path-length regularization with its pl_avg EMA (42-49, 198-243).

All functions are pure and grad-able; gradient penalties use `jax.grad`
through the discriminator instead of torch autograd.grad graphs. Penalties
return (value, aux) so lazy regularization (reference stylegan2/train.py
G_reg_interval/D_reg_interval) can scale them by the interval outside.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


# ------------------------------------------------------------ G losses

def g_logistic_ns(fake_scores: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating logistic: softplus(-D(G(z))) (loss_fns.py:57-66)."""
    return jnp.mean(jax.nn.softplus(-fake_scores))


def g_logistic(fake_scores: jnp.ndarray) -> jnp.ndarray:
    """Saturating logistic: -softplus(D(G(z)))."""
    return jnp.mean(-jax.nn.softplus(fake_scores))


def g_wgan(fake_scores: jnp.ndarray) -> jnp.ndarray:
    """WGAN G loss: -D(G(z)) (loss_fns.py:251-260)."""
    return -jnp.mean(fake_scores)


# ------------------------------------------------------------ D losses

def d_logistic(real_scores: jnp.ndarray, fake_scores: jnp.ndarray) -> jnp.ndarray:
    """softplus(D(fake)) + softplus(-D(real)) (loss_fns.py:81-90)."""
    return jnp.mean(jax.nn.softplus(fake_scores)) + jnp.mean(jax.nn.softplus(-real_scores))


def d_wgan(real_scores: jnp.ndarray, fake_scores: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(fake_scores) - jnp.mean(real_scores)


def d_wgan_gp(d_apply: Callable, params, reals, fakes, key,
              gamma: float = 10.0) -> jnp.ndarray:
    """WGAN gradient penalty on interpolates (loss_fns.py:263-347)."""
    eps = jax.random.uniform(key, (reals.shape[0], 1, 1, 1))
    interp = eps * reals + (1 - eps) * fakes

    def score_sum(x):
        return jnp.sum(d_apply(params, x))

    grads = jax.grad(score_sum)(interp)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1)),
                             axis=1) + 1e-8)
    return gamma * jnp.mean(jnp.square(norms - 1.0))


# ------------------------------------------------------------ penalties

def r1_penalty(d_apply: Callable, params, reals, gamma: float = 10.0) -> jnp.ndarray:
    """R1: gamma/2 * E||grad_x D(x)||^2 on reals (loss_fns.py:106-148)."""
    def score_sum(x):
        return jnp.sum(d_apply(params, x))

    grads = jax.grad(score_sum)(reals)
    return (gamma * 0.5) * jnp.mean(
        jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1)), axis=1))


def r2_penalty(d_apply: Callable, params, fakes, gamma: float = 10.0) -> jnp.ndarray:
    """R2: same on fakes (loss_fns.py:151-190)."""
    return r1_penalty(d_apply, params, fakes, gamma)


def path_length_reg(synthesis_apply: Callable, params, dlatents, key,
                    pl_avg: jnp.ndarray, pl_decay: float = 0.01,
                    pl_weight: float = 2.0,
                    shard=lambda x: x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Path-length regularization (loss_fns.py:198-243): penalize deviation
    of |J^T y| from its running mean; returns (penalty, new_pl_avg).

    dlatents: [B, n_latents, D]. The random projection y ~ N(0,1)/sqrt(HW)
    contracts the image Jacobian to one vector per sample via a vjp.
    `shard` constrains the image-sized random projection to the caller's
    batch sharding (an unconstrained root this size invites GSPMD to
    replicate the whole vjp graph per device).
    """
    def synth(dl):
        return synthesis_apply(params, dl)

    imgs, vjp_fn = jax.vjp(synth, dlatents)
    H, W = imgs.shape[-2:]
    y = shard(jax.random.normal(key, imgs.shape)) / jnp.sqrt(H * W)
    (grads,) = vjp_fn(y)
    lengths = jnp.sqrt(jnp.mean(
        jnp.sum(jnp.square(grads), axis=-1), axis=-1) + 1e-8)  # [B]
    new_pl_avg = pl_avg + pl_decay * (jnp.mean(lengths) - pl_avg)
    penalty = pl_weight * jnp.mean(jnp.square(lengths - new_pl_avg))
    return penalty, new_pl_avg
