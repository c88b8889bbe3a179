"""CLIP-GLaSS-TPU: TPU-native CLIP-guided generative latent-space search.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
galatolofederico/clip-glass (reference: /root/reference): genetic-algorithm /
NSGA-II search over the latent space of frozen generators (StyleGAN2,
BigGAN-deep, GPT-2), scored by a frozen CLIP ViT-B/32, solving text->image
and image->text.

Unlike the PyTorch reference — which drives a host-side numpy GA (pymoo) and
crosses the host<->device boundary twice per generation (reference
problem.py:14-29, latent.py:38) — this framework keeps the ENTIRE search
on-device: population, fitness, evolutionary operators, and the generative +
CLIP forward passes compile into one jitted program per generation, vmapped
over the population and sharded over a `jax.sharding.Mesh` for multi-chip
scaling.

Layout:
    core/        dtype policies, pytree/param utilities, checkpointing, profiling
    ops/         lax + Pallas compute kernels (modulated conv, upfirdn FIR,
                 attention, fused bias+act, minibatch-std, resize)
    models/      clip (ViT-B/32 image+text), stylegan2 (G mapping/synthesis, D),
                 biggan (BigGAN-deep 256/512), gpt2 (124M, scan decode)
    tokenizers/  CLIP BPE + GPT-2 BPE (host-side, dependency-free)
    evolve/      on-device GA / NSGA-II: sampling, SBX, PM, HUX, bitflip,
                 tournament, non-dominated sort, crowding, dedup, mixed masks
    fitness/     latent decode + generate -> norm -> resize -> CLIP -> cosine
                 (+ discriminator hinge) as one jittable population evaluation
    parallel/    mesh construction + shard_map population sharding
    weights/     torch checkpoint -> JAX pytree converters
    utils/       image grids, Pareto plots, IO
"""

__version__ = "0.1.0"

from clip_glass_tpu.config import get_config, list_configs  # noqa: F401
