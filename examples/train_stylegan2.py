#!/usr/bin/env python
"""Programmatic training example: the reference's StyleGAN2 Trainer workflow
(reference stylegan2/train.py:160-677) on the TPU-native trainer.

Covers the full surface: TrainerConfig (overlayable from YAML/JSON, the
reference's ConfigArgumentParser contract), logistic NS losses with lazy
R1/path-length regularization, style mixing, EMA Gs, gradient-accumulation
subdivisions, scalar-CSV + image-grid sinks (the reference's tensorboard
writer, train.py:620-635), and periodic checkpoints with latest-valid
discovery.

By default trains the TINY model on synthetic data for a handful of steps so
it runs in seconds on CPU; point --data at an image folder (and pass
--no-tiny) for real training. Multi-chip: pass --mesh to batch-shard reals
over all visible devices (GSPMD inserts the gradient all-reduces the
reference did with NCCL, train.py:275-430).

Run:
  python examples/train_stylegan2.py --iterations 4 [--mesh] [--data DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_batches(batch_size: int, resolution: int, seed: int = 0):
    """Stand-in data source: yields [B, 3, H, W] arrays in [-1, 1] (the
    contract of Trainer.train; reference train.py:465-477)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    while True:
        yield rng.uniform(-1.0, 1.0,
                          (batch_size, 3, resolution, resolution)
                          ).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=4)
    # reference-trainer CLI idiom: bool flags take yes/no/true/false values
    # (utils.misc.bool_type = reference stylegan2/utils.py:184, the coercion
    # reference train.py uses for its boolean arguments)
    from clip_glass_tpu.utils.misc import bool_type
    ap.add_argument("--tiny", type=bool_type, default=True, nargs="?",
                    const=True,
                    help="TINY test model (default); --tiny false trains "
                         "the full-size CONFIG_F 1024px model")
    ap.add_argument("--data", default=None,
                    help="image folder (utils.data.ImageFolder); synthetic "
                         "noise images when omitted")
    ap.add_argument("--mesh", type=bool_type, default=False, nargs="?",
                    const=True,
                    help="batch-shard reals over all visible devices")
    ap.add_argument("--tensorboard", type=bool_type, default=False,
                    nargs="?", const=True,
                    help="additionally write tensorboard event files under "
                         "<out>/logs/tb (needs a tensorboard backend; "
                         "reference train.py:620-635)")
    ap.add_argument("--out", default="./tmp_train_example")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_glass_tpu.models.stylegan2 import model as sg2
    from clip_glass_tpu.training.logging import TrainLogger
    from clip_glass_tpu.training.trainer import Trainer, TrainerConfig

    cfg = TrainerConfig(batch_size=args.batch_size,
                        checkpoint_every=0,  # checkpoint explicitly below
                        checkpoint_dir=os.path.join(args.out, "checkpoints"),
                        subdivisions=2,      # grad accumulation demo
                        seed=0)
    model_cfg = sg2.TINY if args.tiny else sg2.CONFIG_F
    mesh = None
    if args.mesh:
        from clip_glass_tpu.parallel import make_mesh
        mesh = make_mesh(axis="batch")
    # mesh=: constrains the in-step latent roots to the batch sharding so
    # the G/D activations stay data-parallel (see Trainer docstring)
    trainer = Trainer(model_cfg=model_cfg, cfg=cfg, mesh=mesh)

    if args.data:
        from clip_glass_tpu.utils.data import ImageFolder
        data = iter(ImageFolder(args.data, resolution=model_cfg.resolution,
                                batch_size=args.batch_size))
    else:
        data = synthetic_batches(args.batch_size, model_cfg.resolution)

    if args.mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharded = NamedSharding(mesh, P("batch"))
        base = data

        def shard(batches):
            for b in batches:
                yield jax.device_put(jnp.asarray(b), sharded)
        data = shard(base)

    # scalar CSV + image-grid sinks (reference train.py:620-635, 761-777);
    # --tensorboard mirrors both into event files under logs/tb
    sinks = TrainLogger(os.path.join(args.out, "logs"),
                        image_every=max(args.iterations // 2, 1),
                        tensorboard=args.tensorboard)
    logs = trainer.train(data, args.iterations, log_every=1, sinks=sinks)
    folder = trainer.save_checkpoint()

    # the EMA generator is what you sample from (reference train.py:293-302)
    key = jax.random.PRNGKey(1)
    z = jax.random.normal(key, (2, model_cfg.latent_size))
    imgs = jax.jit(lambda p, a: sg2.generator_apply(
        p, a, model_cfg, noise="random", noise_key=key))(
        trainer.state.gs_params, z)
    print(f"final logs: { {k: round(float(v), 4) for k, v in logs.items()} }")
    print(f"checkpoint: {folder}")
    print(f"Gs sample:  {tuple(imgs.shape)} in "
          f"[{float(np.min(np.asarray(imgs))):.2f}, "
          f"{float(np.max(np.asarray(imgs))):.2f}]")


if __name__ == "__main__":
    main()
