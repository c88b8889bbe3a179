#!/usr/bin/env python
"""Latent projection example: invert an image into StyleGAN2 W space
(reference stylegan2/project.py:60-295 — dlatent statistics, Adam over
(dlatents, per-layer noises), noise regularization + renormalization,
cosine LR ramp).

By default projects a synthetic target with the TINY random-weight model
(seconds on CPU). With real converted checkpoints:

  python examples/project_image.py --g G.npz --image face.png \\
      --lpips lpips_vgg16.npz --steps 1000

`--lpips` switches the perceptual distance to the reference's LPIPS-VGG16
(scripts/download_weights.sh fetches + converts it); without it a
downsampled-L2 stand-in keeps the example dependency-free.

Run:
  python examples/project_image.py [--steps 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--g", default=None,
                    help="converted generator params (.npz with cfg.json "
                         "sidecar); TINY random weights when omitted")
    ap.add_argument("--image", default=None,
                    help="target image path; a synthetic G sample when "
                         "omitted (so the loss has a reachable optimum)")
    ap.add_argument("--lpips", default=None,
                    help="converted LPIPS-VGG16 params (.npz)")
    ap.add_argument("--out", default="./tmp_project_example")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_glass_tpu.models.stylegan2 import model as sg2
    from clip_glass_tpu.projector import Projector, ProjectorConfig
    from clip_glass_tpu.utils.image import save_grid

    if args.g and args.g.endswith(".pth"):
        # reference {name,kwargs,state_dict} torch format
        from clip_glass_tpu.weights.convert_stylegan2 import load_pth
        g_params, model_cfg, _ = load_pth(args.g)
    elif args.g:
        # converted npz + cfg.json sidecar (scripts/convert_weights.py)
        import dataclasses
        import json

        from clip_glass_tpu.core import pytree
        g_params = pytree.restore_lists(pytree.load_npz(args.g))
        with open(os.path.splitext(args.g)[0] + "_cfg.json") as f:
            d = json.load(f)
        known = {f.name for f in dataclasses.fields(sg2.SG2Config)}
        model_cfg = sg2.SG2Config(
            **{k: tuple(v) if isinstance(v, list) else v
               for k, v in d.items() if k in known})
    else:
        model_cfg = sg2.TINY
        g_params = sg2.generator_init(jax.random.PRNGKey(0), model_cfg)

    if args.image:
        from clip_glass_tpu.utils.data import load_image
        target = load_image(args.image, model_cfg.resolution)[None]  # [-1,1]
        target01 = (jnp.asarray(target) + 1.0) / 2.0
    else:
        # project a G sample: the optimum is known to exist in-range
        z = jax.random.normal(jax.random.PRNGKey(7),
                              (1, model_cfg.latent_size))
        img = sg2.generator_apply(g_params, z, model_cfg, noise="random",
                                  noise_key=jax.random.PRNGKey(8))
        target01 = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    lpips_params = None
    if args.lpips:
        from clip_glass_tpu.core import pytree
        lpips_params = pytree.restore_lists(pytree.load_npz(args.lpips))

    cfg = ProjectorConfig(num_steps=args.steps,
                          dlatent_samples=1024 if args.g is None else 10000)
    proj = Projector(g_params, model_cfg, cfg=cfg, lpips_params=lpips_params)
    dlatents, images01 = proj.project(target01, verbose=True)

    os.makedirs(args.out, exist_ok=True)
    pair = np.concatenate([np.asarray(target01), np.asarray(images01)])
    save_grid(pair * 2.0 - 1.0,
              os.path.join(args.out, "target_vs_projected.jpg"), nrow=2)
    np.savez(os.path.join(args.out, "dlatents.npz"),
             dlatents=np.asarray(dlatents))
    d0 = float(proj.distance(target01, target01).sum())
    d1 = float(proj.distance(images01, target01).sum())
    print(f"distance(target, target) = {d0:.5f} (sanity 0)")
    print(f"distance(projected, target) = {d1:.5f} after {args.steps} steps")
    print(f"artifacts: {args.out}/target_vs_projected.jpg, dlatents.npz")


if __name__ == "__main__":
    main()
