#!/usr/bin/env python
"""Multi-tenant serving: K text prompts, one compiled program.

The reference serves one `--target` per process (reference run.py:22). Here
K searches batch into a single vmapped generation step (evolve/batched.py,
DESIGN.md §11): the MXU sees batch K*pop, weights load once, and each
search keeps the reference's per-search dynamics bitwise (tested against K
independent runs in tests/test_batched.py).

Runs on CPU in ~a minute with TINY models; drop --tiny on a TPU (and add
--weights <ckpt-dir> for pretrained checkpoints).

  python examples/serve_batched.py --tiny \
      --prompt "a red flower" --prompt "a blue car"
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", action="append", default=None,
                    help="repeatable; one search per prompt")
    ap.add_argument("--config", default="StyleGAN2_ffhq_d")
    ap.add_argument("--generations", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--weights", default="random:0")
    ap.add_argument("--out", default="/tmp/serve_batched")
    args = ap.parse_args()
    prompts = args.prompt or ["a red flower", "a blue car", "an old house"]
    if args.tiny:  # tiny mode is a CPU smoke run; full size uses the TPU
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    import numpy as np

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.evolve.batched import make_batched, minimize_batched
    from clip_glass_tpu.evolve.decision import pick
    from clip_glass_tpu.fitness.problem import GenerationProblem

    config = get_config(args.config).replace(
        target=prompts[0], weights=args.weights)
    clip_cfg = model_cfg = None
    if args.tiny:
        from clip_glass_tpu.cli import _tinyfy
        config, clip_cfg, model_cfg = _tinyfy(config)

    # one problem (one weights bundle), K searches
    problem = GenerationProblem(config, clip_cfg=clip_cfg, model_cfg=model_cfg)
    balgo = make_batched(problem, prompts)
    results = minimize_batched(balgo, n_gen=args.generations,
                               key=jax.random.PRNGKey(0),
                               save_each=4, verbose=True)

    os.makedirs(args.out, exist_ok=True)
    for i, (prompt, res) in enumerate(zip(prompts, results)):
        if config.n_obj == 2:
            # decision on the rank-0 front only (reference run.py:103-113)
            from clip_glass_tpu.evolve.nds import non_dominated_rank
            front = np.asarray(
                non_dominated_rank(jax.numpy.asarray(res.pop_F))) == 0
            idx = pick(res.pop_F[front], (0, 1))
            X_best = np.atleast_2d(res.pop_X[front][idx])
        else:
            X_best = np.atleast_2d(res.pop_X[res.pop_F[:, 0].argmin()])
        img = problem.generator.generate(jax.numpy.asarray(X_best))
        path = os.path.join(args.out, f"search-{i:02d}.jpg")
        problem.generator.save(img, path)
        print(f"[{i}] {prompt!r}: best sim "
              f"{-float(res.pop_F[:, 0].min()):.4f} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
