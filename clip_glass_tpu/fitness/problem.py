"""GenerationProblem: config -> jittable population-fitness function.

Behavioral reference: reference problem.py:7-29. The reference's `_evaluate`
rebuilds a latent module, moves numpy to torch, loops minibatches, and copies
fitness back per generation; here `eval_fn` is a pure function the GA step
jits and (optionally) shards over the population mesh axis.
"""

from __future__ import annotations



from clip_glass_tpu.fitness.generator import Generator


class GenerationProblem:
    def __init__(self, config, policy=None, clip_weights: str = "random:0",
                 clip_cfg=None, model_cfg=None):
        self.config = config
        self.generator = Generator(config, policy=policy,
                                   clip_weights=clip_weights,
                                   clip_cfg=clip_cfg, model_cfg=model_cfg)

    @property
    def n_var(self) -> int:
        return self.config.n_var

    @property
    def n_obj(self) -> int:
        return self.config.n_obj

    def eval_fn(self):
        """The jittable (X, ctx, key) -> [pop, n_obj] fitness (minimized)."""
        gen = self.generator
        return lambda X, ctx, key=None: gen.eval_population(X, ctx, key)

    def make_algorithm(self, force_host_eval: bool = False):
        """force_host_eval=True builds the host-staged img2txt evaluation
        even where pure_callback is available (tests exercising the TPU
        production path on the CPU backend)."""
        from clip_glass_tpu.evolve.algorithm import make_algorithm
        gen = self.generator
        if gen.needs_host_eval or (force_host_eval
                                   and self.config.task == "img2txt"):
            return make_algorithm(
                self.config,
                lambda X, ctx, key=None: gen.host_eval_population(X, ctx, key),
                ctx=gen.bundle, host_eval=True)
        return make_algorithm(self.config, self.eval_fn(),
                              ctx=gen.bundle)
