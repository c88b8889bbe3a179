"""StyleGAN2 trainer, TPU-native.

Behavioral reference: stylegan2/train.py — G/D alternating steps with
non-saturating logistic loss (505-600), LAZY regularization (R1 every 16
iterations, path-length every 4, with the interval-scaled learning-rate
correction, 101-124 and 946-958), style mixing prob 0.9 (130-131), moving
average generator Gs (293-302), checkpoint save/resume with latest-dir
discovery (820-939), pluggable metric registry (679-705), scalar logging.

TPU-native design:
- one jitted `train_step` = D phase + G phase + EMA update; regularizer
  phases enter via `lax.cond` on the step counter, so the whole schedule is
  a single compiled program — no per-phase python dispatch;
- distributed training is GSPMD over the batch axis of a `Mesh` (the
  reference's manual NCCL all_reduce/broadcast, train.py:400-430, is
  replaced by sharding annotations — gradients are reduced by XLA
  collectives automatically);
- optimizers are optax adam chains; EMA is a jitted tree lerp;
- checkpoints are npz pytrees + kwargs json, resumable mid-schedule.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Callable, Dict, Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clip_glass_tpu.core import pytree
from clip_glass_tpu.models.stylegan2 import model as sg2
from clip_glass_tpu.parallel import distributed as dist
from clip_glass_tpu.training import losses


@dataclasses.dataclass
class TrainerConfig:
    """Training hyperparameters. Overlayable from YAML files — the
    reference's yaml ConfigArgumentParser contract (stylegan2/
    utils.py:152-181) — or from JSON (same keys; used when pyyaml is
    absent)."""
    batch_size: int = 4
    g_lr: float = 2e-3
    d_lr: float = 2e-3
    beta1: float = 0.0
    beta2: float = 0.99
    eps: float = 1e-8
    # regularizer cadences (reference train.py:101-124); 0 disables the
    # phase STATICALLY (it is omitted from the compiled step entirely, like
    # the reference's pl_reg_weight/r1_reg_weight <= 0 branches,
    # loss_fns.py dispatch)
    g_reg_interval: int = 4        # path-length cadence
    d_reg_interval: int = 16       # R1 cadence
    r1_gamma: float = 10.0
    pl_weight: float = 2.0
    pl_decay: float = 0.01
    style_mix_prob: float = 0.9    # reference train.py:130-131
    # running-average dlatent EMA for truncation (reference
    # models.py:219-229, 461-465: updated during every training forward)
    dlatent_avg_beta: float = 0.995
    # Gradient-accumulation subdivisions (reference train.py:432-463,
    # 505-544): each optimizer step averages the grads of `subdivisions`
    # sequential micro-batches of batch_size/subdivisions — big effective
    # batches on small per-step memory. On TPU the accumulation is a
    # lax.scan inside the one jitted step.
    subdivisions: int = 1
    ema_beta: float = 0.999        # Gs moving average (reference train.py:293-302)
    checkpoint_dir: str = "./checkpoints"
    checkpoint_every: int = 10000  # in seen images (reference train.py:668-674)
    seed: int = 0

    @classmethod
    def from_file(cls, path: str, **overrides) -> "TrainerConfig":
        """Load an overlay file: .yaml/.yml via pyyaml (the reference's
        yaml.safe_load, stylegan2/utils.py:160-181), anything else JSON."""
        if path.endswith((".yaml", ".yml")):
            import yaml
            with open(path) as f:
                data = yaml.safe_load(f) or {}
        else:
            with open(path) as f:
                data = json.load(f)
        data.update(overrides)
        fields = {f.name for f in dataclasses.fields(cls)}
        unknown = sorted(set(data) - fields)
        if unknown:
            # a typo'd key silently training with defaults is the worst
            # failure mode of an overlay file; the reference's yaml
            # ConfigArgumentParser likewise rejects unknown options
            raise ValueError(f"unknown TrainerConfig keys in {path}: "
                             f"{unknown}; valid: {sorted(fields)}")
        return cls(**data)

    # back-compat alias (JSON was the only overlay format before round 3)
    from_json = from_file

    def to_json(self, path: str):
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=1)

    def to_yaml(self, path: str):
        import yaml
        with open(path, "w") as f:
            yaml.safe_dump(dataclasses.asdict(self), f)


class TrainState(NamedTuple):
    g_params: dict
    d_params: dict
    g_opt: object
    d_opt: object
    gs_params: dict          # EMA generator
    pl_avg: jnp.ndarray
    step: jnp.ndarray
    key: jnp.ndarray


def _lazy_lr(lr: float, beta1: float, beta2: float, interval: int):
    """Interval-scaled optimizer constants for lazy regularization
    (reference train.py:946-958)."""
    if interval <= 1:
        return lr, beta1, beta2
    c = interval / (interval + 1)
    return lr * c, beta1 ** c, beta2 ** c


class Trainer:
    def __init__(self, model_cfg: sg2.SG2Config = None,
                 cfg: TrainerConfig = None,
                 g_params=None, d_params=None, abstract: bool = False,
                 mesh=None, batch_axes=None):
        """With abstract=True nothing is materialized: `state` is a pytree
        of ShapeDtypeStructs, usable only to AOT-lower `_train_step` (the
        full-size sharded memory check in __graft_entry__.dryrun_multichip
        compiles the config-f 1024px step from shapes alone this way).

        `mesh` (+ `batch_axes`, default: all mesh axes) turns on GSPMD data
        parallelism INSIDE the step: the latent roots (z draws) and the
        reals are constrained to the batch sharding, so the generator/
        discriminator activations stay batch-sharded end to end. Without
        the constraint the fakes pipeline hangs off an unconstrained
        jax.random.normal and GSPMD is free to replicate the whole G
        forward per device — at 1024px that is the difference between
        ~2.5 and ~20 GiB/device. This replaces the reference's explicit
        NCCL all_reduce/broadcast (stylegan2/train.py:400-430): gradients
        reduce through XLA collectives wherever the batch axis contracts."""
        self.model_cfg = model_cfg or sg2.TINY
        self.cfg = cfg or TrainerConfig()
        self.mesh = mesh
        self.batch_axes = (tuple(batch_axes) if batch_axes is not None
                           else (tuple(mesh.axis_names) if mesh is not None
                                 else None))
        self.metrics: Dict[str, Callable] = {}
        key = jax.random.PRNGKey(self.cfg.seed)
        kg, kd, self._key = jax.random.split(key, 3)

        g_lr, gb1, gb2 = _lazy_lr(self.cfg.g_lr, self.cfg.beta1, self.cfg.beta2,
                                  self.cfg.g_reg_interval)
        d_lr, db1, db2 = _lazy_lr(self.cfg.d_lr, self.cfg.beta1, self.cfg.beta2,
                                  self.cfg.d_reg_interval)
        self.g_optim = optax.adam(g_lr, b1=gb1, b2=gb2, eps=self.cfg.eps)
        self.d_optim = optax.adam(d_lr, b1=db1, b2=db2, eps=self.cfg.eps)

        def build_state(kg, kd, key, g_params, d_params):
            if g_params is None:
                g_params = sg2.generator_init(kg, self.model_cfg)
            if d_params is None:
                d_params = sg2.discriminator_init(kd, self.model_cfg)
            return TrainState(
                g_params=g_params, d_params=d_params,
                g_opt=self.g_optim.init(g_params),
                d_opt=self.d_optim.init(d_params),
                gs_params=jax.tree.map(lambda x: x, g_params),
                pl_avg=jnp.zeros(()),
                step=jnp.zeros((), jnp.int32),
                key=key,
            )

        if abstract:
            self.state = jax.eval_shape(build_state, kg, kd, self._key,
                                        g_params, d_params)
        else:
            self.state = jax.jit(build_state)(kg, kd, self._key,
                                              g_params, d_params)
            if mesh is not None and dist.active():
                # multi-host mesh: the step's sharding constraints name a
                # process-spanning mesh, so its inputs must be GLOBAL
                # arrays — place the state replicated on the mesh (every
                # process built the identical value from the same seed)
                from jax.sharding import NamedSharding, PartitionSpec
                self.state = jax.device_put(
                    self.state, NamedSharding(mesh, PartitionSpec()))
        self._train_step = jax.jit(self._build_step())

    # ------------------------------------------------------------ model fns

    def _shard_batch(self, x):
        """Constrain a batch-leading tensor to the data-parallel sharding
        (no-op without a mesh). Applied at the latent ROOTS only — GSPMD
        propagates the batch axis through mapping/synthesis/D from there."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec
        spec = PartitionSpec(self.batch_axes)
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def _gen_dlatents(self, g_params, key, batch):
        """Latent -> per-layer dlatents with style mixing (reference
        stylegan2/utils.py:292-322 PriorGenerator + models.py:425-458)."""
        cfg = self.model_cfg
        k1, k2, k_mix, k_cut = jax.random.split(key, 4)
        z1 = self._shard_batch(jax.random.normal(k1, (batch, cfg.latent_size)))
        z2 = self._shard_batch(jax.random.normal(k2, (batch, cfg.latent_size)))
        w1 = sg2.mapping_apply(g_params["mapping"], z1, cfg)
        w2 = sg2.mapping_apply(g_params["mapping"], z2, cfg)
        n = cfg.num_latents
        cutoff = jax.random.randint(k_cut, (batch, 1), 1, n)
        mix = jax.random.uniform(k_mix, (batch, 1)) < self.cfg.style_mix_prob
        layer = jnp.arange(n)[None, :]
        use_w2 = mix & (layer >= cutoff)
        dl = jnp.where(use_w2[:, :, None],
                       jnp.repeat(w2[:, None, :], n, axis=1),
                       jnp.repeat(w1[:, None, :], n, axis=1))
        return dl

    def _synthesize(self, g_params, dlatents, key):
        # s2d=False: training differentiates through synthesis; the s2d
        # domain's per-style folded kernels are a frozen-inference trade
        # that multiplies autodiff's activation footprint (see
        # synthesis_apply docstring)
        return sg2.synthesis_apply(g_params["synthesis"], dlatents,
                                   self.model_cfg, noise="random",
                                   noise_key=key, s2d=False)

    def _d_apply(self, d_params, images):
        return sg2.discriminator_apply(d_params, images, self.model_cfg)

    # ------------------------------------------------------------ step

    def _build_step(self):
        cfg = self.cfg

        def d_loss_fn(d_params, g_params, reals, key):
            k_lat, k_noise = jax.random.split(key)
            dl = self._gen_dlatents(g_params, k_lat, reals.shape[0])
            fakes = jax.lax.stop_gradient(self._synthesize(g_params, dl, k_noise))
            loss = losses.d_logistic(self._d_apply(d_params, reals),
                                     self._d_apply(d_params, fakes))
            return loss

        def d_reg_fn(d_params, reals):
            return losses.r1_penalty(self._d_apply, d_params, reals,
                                     cfg.r1_gamma) * cfg.d_reg_interval

        def g_loss_fn(g_params, d_params, batch, key):
            k_lat, k_noise = jax.random.split(key)
            dl = self._gen_dlatents(g_params, k_lat, batch)
            fakes = self._synthesize(g_params, dl, k_noise)
            return losses.g_logistic_ns(self._d_apply(d_params, fakes))

        def g_reg_fn(g_params, batch, key, pl_avg):
            k_lat, k_y = jax.random.split(key)
            dl = self._gen_dlatents(g_params, k_lat, batch)

            def synth(p, d):
                return sg2.synthesis_apply(p["synthesis"], d, self.model_cfg,
                                           noise="none", s2d=False)

            pen, new_avg = losses.path_length_reg(
                synth, g_params, dl, k_y, pl_avg, cfg.pl_decay, cfg.pl_weight,
                shard=self._shard_batch)
            return pen * cfg.g_reg_interval, new_avg

        S = max(1, int(cfg.subdivisions))

        def _accum(fn, xs_tree):
            return accumulate_value_and_grads(fn, xs_tree, S)

        def step(state: TrainState, reals):
            key, kd, kg, k_avg, kgr = jax.random.split(state.key, 5)
            batch = reals.shape[0]
            if batch % S:
                raise ValueError(f"batch {batch} not divisible by "
                                 f"subdivisions {S}")
            sub = batch // S
            reals_s = reals.reshape((S, sub) + reals.shape[1:])

            # ---- D phase
            d_loss, d_grads = _accum(
                lambda xs: jax.value_and_grad(d_loss_fn)(
                    state.d_params, state.g_params, xs[0], xs[1]),
                (reals_s, jax.random.split(kd, S)))

            def with_r1(g):
                _, r1_grads = _accum(
                    lambda xs: (jnp.zeros(()),
                                jax.grad(d_reg_fn)(state.d_params, xs)),
                    reals_s)
                return jax.tree.map(jnp.add, g, r1_grads)

            if cfg.d_reg_interval > 0:
                do_d_reg = (state.step % cfg.d_reg_interval) == 0
                d_grads = jax.lax.cond(do_d_reg, with_r1, lambda g: g, d_grads)
            d_updates, d_opt = self.d_optim.update(d_grads, state.d_opt,
                                                   state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)

            # ---- G phase
            g_loss, g_grads = _accum(
                lambda k: jax.value_and_grad(g_loss_fn)(
                    state.g_params, d_params, sub, k),
                jax.random.split(kg, S))

            def with_pl(args):
                g, avg = args
                # pl_avg updates sequentially through the subdivisions, as in
                # the reference's per-subdivision backward calls
                def body(carry, k):
                    gacc, a = carry
                    (pen, new_a), pl_grads = jax.value_and_grad(
                        lambda p: g_reg_fn(p, sub, k, a), has_aux=True)(
                            state.g_params)
                    return (jax.tree.map(jnp.add, gacc, pl_grads), new_a), None

                zero_g = jax.tree.map(jnp.zeros_like, g)
                (pl_g, new_avg), _ = jax.lax.scan(
                    body, (zero_g, avg), jax.random.split(kgr, S))
                pl_g = jax.tree.map(lambda x: x / S, pl_g)
                return jax.tree.map(jnp.add, g, pl_g), new_avg

            if cfg.g_reg_interval > 0:
                do_g_reg = (state.step % cfg.g_reg_interval) == 0
                g_grads, pl_avg = jax.lax.cond(
                    do_g_reg, with_pl, lambda a: a, (g_grads, state.pl_avg))
            else:
                pl_avg = state.pl_avg
            g_updates, g_opt = self.g_optim.update(g_grads, state.g_opt,
                                                   state.g_params)
            g_params = optax.apply_updates(state.g_params, g_updates)

            # ---- dlatent_avg running EMA (reference models.py:461-465:
            # every training forward lerps the buffer toward the batch's
            # first-layer dlatent mean with dlatent_avg_beta; here once per
            # step from a fresh mapping batch — same fixed point, and the
            # mapping forward is negligible next to synthesis). Without
            # this, truncation on a self-trained model lerps toward the
            # init zeros vector.
            z_avg = self._shard_batch(
                jax.random.normal(k_avg, (sub, self.model_cfg.latent_size)))
            w_avg = sg2.mapping_apply(g_params["mapping"], z_avg,
                                      self.model_cfg).mean(axis=0)
            b = cfg.dlatent_avg_beta
            g_params = {**g_params,
                        "dlatent_avg": w_avg + (g_params["dlatent_avg"]
                                                - w_avg) * b}

            # ---- EMA Gs (reference train.py:293-302, 543-548)
            beta = cfg.ema_beta
            gs_params = jax.tree.map(lambda a, b: beta * a + (1 - beta) * b,
                                     state.gs_params, g_params)

            new_state = TrainState(g_params, d_params, g_opt, d_opt,
                                   gs_params, pl_avg, state.step + 1, key)
            # grad global-norms (reference utils.get_grad_norm_from_optimizer,
            # train.py:610-654) — computed on the pre-update grads the same
            # step applies, free next to the backward passes
            return new_state, {"d_loss": d_loss, "g_loss": g_loss,
                               "pl_avg": pl_avg,
                               "g_grad_norm": optax.global_norm(g_grads),
                               "d_grad_norm": optax.global_norm(d_grads)}

        return step

    # ------------------------------------------------------------ driving

    def train(self, data: Iterator[np.ndarray], iterations: int,
              log_every: int = 0, logger: Optional[Callable] = None,
              sinks=None):
        """data yields [B, 3, H, W] arrays in [-1, 1] (reference
        train.py:465-677). `sinks` is an optional training.logging.TrainLogger
        (tensorboard-equivalent scalar CSV + fixed-latent image grids,
        reference train.py:620-635, 761-777). Returns the last logs dict."""
        logs = {}
        # host-side step counter: int(self.state.step) would force a
        # device sync on the just-dispatched step every iteration,
        # serializing the loop against async dispatch
        step = int(self.state.step)
        for it in range(iterations):
            raw = next(data)
            if self.mesh is not None and dist.active():
                # each process's iterator yields ITS slice of the global
                # batch (the reference's per-rank DataLoader, train.py:465)
                reals = dist.global_batch_from_local(self.mesh, raw,
                                                     axis=self.batch_axes)
            else:
                reals = jnp.asarray(raw)
            self.state, logs = self._train_step(self.state, reals)
            step += 1
            seen = step * self.cfg.batch_size
            if log_every and (it + 1) % log_every == 0:
                vals = {k: float(v) for k, v in logs.items()}
                (logger or (lambda s, v: print(f"[{s}] {v}")))(step, vals)
                if sinks is not None:
                    sinks.log_scalars(vals, step)
            if sinks is not None:
                sinks.maybe_log_images(self, step)
            # fire when `seen` CROSSES a checkpoint_every boundary (a
            # divisibility test misses every boundary whose multiple isn't
            # hit exactly, e.g. batch 6 / every 10000)
            if self.cfg.checkpoint_every and (
                    seen // self.cfg.checkpoint_every
                    > (seen - self.cfg.batch_size) // self.cfg.checkpoint_every):
                self.save_checkpoint()
        return logs

    def register_metric(self, name: str, fn: Callable):
        """Pluggable metric registry (reference train.py:679-705)."""
        self.metrics[name] = fn

    def evaluate_metrics(self) -> Dict[str, float]:
        return {name: float(fn(self.state)) for name, fn in self.metrics.items()}

    # ------------------------------------------------------------ checkpoints

    def save_checkpoint(self, folder: Optional[str] = None) -> str:
        seen = int(self.state.step) * self.cfg.batch_size
        folder = folder or os.path.join(self.cfg.checkpoint_dir, str(seen))
        if not dist.is_primary():
            return folder  # rank-0 checkpointing (reference train.py:560-575)
        os.makedirs(folder, exist_ok=True)
        pytree.save_npz(os.path.join(folder, "G.npz"), self.state.g_params)
        pytree.save_npz(os.path.join(folder, "D.npz"), self.state.d_params)
        pytree.save_npz(os.path.join(folder, "Gs.npz"), self.state.gs_params)
        pytree.save_npz(os.path.join(folder, "G_opt.npz"),
                        _opt_to_tree(self.state.g_opt))
        pytree.save_npz(os.path.join(folder, "D_opt.npz"),
                        _opt_to_tree(self.state.d_opt))
        # kwargs.json LAST: with latest_checkpoint requiring the full file
        # set, a save killed mid-write can never present as complete
        with open(os.path.join(folder, "kwargs.json"), "w") as f:
            json.dump({"seen": seen, "pl_avg": float(self.state.pl_avg),
                       "step": int(self.state.step),
                       "trainer": dataclasses.asdict(self.cfg)}, f)
        return folder

    def load_checkpoint(self, folder: str):
        with open(os.path.join(folder, "kwargs.json")) as f:
            meta = json.load(f)
        # restore the list/dict pytree structure FIRST: the optimizer
        # template must be built from the list-structured params, or the
        # restored opt state carries the npz's dict('0','1',...) structure
        # — the next train step then fails on the tree mismatch (and for
        # >=10-element lists the lexicographic '0','1','10','2' flatten
        # order would silently mis-assign moments)
        g_params = _match(pytree.load_npz(os.path.join(folder, "G.npz")),
                          self.state.g_params)
        d_params = _match(pytree.load_npz(os.path.join(folder, "D.npz")),
                          self.state.d_params)
        gs_params = _match(pytree.load_npz(os.path.join(folder, "Gs.npz")),
                           self.state.gs_params)
        g_opt = _tree_to_opt(pytree.load_npz(os.path.join(folder, "G_opt.npz")),
                             self.g_optim.init(g_params))
        d_opt = _tree_to_opt(pytree.load_npz(os.path.join(folder, "D_opt.npz")),
                             self.d_optim.init(d_params))
        self.state = TrainState(
            g_params=g_params, d_params=d_params,
            g_opt=g_opt, d_opt=d_opt, gs_params=gs_params,
            pl_avg=jnp.asarray(meta["pl_avg"]),
            step=jnp.asarray(meta["step"], jnp.int32),
            key=self.state.key)

    @staticmethod
    def latest_checkpoint(root: str) -> Optional[str]:
        """Latest-valid-checkpoint discovery (reference train.py:893-939):
        directories named by images-seen, newest complete one wins."""
        if not os.path.isdir(root):
            return None
        # everything load_checkpoint reads must be present, or a partial
        # save (killed mid-write) would be picked and crash the resume
        required = {"kwargs.json", "G.npz", "D.npz", "Gs.npz",
                    "G_opt.npz", "D_opt.npz"}
        best, best_seen = None, -1
        for name in os.listdir(root):
            path = os.path.join(root, name)
            if not (os.path.isdir(path) and re.fullmatch(r"\d+", name)):
                continue
            if not required.issubset(set(os.listdir(path))):
                continue
            if int(name) > best_seen:
                best, best_seen = path, int(name)
        return best


def accumulate_value_and_grads(fn, xs_tree, S: int):
    """Mean of `fn`'s (value, grads) over S subdivision chunks — gradient
    accumulation (reference train.py:432-463, 505-544) as a lax.scan running
    sum, so peak memory is ONE chunk's activations. `xs_tree` leaves carry a
    leading S dimension; `fn(chunk)` returns (scalar, grad-pytree)."""
    def body(carry, xs):
        acc_v, acc_g = carry
        v, g = fn(xs)
        return (acc_v + v, jax.tree.map(jnp.add, acc_g, g)), None

    v0, g0 = fn(jax.tree.map(lambda x: x[0], xs_tree))
    if S == 1:
        return v0, g0
    (v, g), _ = jax.lax.scan(
        body, (v0, g0), jax.tree.map(lambda x: x[1:], xs_tree))
    return v / S, jax.tree.map(lambda x: x / S, g)


def _opt_to_tree(opt_state):
    leaves = jax.tree.leaves(opt_state)
    return {str(i): leaf for i, leaf in enumerate(leaves)}


def _tree_to_opt(tree, template):
    leaves = [tree[str(i)] for i in range(len(tree))]
    return jax.tree.unflatten(jax.tree.structure(template), leaves)


def _match(loaded, template):
    """Restore list/dict pytree structure from the npz nested dict (lists
    round-trip as dicts keyed '0','1',...)."""
    if isinstance(template, list):
        return [_match(loaded[str(i)], template[i]) for i in range(len(template))]
    if isinstance(template, dict):
        return {k: _match(loaded[k], template[k]) for k in template}
    return jnp.asarray(loaded)
