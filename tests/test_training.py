"""StyleGAN2 training subsystem tests: losses/penalties math, a short
training run on the TINY model (losses finite, params move, EMA follows),
lazy-reg scheduling, checkpoint save/discover/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.models.stylegan2 import model as sg2
from clip_glass_tpu.training import losses
from clip_glass_tpu.training.trainer import Trainer, TrainerConfig, _lazy_lr


# ------------------------------------------------------------ losses

def test_logistic_losses_values():
    zeros = jnp.zeros((4, 1))
    # softplus(0) = ln 2
    np.testing.assert_allclose(float(losses.g_logistic_ns(zeros)), np.log(2), rtol=1e-6)
    np.testing.assert_allclose(float(losses.d_logistic(zeros, zeros)),
                               2 * np.log(2), rtol=1e-6)
    assert float(losses.g_wgan(jnp.ones((4, 1)))) == -1.0
    assert float(losses.d_wgan(jnp.ones((4, 1)), jnp.zeros((4, 1)))) == -1.0


def test_r1_penalty_on_quadratic():
    # D(x) = sum(x^2): grad = 2x, ||grad||^2 = 4 sum(x^2)
    def d_apply(params, x):
        return jnp.sum(jnp.square(x), axis=(1, 2, 3), keepdims=False)[:, None]

    x = jnp.ones((2, 1, 2, 2))
    pen = losses.r1_penalty(d_apply, {}, x, gamma=10.0)
    np.testing.assert_allclose(float(pen), 10.0 * 0.5 * 4 * 4, rtol=1e-5)


def test_wgan_gp_unit_gradient_is_zero_penalty():
    # D(x) = sum(x) / sqrt(n): ||grad|| = 1 everywhere -> penalty 0
    def d_apply(params, x):
        n = x[0].size
        return jnp.sum(x, axis=(1, 2, 3))[:, None] / jnp.sqrt(n)

    x = jnp.ones((4, 1, 2, 2))
    pen = losses.d_wgan_gp(d_apply, {}, x, x * 0.5, jax.random.PRNGKey(0))
    assert float(pen) < 1e-6


def test_lazy_lr_scaling():
    lr, b1, b2 = _lazy_lr(2e-3, 0.0, 0.99, 16)
    c = 16 / 17
    np.testing.assert_allclose(lr, 2e-3 * c)
    np.testing.assert_allclose(b2, 0.99 ** c)
    assert _lazy_lr(1.0, 0.5, 0.9, 1) == (1.0, 0.5, 0.9)


def test_path_length_reg_updates_avg():
    cfg = sg2.TINY
    params = jax.jit(lambda k: sg2.generator_init(k, cfg))(jax.random.PRNGKey(0))
    dl = jnp.ones((2, cfg.num_latents, cfg.latent_size)) * 0.1

    def synth(p, d):
        return sg2.synthesis_apply(p["synthesis"], d, cfg, noise="none")

    pen, new_avg = losses.path_length_reg(synth, params, dl,
                                          jax.random.PRNGKey(1), jnp.zeros(()))
    assert np.isfinite(float(pen))
    assert float(new_avg) > 0.0


# ------------------------------------------------------------ trainer

@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    cfg = TrainerConfig(batch_size=4, checkpoint_every=0,
                        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt")))
    return Trainer(model_cfg=sg2.TINY, cfg=cfg)


def _data(batch=4, res=16):
    rng = np.random.default_rng(0)
    while True:
        yield rng.uniform(-1, 1, (batch, 3, res, res)).astype(np.float32)


def test_reg_interval_zero_statically_disables_phase():
    """interval=0 omits the regularizer from the compiled step (reference
    loss_fns.py's <=0 weight dispatch): training runs, pl_avg never moves
    (no path-length phase), and params still optimize."""
    cfg = TrainerConfig(batch_size=4, checkpoint_every=0,
                        d_reg_interval=0, g_reg_interval=0)
    tr = Trainer(model_cfg=sg2.TINY, cfg=cfg)
    g0 = np.asarray(tr.state.g_params["mapping"]["dense"][0]["w"]).copy()
    logs = tr.train(_data(), iterations=2)
    assert np.isfinite(float(logs["d_loss"]))
    assert float(tr.state.pl_avg) == 0.0
    assert not np.allclose(
        g0, np.asarray(tr.state.g_params["mapping"]["dense"][0]["w"]))


def test_training_steps_move_params(trainer):
    # dlatent_avg takes no gradient; check a live weight
    leaf = lambda p: p["mapping"]["dense"][0]["w"]
    g0 = leaf(trainer.state.g_params).copy()
    gs0 = leaf(trainer.state.gs_params).copy()
    logs = trainer.train(_data(), iterations=3)
    assert np.isfinite(float(logs["d_loss"]))
    assert np.isfinite(float(logs["g_loss"]))
    g1 = leaf(trainer.state.g_params)
    gs1 = leaf(trainer.state.gs_params)
    assert not np.allclose(np.asarray(g0), np.asarray(g1))       # optimized
    assert not np.allclose(np.asarray(gs0), np.asarray(gs1))     # EMA moved
    # EMA lags the raw params
    assert float(jnp.abs(gs1 - g0).max()) <= float(jnp.abs(g1 - g0).max()) + 1e-6
    assert int(trainer.state.step) == 3


def test_checkpoint_roundtrip_and_discovery(trainer, tmp_path):
    root = str(tmp_path / "ck")
    trainer.cfg.checkpoint_dir = root
    folder = trainer.save_checkpoint()
    assert Trainer.latest_checkpoint(root) == folder
    step_before = int(trainer.state.step)
    pl_before = float(trainer.state.pl_avg)
    g_before = np.asarray(trainer.state.g_params["mapping"]["dense"][0]["w"])
    # perturb, then restore
    trainer.train(_data(), iterations=1)
    trainer.load_checkpoint(folder)
    assert int(trainer.state.step) == step_before
    assert float(trainer.state.pl_avg) == pytest.approx(pl_before)
    np.testing.assert_array_equal(
        np.asarray(trainer.state.g_params["mapping"]["dense"][0]["w"]), g_before)


def test_metric_registry(trainer):
    trainer.register_metric("g_norm", lambda s: sum(
        float(jnp.sum(jnp.square(x))) for x in jax.tree.leaves(s.g_params)))
    vals = trainer.evaluate_metrics()
    assert "g_norm" in vals and vals["g_norm"] > 0


def test_trainer_config_json_overlay(tmp_path):
    cfg = TrainerConfig(batch_size=6, g_lr=1e-3)
    p = str(tmp_path / "cfg.json")
    cfg.to_json(p)
    loaded = TrainerConfig.from_json(p, d_lr=5e-4)
    assert loaded.batch_size == 6 and loaded.g_lr == 1e-3
    assert loaded.d_lr == 5e-4  # override wins


def test_trainer_config_yaml_overlay(tmp_path):
    """The reference's yaml ConfigArgumentParser contract
    (stylegan2/utils.py:160-181): .yaml overlays load via yaml.safe_load
    with CLI-style overrides winning."""
    pytest.importorskip("yaml")
    cfg = TrainerConfig(batch_size=6, g_lr=1e-3)
    p = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(p)
    loaded = TrainerConfig.from_file(p, d_lr=5e-4)
    assert loaded.batch_size == 6 and loaded.g_lr == 1e-3
    assert loaded.d_lr == 5e-4


# ------------------------------------------------------------ subdivisions

def test_accumulate_value_and_grads_is_exact_chunk_mean():
    """Gradient-accumulation subdivisions (reference train.py:432-463): the
    lax.scan accumulation must be EXACTLY the mean of per-chunk
    value_and_grad results — verified on a deterministic loss with
    per-chunk data and keys."""
    from clip_glass_tpu.training.trainer import accumulate_value_and_grads

    params = {"w": jnp.asarray([[1.0, -2.0], [0.5, 3.0]]),
              "b": jnp.asarray([0.1, -0.3])}
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(4, 8, 2)), jnp.float32)  # 4 chunks of 8
    keys = jax.random.split(jax.random.PRNGKey(5), 4)

    def loss(p, x, k):
        noise = jax.random.normal(k, x.shape[:1])
        y = jnp.tanh(x @ p["w"] + p["b"])
        return jnp.mean((y[:, 0] - noise) ** 2 + 0.1 * y[:, 1] ** 2)

    fn = lambda xs: jax.value_and_grad(loss)(params, xs[0], xs[1])
    v, g = jax.jit(lambda xt: accumulate_value_and_grads(fn, xt, 4))(
        (X, keys))

    vs, gs = zip(*[jax.value_and_grad(loss)(params, X[i], keys[i])
                   for i in range(4)])
    np.testing.assert_allclose(float(v), np.mean([float(x) for x in vs]),
                               rtol=1e-6)
    want = jax.tree.map(lambda *a: sum(a) / 4, *gs)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # S=1 passthrough
    v1, g1 = accumulate_value_and_grads(fn, (X[:1], keys[:1]), 1)
    np.testing.assert_allclose(float(v1), float(vs[0]), rtol=1e-6)


def test_subdivided_training_runs_and_checks_divisibility():
    cfg = TrainerConfig(batch_size=4, subdivisions=2, checkpoint_every=0)
    tr = Trainer(model_cfg=sg2.TINY, cfg=cfg)
    logs = tr.train(_data(), iterations=2)
    assert np.isfinite(float(logs["d_loss"]))
    assert np.isfinite(float(logs["g_loss"]))
    with pytest.raises(ValueError, match="divisible"):
        bad = Trainer(model_cfg=sg2.TINY,
                      cfg=TrainerConfig(batch_size=4, subdivisions=3,
                                        checkpoint_every=0))
        bad.train(_data(), iterations=1)


# ------------------------------------------------------------ logging sinks

def test_scalar_and_image_sinks(tmp_path):
    from clip_glass_tpu.training.logging import TrainLogger

    run_dir = str(tmp_path / "run")
    sinks = TrainLogger(run_dir, image_every=2, n_image_latents=4)
    cfg = TrainerConfig(batch_size=4, checkpoint_every=0)
    tr = Trainer(model_cfg=sg2.TINY, cfg=cfg)
    tr.train(_data(), iterations=4, log_every=1,
             logger=lambda s, v: None, sinks=sinks)

    rows = sinks.scalars.read()
    steps = sorted({s for s, _, _ in rows})
    tags = {t for _, t, _ in rows}
    assert steps == [1, 2, 3, 4]
    assert {"d_loss", "g_loss", "pl_avg"} <= tags
    assert all(np.isfinite(v) for _, _, v in rows)

    import os
    imgs = sorted(f for f in os.listdir(run_dir) if f.endswith(".jpg"))
    assert imgs == ["fakes_2.jpg", "fakes_4.jpg"]


def test_tensorboard_sink_roundtrip(tmp_path):
    """The optional event-file sink (reference train.py:620-635, 761-777)
    must write scalars and images that tensorboard can actually read back,
    with values matching the CSV sink's."""
    from clip_glass_tpu.training.logging import TensorboardSink, TrainLogger
    if not TensorboardSink.available():
        pytest.skip("no tensorboard backend installed")
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")
    import os

    run_dir = str(tmp_path / "run")
    sinks = TrainLogger(run_dir, image_every=2, n_image_latents=2,
                        tensorboard=True)
    cfg = TrainerConfig(batch_size=4, checkpoint_every=0)
    tr = Trainer(model_cfg=sg2.TINY, cfg=cfg)
    tr.train(_data(), iterations=2, log_every=1,
             logger=lambda s, v: None, sinks=sinks)
    sinks.tb.flush()
    sinks.tb.close()

    acc = ea_mod.EventAccumulator(
        os.path.join(run_dir, "tb"),
        size_guidance={ea_mod.SCALARS: 0, ea_mod.IMAGES: 0})
    acc.Reload()
    got = {(e.step, tag): e.value
           for tag in acc.Tags()["scalars"]
           for e in acc.Scalars(tag)}
    csv_rows = {(s, t): v for s, t, v in sinks.scalars.read()}
    assert set(got) == set(csv_rows)
    for k, v in csv_rows.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-5)
    # image grid at step 2 (image_every=2) landed as an image event
    img_tags = acc.Tags()["images"]
    assert any(t.startswith("fakes") for t in img_tags)


# ------------------------------------------------------------ review fixes

def test_dlatent_avg_tracks_mapping_mean(trainer):
    """The truncation running average must MOVE during training toward the
    mapping output mean (reference models.py:461-465) — a zero dlatent_avg
    would make truncation on a self-trained model lerp toward the origin."""
    before = np.asarray(trainer.state.g_params["dlatent_avg"]).copy()
    trainer.train(_data(), iterations=2)
    after = np.asarray(trainer.state.g_params["dlatent_avg"])
    assert not np.allclose(before, after)
    # and the EMA generator carries it too (reference MovingAverageModule
    # averages buffers as well as params)
    assert not np.allclose(
        np.asarray(trainer.state.gs_params["dlatent_avg"]), 0.0)


def test_trainer_config_rejects_unknown_keys(tmp_path):
    import json
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"g_lr": 1e-3, "d_reg_intervall": 4}))
    with pytest.raises(ValueError, match="d_reg_intervall"):
        TrainerConfig.from_file(str(p))


def test_latest_checkpoint_skips_partial_dirs(trainer, tmp_path):
    import os
    root = str(tmp_path / "ck2")
    trainer.cfg.checkpoint_dir = root
    complete = trainer.save_checkpoint()
    # a newer dir missing the optimizer files (save killed mid-write) must
    # not win the discovery
    partial = os.path.join(root, str(10 ** 9))
    os.makedirs(partial)
    for name in ("kwargs.json", "G.npz", "D.npz", "Gs.npz"):
        open(os.path.join(partial, name), "wb").close()
    assert Trainer.latest_checkpoint(root) == complete


def test_checkpoint_cadence_is_boundary_crossing(tmp_path):
    """seen=step*batch crossing checkpoint_every must fire even when the
    batch size does not divide the interval (6*step % 10 == 0 only every
    5 steps; the crossing test fires at steps 2, 4, 5, ...)."""
    cfg = TrainerConfig(batch_size=6, checkpoint_every=10,
                        checkpoint_dir=str(tmp_path / "ck3"))
    tr = Trainer(model_cfg=sg2.TINY, cfg=cfg)
    fired = []
    tr.save_checkpoint = lambda folder=None: fired.append(
        int(tr.state.step))  # stub: record instead of writing npz files
    tr.train(_data(batch=6), iterations=5)
    # seen after each step: 6, 12, 18, 24, 30 -> boundary crossings (of 10)
    # at 12, 24, 30; the old divisibility test (6*step % 10 == 0) would
    # have fired only at step 5
    assert fired == [2, 4, 5]


def test_training_continues_after_resume(tmp_path):
    """Training must continue from a loaded checkpoint: the restored
    optimizer state must carry the params' list structure (a template
    built from the raw npz dict crashed the next step on tree mismatch)."""
    cfg = TrainerConfig(batch_size=4, checkpoint_every=0,
                        checkpoint_dir=str(tmp_path / "ck4"))
    tr = Trainer(model_cfg=sg2.TINY, cfg=cfg)
    tr.train(_data(), iterations=1)
    folder = tr.save_checkpoint()
    tr2 = Trainer(model_cfg=sg2.TINY, cfg=cfg)
    tr2.load_checkpoint(folder)
    logs = tr2.train(_data(), iterations=2)
    assert np.isfinite(float(logs["g_loss"]))
    assert int(tr2.state.step) == 3
