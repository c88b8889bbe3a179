"""Checkpoint ingestion through the REAL on-disk formats: the reference's
{name, kwargs, state_dict} .pth files (written by its own save machinery,
reference stylegan2/models.py:160-209) and the convert_weights.py CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import FP32
from clip_glass_tpu.models.stylegan2 import model as jsg2
from clip_glass_tpu.weights import convert_stylegan2

from reference_oracle import import_reference_stylegan2, randomize_module

torch = pytest.importorskip("torch")
ref_models, _ = import_reference_stylegan2()

CH = (16, 16, 24)
CFG = jsg2.SG2Config(latent_size=32, mapping_layers=3, channels=CH,
                     mbstd_group_size=2)


@pytest.fixture(scope="module")
def pth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("weights")
    g_map = ref_models.GeneratorMapping(latent_size=32, num_layers=3, lr_mul=0.01)
    g_syn = ref_models.GeneratorSynthesis(latent_size=32, channels=list(CH),
                                          base_shape=(4, 4))
    G = ref_models.Generator(G_mapping=g_map, G_synthesis=g_syn)
    randomize_module(G, seed=41, std=0.5)
    D = ref_models.Discriminator(channels=list(CH), mbstd_group_size=2,
                                 base_shape=(4, 4))
    randomize_module(D, seed=42, std=0.5)
    # write the REAL reference serialization format
    ref_models.save(G.eval(), str(d / "G.pth"))
    ref_models.save(D.eval(), str(d / "D.pth"))
    return d, G, D


def test_load_pth_generator_matches_reference(pth_dir):
    d, G, _ = pth_dir
    params, cfg, kind = convert_stylegan2.load_pth(str(d / "G.pth"))
    assert kind == "G"
    assert cfg.channels == tuple(CH)
    assert cfg.latent_size == 32 and cfg.mapping_layers == 3

    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, 32)).astype(np.float32)
    noises = [rng.normal(size=s).astype(np.float32) for s in cfg.noise_shapes()]
    with torch.no_grad():
        G(torch.from_numpy(z))
        G.static_noise(noise_tensors=[torch.from_numpy(n)[None, None]
                                      for n in noises])
        want = G(torch.from_numpy(z)).numpy()
    got = np.asarray(jsg2.generator_apply(
        params, jnp.asarray(z), cfg, noise=[jnp.asarray(n) for n in noises],
        policy=FP32))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_load_pth_discriminator_matches_reference(pth_dir):
    d, _, D = pth_dir
    params, cfg, kind = convert_stylegan2.load_pth(str(d / "D.pth"))
    assert kind == "D"
    rng = np.random.default_rng(1)
    imgs = rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = D(torch.from_numpy(imgs)).numpy()
    got = np.asarray(jsg2.discriminator_apply(params, jnp.asarray(imgs), cfg,
                                              policy=FP32))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_convert_weights_cli(pth_dir, tmp_path):
    d, _, _ = pth_dir
    out = tmp_path / "converted"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/convert_weights.py", "stylegan2",
         str(d), str(out)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-500:]
    assert (out / "G.npz").exists() and (out / "D.npz").exists()
    from clip_glass_tpu.core import pytree
    loaded = pytree.load_npz(str(out / "G.npz"))
    assert "mapping" in loaded and "synthesis" in loaded
    # cfg sidecars written for torch-free npz reload
    assert (out / "G_cfg.json").exists() and (out / "D_cfg.json").exists()


def test_generator_loads_converted_npz_dir(pth_dir, tmp_path):
    """The fitness generator accepts a directory of converted npz pytrees +
    cfg sidecars (what scripts/download_weights.sh produces) and yields the
    same fitness as loading the reference .pth directly."""
    d, _, _ = pth_dir
    out = tmp_path / "converted"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/convert_weights.py", "stylegan2",
         str(d), str(out)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-500:]

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.clip import model as clip_model

    base = get_config("StyleGAN2_ffhq_d").replace(
        target="a face", pop_size=4, dim_z=32, n_var=32)
    X = jnp.asarray(np.random.default_rng(3).normal(size=(4, 32)), jnp.float32)

    F = {}
    for label, weights in (("pth", str(d)), ("npz", str(out))):
        problem = GenerationProblem(base.replace(weights=weights),
                                    clip_cfg=clip_model.TINY)
        assert problem.generator.model_cfg.channels == tuple(CH), label
        F[label] = np.asarray(problem.generator.eval_population(
            X, problem.generator.bundle))
    assert np.isfinite(F["pth"]).all()
    np.testing.assert_allclose(F["npz"], F["pth"], rtol=1e-5, atol=1e-5)

def _convert_dir(pth_dir_tuple, tmp_path):
    d, _, _ = pth_dir_tuple
    out = tmp_path / "converted"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/convert_weights.py", "stylegan2",
         str(d), str(out)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-500:]
    return out


def test_generator_prefers_ema_gs_npz(pth_dir, tmp_path):
    """When both Gs.npz (EMA) and G.npz (training snapshot) exist — the
    layout scripts/download_weights.sh produces from the NVIDIA pickles —
    the fitness generator must evaluate Gs, like the reference."""
    import shutil

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.core import pytree
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.clip import model as clip_model

    conv = _convert_dir(pth_dir, tmp_path)

    # dir A: G-only.  dir B: same + a distinct "EMA" Gs (G scaled by 1.5).
    # dir C: the scaled tree shipped AS G (the expected-answer control).
    dir_a, dir_b, dir_c = (tmp_path / n for n in ("a", "b", "c"))
    for dd in (dir_a, dir_b, dir_c):
        shutil.copytree(conv, dd)
    scaled = jax.tree.map(lambda x: 1.5 * x,
                          pytree.load_npz(str(conv / "G.npz")))
    pytree.save_npz(str(dir_b / "Gs.npz"), scaled)
    shutil.copy(conv / "G_cfg.json", dir_b / "Gs_cfg.json")
    pytree.save_npz(str(dir_c / "G.npz"), scaled)

    base = get_config("StyleGAN2_ffhq_d").replace(
        target="a face", pop_size=4, dim_z=32, n_var=32)
    X = jnp.asarray(np.random.default_rng(3).normal(size=(4, 32)), jnp.float32)
    F = {}
    for label, wdir in (("a", dir_a), ("b", dir_b), ("c", dir_c)):
        problem = GenerationProblem(base.replace(weights=str(wdir)),
                                    clip_cfg=clip_model.TINY)
        F[label] = np.asarray(problem.generator.eval_population(
            X, problem.generator.bundle))
    np.testing.assert_allclose(F["b"], F["c"], rtol=1e-6, atol=1e-6)
    assert not np.allclose(F["b"], F["a"], rtol=1e-3, atol=1e-3)


def test_gpt2_npz_cfg_sidecar_restores_n_head(tmp_path):
    """n_head is not recoverable from tensor shapes; the loader must honor
    the `<stem>_cfg.json` sidecar scripts/convert_weights.py writes (a
    64-dim 4-head model defeats the head_dim-64 fallback heuristic)."""
    import dataclasses
    import json

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.core import pytree
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.clip import model as clip_model
    from clip_glass_tpu.models.gpt2 import model as g2

    cfg = g2.GPT2Config(vocab_size=50257, n_positions=128, n_embd=64,
                        n_layer=2, n_head=4)
    params = jax.jit(lambda k: g2.init(k, cfg))(jax.random.PRNGKey(0))
    path = str(tmp_path / "gpt2.npz")
    pytree.save_npz(path, params)
    with open(str(tmp_path / "gpt2_cfg.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f)

    dog = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "examples", "gpt2_images", "dog.jpeg")
    base = get_config("GPT2").replace(
        pop_size=4, batch_size=4, dim_z=6, n_var=6, max_tokens_len=5,
        weights=path, target=dog, compute_dtype="float32")
    problem = GenerationProblem(base, clip_cfg=clip_model.TINY)
    assert problem.generator.model_cfg == cfg
    assert problem.generator.model_cfg.n_head == 4  # heuristic would say 2


def test_biggan_npz_cfg_sidecar_and_override(tmp_path):
    """The BigGAN npz branch honors the cfg sidecar / explicit model_cfg
    override instead of hardcoding the resolution-keyed registry entry
    (which KeyErrors for non-standard resolutions)."""
    import dataclasses
    import json

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.core import pytree
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.biggan import model as bg
    from clip_glass_tpu.models.clip import model as clip_model

    params = jax.jit(lambda k: bg.init(k, bg.TINY))(jax.random.PRNGKey(0))
    path = str(tmp_path / "biggan_tiny.npz")
    pytree.save_npz(path, params)
    with open(str(tmp_path / "biggan_tiny_cfg.json"), "w") as f:
        json.dump(dataclasses.asdict(bg.TINY), f)

    base = get_config("DeepMindBigGAN256").replace(
        pop_size=4, batch_size=4, dim_z=16, num_classes=10, n_var=16 + 10,
        weights=path, target="a red flower", compute_dtype="float32",
        resolution=8)
    # sidecar path (no override): previously KeyError 'biggan-deep-8'
    problem = GenerationProblem(base, clip_cfg=clip_model.TINY)
    assert problem.generator.model_cfg == bg.TINY
    # explicit override wins
    problem2 = GenerationProblem(base, clip_cfg=clip_model.TINY,
                                 model_cfg=bg.TINY)
    assert problem2.generator.model_cfg == bg.TINY
