"""Resize parity vs the reference's kornia/bilinear semantics, and config
registry parity with the reference table (reference config.py:5-200)."""

import numpy as np
import pytest

import jax.numpy as jnp

from clip_glass_tpu.config import get_config, list_configs
from clip_glass_tpu.ops.resize import resize_bilinear

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_resize_matches_torch_bilinear(rng):
    """kornia.resize == F.interpolate(bilinear, align_corners=False)
    (reference generator.py:45); jax.image.resize('bilinear') must agree."""
    x = rng.uniform(0, 1, (2, 3, 37, 53)).astype(np.float32)
    with torch.no_grad():
        want = F.interpolate(torch.from_numpy(x), size=(24, 24),
                             mode="bilinear", align_corners=False).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), 24))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_registry_has_reference_configs():
    assert list_configs() == sorted([
        "GPT2", "DeepMindBigGAN256", "DeepMindBigGAN512",
        "StyleGAN2_ffhq_d", "StyleGAN2_car_d", "StyleGAN2_church_d",
        "StyleGAN2_ffhq_nod", "StyleGAN2_car_nod", "StyleGAN2_church_nod"])


@pytest.mark.parametrize("name,task,algo,pop,batch,n_var,n_obj,xl,xu", [
    # values from reference config.py:6-194
    ("GPT2", "img2txt", "ga", 100, 25, 20, 1, 0, 50256),
    ("DeepMindBigGAN256", "txt2img", "ga", 64, 32, 1128, 1, -2, 2),
    ("DeepMindBigGAN512", "txt2img", "ga", 32, 8, 1128, 1, -2, 2),
    ("StyleGAN2_ffhq_d", "txt2img", "nsga2", 16, 4, 512, 2, -10, 10),
    ("StyleGAN2_car_d", "txt2img", "nsga2", 16, 4, 512, 2, -10, 10),
    ("StyleGAN2_church_d", "txt2img", "nsga2", 16, 4, 512, 2, -10, 10),
    ("StyleGAN2_ffhq_nod", "txt2img", "ga", 16, 4, 512, 1, -10, 10),
    ("StyleGAN2_car_nod", "txt2img", "ga", 16, 4, 512, 1, -10, 10),
    ("StyleGAN2_church_nod", "txt2img", "ga", 16, 4, 512, 1, -10, 10),
])
def test_config_values_match_reference(name, task, algo, pop, batch, n_var,
                                       n_obj, xl, xu):
    c = get_config(name)
    assert c.task == task and c.algorithm == algo
    assert c.pop_size == pop and c.batch_size == batch
    assert c.problem_args["n_var"] == n_var
    assert c.problem_args["n_obj"] == n_obj
    assert c.problem_args["xl"] == xl and c.problem_args["xu"] == xu
    assert c.use_discriminator == (n_obj == 2)


def test_gpt2_config_details():
    c = get_config("GPT2")
    assert c.init_text == "the picture of"
    assert c.max_tokens_len == 30 and c.max_text_len == 50
    assert c.encoder_size == 50257 and c.stochastic is False


def test_biggan_config_details():
    c = get_config("DeepMindBigGAN512")
    assert c.dim_z == 128 and c.num_classes == 1000
    assert c.truncation == 1.0 and c.resolution == 512

def test_clip_checkpoint_hash_verification(tmp_path):
    from clip_glass_tpu.models.clip.api import available_models, verify_checkpoint
    assert available_models() == ["RN50", "ViT-B/32"]
    p = tmp_path / "fake.pt"
    p.write_bytes(b"not a checkpoint")
    assert verify_checkpoint(str(p), "ViT-B/32") is False
    with pytest.raises(KeyError):
        verify_checkpoint(str(p), "ViT-L/99")


def test_fullsize_eval_shapes_all_configs():
    """Trace the FULL-SIZE fitness evaluation of every registry config with
    abstract weights (jax.eval_shape — no arrays, no compile): catches
    shape/bookkeeping regressions in paths that only activate at production
    resolutions (e.g. the s2d offset lattices at >= 512 px), which the tiny
    model tests cannot reach."""
    import jax
    import jax.numpy as jnp

    from clip_glass_tpu.config import get_config, list_configs
    from clip_glass_tpu.fitness.problem import GenerationProblem

    for name in list_configs():
        config = get_config(name).replace(weights="abstract")
        if config.task == "img2txt":
            continue  # the BPE round trip is a host excursion, not traceable
        config = config.replace(target="a shape check")
        problem = GenerationProblem(config, clip_weights="abstract")
        gen = problem.generator
        X = jax.ShapeDtypeStruct((config.pop_size, config.n_var), jnp.float32)
        out = jax.eval_shape(lambda X, b: gen.eval_population(X, b),
                             X, gen.bundle)
        assert out.shape == (config.pop_size, config.n_obj), name
        assert out.dtype == jnp.float32, name
