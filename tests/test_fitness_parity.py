"""END-TO-END fitness parity: the complete jitted fitness chain
(decode -> synthesize -> biggan_norm -> 224-resize -> CLIP -> cosine
[+ denorm -> D -> hinge]) against a torch computation replicating the
reference's evaluation flow (reference problem.py:14-29, generator.py:29-59,
models.py:108-130, utils.py:14-21) with IDENTICAL weights on both sides."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.config import get_config
from clip_glass_tpu.fitness.problem import GenerationProblem
from clip_glass_tpu.models.clip import model as jclip
from clip_glass_tpu.models.stylegan2 import model as jsg2
from clip_glass_tpu.weights import convert_clip, convert_stylegan2

from reference_oracle import add_reference_path, import_reference_stylegan2, randomize_module

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

ref_models, _ = import_reference_stylegan2()
add_reference_path()
from clip.model import CLIP as TorchCLIP  # noqa: E402

CH = (16, 16, 24)
SG2_CFG = jsg2.SG2Config(latent_size=32, mapping_layers=3, channels=CH,
                         mbstd_group_size=2)
# CLIP small: image_resolution must be 224-like for the resize path; use 32
CLIP_KW = dict(embed_dim=64, image_resolution=32, vision_layers=2,
               vision_width=128, vision_patch_size=8, context_length=77,
               vocab_size=49408, transformer_width=64, transformer_heads=1,
               transformer_layers=2)


@pytest.fixture(scope="module")
def rig():
    # torch oracles with shared weights
    t_clip = TorchCLIP(**CLIP_KW)
    randomize_module(t_clip, seed=31, std=0.05)
    t_clip.eval()
    g_map = ref_models.GeneratorMapping(latent_size=32, num_layers=3, lr_mul=0.01)
    g_syn = ref_models.GeneratorSynthesis(latent_size=32, channels=list(CH),
                                          base_shape=(4, 4))
    G_t = ref_models.Generator(G_mapping=g_map, G_synthesis=g_syn)
    randomize_module(G_t, seed=32, std=0.5)
    G_t.eval()
    D_t = ref_models.Discriminator(channels=list(CH), mbstd_group_size=2,
                                   base_shape=(4, 4))
    randomize_module(D_t, seed=33, std=0.5)
    D_t.eval()

    # my problem with injected converted weights
    cfg = get_config("StyleGAN2_ffhq_d").replace(
        pop_size=8, dim_z=32, n_var=32, weights="random:0",
        target="a red flower", compute_dtype="float32")
    clip_cfg = jclip.CLIPConfig(**CLIP_KW)
    prob = GenerationProblem(cfg, clip_cfg=clip_cfg, model_cfg=SG2_CFG)
    gen = prob.generator
    gen.clip_params, _ = convert_clip.convert(t_clip.state_dict(), clip_cfg)
    gen.g_params = convert_stylegan2.convert_generator(G_t.state_dict(), SG2_CFG)
    gen.d_params = convert_stylegan2.convert_discriminator(D_t.state_dict(), SG2_CFG)
    gen.refresh_targets()

    # pin identical noise on both sides
    rng = np.random.default_rng(34)
    noises = [rng.normal(size=s).astype(np.float32)
              for s in SG2_CFG.noise_shapes()]
    gen.noise = [jnp.asarray(n) for n in noises]
    with torch.no_grad():
        G_t(torch.zeros(1, 32))
        G_t.static_noise(noise_tensors=[torch.from_numpy(n)[None, None]
                                        for n in noises])
    return prob, t_clip, G_t, D_t


def _torch_fitness(t_clip, G_t, D_t, X, target: str):
    """The reference evaluation flow in torch (problem.py:14-29)."""
    from clip_glass_tpu.tokenizers import tokenize
    tokens = torch.from_numpy(np.asarray(tokenize([target]), np.int64))
    with torch.no_grad():
        text_features = t_clip.encode_text(tokens)
        imgs = G_t(torch.from_numpy(X))                       # generate
        imgs = ((imgs + 1) / 2.0).clamp(0, 1)                 # biggan_norm
        r = F.interpolate(imgs, size=(32, 32), mode="bilinear",
                          align_corners=False)                # kornia.resize
        image_features = t_clip.encode_image(r)
        sim = torch.cosine_similarity(image_features, text_features)
        d = D_t(imgs * 2.0 - 1.0)                             # denorm -> D
        hinge = torch.relu(1.0 - d).squeeze(1)
    return np.column_stack((-sim.numpy(), hinge.numpy()))


def test_full_fitness_chain_parity(rig):
    prob, t_clip, G_t, D_t = rig
    rng = np.random.default_rng(35)
    X = rng.normal(size=(8, 32)).astype(np.float32)
    want = _torch_fitness(t_clip, G_t, D_t, X, "a red flower")
    gen = prob.generator
    got = np.asarray(jax.jit(lambda x, b: gen.eval_population(x, b))(
        jnp.asarray(X), gen.bundle))
    assert got.shape == want.shape == (8, 2)
    # objective 0: -cosine similarity; objective 1: hinge
    np.testing.assert_allclose(got[:, 0], want[:, 0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got[:, 1], want[:, 1], rtol=2e-3, atol=2e-3)


def test_fitness_ranking_parity(rig):
    """What the GA actually consumes: the ORDERING of candidates."""
    prob, t_clip, G_t, D_t = rig
    rng = np.random.default_rng(36)
    X = rng.normal(size=(8, 32)).astype(np.float32)
    want = _torch_fitness(t_clip, G_t, D_t, X, "a red flower")
    gen = prob.generator
    got = np.asarray(gen.eval_population(jnp.asarray(X), gen.bundle))
    # any pairwise ordering disagreement must involve a near-tie (float noise)
    for i in range(8):
        for j in range(8):
            if (got[i, 0] < got[j, 0]) != (want[i, 0] < want[j, 0]):
                assert abs(want[i, 0] - want[j, 0]) < 5e-3, (i, j)
