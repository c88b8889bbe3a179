"""FULL-GEOMETRY random-weight oracle parity (slow lane, `pytest -m fullgeom`).

The fast parity suites verify every code path at toy geometry
(tests/test_{clip,stylegan2,gpt2}_parity.py, tests/test_biggan.py); this lane
runs ONE random-weight forward per model family at the *real* benchmarked
geometry against the in-repo torch reference, through the real converters, in
fp32/highest precision:

- StyleGAN2 config-f G (mapping + 18-style-layer synthesis, 1024px) + D
  (reference stylegan2/models.py:744-750 channel schedule)
- CLIP ViT-B/32 exact dims (reference clip/model.py:363-399 hyperparams)
- GPT-2 124M incl. the deterministic argmax decode (reference
  gpt2/config.py:8-16, gpt2/sample.py:21-36)
- BigGAN-deep-256 vs the transcribed HF oracle (reference models.py:65-86)

This closes the "tiny-config verified" -> "the thing we benchmark is
verified" gap to the extent an egress-less environment permits: accumulated
error over the full depth/width (18 style layers at 1024px, 12-layer towers)
is measured here, not extrapolated. Runtime is minutes on CPU, hence the
`fullgeom` marker (deselected by default via pyproject addopts).

Tolerances: stated per test. Random N(0, std) weights are HARDER than real
checkpoints for relative error (no learned conditioning keeps activations
centered), so these bounds are conservative for the pretrained path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import FP32

from reference_oracle import (add_reference_path, import_reference_stylegan2,
                              randomize_module)

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.fullgeom


# ------------------------------------------------------------ StyleGAN2 f

class TestStyleGAN2ConfigF:
    """config-f at 1024px: channels [32,32,64,128,256,512,512,512,512],
    latent 512, 8 mapping layers, 18 style layers (reference
    stylegan2/models.py:744-750, 890-896)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from clip_glass_tpu.models.stylegan2 import model as sg2
        from clip_glass_tpu.weights import convert_stylegan2 as conv

        ref_models, _ = import_reference_stylegan2()
        cfg = sg2.CONFIG_F
        g_map = ref_models.GeneratorMapping(latent_size=512, num_layers=8,
                                            lr_mul=0.01)
        g_syn = ref_models.GeneratorSynthesis(
            latent_size=512, channels=list(cfg.channels), base_shape=(4, 4))
        G = ref_models.Generator(G_mapping=g_map, G_synthesis=g_syn)
        randomize_module(G, seed=41, std=0.25)
        G.eval()
        gp = conv.convert_generator(G.state_dict(), cfg)

        D = ref_models.Discriminator(channels=list(cfg.channels),
                                     base_shape=(4, 4),
                                     mbstd_group_size=cfg.mbstd_group_size)
        randomize_module(D, seed=42, std=0.25)
        D.eval()
        dp = conv.convert_discriminator(D.state_dict(), cfg)
        return sg2, cfg, G, gp, D, dp

    def test_generator_1024px(self, setup):
        sg2, cfg, G, gp, _, _ = setup
        assert cfg.resolution == 1024 and cfg.num_latents == 18
        assert len(G) == 18
        rng = np.random.default_rng(0)
        z = rng.normal(size=(2, 512)).astype(np.float32)
        noises = [rng.normal(size=s).astype(np.float32)
                  for s in cfg.noise_shapes()]
        with torch.no_grad():
            G(torch.from_numpy(z))  # populate noise shapes
            G.static_noise(
                noise_tensors=[torch.from_numpy(n)[None, None] for n in noises])
            want = G(torch.from_numpy(z)).numpy()
        got = np.asarray(jax.jit(lambda p, a: sg2.generator_apply(
            p, a, cfg, noise=[jnp.asarray(n) for n in noises], policy=FP32)
        )(gp, jnp.asarray(z)))
        assert got.shape == want.shape == (2, 3, 1024, 1024)
        # 18 modulated-conv layers of accumulated fp32 reduction-order noise;
        # demodulation keeps activations O(1) so atol is the binding bound
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
        # signal-scale check: error must be tiny vs the image dynamic range
        assert np.abs(got - want).max() < 1e-2 * want.std()

    def test_discriminator_1024px(self, setup):
        sg2, cfg, _, _, D, dp = setup
        rng = np.random.default_rng(1)
        imgs = rng.uniform(-1, 1, (4, 3, 1024, 1024)).astype(np.float32)
        with torch.no_grad():
            want = D(torch.from_numpy(imgs)).numpy()
        got = np.asarray(jax.jit(lambda p, a: sg2.discriminator_apply(
            p, a, cfg, policy=FP32))(dp, jnp.asarray(imgs)))
        assert got.shape == want.shape == (4, 1)
        # scalar head after 9 resnet blocks: compare on the hinge scale the
        # GA consumes (reference problem.py:23)
        np.testing.assert_allclose(got, want, rtol=2e-3,
                                   atol=2e-3 * float(np.abs(want).max()))


# ------------------------------------------------------------ CLIP ViT-B/32

class TestCLIPViTB32:
    """Exact ViT-B/32 dims (reference clip/model.py:363-399 would infer these
    from the released checkpoint): embed 512, image 224, 12x768 vision tower
    patch 32, 12x512 text tower, vocab 49408."""

    @pytest.fixture(scope="class")
    def setup(self):
        from clip_glass_tpu.models.clip import model as jclip
        from clip_glass_tpu.weights import convert_clip

        add_reference_path()
        from clip.model import CLIP as TorchCLIP
        m = TorchCLIP(embed_dim=512, image_resolution=224, vision_layers=12,
                      vision_width=768, vision_patch_size=32,
                      context_length=77, vocab_size=49408,
                      transformer_width=512, transformer_heads=8,
                      transformer_layers=12)
        randomize_module(m, seed=43, std=0.02)
        m.eval()
        params, cfg = convert_clip.convert(m.state_dict())
        assert (cfg.vision_layers, cfg.vision_width, cfg.vision_patch_size,
                cfg.transformer_layers, cfg.transformer_width,
                cfg.embed_dim) == (12, 768, 32, 12, 512, 512)
        return jclip, m, params, cfg

    def test_encode_image_224(self, setup):
        jclip, m, params, cfg = setup
        rng = np.random.default_rng(2)
        imgs = rng.uniform(0, 1, (4, 3, 224, 224)).astype(np.float32)
        with torch.no_grad():
            want = m.encode_image(torch.from_numpy(imgs)).numpy()
        got = np.asarray(jax.jit(lambda p, im: jclip.encode_image(
            p, im, cfg, FP32))(params, jnp.asarray(imgs)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_encode_text_and_cosine(self, setup):
        jclip, m, params, cfg = setup
        rng = np.random.default_rng(3)
        ids = np.zeros((3, 77), np.int64)
        for i, L in enumerate([5, 30, 76]):
            ids[i, 0] = 49406
            ids[i, 1:L] = rng.integers(1, 49000, L - 1)
            ids[i, L] = 49407
        imgs = rng.uniform(0, 1, (3, 3, 224, 224)).astype(np.float32)
        with torch.no_grad():
            tt = m.encode_text(torch.from_numpy(ids))
            ti = m.encode_image(torch.from_numpy(imgs))
            want_t = tt.numpy()
            want_cos = torch.cosine_similarity(ti, tt).numpy()
        got_t = np.asarray(jax.jit(lambda p, t: jclip.encode_text(
            p, t, cfg, FP32))(params, jnp.asarray(ids, jnp.int32)))
        np.testing.assert_allclose(got_t, want_t, rtol=2e-3, atol=2e-3)

        @jax.jit
        def cos(p, im, t):
            ji = jclip.encode_image(p, im, cfg, FP32)
            jt = jclip.encode_text(p, t, cfg, FP32)
            return jnp.sum(ji * jt, -1) / (
                jnp.linalg.norm(ji, axis=-1) * jnp.linalg.norm(jt, axis=-1))
        got_cos = np.asarray(cos(params, jnp.asarray(imgs),
                                 jnp.asarray(ids, jnp.int32)))
        # the GA's actual fitness signal (reference generator.py:51)
        np.testing.assert_allclose(got_cos, want_cos, rtol=2e-3, atol=2e-3)


# ------------------------------------------------------------ GPT-2 124M

class TestGPT2_124M:
    """Real 124M geometry: vocab 50257, n_ctx 1024, 12x768, 12 heads
    (reference gpt2/config.py:8-16)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from clip_glass_tpu.models.gpt2 import model as jgpt2
        from clip_glass_tpu.weights import convert_gpt2

        add_reference_path()
        from gpt2.model import GPT2LMHeadModel
        from gpt2.config import GPT2Config as RefConfig
        m = GPT2LMHeadModel(RefConfig())
        randomize_module(m, seed=44, std=0.02)
        m.set_tied()
        m.eval()
        cfg = jgpt2.GPT2Config()
        assert (cfg.vocab_size, cfg.n_positions, cfg.n_embd, cfg.n_layer,
                cfg.n_head) == (50257, 1024, 768, 12, 12)
        params, cfg = convert_gpt2.convert(m.transformer.state_dict(), cfg)
        return jgpt2, m, params, cfg

    def test_logits_parity(self, setup):
        jgpt2, m, params, cfg = setup
        rng = np.random.default_rng(4)
        ids = rng.integers(0, 50257, (2, 53)).astype(np.int64)
        with torch.no_grad():
            want, _ = m(torch.from_numpy(ids))
            want = want.numpy()
        got = np.asarray(jax.jit(lambda p, t: jgpt2.forward(
            p, t, cfg, policy=FP32)[0])(params, jnp.asarray(ids, jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_argmax_decode_parity(self, setup):
        """The exact img2txt workload: ctx 20+3 tokens, 30-step deterministic
        decode (reference models.py:50-60, config.py:8-9)."""
        from gpt2 import sample as ref_sample
        jgpt2, m, params, cfg = setup
        rng = np.random.default_rng(5)
        ctx = rng.integers(0, 50257, (2, 23)).astype(np.int64)
        want = ref_sample.sample_sequence(
            model=m, length=30, context=torch.from_numpy(ctx),
            start_token=None, batch_size=2, temperature=0.7, top_k=40,
            device="cpu", sample=False)
        got = np.asarray(jgpt2.sample_sequence(
            params, jnp.asarray(ctx, jnp.int32), 30, cfg,
            temperature=0.7, top_k=40, sample=False, policy=FP32))
        assert got.shape == (2, 53)
        np.testing.assert_array_equal(got, np.asarray(want))


# ------------------------------------------------------------ BigGAN-256

class TestBigGANDeep256:
    """Full biggan-deep-256 geometry (12 blocks, ch 128, attention at 64px)
    vs the transcribed HF oracle through the real spectral-norm-folding
    converter (reference models.py:65-86, pytorch_pretrained_biggan)."""

    def test_forward_256(self):
        import biggan_hf_oracle as oracle
        from clip_glass_tpu.models.biggan import model as bg
        from clip_glass_tpu.weights import convert_biggan

        cfg = bg.BIGGAN_DEEP_256
        tm = oracle.make_random_oracle(cfg, seed=45)
        params = convert_biggan.convert(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()}, cfg)
        rng = np.random.default_rng(6)
        z = rng.normal(size=(2, cfg.z_dim)).astype(np.float32)
        cl = np.exp(rng.normal(size=(2, cfg.num_classes))).astype(np.float32)
        cl /= cl.sum(1, keepdims=True)
        with torch.no_grad():
            want = tm(torch.from_numpy(z), torch.from_numpy(cl), 1.0).numpy()
        got = np.asarray(jax.jit(lambda p, a, b: bg.apply(
            p, a, b, 1.0, cfg, FP32))(params, jnp.asarray(z),
                                      jnp.asarray(cl)))
        assert got.shape == want.shape == (2, 3, 256, 256)
        # tanh-bounded output: atol on the [-1,1] scale is the meaningful
        # bound; 12 bottleneck blocks of fp32 accumulation
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
