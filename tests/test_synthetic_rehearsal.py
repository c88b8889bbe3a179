"""Pretrained-path rehearsal without egress (slow lane, `pytest -m rehearsal`).

Drives scripts/validate_pretrained.py --synthetic end to end: fabricate
reference-format checkpoints (scripts/synthesize_checkpoints.py — TorchScript
CLIP archives, legacy HF GPT-2 bin, NVIDIA TF pickles, HF BigGAN bin), run
every converter through the convert_weights.py CLI exactly as
download_weights.sh would, run the torch-oracle parity checks on the
fabricated checkpoints, and drive run.py to the full reference artifact set
(reference run.py:79-125). Any breakage in the real-weights path
(download_weights.sh -> converters -> loaders -> CLI) fails HERE before a
user with egress hits it.

Opt-in like the other slow lanes (deselected by pyproject addopts): the
subprocess compiles four model families + two CLI searches (~10 min CPU).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.rehearsal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_synthetic_pipeline_rehearsal(tmp_path):
    script = os.path.join(REPO, "scripts", "validate_pretrained.py")
    r = subprocess.run(
        [sys.executable, script,
         "--weights-dir", str(tmp_path / "weights"),
         "--out", str(tmp_path / "out"),
         "--synthetic"],
        capture_output=True, text=True, timeout=3000,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    tail = (r.stdout + r.stderr)[-4000:]
    assert r.returncode == 0, tail
    assert " FAIL" not in r.stdout, tail
    # every load-bearing stage passed (not skipped): one converter per
    # family, parity per family, and both CLI drives
    for needle in ("PASS  convert CLI: clip ViT-B/32",
                   "PASS  convert CLI: gpt2",
                   "PASS  convert CLI: stylegan2-tf ffhq-config-f",
                   "PASS  convert CLI: biggan biggan-deep-256",
                   "PASS  convert CLI: lpips vgg16",
                   "PASS  convert CLI: inception pytorch-fid",
                   "PASS  clip/ViT-B/32: convert + torch parity",
                   "PASS  clip/RN50: convert + torch parity",
                   "PASS  gpt2: convert + logits/decode parity",
                   "PASS  stylegan2/ffhq-config-f",
                   "PASS  biggan/biggan-deep-256",
                   "PASS  lpips/VGG16: convert + torch-oracle parity",
                   "PASS  inception/pytorch-fid: convert + BN-fold parity",
                   "PASS  CLI drive: StyleGAN2_ffhq_d txt2img",
                   "PASS  CLI drive: GPT2 img2txt"):
        assert needle in r.stdout, f"missing: {needle}\n{tail}"
