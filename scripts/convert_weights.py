#!/usr/bin/env python
"""Checkpoint conversion CLI — the counterpart of the reference's
download-weights.sh + convert_from_tf (reference download-weights.sh:16-37):
converts locally available reference checkpoints into this framework's npz
pytrees. (This environment has no network egress; fetch checkpoints wherever
you normally would, then convert.)

Usage:
  python scripts/convert_weights.py clip         ViT-B-32.pt          out.npz
  python scripts/convert_weights.py stylegan2    <dir-with-G.pth>     out_dir
  python scripts/convert_weights.py stylegan2-tf stylegan2-ffhq.pkl   out_dir
  python scripts/convert_weights.py gpt2         gpt2-pytorch_model.bin out.npz
  python scripts/convert_weights.py biggan       biggan-deep-256.bin  out.npz
  python scripts/convert_weights.py lpips        vgg16-397923af.pth   out.npz \
                                                 --linear vgg.pth
  python scripts/convert_weights.py inception    pt_inception-*.pth   out.npz

Run with --urls to print the checkpoint acquisition table (every URL the
reference's download-weights.sh / convert_from_tf.py / clip.py /
pytorch_pretrained_biggan pipeline fetches from).
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_glass_tpu.core.backend import pin_platform_from_env  # noqa: E402

# Conversion is host-side work; honor an env-pinned platform (JAX_PLATFORMS=
# cpu) instead of letting the TPU plugin's startup hook force a TPU handshake.
pin_platform_from_env()


def _save_cfg(path: str, cfg) -> None:
    """Sidecar config json so converted npz pytrees reload without shape
    inference (fitness/generator.py reads `<net>_cfg.json`)."""
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1)

# Checkpoint acquisition table — where a user WITH egress obtains each
# checkpoint this CLI converts (reference download-weights.sh:16-37,
# stylegan2/convert_from_tf.py:12-38, clip/clip.py:18-21, and the
# pytorch_pretrained_biggan hub layout). sha256 prefixes in the CLIP URLs
# are verified by models/clip/api.py on load.
WEIGHT_URLS = {
    "clip ViT-B/32": "https://openaipublic.azureedge.net/clip/models/"
                     "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f5"
                     "8eba950af/ViT-B-32.pt",
    "clip RN50": "https://openaipublic.azureedge.net/clip/models/"
                 "afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc0"
                 "4b6762/RN50.pt",
    "gpt2 124M": "https://s3.amazonaws.com/models.huggingface.co/bert/"
                 "gpt2-pytorch_model.bin",
    "stylegan2-tf ffhq-config-f": "http://d36zk2xti64re0.cloudfront.net/"
                                  "stylegan2/networks/stylegan2-ffhq-config-f.pkl",
    "stylegan2-tf car-config-f": "http://d36zk2xti64re0.cloudfront.net/"
                                 "stylegan2/networks/stylegan2-car-config-f.pkl",
    "stylegan2-tf church-config-f": "http://d36zk2xti64re0.cloudfront.net/"
                                    "stylegan2/networks/stylegan2-church-config-f.pkl",
    "biggan biggan-deep-256": "https://s3.amazonaws.com/models.huggingface.co/"
                              "biggan/biggan-deep-256-pytorch_model.bin",
    "biggan biggan-deep-512": "https://s3.amazonaws.com/models.huggingface.co/"
                              "biggan/biggan-deep-512-pytorch_model.bin",
    "biggan biggan-deep-128": "https://s3.amazonaws.com/models.huggingface.co/"
                              "biggan/biggan-deep-128-pytorch_model.bin",
    # metric models (reference external_models/lpips.py:36-38 linear-head
    # URL + the torchvision vgg16 zoo file its constructor downloads;
    # external_models/inception.py:27 FID_WEIGHTS_URL)
    "lpips vgg16 (torchvision)": "https://download.pytorch.org/models/"
                                 "vgg16-397923af.pth",
    "lpips linear v0.1 (richzhang)": "https://github.com/richzhang/"
                                     "PerceptualSimilarity/blob/master/lpips/"
                                     "weights/v0.1/vgg.pth?raw=true",
    "inception (pytorch-fid)": "https://github.com/mseitzer/pytorch-fid/"
                               "releases/download/fid_weights/"
                               "pt_inception-2015-12-05-6726825d.pth",
}


def main() -> int:
    if "--urls" in sys.argv:
        width = max(len(k) for k in WEIGHT_URLS)
        for k, v in WEIGHT_URLS.items():
            print(f"{k:{width}s}  {v}")
        return 0
    p = argparse.ArgumentParser(
        epilog="use --urls to print the checkpoint acquisition table")
    p.add_argument("kind", choices=["clip", "stylegan2", "stylegan2-tf",
                                    "gpt2", "biggan", "lpips", "inception"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--model-name", default="biggan-deep-256",
                   help="biggan variant for the biggan kind; 'auto' infers "
                        "the geometry from the checkpoint shapes")
    p.add_argument("--linear", default=None,
                   help="richzhang v0.1 linear-weights .pth (lpips kind)")
    args = p.parse_args()

    from clip_glass_tpu.core import pytree

    if args.kind == "clip":
        from clip_glass_tpu.weights import convert_clip
        params, cfg = convert_clip.load_torch_checkpoint(args.src)
        pytree.save_npz(args.dst, params)
        _save_cfg(os.path.splitext(args.dst)[0] + "_cfg.json", cfg)
        print(f"CLIP {cfg} -> {args.dst}")
    elif args.kind == "gpt2":
        from clip_glass_tpu.weights import convert_gpt2
        params, cfg = convert_gpt2.load_torch_checkpoint(args.src)
        pytree.save_npz(args.dst, params)
        _save_cfg(os.path.splitext(args.dst)[0] + "_cfg.json", cfg)
        print(f"GPT-2 {cfg} -> {args.dst}")
    elif args.kind == "biggan":
        from clip_glass_tpu.weights import convert_biggan
        params, cfg = convert_biggan.load_torch_checkpoint(args.src, args.model_name)
        pytree.save_npz(args.dst, params)
        _save_cfg(os.path.splitext(args.dst)[0] + "_cfg.json", cfg)
        print(f"BigGAN {args.model_name} -> {args.dst}")
    elif args.kind == "stylegan2":
        from clip_glass_tpu.weights import convert_stylegan2
        os.makedirs(args.dst, exist_ok=True)
        src_dir = args.src if os.path.isdir(args.src) else os.path.dirname(args.src)
        converted = 0
        for name in ("G.pth", "D.pth", "Gs.pth"):
            path = os.path.join(src_dir, name)
            if not os.path.exists(path):
                continue
            params, cfg, kind = convert_stylegan2.load_pth(path)
            stem = name.replace(".pth", "")
            out = os.path.join(args.dst, stem + ".npz")
            pytree.save_npz(out, params)
            _save_cfg(os.path.join(args.dst, stem + "_cfg.json"), cfg)
            print(f"{name} ({kind}, {cfg.resolution}px) -> {out}")
            converted += 1
        if not converted:
            # exiting 0 with an empty out dir would read as success to
            # scripted callers (download_weights.sh's `|| die` pattern)
            sys.exit(f"no G.pth/D.pth/Gs.pth found under {src_dir!r}")
    elif args.kind == "lpips":
        # src = torchvision vgg16 zoo file (full state dict incl. the
        # classifier head the LPIPS metric never touches); --linear = the
        # richzhang v0.1 vgg.pth of 5 per-slice head tensors (reference
        # external_models/lpips.py:36-56 consumes exactly this pair)
        import torch
        from clip_glass_tpu.metrics import lpips as jlpips
        if not args.linear:
            sys.exit("lpips kind requires --linear <richzhang vgg.pth>")
        sd = torch.load(args.src, map_location="cpu", weights_only=False)
        feats = {k[len("features."):]: v for k, v in sd.items()
                 if k.startswith("features.")} or sd
        lin = torch.load(args.linear, map_location="cpu", weights_only=False)
        params = jlpips.convert_torch_lpips(feats, list(lin.values()))
        pytree.save_npz(args.dst, params)
        print(f"LPIPS-VGG16 ({len(params['convs'])} convs + "
              f"{len(params['heads'])} linear heads) -> {args.dst}")
    elif args.kind == "inception":
        # src = the pytorch-fid pt_inception checkpoint (reference
        # external_models/inception.py:27); fc / bookkeeping keys ignored
        import torch
        from clip_glass_tpu.metrics import inception as jinc
        sd = torch.load(args.src, map_location="cpu", weights_only=False)
        params = jinc.convert_torch_inception(sd)
        pytree.save_npz(args.dst, params)
        print(f"InceptionV3 (pytorch-fid layout, BN folded) -> {args.dst}")
    elif args.kind == "stylegan2-tf":
        from clip_glass_tpu.weights import convert_stylegan2_tf
        os.makedirs(args.dst, exist_ok=True)
        nets = convert_stylegan2_tf.convert_pkl(args.src)
        for key, val in nets.items():
            if key in ("G", "Gs"):
                params, cfg, noises = val
                pytree.save_npz(os.path.join(args.dst, f"{key}.npz"), params)
                pytree.save_npz(os.path.join(args.dst, f"{key}_noise.npz"),
                                {str(i): n for i, n in enumerate(noises)})
                _save_cfg(os.path.join(args.dst, f"{key}_cfg.json"), cfg)
                print(f"{key} ({cfg.resolution}px) -> {args.dst}")
            else:
                params, cfg = val
                pytree.save_npz(os.path.join(args.dst, "D.npz"), params)
                _save_cfg(os.path.join(args.dst, "D_cfg.json"), cfg)
                print(f"D ({cfg.resolution}px) -> {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
