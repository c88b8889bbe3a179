#!/bin/sh
# Checkpoint fetcher — the runnable counterpart of the reference's
# download-weights.sh (reference download-weights.sh:1-41), extended to every
# checkpoint the full pipeline consumes (CLIP ViT-B/32 + RN50 per
# clip/clip.py:18-21, GPT-2 124M per download-weights.sh:37, the NVIDIA
# StyleGAN2 config-f pickles per stylegan2/convert_from_tf.py:12-38, and the
# HF BigGAN-deep checkpoints).
#
# Each model: curl -> sha256 verify (when the hash is pinned; the CLIP URLs
# embed their own sha256, which is also re-verified at load time by
# models/clip/api.py) -> convert to this framework's npz pytrees via
# scripts/convert_weights.py.
#
# Usage:
#   ./scripts/download_weights.sh <model> [weights_dir]
#   <model>: CLIP-ViT-B-32 | CLIP-RN50 | GPT2 | StyleGAN2-ffhq |
#            StyleGAN2-car | StyleGAN2-church | BigGAN-256 | BigGAN-512 | all
#   weights_dir defaults to ./weights
#
# After fetching, run the end-to-end validation harness:
#   python scripts/validate_pretrained.py --weights-dir ./weights

set -u

REPO_DIR=$(CDPATH= cd -- "$(dirname -- "$0")/.." && pwd)
WEIGHTS_DIR=${2:-"$REPO_DIR/weights"}
PY=${PYTHON:-python}

die() {
    echo "$1" >&2
    exit 1
}

usage() {
    echo "./scripts/download_weights.sh <model> [weights_dir]"
    echo "Possible <model> are: CLIP-ViT-B-32, CLIP-RN50, GPT2,"
    echo "  StyleGAN2-ffhq, StyleGAN2-car, StyleGAN2-church,"
    echo "  BigGAN-256, BigGAN-512, LPIPS, Inception, all"
    echo "Example:"
    echo "./scripts/download_weights.sh StyleGAN2-ffhq"
    exit 1
}

# fetch <url> <dest> [sha256]
fetch() {
    url="$1"; dest="$2"; want="${3:-}"
    if [ -f "$dest" ]; then
        echo "already downloaded: $dest"
    else
        mkdir -p "$(dirname "$dest")"
        echo "fetching $url"
        curl -L --fail --retry 3 --output "$dest.part" "$url" \
            || die "download failed: $url"
        mv "$dest.part" "$dest"
    fi
    _verify_sha "$dest" "$want"
}

# fetch_any <dest> <url>... — try mirrors in order (hosting moves: the
# legacy models.huggingface.co S3 bucket is being retired in favor of
# huggingface.co/<repo>/resolve/main/ URLs); place the file at <dest>
# manually if every mirror fails.
fetch_any() {
    dest="$1"; shift
    if [ -f "$dest" ]; then
        echo "already downloaded: $dest"
        return 0
    fi
    mkdir -p "$(dirname "$dest")"
    for url in "$@"; do
        echo "fetching $url"
        if curl -L --fail --retry 3 --output "$dest.part" "$url"; then
            mv "$dest.part" "$dest"
            return 0
        fi
        echo "  mirror failed, trying next"
    done
    die "all mirrors failed; download the checkpoint manually to $dest"
}

_verify_sha() {
    dest="$1"; want="${2:-}"
    if [ -n "$want" ]; then
        got=$(sha256sum "$dest" | cut -d' ' -f1)
        [ "$got" = "$want" ] || die "sha256 mismatch for $dest
  expected $want
  got      $got"
        echo "sha256 OK: $dest"
    else
        # no published hash for this artifact (the reference fetches it
        # unverified too); record what we got for reproducibility
        echo "sha256 (unpinned, recorded): $(sha256sum "$dest" | cut -d' ' -f1)"
    fi
}

# The CLIP URLs embed the artifact's own sha256 as a path component
# (reference clip/clip.py:18-21); models/clip/api.py re-verifies on load.
CLIP_VIT_SHA=40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af
CLIP_RN50_SHA=afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762

clip_vit() {
    dest="$WEIGHTS_DIR/clip/ViT-B-32.pt"
    fetch "https://openaipublic.azureedge.net/clip/models/$CLIP_VIT_SHA/ViT-B-32.pt" \
        "$dest" "$CLIP_VIT_SHA"
    $PY "$REPO_DIR/scripts/convert_weights.py" clip "$dest" \
        "$WEIGHTS_DIR/clip/ViT-B-32.npz" || die "conversion failed: $dest"
}

clip_rn50() {
    dest="$WEIGHTS_DIR/clip/RN50.pt"
    fetch "https://openaipublic.azureedge.net/clip/models/$CLIP_RN50_SHA/RN50.pt" \
        "$dest" "$CLIP_RN50_SHA"
    $PY "$REPO_DIR/scripts/convert_weights.py" clip "$dest" \
        "$WEIGHTS_DIR/clip/RN50.npz" || die "conversion failed: $dest"
}

gpt2() {
    # reference download-weights.sh:37 fetches the legacy S3 object; the
    # current canonical host is the HF hub (same 124M checkpoint — the
    # converter normalizes both the .g/.b/.w and .weight/.bias layouts)
    dest="$WEIGHTS_DIR/gpt2/gpt2-pytorch_model.bin"
    fetch_any "$dest" \
        "https://huggingface.co/gpt2/resolve/main/pytorch_model.bin" \
        "https://s3.amazonaws.com/models.huggingface.co/bert/gpt2-pytorch_model.bin"
    _verify_sha "$dest"
    $PY "$REPO_DIR/scripts/convert_weights.py" gpt2 "$dest" \
        "$WEIGHTS_DIR/gpt2/gpt2.npz" || die "conversion failed: $dest"
}

# download_stylegan2 <config>  (reference convert_from_tf.py:12-38 URL table)
download_stylegan2() {
    config="$1"
    dest="$WEIGHTS_DIR/stylegan2/$config/stylegan2-$config.pkl"
    fetch "http://d36zk2xti64re0.cloudfront.net/stylegan2/networks/stylegan2-$config.pkl" \
        "$dest"
    $PY "$REPO_DIR/scripts/convert_weights.py" stylegan2-tf "$dest" \
        "$WEIGHTS_DIR/stylegan2/$config" || die "conversion failed: $dest"
}

# Metric models (reference external_models/lpips.py:36-43 downloads the
# torchvision vgg16 zoo file + the richzhang v0.1 linear heads;
# external_models/inception.py:27 the pytorch-fid FID inception). The
# torchvision/pytorch-fid filenames embed a sha256 prefix their own
# loaders verify; recorded unpinned here like the reference's fetches.
lpips() {
    vgg="$WEIGHTS_DIR/metrics/vgg16-397923af.pth"
    lin="$WEIGHTS_DIR/metrics/lpips_vgg_v0.1.pth"
    fetch "https://download.pytorch.org/models/vgg16-397923af.pth" "$vgg"
    fetch "https://github.com/richzhang/PerceptualSimilarity/blob/master/lpips/weights/v0.1/vgg.pth?raw=true" "$lin"
    $PY "$REPO_DIR/scripts/convert_weights.py" lpips "$vgg" \
        "$WEIGHTS_DIR/metrics/lpips_vgg16.npz" --linear "$lin" \
        || die "conversion failed: $vgg"
}

inception() {
    dest="$WEIGHTS_DIR/metrics/pt_inception-2015-12-05-6726825d.pth"
    fetch "https://github.com/mseitzer/pytorch-fid/releases/download/fid_weights/pt_inception-2015-12-05-6726825d.pth" "$dest"
    $PY "$REPO_DIR/scripts/convert_weights.py" inception "$dest" \
        "$WEIGHTS_DIR/metrics/inception.npz" || die "conversion failed: $dest"
}

# download_biggan <model-name>  (pytorch_pretrained_biggan checkpoint
# layout; the package's own URL map points at the legacy S3 bucket, which
# is being retired — if both mirrors fail, obtain the
# <name>-pytorch_model.bin via `pip download pytorch-pretrained-biggan` on
# a machine with egress and place it at the printed path)
download_biggan() {
    name="$1"
    dest="$WEIGHTS_DIR/biggan/$name-pytorch_model.bin"
    fetch_any "$dest" \
        "https://s3.amazonaws.com/models.huggingface.co/biggan/$name-pytorch_model.bin" \
        "https://cdn.huggingface.co/biggan/$name-pytorch_model.bin"
    _verify_sha "$dest"
    $PY "$REPO_DIR/scripts/convert_weights.py" biggan "$dest" \
        "$WEIGHTS_DIR/biggan/$name.npz" --model-name "$name" \
        || die "conversion failed: $dest"
}

[ "$#" -ge 1 ] || usage

run_one() {
    case "$1" in
        CLIP-ViT-B-32) clip_vit ;;
        CLIP-RN50) clip_rn50 ;;
        GPT2) gpt2 ;;
        StyleGAN2-ffhq) download_stylegan2 "ffhq-config-f" ;;
        StyleGAN2-car) download_stylegan2 "car-config-f" ;;
        StyleGAN2-church) download_stylegan2 "church-config-f" ;;
        BigGAN-256) download_biggan "biggan-deep-256" ;;
        BigGAN-512) download_biggan "biggan-deep-512" ;;
        LPIPS) lpips ;;
        Inception) inception ;;
        *) echo "Unknown model '$1'"; usage ;;
    esac
}

if [ "$1" = "all" ]; then
    for m in CLIP-ViT-B-32 CLIP-RN50 GPT2 StyleGAN2-ffhq StyleGAN2-car \
             StyleGAN2-church BigGAN-256 BigGAN-512 LPIPS Inception; do
        run_one "$m"
    done
else
    run_one "$1"
fi

echo "done. validate with:"
echo "  python scripts/validate_pretrained.py --weights-dir $WEIGHTS_DIR"
