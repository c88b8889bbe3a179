"""Native C++ BPE merge core vs the pure-Python merge loop."""

import os
import time

import numpy as np
import pytest

from clip_glass_tpu.tokenizers import bpe as pybpe
from clip_glass_tpu.tokenizers.clip_bpe import CLIPTokenizer
from clip_glass_tpu.tokenizers.gpt2_bpe import GPT2Tokenizer
from clip_glass_tpu.tokenizers.native import get_native_merger

CORPUS = [
    "The quick brown fox jumps over the lazy dog",
    "internationalization antidisestablishmentarianism",
    "a wolf at night with the moon in the background",
    "it's a dog's breakfast, isn't it?!",
    "xXx_1337_speak_xXx and emoji \U0001f415\U0001f408",
    "the picture of a red flower on a sunny day",
]


@pytest.fixture(scope="module")
def pair():
    gpt_native = GPT2Tokenizer()
    if gpt_native._native is None:
        pytest.skip("native BPE core not built (no g++?)")
    os.environ["CLIP_GLASS_NATIVE_BPE"] = "0"
    gpt_py = GPT2Tokenizer()
    clip_py = CLIPTokenizer()
    os.environ["CLIP_GLASS_NATIVE_BPE"] = "1"
    clip_native = CLIPTokenizer()
    assert gpt_py._native is None and clip_native._native is not None
    return gpt_native, gpt_py, clip_native, clip_py


def test_gpt2_native_matches_python(pair):
    gpt_native, gpt_py, _, _ = pair
    for s in CORPUS:
        assert gpt_native.encode(s) == gpt_py.encode(s), s


def test_clip_native_matches_python(pair):
    _, _, clip_native, clip_py = pair
    for s in CORPUS:
        assert clip_native.encode(s) == clip_py.encode(s), s


def test_native_merger_single_symbol(pair):
    gpt_native = pair[0]
    # single symbol: no pairs, unchanged
    sym = gpt_native.encoder["a"]
    assert gpt_native._native.apply([sym]) == [sym]


def test_native_is_not_slower(pair):
    gpt_native, gpt_py, _, _ = pair
    text = " ".join(CORPUS) * 5

    def run(tok):
        tok._id_cache.clear()
        tok._cache.clear()
        t0 = time.perf_counter()
        for _ in range(3):
            tok._id_cache.clear()
            tok._cache.clear()
            tok.encode(text)
        return time.perf_counter() - t0

    t_py = run(gpt_py)
    t_nat = run(gpt_native)
    # informative bound: native must at least not be dramatically slower
    assert t_nat < t_py * 2.0
