"""Tokenizer behavior vs the reference (clip/simple_tokenizer.py,
gpt2/encoder.py) using transformers' slow tokenizers as an independent oracle
where their behavior coincides with the reference's regex path."""

import numpy as np
import pytest

from clip_glass_tpu.tokenizers import (
    CLIPTokenizer,
    GPT2Tokenizer,
    get_clip_tokenizer,
    get_gpt2_tokenizer,
    tokenize,
)

CASES = [
    "Hello world",
    " leading space",
    "numbers 12345 mixed99",
    "it's a dog's breakfast, isn't it?",
    "multi   spaces\t tabs\n\nnewlines x",
    "unicode: café über \U0001f415 emoji",
    "CAPS and MiXeD",
    "...!!!???",
    "'s standalone 'll",
    "trailing spaces   ",
    "a1b2c3",
    "don't",
    "x",
    "a wolf at night with the moon in the background",
    "the picture of",
]


def test_gpt2_known_ids():
    g = get_gpt2_tokenizer()
    assert g.encode("Hello world") == [15496, 995]
    assert g.encode("the picture of") == [1169, 4286, 286]
    assert g.eot_id == 50256
    assert len(g.encoder) == 50257


def test_gpt2_roundtrip():
    g = get_gpt2_tokenizer()
    for s in CASES:
        assert g.decode(g.encode(s)) == s


def test_gpt2_vs_transformers_oracle():
    transformers = pytest.importorskip("transformers")
    import os
    d = os.path.join(os.path.dirname(__file__), "..", "clip_glass_tpu", "tokenizers", "assets")
    t = transformers.GPT2Tokenizer(
        vocab_file=os.path.join(d, "gpt2_encoder.json"),
        merges_file=os.path.join(d, "gpt2_vocab.bpe"))
    g = get_gpt2_tokenizer()
    for s in CASES:
        assert g.encode(s) == t.encode(s), s


def test_clip_vocab_construction():
    c = get_clip_tokenizer()
    # 256 bytes + 256 byte</w> + 48894 merges + 2 specials = 49408
    assert len(c.encoder) == 49408
    assert c.sot_id == 49406 and c.eot_id == 49407


def test_clip_lowercases_and_cleans():
    c = get_clip_tokenizer()
    assert c.encode("A Red FLOWER") == c.encode("a red flower")
    assert c.encode("  a   red\tflower ") == c.encode("a red flower")


def test_clip_decode_roundtrip():
    # CLIP decode replaces each "</w>" with a space (reference
    # simple_tokenizer.py:129-132), so every pre-token becomes
    # space-separated on the way back.
    c = get_clip_tokenizer()
    assert c.decode(c.encode("a red flower")).strip() == "a red flower"
    assert c.decode(c.encode("it's fine!")).strip() == "it 's fine !"
    assert c.decode(c.encode("numbers 123")).strip() == "numbers 1 2 3"


def test_clip_vs_transformers_oracle():
    transformers = pytest.importorskip("transformers")
    import gzip, json, os, tempfile
    c = get_clip_tokenizer()
    d = os.path.join(os.path.dirname(__file__), "..", "clip_glass_tpu", "tokenizers", "assets")
    vf = tempfile.mktemp(suffix=".json")
    mf = tempfile.mktemp(suffix=".txt")
    json.dump(c.encoder, open(vf, "w"))
    merges = gzip.open(os.path.join(d, "bpe_simple_vocab_16e6.txt.gz")).read().decode("utf-8").split("\n")
    open(mf, "w").write("\n".join(merges[:48895]))
    t = transformers.CLIPTokenizer(vocab_file=vf, merges_file=mf)
    # Exclude CJK: transformers' no-ftfy fallback splits CJK per-char, the
    # reference regex (and we) keep letter runs whole.
    for s in CASES:
        assert c.encode(s) == t.encode(s, add_special_tokens=False), s


def test_fix_mojibake():
    """The ftfy.fix_text stand-in (reference clip/simple_tokenizer.py:50-53):
    UTF-8-as-cp1252 mojibake is repaired, including double encodings;
    well-formed text of any script passes through untouched."""
    from clip_glass_tpu.tokenizers.clip_bpe import basic_clean, fix_mojibake

    assert fix_mojibake("CafÃ©") == "Café"
    assert fix_mojibake("donâ€™t") == "don’t"
    assert fix_mojibake("naÃ¯ve rÃ©sumÃ©") == "naïve résumé"
    # double-encoded
    assert fix_mojibake("CafÃƒÂ©") == "Café"
    # identity on well-formed input (the gates, not luck)
    for ok in ("a red flower", "Café au lait", "naïve — résumé",
               "Привет мир", "日本語テキスト", "emoji 🙂 fine"):
        assert fix_mojibake(ok) == ok, ok
    # and through the full clean pipeline
    assert basic_clean("CafÃ©  ") == "Café"


def test_tokenize_packing():
    out = tokenize(["a red flower", "a wolf"])
    assert out.shape == (2, 77)
    assert out[0, 0] == 49406
    assert (out != 0).sum(axis=1)[1] == 2 + 2  # sot + 2 words + eot
    row = out[0]
    eot_pos = int(np.argmax(row))  # eot is the max token id (reference model.py:318)
    assert row[eot_pos] == 49407


def test_tokenize_overflow_raises():
    with pytest.raises(RuntimeError):
        tokenize("word " * 100)
