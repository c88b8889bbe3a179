"""GPT-2 byte-level BPE tokenizer (reference gpt2/encoder.py:40-115).

Loads the standard `encoder.json` (token->id) + `vocab.bpe` (merges) shipped
with GPT-2 124M. Pure host-side Python; the hot decode path of the img2txt
search calls this once per generation on ~pop strings of ~50 chars.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, List

from clip_glass_tpu.tokenizers.bpe import bpe_merge, bytes_to_unicode, pretokenize_gpt2

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")


class GPT2Tokenizer:
    def __init__(self, encoder_path: str = None, vocab_path: str = None,
                 errors: str = "replace"):
        encoder_path = encoder_path or os.path.join(_ASSET_DIR, "gpt2_encoder.json")
        vocab_path = vocab_path or os.path.join(_ASSET_DIR, "gpt2_vocab.bpe")
        with open(encoder_path, "r", encoding="utf-8") as f:
            self.encoder: Dict[str, int] = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.errors = errors
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        # C-speed decode: map token-chars to latin-1 chars of the byte value
        self._decode_trans = str.maketrans(
            {c: chr(b) for c, b in self.byte_decoder.items()})
        with open(vocab_path, "r", encoding="utf-8") as f:
            bpe_data = f.read()
        merges = [tuple(line.split()) for line in bpe_data.split("\n")[1:-1]]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self._cache: Dict[str, str] = {}
        self._id_cache: Dict[str, List[int]] = {}
        # native C++ merge core (tokenizers/native.py); None -> pure python
        self._native = None
        if os.environ.get("CLIP_GLASS_NATIVE_BPE", "1") == "1":
            from clip_glass_tpu.tokenizers.native import get_native_merger
            self._native = get_native_merger(self.encoder, self.bpe_ranks)

    @property
    def eot_id(self) -> int:
        return self.encoder["<|endoftext|>"]

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = bpe_merge(tuple(token), self.bpe_ranks)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def _token_ids(self, token: str) -> List[int]:
        if token in self._id_cache:
            return self._id_cache[token]
        if self._native is not None:
            out = self._native.apply([self.encoder[c] for c in token])
        else:
            out = [self.encoder[t] for t in self._bpe(token).split(" ")]
        self._id_cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in pretokenize_gpt2(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self._token_ids(token))
        return ids

    def decode(self, ids: List[int]) -> str:
        text = "".join(self.decoder.get(int(t), "") for t in ids)
        return text.translate(self._decode_trans).encode(
            "latin-1").decode("utf-8", errors=self.errors)


@lru_cache()
def get_gpt2_tokenizer() -> GPT2Tokenizer:
    return GPT2Tokenizer()
