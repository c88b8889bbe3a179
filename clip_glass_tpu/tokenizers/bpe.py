"""Shared byte-level BPE machinery (host-side, dependency-free).

Reimplements the behavior of the reference tokenizers (reference
gpt2/encoder.py and clip/simple_tokenizer.py) without the `regex`/`ftfy`
packages: the \\p{L}/\\p{N} regex pre-tokenizers are replaced by an explicit
scanner over `unicodedata` categories with identical match semantics.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache
from typing import Dict, List, Tuple


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> printable-unicode map (reference gpt2/encoder.py:9-27).

    Printable ASCII/latin bytes map to themselves; the rest map to 256+offset
    so every byte has a visible, non-whitespace stand-in character.
    """
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


@lru_cache(maxsize=None)
def _is_letter(ch: str) -> bool:
    # per-codepoint memoization: the category lookup dominates the scanner's
    # host time on the img2txt hot path (pop captions re-tokenized per
    # generation); real text reuses a small alphabet
    return unicodedata.category(ch).startswith("L")


@lru_cache(maxsize=None)
def _is_number(ch: str) -> bool:
    return unicodedata.category(ch).startswith("N")


def _is_space(ch: str) -> bool:
    # \s in the `regex` package: unicode whitespace.
    return ch.isspace()


_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def pretokenize_gpt2(text: str) -> List[str]:
    """GPT-2 pattern: 's|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+|
    ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+   (reference gpt2/encoder.py:42).

    Implemented as a left-to-right scanner with exactly the regex's
    alternation/backtracking semantics (including the trailing-whitespace
    lookahead that leaves the last space to fuse with the following word).
    """
    out: List[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        # contractions (case-sensitive literals, as in the reference pattern)
        if ch == "'":
            for c in _CONTRACTIONS:
                if text.startswith(c, i):
                    out.append(c)
                    i += len(c)
                    break
            else:
                # fall through to the "other" run branch
                j = i
                while j < n and not _is_space(text[j]) and not _is_letter(text[j]) and not _is_number(text[j]):
                    j += 1
                out.append(text[i:j])
                i = j
            continue
        if _is_space(ch):
            j = i
            while j < n and _is_space(text[j]):
                j += 1
            if j >= n:
                out.append(text[i:j])  # \s+ at end of string
                i = j
                continue
            # whitespace run followed by non-space: \s+(?!\S) matches all but
            # the final whitespace char (if any remain), then the final one
            # joins the next token via the " ?" prefixes — but only if it is
            # a plain space; otherwise it is emitted alone by the \s+ branch.
            if j - i > 1:
                out.append(text[i:j - 1])
            last = text[j - 1]
            if last == " ":
                k = j
                if _is_letter(text[k]):
                    while k < n and _is_letter(text[k]):
                        k += 1
                elif _is_number(text[k]):
                    while k < n and _is_number(text[k]):
                        k += 1
                else:
                    # " ?[^\s\p{L}\p{N}]+" — but contractions outrank it; the
                    # regex would match " " + run, stopping before a "'" only
                    # if "'" heads a contraction? No: [^..]+ matches "'" too;
                    # alternation order only matters at the match START, and
                    # the match starts at the space. So consume the full run.
                    while k < n and not _is_space(text[k]) and not _is_letter(text[k]) and not _is_number(text[k]):
                        k += 1
                out.append(text[j - 1:k])
                i = k
            else:
                out.append(last)
                i = j
            continue
        if _is_letter(ch):
            j = i
            while j < n and _is_letter(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if _is_number(ch):
            j = i
            while j < n and _is_number(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        # other: [^\s\p{L}\p{N}]+
        j = i
        while j < n and not _is_space(text[j]) and not _is_letter(text[j]) and not _is_number(text[j]):
            j += 1
        out.append(text[i:j])
        i = j
    return out


def pretokenize_clip(text: str) -> List[str]:
    """CLIP pattern: <|startoftext|>|<|endoftext|>|'s|'t|'re|'ve|'m|'ll|'d|
    [\\p{L}]+|[\\p{N}]|[^\\s\\p{L}\\p{N}]+   (reference clip/simple_tokenizer.py:78).

    findall semantics: unmatched characters (whitespace) are skipped.
    Digits match ONE AT A TIME ([\\p{N}] has no +).
    """
    out: List[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if _is_space(ch):
            i += 1
            continue
        if text.startswith("<|startoftext|>", i):
            out.append("<|startoftext|>")
            i += 15
            continue
        if text.startswith("<|endoftext|>", i):
            out.append("<|endoftext|>")
            i += 13
            continue
        if ch == "'":
            for c in _CONTRACTIONS:
                if text.startswith(c, i):
                    out.append(c)
                    i += len(c)
                    break
            else:
                j = i
                while j < n and not _is_space(text[j]) and not _is_letter(text[j]) and not _is_number(text[j]):
                    # "<" could begin a special literal; specials can't occur
                    # mid-run here because they start with "<" which would have
                    # been caught at run start — but a run like "a<|endoftext|>"
                    # starts at "<", caught above. Inside this run, stop at "<"
                    # only if a special literal starts there.
                    if text.startswith("<|startoftext|>", j) or text.startswith("<|endoftext|>", j):
                        break
                    j += 1
                out.append(text[i:j])
                i = j
            continue
        if _is_letter(ch):
            j = i
            while j < n and _is_letter(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if _is_number(ch):
            out.append(ch)
            i += 1
            continue
        j = i
        while j < n and not _is_space(text[j]) and not _is_letter(text[j]) and not _is_number(text[j]):
            if j > i and (text.startswith("<|startoftext|>", j) or text.startswith("<|endoftext|>", j)):
                break
            j += 1
        out.append(text[i:j])
        i = j
    return out


def get_pairs(word: Tuple[str, ...]) -> set:
    """Set of adjacent symbol bigrams (reference gpt2/encoder.py:29-37)."""
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def bpe_merge(token: Tuple[str, ...], bpe_ranks: Dict[Tuple[str, str], int]) -> Tuple[str, ...]:
    """Greedy lowest-rank-first BPE merge loop (reference gpt2/encoder.py:53-83)."""
    word = token
    pairs = get_pairs(word)
    if not pairs:
        return word
    while True:
        bigram = min(pairs, key=lambda p: bpe_ranks.get(p, float("inf")))
        if bigram not in bpe_ranks:
            break
        first, second = bigram
        new_word: List[str] = []
        i = 0
        while i < len(word):
            try:
                j = word.index(first, i)
            except ValueError:
                new_word.extend(word[i:])
                break
            new_word.extend(word[i:j])
            i = j
            if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                new_word.append(first + second)
                i += 2
            else:
                new_word.append(word[i])
                i += 1
        word = tuple(new_word)
        if len(word) == 1:
            break
        pairs = get_pairs(word)
    return word
