"""ctypes binding for the native BPE merge core (clip_glass_tpu/native/bpe_core.cpp).

Builds the shared library on demand with g++ (cached next to the source, or
under ~/.cache/clip_glass_tpu when the package directory is read-only — e.g.
a wheel installed into a system site-packages), converts a tokenizer's
string-keyed merge ranks into integer-id tables once, and exposes
`NativeMerger.apply(symbol_ids) -> merged_ids`. Falls back cleanly when no
compiler is available (`get_native_merger` returns None).
CLIP_GLASS_BPE_SRC overrides the source location.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_SRC = os.environ.get("CLIP_GLASS_BPE_SRC") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "bpe_core.cpp")

_lib = None


def _lib_path() -> str:
    preferred = os.path.join(os.path.dirname(_SRC), "libbpe_core.so")
    if os.path.exists(preferred) or os.access(os.path.dirname(_SRC), os.W_OK):
        return preferred
    cache = os.path.join(os.path.expanduser("~"), ".cache", "clip_glass_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libbpe_core.so")


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    lib_path = _lib_path()
    if not os.path.exists(lib_path) or (os.path.exists(_SRC) and
                                        os.path.getmtime(lib_path) < os.path.getmtime(_SRC)):
        try:
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                            "-o", lib_path, _SRC], check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    lib = ctypes.CDLL(lib_path)
    lib.bpe_create.restype = ctypes.c_void_p
    lib.bpe_create.argtypes = [ctypes.POINTER(ctypes.c_int32)] * 3 + [ctypes.c_int32]
    lib.bpe_free.argtypes = [ctypes.c_void_p]
    lib.bpe_apply.restype = ctypes.c_int32
    lib.bpe_apply.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                              ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    _lib = lib
    return lib


class NativeMerger:
    """Greedy BPE merge over integer symbol ids."""

    def __init__(self, merges: Sequence[Tuple[int, int, int]]):
        """merges: [(left_id, right_id, merged_id)] in rank order."""
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native BPE core unavailable")
        self._lib = lib
        lefts = np.asarray([m[0] for m in merges], np.int32)
        rights = np.asarray([m[1] for m in merges], np.int32)
        merged = np.asarray([m[2] for m in merges], np.int32)
        self._handle = lib.bpe_create(
            lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            merged.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(merges))

    def apply(self, symbol_ids: Sequence[int]) -> List[int]:
        n = len(symbol_ids)
        arr = np.asarray(symbol_ids, np.int32)
        out = np.empty(max(n, 1), np.int32)
        m = self._lib.bpe_apply(
            self._handle,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(out))
        if m < 0:
            raise RuntimeError("bpe_apply output overflow")
        return out[:m].tolist()

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.bpe_free(self._handle)
            self._handle = None


def merger_from_tables(encoder: Dict[str, int],
                       bpe_ranks: Dict[Tuple[str, str], int]) -> NativeMerger:
    """Build the integer-id merge table from a tokenizer's string tables.
    Skips merges whose operands/results are not representable as ids (none
    for GPT-2; CLIP's truncated merge list is fully representable)."""
    merges = []
    for (a, b), _rank in sorted(bpe_ranks.items(), key=lambda kv: kv[1]):
        ia, ib, iab = encoder.get(a), encoder.get(b), encoder.get(a + b)
        if ia is None or ib is None or iab is None:
            continue
        merges.append((ia, ib, iab))
    return NativeMerger(merges)


def get_native_merger(encoder, bpe_ranks) -> Optional[NativeMerger]:
    try:
        return merger_from_tables(encoder, bpe_ranks)
    except (RuntimeError, OSError):
        return None
