"""Backend capability probes.

The tunneled `axon` TPU backend does not implement host send/recv callbacks
(jax pure_callback/io_callback raise UNIMPLEMENTED), which the img2txt BPE
round trip uses. fitness/evolve fall back to a host-staged evaluation there.
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=None)
def supports_host_callbacks() -> bool:
    try:
        client = jax.devices()[0].client
        version = getattr(client, "platform_version", "") or ""
    except Exception:
        return True
    return "axon" not in version.lower()
