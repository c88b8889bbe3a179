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


def pin_platform_from_env() -> None:
    """Re-assert the JAX_PLATFORMS env var over the plugin-startup config.

    The axon TPU plugin's interpreter-startup hook calls
    `jax.config.update("jax_platforms", "axon,cpu")` AFTER the env var has
    been read, so a platform pinned in a subprocess's environment (e.g.
    JAX_PLATFORMS=cpu for a checkpoint-conversion run, which has no reason
    to pay — or depend on — a TPU handshake) silently loses to the plugin.
    Standalone scripts call this before first backend use; no-op when the
    env var is unset.
    """
    import os

    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        jax.config.update("jax_platforms", plats)


def tune_tpu_compiler() -> None:
    """Default TPU compiler tuning, applied before the first backend use.

    Raises libtpu's scoped-VMEM limit to 64 MiB
    (`--xla_tpu_scoped_vmem_limit_kib=65536`): larger scoped VMEM lets the
    TPU backend pick deeper fusions / bigger tiles for the 1024px conv
    pairs. Measured on the flagship (StyleGAN2_ffhq_d pop 16, 1x v5e,
    alternating A/B, 4 runs per arm): default median 366.0 cand/s
    (364.7-369.3) vs 64 MiB median 379.2 (377.3-379.9) — **+3.6%** with
    non-overlapping spreads; 96 MiB regresses to ~364 (over-reserving
    scoped VMEM starves the scheduler), so 64 MiB is the swept optimum.
    Cross-checked no-regression on the other bench rows (BigGAN 512/256,
    GPT-2 K=8, flagship K=8 — BASELINE.md).

    The env var must be set before libtpu is initialized (first backend
    use), so perf entry points call this alongside `enable_compile_cache`.
    Respects an explicit user choice: a LIBTPU_INIT_ARGS that already sets
    the flag is left alone, and CLIP_GLASS_NO_TPU_TUNING=1 disables the
    default entirely. Harmless on non-TPU platforms (libtpu absent, env
    ignored).
    """
    import os

    if os.environ.get("CLIP_GLASS_NO_TPU_TUNING"):
        return
    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" in args:
        return
    os.environ["LIBTPU_INIT_ARGS"] = (
        args + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()


def enable_compile_cache(cache_dir: str = "~/.cache/jax_bench_cache",
                         min_compile_secs: float = 1.0) -> None:
    """Point JAX's persistent compilation cache at `cache_dir` so repeated
    runs skip the multi-minute full-size XLA compiles. Respects an explicit
    user configuration: a set JAX_COMPILATION_CACHE_DIR env var (or an
    already-configured cache dir) wins.

    Only compiles slower than `min_compile_secs` are persisted, so the
    cache directory holds the expensive executables without growing
    unboundedly from trivial sub-second compiles (which recompile faster
    than they deserialize anyway)."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    if jax.config.jax_compilation_cache_dir:
        return
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
