"""Small shared helpers."""

from __future__ import annotations

import os


def round_up(n: int, multiple: int) -> int:
    """Round n up to a multiple — the shape-bucketing helper used by the
    eval runner, batch collation, precompute, and BERTScore batching so
    jitted pipelines compile a bounded number of shapes."""
    return ((n + multiple - 1) // multiple) * multiple


def enable_persistent_compilation_cache(path: str = None) -> None:
    """Turn on JAX's on-disk compilation cache (idempotent).

    TPU compiles through this environment's remote tunnel run minutes per
    graph; the persistent cache makes repeat runs (bench, eval loops,
    validation) near-instant across processes.
    """
    import jax

    path = path or os.environ.get("OPUS_JAX_CACHE",
                                  os.path.expanduser("~/.opus_jax_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass   # older jax without these flags: cache simply stays off


def pvary(x, axis_name):
    """Mark `x` varying over a shard_map mesh axis — jax.lax.pcast on
    current JAX, falling back to the deprecated jax.lax.pvary. Needed at
    lax.scan carry boundaries where a freshly-created constant must
    type-check against a collective-produced (varying) carry-out."""
    import jax
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)
