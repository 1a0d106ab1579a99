"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends (the idiomatic JAX way
to test DP/TP sharding without a TPU pod — SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU plugin for every
# interpreter and overrides JAX_PLATFORMS; this config update wins and pins
# tests to the virtual 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# exact fp32 matmuls in numerics/parity tests (default may downcast to bf16)
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_state():
    """Free compiled executables between test modules.

    A full-suite run accumulates hundreds of XLA:CPU JIT executables in
    one process; past ~70% of the suite the CPU compiler segfaults inside
    backend_compile_and_load when the big serve-engine graphs compile
    (reproduced twice at tests/test_serve_lora.py, 2026-08-21; every
    module passes in its own process). Dropping jit caches per module
    bounds the live-executable count; cross-module graph reuse is rare
    (different shapes), so the recompile cost is small.
    """
    yield
    jax.clear_caches()
