"""Runtime/XLA configuration helpers.

Centralizes the environment tuning the attack pipeline needs on the TPU
backend:

  * persistent compilation cache (first compile of the fused step is
    expensive; every later process reuses it),
  * disable XLA's latency-hiding-scheduler pass by default: it scales
    super-linearly with program size on this backend (measured: the
    feature-extractor backward compiles 17× faster without it, with <9%
    runtime cost on a single-stream program). Re-enable with
    ``PAA_KEEP_LHS=1`` for multi-chip runs where collective/compute
    overlap matters more than compile latency.

Call ``configure()`` BEFORE the first JAX computation (flags are read at
backend initialization).
"""

from __future__ import annotations

import os

_LHS_FLAG = "--xla_disable_hlo_passes=latency-hiding-scheduler"


def configure(cache_dir: str | None = None, disable_lhs: bool | None = None) -> None:
    if disable_lhs is None:
        disable_lhs = os.environ.get("PAA_KEEP_LHS", "0") != "1"
    flags = os.environ.get("XLA_FLAGS", "")
    if disable_lhs and _LHS_FLAG not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + _LHS_FLAG).strip()

    import jax

    cache = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/paa_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
