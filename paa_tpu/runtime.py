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
import subprocess
import sys

_LHS_FLAG = "--xla_disable_hlo_passes=latency-hiding-scheduler"


def backends_initialized() -> bool:
    """True when this process already has live JAX backends (so a
    reachability probe would be redundant — any hang already happened).

    Uses a private jax API (no public equivalent exists); if a jax
    upgrade moves it, fall back to False — a redundant subprocess probe
    costs seconds, whereas True would silently disable the fail-fast
    guard.
    """
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge.backends_are_initialized())
    except (ImportError, AttributeError):
        return False


def probe_device(timeout: float = 900.0, platform: str | None = None) -> str:
    """Fail fast when the accelerator is unreachable instead of hanging.

    The TPU arrives over a tunnel that can be down for hours; in that
    state the first device op of ANY default-platform process blocks
    forever with no error (observed 2026-08-18). A hung call inside this
    process cannot be cancelled, so the probe runs a 1-op computation in
    a SUBPROCESS with a hard timeout and raises an actionable
    ``RuntimeError`` if it never returns. The default budget (15 min)
    rides out the ~8 min grant-stickiness a freshly killed TPU process
    leaves behind; a healthy backend answers in seconds.

    Returns the backend name (``"tpu"``/``"cpu"``/…) on success.

    ``platform`` pins the subprocess to that backend via the jax config
    (the env var does not win against the container sitecustomize).
    Tests use ``platform="cpu"`` so a watchdog-killed probe can never be
    mid-TPU-acquisition (a killed TPU process sticks the single-tenant
    chip ~8 min).
    """
    pin = (
        f"jax.config.update('jax_platforms', {platform!r})\n" if platform else ""
    )
    code = (
        "import jax\n" + pin +
        "import jax.numpy as jnp\n"
        "x = jnp.ones((128, 128))\n"
        "s = float((x @ x).sum())\n"
        "print('PROBE_OK', jax.default_backend(), s)\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"device probe hung for {timeout:.0f}s — the accelerator "
            "backend is unreachable (TPU tunnel outage or a stuck device "
            "grant). Re-run with --platform cpu to use the host, or "
            "--device_probe_timeout 0 to skip this check and wait "
            "indefinitely."
        )
    for line in r.stdout.splitlines():
        if line.startswith("PROBE_OK "):
            return line.split()[1]
    raise RuntimeError(
        "device probe failed before reaching the backend:\n"
        + (r.stderr or r.stdout)[-1000:]
    )


def maybe_probe(platform: str | None, timeout: float, log=None) -> str | None:
    """The CLIs' shared probe policy: probe the accelerator (fail-fast,
    see probe_device) unless the run is pinned to the host CPU, the
    timeout is 0/unset, or this process already has live backends
    (in-process callers/tests — any hang already happened).

    Returns the probed backend name, or None when the probe was skipped.
    Raises RuntimeError (from probe_device) when the accelerator is
    unreachable.
    """
    if not timeout or platform == "cpu" or backends_initialized():
        return None
    backend = probe_device(timeout=timeout)
    if log is not None:
        log.info("device probe ok: %s", backend)
    return backend


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
