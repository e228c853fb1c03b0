"""Device mesh construction for the attack's two parallel axes.

The reference's only scale-out is SLURM job arrays over the epsilon grid,
one GPU per cell (reference: submit_scan_range.py:52-66; SURVEY.md §2.4).
The TPU-native layout is a 2-D mesh:

  * ``data``  — batch sharding inside one attack run; the universal
    perturbation is replicated and its gradient all-reduced over ICI.
  * ``sweep`` — independent (epsilon) cells of a sweep, vmapped and
    sharded; no cross-cell communication (keeps DCN out of the hot loop).

Helpers below pick sensible factorizations of whatever devices exist
(1 real chip, a v5e-8 slice, or the 8-device virtual CPU mesh used by
tests and the driver's multi-chip dry run).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over ``data`` (pure data-parallel attack step)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), axis_names=("data",))


def tp_mesh(n_model: int, n_devices: int | None = None) -> Mesh:
    """2-D ``(data, model)`` mesh: batch data-parallel × Megatron tensor
    parallelism over the encoder (parallel/tp.py). ``n_model`` must divide
    the device count; the remainder becomes the data axis. ``model`` is the
    minor (fastest-varying) axis so its per-layer all-reduces ride the
    tightest ICI neighborhood."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"n_model={n_model} must divide device count {n}")
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def decide_mesh(tp: int, batch_size: int, n_devices: int | None = None) -> Mesh | None:
    """The mesh a single attack run will use — the ONE home for that
    choice, so the model's manual attention region (models/wav2vec2.py
    ``attn_mesh``) and AttackRunner's step shardings (train/loop.py) can
    never disagree: ``tp > 1`` → the ``(data, model)`` mesh; otherwise all
    devices on the ``data`` axis when the batch divides over them; else
    ``None`` (single-device execution).

    Also the ONE error site for the run-level divisibility checks, with
    flag-named messages — callers (cli/run_attack.load_model_bundle and
    train/loop.AttackRunner) must see identical errors regardless of
    which resolves the mesh first."""
    n = n_devices or len(jax.devices())
    if tp > 1:
        if n % tp:
            raise ValueError(f"--tp {tp} must divide the device count {n}")
        n_data = n // tp
        if n_data > 1 and batch_size % n_data:
            raise ValueError(
                f"batch_size {batch_size} must divide over the data axis "
                f"({n_data} = {n} devices / tp {tp})"
            )
        return tp_mesh(tp, n_devices=n)
    if n > 1 and batch_size % n == 0:
        return data_mesh(n_devices=n)
    return None


def sweep_mesh(n_sweep: int, n_devices: int | None = None) -> Mesh:
    """2-D ``(sweep, data)`` mesh.

    ``n_sweep`` must divide the device count; the remainder becomes the
    data axis. With fewer devices than sweep cells, vmap still runs every
    cell — they just share chips (n_sweep=devices, data=1 is typical for
    "one cell per chip", the direct analogue of the reference's one job
    per GPU).
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if n % n_sweep != 0:
        raise ValueError(f"n_sweep={n_sweep} must divide device count {n}")
    arr = np.asarray(devices).reshape(n_sweep, n // n_sweep)
    return Mesh(arr, axis_names=("sweep", "data"))
