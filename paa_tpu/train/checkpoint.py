"""Checkpoint / resume for attack runs.

The reference checkpoints only the perturbation tensor and rediscovers
progress from results.json, restarting Adam moments on resume (reference:
src/training_utils/build.py:266-320, SURVEY.md §5.4 notes this gap). Here
the full attack state — perturbation, optimizer state, epoch, best score,
RNG — is serialized atomically via flax msgpack, so preemption resume is
exact. The perturbation is additionally exported standalone
(``perturbation.npy``) as the run's *product*, mirroring the reference's
``perturbation.pt`` artifact (save.py:155-156).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: dict) -> None:
    """Atomically write a pytree checkpoint (msgpack)."""
    data = serialization.to_bytes(jax.tree.map(np.asarray, state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: dict) -> dict:
    """Load a checkpoint into the structure of ``template``.

    Tolerates history-series drift: a checkpoint written before a newer
    metric series existed (e.g. the targeted emission metrics added in
    round 4) resumes with that series NaN-backfilled to the length of
    the surviving series, instead of dying on flax's exact-key check;
    series the template no longer knows are dropped.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    hist, want = raw.get("history"), template.get("history")
    if isinstance(hist, dict) and isinstance(want, dict):
        n = max((len(v) for v in hist.values()), default=0)
        for k in want:
            if k not in hist:
                hist[k] = np.full((n,), np.nan)
        for k in list(hist):
            if k not in want:
                del hist[k]
    return serialization.from_state_dict(template, raw)


def save_perturbation(path: str, p) -> None:
    np.save(path, np.asarray(p))


def load_perturbation(path: str) -> np.ndarray:
    return np.load(path)


def discover_resume(save_dir: str) -> tuple[bool, str | None]:
    """Preemption-resume discovery: a checkpoint in save_dir means a
    previous run was interrupted (reference: build.py:266-286)."""
    ckpt = os.path.join(save_dir, "attack_state.msgpack")
    if os.path.exists(ckpt):
        return True, ckpt
    return False, None
