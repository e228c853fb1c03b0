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
    """Load a checkpoint into the structure of ``template``."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


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
