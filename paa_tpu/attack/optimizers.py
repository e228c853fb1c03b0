"""Perturbation optimizers: PGD sign steps and Adam, plus the StepLR decay.

Reference semantics (src/training_utils/train.py:156-177):
  * PGD:  ``(direction·loss).backward(); p += lr·sign(p.grad)`` — i.e.
    ``p ← p + lr·direction·sign(∂loss/∂p)`` (ascent when untargeted).
  * Adam: gradient descent on ``(-direction·loss)`` via torch Adam on the
    single parameter ``p`` (reference: src/training_utils/build.py:352-359),
    with a per-epoch StepLR schedule ``lr·gamma^(epoch // step_size)``.

Here both are pure functions of ``(p, grad, opt_state, lr)`` so they live
*inside* the jitted attack step; the learning rate is a traced scalar so
the epoch schedule never triggers a recompile.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import optax

from paa_tpu.config import AttackConfig


class OptState(NamedTuple):
    """Adam state for the perturbation (empty leaves for PGD)."""

    inner: optax.OptState


_ADAM = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def init_opt_state(cfg: AttackConfig, p: jnp.ndarray) -> OptState:
    if cfg.optimizer_type == "adam":
        return OptState(inner=_ADAM.init(p))
    # PGD is stateless; keep a unit-shaped placeholder so the train step
    # signature (and checkpoint layout) is optimizer-independent.
    return OptState(inner=optax.EmptyState())


def apply_update(
    cfg: AttackConfig,
    p: jnp.ndarray,
    grad: jnp.ndarray,  # ∂loss/∂p (raw CTC loss gradient)
    opt_state: OptState,
    lr: jnp.ndarray,
) -> tuple[jnp.ndarray, OptState]:
    """One optimizer update of the perturbation (projection NOT included)."""
    direction = cfg.loss_direction
    if cfg.optimizer_type == "pgd":
        new_p = p + lr * direction * jnp.sign(grad)
        return new_p, opt_state
    if cfg.optimizer_type == "adam":
        # descend on (-direction · loss): its gradient is -direction·grad
        descent_grad = -direction * grad
        updates, inner = _ADAM.update(descent_grad, opt_state.inner, p)
        new_p = p - lr * updates
        return new_p, OptState(inner=inner)
    raise NotImplementedError(f"Optimization type not implemented: {cfg.optimizer_type!r}")


def step_lr(cfg: AttackConfig, epoch: int) -> float:
    """StepLR: lr·gamma^(epoch // step_size), stepped per epoch.

    Reference: src/training_utils/build.py:358 + src/run_attack.py:170-178.
    """
    return cfg.lr * cfg.gamma ** (epoch // cfg.step_size)
