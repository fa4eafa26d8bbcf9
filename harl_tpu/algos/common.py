"""Shared algorithm plumbing: train states, optimizers, losses, aggregation.

Replaces the scattered torch helpers of the reference
(``harl/utils/models_tools.py``): Adam + grad clipping, huber/mse, linear lr
decay, grad-norm reporting — as optax transforms and pure functions.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AgentTrainState(NamedTuple):
    """Params + optimizer state for one network (actor or critic)."""

    params: Any
    opt_state: Any


def make_optimizer(
    lr: float,
    opti_eps: float = 1e-5,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
    use_linear_lr_decay: bool = False,
    total_updates: int = 1,
    updates_per_iteration: int = 1,
) -> optax.GradientTransformation:
    """Adam with optional pre-clip and linear per-iteration lr decay.

    Matches torch Adam(lr, eps=opti_eps, weight_decay) + clip_grad_norm_
    (models_tools.py:110-117, happo.py:93-96) and update_linear_schedule
    (models_tools.py:77-87): lr(e) = lr·(1 − e/E) stepped once per training
    iteration (= ``updates_per_iteration`` optimizer steps).
    """
    if use_linear_lr_decay:
        def schedule(count):
            it = count // max(updates_per_iteration, 1)
            frac = jnp.minimum(it / max(total_updates, 1), 1.0)
            return lr * (1.0 - frac)
    else:
        schedule = lr
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay and weight_decay > 0:
        chain.append(optax.adamw(schedule, eps=opti_eps, weight_decay=weight_decay))
    else:
        chain.append(optax.adam(schedule, eps=opti_eps))
    return optax.chain(*chain)


def global_grad_norm(grads) -> jnp.ndarray:
    """L2 norm over the whole gradient pytree (models_tools.py:110-117)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))


def huber_loss(error: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Elementwise huber (models_tools.py:64-69)."""
    a = jnp.abs(error)
    quad = jnp.minimum(a, delta)
    return 0.5 * quad ** 2 + delta * (a - quad)


def mse_loss(error: jnp.ndarray) -> jnp.ndarray:
    """Elementwise e²/2 (models_tools.py:72-74)."""
    return 0.5 * error ** 2


def aggregate_ratio(delta_logp: jnp.ndarray, action_aggregation: str) -> jnp.ndarray:
    """prod/mean of exp(Δlogp) over the last axis, keepdims — the
    ``action_aggregation`` switch (happo.py:66-70, on_policy_ha_runner.py:116-124)."""
    r = jnp.exp(delta_logp)
    if action_aggregation == "prod":
        return jnp.prod(r, axis=-1, keepdims=True)
    if action_aggregation == "mean":
        return jnp.mean(r, axis=-1, keepdims=True)
    raise ValueError(action_aggregation)


def soft_update(target_params, params, polyak: float):
    """θ′ ← τθ + (1−τ)θ′ (off_policy_base.py:28-35)."""
    return jax.tree.map(lambda t, s: (1.0 - polyak) * t + polyak * s, target_params, params)
