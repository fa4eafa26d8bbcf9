"""Functional running return normalizer (ValueNorm).

Reference: ``harl/common/valuenorm.py`` — debiased EMA of mean and mean-square
with β=0.99999, variance clamped to ≥1e−2, debiasing term clamped to ≥ε.
State lives in the train-state pytree; all ops are pure.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class ValueNormState(NamedTuple):
    running_mean: jnp.ndarray     # (input_shape,)
    running_mean_sq: jnp.ndarray  # (input_shape,)
    debiasing_term: jnp.ndarray   # scalar


def init_value_norm(input_shape=1, dtype=jnp.float32) -> ValueNormState:
    shape = (input_shape,) if isinstance(input_shape, int) else tuple(input_shape)
    return ValueNormState(
        running_mean=jnp.zeros(shape, dtype),
        running_mean_sq=jnp.zeros(shape, dtype),
        debiasing_term=jnp.zeros((), dtype),
    )


def _debiased_mean_var(state: ValueNormState, epsilon: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """valuenorm.py:44-52 — clamp debias by ε, clamp var to ≥1e−2."""
    debias = jnp.maximum(state.debiasing_term, epsilon)
    mean = state.running_mean / debias
    mean_sq = state.running_mean_sq / debias
    var = jnp.maximum(mean_sq - mean ** 2, 1e-2)
    return mean, var


def update_value_norm(
    state: ValueNormState,
    input_vector: jnp.ndarray,
    beta: float = 0.99999,
    per_element_update: bool = False,
    norm_axes: int = 1,
) -> ValueNormState:
    """EMA update over all leading axes (valuenorm.py:54-75; the reference's
    ``norm_axes`` always equals input.ndim − running_mean.ndim in practice)."""
    del norm_axes
    axes = tuple(range(input_vector.ndim - state.running_mean.ndim))
    batch_mean = jnp.mean(input_vector, axis=axes)
    batch_sq_mean = jnp.mean(input_vector ** 2, axis=axes)
    if per_element_update:
        batch_size = 1
        for a in axes:
            batch_size *= input_vector.shape[a]
        weight = beta ** batch_size
    else:
        weight = beta
    return ValueNormState(
        running_mean=state.running_mean * weight + batch_mean * (1.0 - weight),
        running_mean_sq=state.running_mean_sq * weight + batch_sq_mean * (1.0 - weight),
        debiasing_term=state.debiasing_term * weight + (1.0 - weight),
    )


def normalize(state: ValueNormState, x: jnp.ndarray) -> jnp.ndarray:
    mean, var = _debiased_mean_var(state)
    return (x - mean) / jnp.sqrt(var)


def denormalize(state: ValueNormState, x: jnp.ndarray) -> jnp.ndarray:
    mean, var = _debiased_mean_var(state)
    return x * jnp.sqrt(var) + mean
