"""Return / advantage computation as reverse ``lax.scan``s.

Replaces the O(T) host-side Python recursions of the reference
(``harl/common/buffers/on_policy_critic_buffer_ep.py:97-200``) with fused XLA
scans over the time axis. ValueNorm handling is factored out: callers pass
*denormalized* value predictions, so only the {use_gae} × {use_proper_time_limits}
branches remain. All functions are shape-polymorphic over trailing batch dims:
time is axis 0, everything else is batched.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jnp.ndarray,       # (T, ...)
    values: jnp.ndarray,        # (T+1, ...) — denormalized value predictions
    masks: jnp.ndarray,         # (T+1, ...) — 0 where env finished at that index
    bad_masks: Optional[jnp.ndarray],  # (T+1, ...) — 0 at truncation; None ⇒ no proper-time-limits
    gamma: float,
    gae_lambda: float,
) -> jnp.ndarray:
    """GAE returns (= gae + V), matching on_policy_critic_buffer_ep.py:107-139,168-190.

    delta_t = r_t + γ·V_{t+1}·m_{t+1} − V_t
    gae_t   = delta_t + γλ·m_{t+1}·gae_{t+1}            (gae_{T}=0)
    gae_t  *= bad_m_{t+1}                                (iff proper time limits)
    ret_t   = gae_t + V_t
    """
    v_next = values[1:]
    v_cur = values[:-1]
    m_next = masks[1:]
    deltas = rewards + gamma * v_next * m_next - v_cur

    if bad_masks is not None:
        bm_next = bad_masks[1:]
    else:
        bm_next = jnp.ones_like(m_next)

    def step(gae, xs):
        delta, m, bm = xs
        gae = (delta + gamma * gae_lambda * m * gae) * bm
        return gae, gae

    _, gaes = jax.lax.scan(step, jnp.zeros_like(deltas[0]), (deltas, m_next, bm_next), reverse=True)
    return gaes + v_cur


def compute_discounted_returns(
    rewards: jnp.ndarray,       # (T, ...)
    values: jnp.ndarray,        # (T+1, ...) — denormalized; used at truncations
    masks: jnp.ndarray,         # (T+1, ...)
    bad_masks: Optional[jnp.ndarray],
    next_value: jnp.ndarray,    # (...)
    gamma: float,
) -> jnp.ndarray:
    """Discounted returns without GAE (on_policy_critic_buffer_ep.py:140-166,191-200).

    ret_t = (ret_{t+1}·γ·m_{t+1} + r_t)·bad_m_{t+1} + (1−bad_m_{t+1})·V_t
    """
    m_next = masks[1:]
    if bad_masks is not None:
        bm_next = bad_masks[1:]
    else:
        bm_next = jnp.ones_like(m_next)
    v_cur = values[:-1]

    def step(ret, xs):
        r, m, bm, v = xs
        ret = (ret * gamma * m + r) * bm + (1.0 - bm) * v
        return ret, ret

    _, rets = jax.lax.scan(step, next_value, (rewards, m_next, bm_next, v_cur), reverse=True)
    return rets


def masked_mean_std(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-9) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean/std of x over elements where mask≠0 — the nanmean/nanstd trick of
    on_policy_ha_runner.py:41-45 and happo.py:123-127 without NaNs.

    Std is the population std (ddof=0) to match np.nanstd.
    """
    mask = jnp.broadcast_to(mask, x.shape)
    denom = jnp.maximum(jnp.sum(mask), eps)
    mean = jnp.sum(x * mask) / denom
    var = jnp.sum(((x - mean) ** 2) * mask) / denom
    return mean, jnp.sqrt(var)


def normalize_advantages_masked(advantages: jnp.ndarray, active_masks: jnp.ndarray) -> jnp.ndarray:
    """(adv − masked_mean) / (masked_std + 1e−5), applied to ALL elements
    (including inactive ones), exactly like the reference (happo.py:122-127)."""
    mean, std = masked_mean_std(advantages, active_masks != 0)
    return (advantages - mean) / (std + 1e-5)


def compute_nstep_target_indices(
    idx: jnp.ndarray, n_step: int, stride: int, end_flag: jnp.ndarray
) -> jnp.ndarray:
    """Placeholder for off-policy n-step walk; implemented in buffers.off_policy."""
    raise NotImplementedError
