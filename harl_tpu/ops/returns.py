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
    impl: str = "scan",
) -> jnp.ndarray:
    """GAE returns (= gae + V), matching on_policy_critic_buffer_ep.py:107-139,168-190.

    delta_t = r_t + γ·V_{t+1}·m_{t+1} − V_t
    gae_t   = delta_t + γλ·m_{t+1}·gae_{t+1}            (gae_{T}=0)
    gae_t  *= bad_m_{t+1}                                (iff proper time limits)
    ret_t   = gae_t + V_t

    ``impl="pallas"`` dispatches to the fused single-launch TPU kernel
    (ops/pallas_gae.py); ``"scan"`` is the portable reverse ``lax.scan``.
    """
    if impl == "pallas":
        from harl_tpu.ops.pallas_gae import gae_pallas

        return gae_pallas(rewards, values, masks, bad_masks, gamma, gae_lambda)
    v_next = values[1:]
    if impl == "assoc":
        # The recursion is a linear recurrence gae_t = a_t·gae_{t+1} + b_t with
        #   a_t = γλ·m_{t+1}·bad_{t+1},  b_t = bad_{t+1}·delta_t
        # so a log-depth parallel prefix (associative_scan over large vector
        # ops) replaces the T-step sequential loop — the TPU-native form.
        m_next = masks[1:]
        deltas = rewards + gamma * v_next * m_next - values[:-1]
        bm = jnp.ones_like(m_next) if bad_masks is None else bad_masks[1:]
        a = (gamma * gae_lambda) * m_next * bm
        b = bm * deltas

        def combine(x, y):
            # compose affine maps: y∘x (x is the accumulated earlier prefix)
            ax, bx = x
            ay, by = y
            return ax * ay, ay * bx + by

        # reverse-time prefix: flip so the "previous" element is t+1
        a_r, b_r = jnp.flip(a, 0), jnp.flip(b, 0)
        _, gaes_r = jax.lax.associative_scan(combine, (a_r, b_r), axis=0)
        return jnp.flip(gaes_r, 0) + values[:-1]
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
    impl: str = "scan",
) -> jnp.ndarray:
    """Discounted returns without GAE (on_policy_critic_buffer_ep.py:140-166,191-200).

    ret_t = (ret_{t+1}·γ·m_{t+1} + r_t)·bad_m_{t+1} + (1−bad_m_{t+1})·V_t
    """
    if impl == "pallas":
        from harl_tpu.ops.pallas_gae import discounted_returns_pallas

        return discounted_returns_pallas(
            rewards, values, masks, bad_masks, next_value, gamma
        )
    if impl == "assoc":
        # linear recurrence ret_t = a_t·ret_{t+1} + b_t with
        #   a_t = γ·m_{t+1}·bad_{t+1},  b_t = r_t·bad_{t+1} + (1−bad_{t+1})·V_t
        # bootstrap folded into b at t=T−1; log-depth parallel prefix.
        m_next = masks[1:]
        bm = jnp.ones_like(m_next) if bad_masks is None else bad_masks[1:]
        v_cur = values[:-1]
        a = gamma * m_next * bm
        b = rewards * bm + (1.0 - bm) * v_cur
        b = b.at[-1].add(a[-1] * next_value)

        def combine(x, y):
            ax, bx = x
            ay, by = y
            return ax * ay, ay * bx + by

        a_r, b_r = jnp.flip(a, 0), jnp.flip(b, 0)
        _, rets_r = jax.lax.associative_scan(combine, (a_r, b_r), axis=0)
        return jnp.flip(rets_r, 0)
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

