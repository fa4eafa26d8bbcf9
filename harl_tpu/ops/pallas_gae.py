"""Fused GAE / discounted-return Pallas TPU kernels.

The GAE recursion (reference: ``harl/common/buffers/on_policy_critic_buffer_ep.py:97-200``,
a host-side Python loop over T) is a strictly sequential reverse recurrence over
time with elementwise work per step. As a ``lax.scan`` (ops/returns.py) XLA
emits a T-iteration loop of tiny fused elementwise kernels with an HBM
round-trip per step. Here the whole (T, B) problem is tiled over the batch
(lane) axis and each tile runs the full recursion out of VMEM in ONE kernel
launch: 6 HBM reads + 1 write per element total, no per-step launch overhead.

Layout: time on the sublane axis, batch on the lane axis (128-multiple tiles);
the recursion walks sublanes in reverse with a (1, TILE_B) carry held in
registers/VMEM. Trailing batch dims are flattened; columns are independent so
tile padding is harmless.

Used by all on-policy algorithms (HAPPO/HATRPO/HAA2C/MAPPO) via
``harl_tpu.ops.returns.compute_gae(..., impl="pallas")``. The ``lax.scan``
implementation remains the fallback for CPU tests and GSPMD-sharded inputs
(a pallas_call does not partition under automatic sharding propagation).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane-axis tile. 512 lanes × T≤1024 sublanes × 6 f32 buffers ≈ 12 MB worst
# case; typical episode_length (≤200) stays well under the ~16 MB VMEM budget.
_TILE_B = 512


def _gae_kernel(rew_ref, vcur_ref, vnext_ref, mnext_ref, bm_ref, out_ref,
                *, gamma: float, lam: float, T: int):
    """One batch tile: reverse recursion over the time (sublane) axis.

    delta_t = r_t + γ·V_{t+1}·m_{t+1} − V_t
    gae_t   = (delta_t + γλ·m_{t+1}·gae_{t+1}) · bad_m_{t+1}
    out_t   = gae_t + V_t
    """
    width = rew_ref.shape[1]

    def body(i, gae):
        t = T - 1 - i
        row = pl.ds(t, 1)
        m = mnext_ref[row, :]
        delta = rew_ref[row, :] + gamma * vnext_ref[row, :] * m - vcur_ref[row, :]
        gae = (delta + (gamma * lam) * m * gae) * bm_ref[row, :]
        out_ref[row, :] = gae + vcur_ref[row, :]
        return gae

    jax.lax.fori_loop(0, T, body, jnp.zeros((1, width), jnp.float32))


def _returns_kernel(rew_ref, vcur_ref, nv_ref, mnext_ref, bm_ref, out_ref,
                    *, gamma: float, T: int):
    """Discounted returns without GAE (on_policy_critic_buffer_ep.py:140-166):
    ret_t = (ret_{t+1}·γ·m_{t+1} + r_t)·bad_m_{t+1} + (1−bad_m_{t+1})·V_t,
    seeded with the bootstrap value."""
    width = rew_ref.shape[1]

    def body(i, ret):
        t = T - 1 - i
        row = pl.ds(t, 1)
        bm = bm_ref[row, :]
        ret = (ret * gamma * mnext_ref[row, :] + rew_ref[row, :]) * bm \
            + (1.0 - bm) * vcur_ref[row, :]
        out_ref[row, :] = ret
        return ret

    jax.lax.fori_loop(0, T, body, nv_ref[:])


def _flatten_pad(x: jnp.ndarray, T: int, b_pad: int) -> jnp.ndarray:
    x = x.reshape(T, -1).astype(jnp.float32)
    if x.shape[1] != b_pad:
        x = jnp.pad(x, ((0, 0), (0, b_pad - x.shape[1])))
    return x


def _tile(b_pad: int) -> int:
    return min(_TILE_B, b_pad)


def gae_pallas(
    rewards: jnp.ndarray,               # (T, ...)
    values: jnp.ndarray,                # (T+1, ...)
    masks: jnp.ndarray,                 # (T+1, ...)
    bad_masks: Optional[jnp.ndarray],   # (T+1, ...) or None
    gamma: float,
    gae_lambda: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """GAE returns (gae + V) with the full recursion fused into one kernel."""
    T = rewards.shape[0]
    out_shape = rewards.shape
    b = math.prod(rewards.shape[1:])
    b_pad = max(128, -(-b // 128) * 128)
    tile = _tile(b_pad)

    rew = _flatten_pad(rewards, T, b_pad)
    vals = values.reshape(T + 1, -1).astype(jnp.float32)
    m_next = _flatten_pad(masks[1:], T, b_pad)
    bm = masks[1:] if bad_masks is None else bad_masks[1:]
    bm_next = _flatten_pad(jnp.ones_like(bm) if bad_masks is None else bm, T, b_pad)
    v_cur = _flatten_pad(vals[:-1], T, b_pad)
    v_next = _flatten_pad(vals[1:], T, b_pad)

    spec = pl.BlockSpec((T, tile), lambda j: (0, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_gae_kernel, gamma=float(gamma), lam=float(gae_lambda), T=T),
        out_shape=jax.ShapeDtypeStruct((T, b_pad), jnp.float32),
        grid=(b_pad // tile,),
        in_specs=[spec] * 5,
        out_specs=spec,
        interpret=interpret,
    )(rew, v_cur, v_next, m_next, bm_next)
    return out[:, :b].reshape(out_shape)


def discounted_returns_pallas(
    rewards: jnp.ndarray,               # (T, ...)
    values: jnp.ndarray,                # (T+1, ...)
    masks: jnp.ndarray,                 # (T+1, ...)
    bad_masks: Optional[jnp.ndarray],
    next_value: jnp.ndarray,            # (...)
    gamma: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused discounted-return recursion (non-GAE path)."""
    T = rewards.shape[0]
    out_shape = rewards.shape
    b = math.prod(rewards.shape[1:])
    b_pad = max(128, -(-b // 128) * 128)
    tile = _tile(b_pad)

    rew = _flatten_pad(rewards, T, b_pad)
    v_cur = _flatten_pad(values[:-1], T, b_pad)
    m_next = _flatten_pad(masks[1:], T, b_pad)
    bm = masks[1:] if bad_masks is None else bad_masks[1:]
    bm_next = _flatten_pad(jnp.ones_like(bm) if bad_masks is None else bm, T, b_pad)
    nv = _flatten_pad(next_value[None], 1, b_pad)

    spec = pl.BlockSpec((T, tile), lambda j: (0, j), memory_space=pltpu.VMEM)
    nv_spec = pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_returns_kernel, gamma=float(gamma), T=T),
        out_shape=jax.ShapeDtypeStruct((T, b_pad), jnp.float32),
        grid=(b_pad // tile,),
        in_specs=[spec, spec, nv_spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(rew, v_cur, nv, m_next, bm_next)
    return out[:, :b].reshape(out_shape)
