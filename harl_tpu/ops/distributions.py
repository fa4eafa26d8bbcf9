"""Functional action distributions (pure jnp, jit/vmap-safe).

Replaces the reference's torch distribution wrappers
(``harl/models/base/distributions.py``) with stateless functions over arrays.
Semantics preserved:
  * Categorical head masks unavailable actions with logits −1e10
    (distributions.py:51-55); sampled action shape is (..., 1).
  * DiagGaussian uses a state-independent learnable log_std with
    ``sigmoid(log_std / std_x_coef) * std_y_coef`` parameterization
    (distributions.py:76-89); entropy is summed over action dims.
  * Squashed Gaussian (SAC) clamps log_std to [−20, 2] and applies the
    numerically-stable tanh log-prob correction
    (squashed_gaussian_policy.py:57-78).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

MASK_LOGIT = -1e10
_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def mask_logits(logits: jnp.ndarray, available_actions: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Set logits of unavailable actions to −1e10 (distributions.py:51-55)."""
    if available_actions is None:
        return logits
    return jnp.where(available_actions == 0, MASK_LOGIT, logits)


# ---------------------------------------------------------------------------
# Categorical
# ---------------------------------------------------------------------------

class Categorical(NamedTuple):
    """Categorical over the last axis of ``logits`` (already masked)."""

    logits: jnp.ndarray  # (..., n)

    @property
    def log_probs_all(self) -> jnp.ndarray:
        return jax.nn.log_softmax(self.logits, axis=-1)

    def sample(self, key) -> jnp.ndarray:
        """Sampled action index, shape (..., 1) like FixedCategorical.sample."""
        a = jax.random.categorical(key, self.logits, axis=-1)
        return a[..., None]

    def mode(self) -> jnp.ndarray:
        return jnp.argmax(self.logits, axis=-1)[..., None]

    def log_prob(self, action: jnp.ndarray) -> jnp.ndarray:
        """Log-prob of integer actions shaped (..., 1) → (..., 1)."""
        lp = self.log_probs_all
        a = action[..., 0].astype(jnp.int32)
        return jnp.take_along_axis(lp, a[..., None], axis=-1)

    def entropy(self) -> jnp.ndarray:
        """Shape (...,). Matches torch Categorical entropy (−Σ p·logp)."""
        lp = self.log_probs_all
        p = jnp.exp(lp)
        # masked actions have p≈0; p*lp → 0*(-1e10)=nan guard via where
        plp = jnp.where(p > 0, p * lp, 0.0)
        return -jnp.sum(plp, axis=-1)


def categorical(logits, available_actions=None) -> Categorical:
    return Categorical(mask_logits(logits, available_actions))


# ---------------------------------------------------------------------------
# Diagonal Gaussian (on-policy Box actions)
# ---------------------------------------------------------------------------

class DiagGaussian(NamedTuple):
    mean: jnp.ndarray  # (..., d)
    std: jnp.ndarray   # (..., d) or (d,)

    def sample(self, key) -> jnp.ndarray:
        eps = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + jnp.broadcast_to(self.std, self.mean.shape) * eps

    def mode(self) -> jnp.ndarray:
        return self.mean

    def log_prob(self, action: jnp.ndarray) -> jnp.ndarray:
        """Per-dimension log-prob, shape (..., d) — matches FixedNormal.log_probs
        which does NOT sum over dims (the caller aggregates with prod/mean of
        exp(Δlogp) over the last axis, on_policy_ha_runner.py:116-124)."""
        var = self.std ** 2
        return -((action - self.mean) ** 2) / (2 * var) - jnp.log(self.std) - _LOG_SQRT_2PI

    def entropy(self) -> jnp.ndarray:
        """Summed over action dims, shape (...,) (FixedNormal.entropy)."""
        ent = 0.5 + _LOG_SQRT_2PI + jnp.log(jnp.broadcast_to(self.std, self.mean.shape))
        return jnp.sum(ent, axis=-1)


def diag_gaussian_std(log_std: jnp.ndarray, std_x_coef: float, std_y_coef: float) -> jnp.ndarray:
    """sigmoid(log_std/std_x_coef)·std_y_coef (distributions.py:87)."""
    return jax.nn.sigmoid(log_std / std_x_coef) * std_y_coef


# ---------------------------------------------------------------------------
# Tanh-squashed Gaussian (HASAC Box actions)
# ---------------------------------------------------------------------------

# The reference clamps log_std to [-20, 2] (squashed_gaussian_policy.py:10).
# A -20 floor lets the Gaussian density term spike to ~ +20/dim when the std
# head saturates, which is what overflowed the HASAC auto-alpha loop in the
# (reference-twin-confirmed, round-4) n_step=20 divergence. The floor here is
# -5 (std >= 6.7e-3): healthy SAC policies sit at std ~0.1-0.3 (log_std -1
# to -2.3) so the tighter floor binds ONLY in the saturated pathological
# regime, where it bounds per-dim logp at ~ +4.1 instead of +19 — the
# source-side guard the round-4 verdict asked for, complementing (not
# replacing) the critic-side log-alpha clamp (q_critics.py).
LOG_STD_MIN = -5.0
LOG_STD_MAX = 2.0


class SquashedGaussianSample(NamedTuple):
    action: jnp.ndarray    # (..., d), scaled to act_limit
    log_prob: jnp.ndarray  # (..., 1), summed over dims with tanh correction


def squashed_gaussian_sample(key, mu, log_std, act_limit, deterministic=False) -> SquashedGaussianSample:
    """rsample + tanh squash + act_limit rescale.

    Reference: squashed_gaussian_policy.py:57-84. Log-prob uses the stable
    form logp −= Σ 2(log2 − a − softplus(−2a)).
    """
    log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
    std = jnp.exp(log_std)
    if deterministic:
        pre = mu
    else:
        pre = mu + std * jax.random.normal(key, mu.shape, dtype=mu.dtype)
    logp = jnp.sum(
        -((pre - mu) ** 2) / (2 * std ** 2) - log_std - _LOG_SQRT_2PI, axis=-1, keepdims=True
    )
    correction = 2.0 * (math.log(2.0) - pre - jax.nn.softplus(-2.0 * pre))
    logp = logp - jnp.sum(correction, axis=-1, keepdims=True)
    action = jnp.tanh(pre) * act_limit
    return SquashedGaussianSample(action, logp)


# ---------------------------------------------------------------------------
# Gumbel-softmax (HASAC discrete actions)
# ---------------------------------------------------------------------------

def onehot_from_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Argmax one-hot (discrete_util.py:8-16)."""
    return jax.nn.one_hot(jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=logits.dtype)


def gumbel_softmax(key, logits: jnp.ndarray, temperature: float = 1.0, hard: bool = True) -> jnp.ndarray:
    """Straight-through Gumbel-softmax sample (discrete_util.py:44-59)."""
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    y = jax.nn.softmax((logits + g) / temperature, axis=-1)
    if hard:
        y_hard = onehot_from_logits(y)
        y = y_hard + y - jax.lax.stop_gradient(y)
    return y
