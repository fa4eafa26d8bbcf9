"""Action heads + functional sample/evaluate.

Parity target: ``harl/models/base/act.py`` (ACTLayer) and
``harl/models/base/distributions.py``. The flax module produces raw head
outputs (logits / mean); sampling, log-prob and entropy are pure functions in
``harl_tpu.ops.distributions`` driven by explicit PRNG keys, so the same head
output can be reused for sampling and evaluation without re-running the torso.

Head output convention (static per action space):
  * Discrete      → (logits,)                               — one (…, n) array
  * MultiDiscrete → (logits_0, …, logits_{k−1})              — k arrays (…, n_i)
  * Box           → (mean, log_std_param)                    — log_std is the raw
                    learnable parameter; std = sigmoid(log_std/x)·y
                    (distributions.py:76-89)
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from harl_tpu.ops import distributions as D
from harl_tpu.utils import spaces
from harl_tpu.models.mlp import get_init


class ACTLayer(nn.Module):
    """Linear head(s) over features (act.py:24-42)."""

    action_space: object  # spaces.Box | spaces.Discrete | spaces.MultiDiscrete
    initialization_method: str = "orthogonal_"
    gain: float = 0.01
    std_x_coef: float = 1.0
    std_y_coef: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        kernel_init = get_init(self.initialization_method, self.gain)
        kind = spaces.space_kind(self.action_space)
        if kind == "Discrete":
            logits = nn.Dense(self.action_space.n, kernel_init=kernel_init,
                              bias_init=nn.initializers.zeros, name="head")(x)
            return (logits,)
        if kind == "MultiDiscrete":
            outs = []
            for i, n in enumerate(self.action_space.nvec):
                outs.append(nn.Dense(int(n), kernel_init=kernel_init,
                                     bias_init=nn.initializers.zeros, name=f"head{i}")(x))
            return tuple(outs)
        # Box → DiagGaussian with state-independent log_std initialised to
        # std_x_coef so that sigmoid(1)·std_y_coef is the initial std
        # (distributions.py:83-85).
        d = self.action_space.shape[0]
        mean = nn.Dense(d, kernel_init=kernel_init,
                        bias_init=nn.initializers.zeros, name="head")(x)
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, float(self.std_x_coef), jnp.float32),
            (d,),
        )
        return (mean, jnp.broadcast_to(log_std, mean.shape))


class ActOutput(NamedTuple):
    actions: jnp.ndarray          # Discrete: (…, 1) int; Box: (…, d); MultiDiscrete: (…, k) int
    log_probs: jnp.ndarray        # Discrete/MultiDiscrete: (…, 1); Box: (…, d) per-dim


def act_sample(
    key,
    head_out: Tuple[jnp.ndarray, ...],
    action_space,
    available_actions: Optional[jnp.ndarray] = None,
    deterministic: bool = False,
    std_x_coef: float = 1.0,
    std_y_coef: float = 0.5,
) -> ActOutput:
    """Sample (or mode) + log-prob; mirrors ACTLayer.forward (act.py:44-82)."""
    kind = spaces.space_kind(action_space)
    if kind == "Discrete":
        dist = D.categorical(head_out[0], available_actions)
        a = dist.mode() if deterministic else dist.sample(key)
        return ActOutput(a, dist.log_prob(a))
    if kind == "MultiDiscrete":
        keys = jax.random.split(key, len(head_out))
        acts, lps = [], []
        for k, logits in zip(keys, head_out):
            dist = D.categorical(logits, None)
            a = dist.mode() if deterministic else dist.sample(k)
            acts.append(a)
            lps.append(dist.log_prob(a))
        actions = jnp.concatenate(acts, axis=-1)
        log_probs = jnp.sum(jnp.concatenate(lps, axis=-1), axis=-1, keepdims=True)
        return ActOutput(actions, log_probs)
    mean, log_std = head_out
    std = D.diag_gaussian_std(log_std, std_x_coef, std_y_coef)
    dist = D.DiagGaussian(mean, std)
    a = dist.mode() if deterministic else dist.sample(key)
    return ActOutput(a, dist.log_prob(a))


class ActEval(NamedTuple):
    log_probs: jnp.ndarray   # same shape convention as ActOutput.log_probs
    entropy: jnp.ndarray     # scalar (aggregated like the reference)


def act_evaluate(
    head_out: Tuple[jnp.ndarray, ...],
    action_space,
    action: jnp.ndarray,
    available_actions: Optional[jnp.ndarray] = None,
    active_masks: Optional[jnp.ndarray] = None,
    std_x_coef: float = 1.0,
    std_y_coef: float = 0.5,
) -> ActEval:
    """Log-prob of given actions + aggregated entropy (act.py:104-157).

    Entropy aggregation: with active_masks, Σ(ent·mask)/Σmask; else mean.
    (For MultiDiscrete the reference's active-mask branch has a broadcasting
    bug, act.py:127-133; we use the per-sub-action sum with masked mean, which
    is the evident intent.)
    """
    kind = spaces.space_kind(action_space)
    if kind == "Discrete":
        dist = D.categorical(head_out[0], available_actions)
        lp = dist.log_prob(action)
        ent = dist.entropy()  # (…,)
    elif kind == "MultiDiscrete":
        lps, ents = [], []
        for i, logits in enumerate(head_out):
            dist = D.categorical(logits, None)
            lps.append(dist.log_prob(action[..., i : i + 1]))
            ents.append(dist.entropy())
        lp = jnp.sum(jnp.concatenate(lps, axis=-1), axis=-1, keepdims=True)
        ent = sum(ents)
    else:
        mean, log_std = head_out
        std = D.diag_gaussian_std(log_std, std_x_coef, std_y_coef)
        dist = D.DiagGaussian(mean, std)
        lp = dist.log_prob(action)
        ent = dist.entropy()
    if active_masks is not None:
        am = active_masks[..., 0]
        entropy = jnp.sum(ent * am) / jnp.maximum(jnp.sum(am), 1e-9)
    else:
        entropy = jnp.mean(ent)
    return ActEval(lp, entropy)


def act_logits(head_out, action_space, available_actions=None):
    """Masked logits (ACTLayer.get_logits, act.py:84-103) — HASAC discrete path."""
    kind = spaces.space_kind(action_space)
    if kind == "Discrete":
        return D.mask_logits(head_out[0], available_actions)
    if kind == "MultiDiscrete":
        return tuple(D.mask_logits(l, None) for l in head_out)
    raise TypeError("logits only defined for discrete action spaces")
