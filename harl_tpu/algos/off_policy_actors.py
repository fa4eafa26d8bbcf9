"""Off-policy actors: HADDPG, HATD3, HASAC, HAD3QN (+ MADDPG/MATD3 aliases).

Parity targets: ``harl/algorithms/actors/{haddpg,hatd3,hasac,had3qn}.py`` and
``off_policy_base.py``. Each actor owns a policy module plus target params;
exploration, target smoothing and Gumbel/squashed sampling are pure functions
with explicit keys. Polyak soft updates live in ``algos.common.soft_update``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from harl_tpu.models.policies import (
    DeterministicPolicy,
    SquashedGaussianPolicy,
    StochasticMlpPolicy,
)
from harl_tpu.models.values import DuelingQNet
from harl_tpu.ops import distributions as D
from harl_tpu.utils import spaces


class OffPolicyAgentState(NamedTuple):
    params: any
    target_params: any
    opt_state: any
    log_alpha: Optional[jnp.ndarray]      # HASAC auto-alpha (scalar) or None
    alpha_opt_state: Optional[any]


class HADDPGActor:
    """Deterministic policy + Gaussian exploration noise (haddpg.py:30-43)."""

    def __init__(self, obs_dim, action_space, cfg: dict):
        assert spaces.space_kind(action_space) == "Box", (
            f"only continuous action space is supported by {type(self).__name__}"
        )
        self.action_space = action_space
        self.obs_dim = obs_dim
        self.low = jnp.asarray(action_space.low)
        self.high = jnp.asarray(action_space.high)
        self.scale = (self.high - self.low) / 2.0
        self.mean = (self.high + self.low) / 2.0
        self.expl_noise = cfg["expl_noise"]
        self.lr = cfg["lr"]
        self.polyak = cfg["polyak"]
        self.policy = DeterministicPolicy(
            low=action_space.low,
            high=action_space.high,
            hidden_sizes=tuple(cfg["hidden_sizes"]),
            activation_func=cfg.get("activation_func", "relu"),
            final_activation_func=cfg.get("final_activation_func", "tanh"),
        )
        self.tx = optax.adam(self.lr)

    def init(self, key) -> OffPolicyAgentState:
        params = self.policy.init(key, jnp.zeros((1, self.obs_dim)))
        return OffPolicyAgentState(params, params, self.tx.init(params), None, None)

    def get_actions(self, params, obs, key=None, add_noise=False):
        actions = self.policy.apply(params, obs)
        if add_noise:
            noise = jax.random.normal(key, actions.shape) * self.expl_noise * self.scale
            actions = jnp.clip(actions + noise, self.low, self.high)
        return actions

    def get_target_actions(self, target_params, obs, key=None):
        return self.policy.apply(target_params, obs)

    def random_actions(self, key, batch):
        """Uniform warmup actions (off_policy_base_runner.sample_actions)."""
        return jax.random.uniform(
            key, (batch, len(self.action_space.low)), minval=self.low, maxval=self.high
        )


class HATD3Actor(HADDPGActor):
    """Adds clipped target-policy smoothing noise (hatd3.py:13-28)."""

    def __init__(self, obs_dim, action_space, cfg):
        super().__init__(obs_dim, action_space, cfg)
        self.policy_noise = cfg["policy_noise"]
        self.noise_clip = cfg["noise_clip"]

    def get_target_actions(self, target_params, obs, key=None):
        actions = self.policy.apply(target_params, obs)
        noise = jax.random.normal(key, actions.shape) * self.policy_noise * self.scale
        noise = jnp.clip(noise, -self.noise_clip * self.scale, self.noise_clip * self.scale)
        return jnp.clip(actions + noise, self.low, self.high)


class HASACActor:
    """Squashed Gaussian (Box) or straight-through Gumbel (Discrete/
    MultiDiscrete) stochastic actor (hasac.py)."""

    def __init__(self, obs_dim, action_space, cfg: dict):
        self.action_space = action_space
        self.obs_dim = obs_dim
        self.kind = spaces.space_kind(action_space)
        self.lr = cfg["lr"]
        self.polyak = cfg["polyak"]
        hs = tuple(cfg["hidden_sizes"])
        if self.kind == "Box":
            self.act_limit = float(action_space.high[0])
            self.policy = SquashedGaussianPolicy(
                act_dim=action_space.shape[0],
                hidden_sizes=hs,
                activation_func=cfg.get("activation_func", "relu"),
            )
        else:
            self.policy = StochasticMlpPolicy(
                action_space=action_space,
                hidden_sizes=hs,
                activation_func=cfg.get("activation_func", "relu"),
                use_feature_normalization=cfg.get("use_feature_normalization", True),
                initialization_method=cfg.get("initialization_method", "orthogonal_"),
                gain=cfg.get("gain", 0.01),
            )
        self.tx = optax.adam(self.lr)

    @property
    def onehot_dim(self) -> int:
        """Width of the action encoding fed to the joint-action critic."""
        if self.kind == "Box":
            return self.action_space.shape[0]
        if self.kind == "Discrete":
            return self.action_space.n
        return int(sum(self.action_space.nvec))

    def init(self, key) -> OffPolicyAgentState:
        params = self.policy.init(key, jnp.zeros((1, self.obs_dim)))
        return OffPolicyAgentState(params, params, self.tx.init(params), None, None)

    def get_actions_with_logprobs(self, params, obs, key, available_actions=None,
                                  stochastic=True):
        """(actions, logp) — actions are env-scaled (Box) or one-hot
        (Discrete/MultiDiscrete with logp = Σ onehot·logits, hasac.py:59-77)."""
        if self.kind == "Box":
            mu, log_std = self.policy.apply(params, obs)
            s = D.squashed_gaussian_sample(
                key, mu, log_std, self.act_limit, deterministic=not stochastic
            )
            return s.action, s.log_prob
        head = self.policy.apply(params, obs)
        if self.kind == "Discrete":
            logits = D.mask_logits(head[0], available_actions)
            if stochastic:
                onehot = D.gumbel_softmax(key, logits, hard=True)
            else:
                onehot = D.onehot_from_logits(logits)
            logp = jnp.sum(onehot * logits, axis=-1, keepdims=True)
            return onehot, logp
        # MultiDiscrete: per-sub gumbel; concat onehots + per-sub logps
        onehots, logps = [], []
        for i, logits in enumerate(head):
            k = jax.random.fold_in(key, i)
            oh = D.gumbel_softmax(k, logits, hard=True) if stochastic else D.onehot_from_logits(logits)
            onehots.append(oh)
            logps.append(jnp.sum(oh * logits, axis=-1, keepdims=True))
        return jnp.concatenate(onehots, axis=-1), jnp.concatenate(logps, axis=-1)

    def get_actions(self, params, obs, key, available_actions=None, stochastic=True):
        """Env-facing actions: Box → scaled; discrete → integer indices."""
        if self.kind == "Box":
            a, _ = self.get_actions_with_logprobs(params, obs, key, None, stochastic)
            return a
        head = self.policy.apply(params, obs)
        if self.kind == "Discrete":
            logits = D.mask_logits(head[0], available_actions)
            oh = D.gumbel_softmax(key, logits, hard=True) if stochastic else D.onehot_from_logits(logits)
            return jnp.argmax(oh, axis=-1, keepdims=True)
        idxs = []
        for i, logits in enumerate(head):
            k = jax.random.fold_in(key, i)
            oh = D.gumbel_softmax(k, logits, hard=True) if stochastic else D.onehot_from_logits(logits)
            idxs.append(jnp.argmax(oh, axis=-1, keepdims=True))
        return jnp.concatenate(idxs, axis=-1)

    def random_actions(self, key, batch):
        if self.kind == "Box":
            low = jnp.asarray(self.action_space.low)
            high = jnp.asarray(self.action_space.high)
            return jax.random.uniform(key, (batch, len(self.action_space.low)),
                                      minval=low, maxval=high)
        if self.kind == "Discrete":
            return jax.random.randint(key, (batch, 1), 0, self.action_space.n)
        return jnp.stack(
            [
                jax.random.randint(jax.random.fold_in(key, i), (batch,), 0, int(n))
                for i, n in enumerate(self.action_space.nvec)
            ],
            axis=-1,
        )


class HAD3QNActor:
    """Per-agent dueling Q-network actor with ε-greedy (had3qn.py)."""

    def __init__(self, obs_dim, action_space, cfg: dict):
        assert spaces.space_kind(action_space) == "Discrete", (
            "only discrete action space is supported by HAD3QN"
        )
        self.action_space = action_space
        self.obs_dim = obs_dim
        self.action_dim = action_space.n
        self.lr = cfg["lr"]
        self.polyak = cfg["polyak"]
        self.epsilon = cfg["epsilon"]
        self.policy = DuelingQNet(
            output_dim=self.action_dim,
            base_hidden_sizes=tuple(cfg.get("base_hidden_sizes", cfg["hidden_sizes"])),
            base_activation_func=cfg.get("base_activation_func", "relu"),
            dueling_v_hidden_sizes=tuple(cfg.get("dueling_v_hidden_sizes", [128])),
            dueling_v_activation_func=cfg.get("dueling_v_activation_func", "hardswish"),
            dueling_a_hidden_sizes=tuple(cfg.get("dueling_a_hidden_sizes", [128])),
            dueling_a_activation_func=cfg.get("dueling_a_activation_func", "hardswish"),
        )
        self.tx = optax.adam(self.lr)

    def init(self, key) -> OffPolicyAgentState:
        params = self.policy.init(key, jnp.zeros((1, self.obs_dim)))
        return OffPolicyAgentState(params, params, self.tx.init(params), None, None)

    def get_actions(self, params, obs, key=None, epsilon_greedy=False):
        q = self.policy.apply(params, obs)
        greedy = jnp.argmax(q, axis=-1, keepdims=True)
        if not epsilon_greedy:
            return greedy
        k1, k2 = jax.random.split(key)
        rand = jax.random.randint(k1, greedy.shape, 0, self.action_dim)
        explore = jax.random.uniform(k2, (obs.shape[0], 1)) < self.epsilon
        return jnp.where(explore, rand, greedy)

    def get_target_actions(self, target_params, obs, key=None):
        q = self.policy.apply(target_params, obs)
        return jnp.argmax(q, axis=-1, keepdims=True)

    def train_values(self, params, obs, actions):
        """Q(s, a) gathered at given integer actions (had3qn.py:56-67)."""
        q = self.policy.apply(params, obs)
        return jnp.take_along_axis(q, actions.astype(jnp.int32), axis=-1)

    def random_actions(self, key, batch):
        return jax.random.randint(key, (batch, 1), 0, self.action_dim)


# MADDPG / MATD3 actors are identical to HADDPG / HATD3 (maddpg.py:5-6);
# the behavioral difference lives in the runner's simultaneous update.
MADDPGActor = HADDPGActor
MATD3Actor = HATD3Actor
