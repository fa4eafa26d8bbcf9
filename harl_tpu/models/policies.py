"""Policy models (flax.linen).

Parity targets: ``harl/models/policy_models/*.py``. Each module outputs raw
distribution parameters / deterministic actions; sampling lives in
``harl_tpu.models.act`` / ``harl_tpu.ops.distributions`` with explicit keys.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from harl_tpu.models.act import ACTLayer
from harl_tpu.models.cnn import CNNBase
from harl_tpu.models.mlp import MLPBase, PlainMLP
from harl_tpu.models.rnn import GRUStack


class StochasticPolicy(nn.Module):
    """MLPBase → optional GRU → ACTLayer (stochastic_policy.py:14-86).

    ``__call__(obs, rnn_states, masks, seq)`` → (head_out, new_rnn_states).
    rnn_states: (N, recurrent_n, hidden); pass zeros when not recurrent.
    """

    action_space: object
    hidden_sizes: Sequence[int] = (128, 128)
    activation_func: str = "relu"
    use_feature_normalization: bool = True
    initialization_method: str = "orthogonal_"
    gain: float = 0.01
    use_recurrent_policy: bool = False
    recurrent_n: int = 1
    std_x_coef: float = 1.0
    std_y_coef: float = 0.5
    image_input: bool = False  # 3D obs → CNNBase (stochastic_policy.py:34-36)

    @nn.compact
    def __call__(self, obs, rnn_states=None, masks=None, seq: bool = False):
        if self.image_input:
            x = CNNBase(
                self.hidden_sizes, self.activation_func,
                self.initialization_method, name="base",
            )(obs)
        else:
            x = MLPBase(
                self.hidden_sizes,
                self.activation_func,
                self.use_feature_normalization,
                self.initialization_method,
                name="base",
            )(obs)
        if self.use_recurrent_policy:
            if rnn_states is None:  # e.g. during init
                rnn_states = jnp.zeros(
                    obs.shape[:-1][-1:] + (self.recurrent_n, self.hidden_sizes[-1])
                )
            if masks is None:
                masks = jnp.ones(obs.shape[:-1] + (1,))
            x, rnn_states = GRUStack(
                self.hidden_sizes[-1], self.recurrent_n, name="rnn"
            )(x, rnn_states, masks, seq=seq)
        head_out = ACTLayer(
            self.action_space,
            self.initialization_method,
            self.gain,
            self.std_x_coef,
            self.std_y_coef,
            name="act",
        )(x)
        return head_out, rnn_states


class StochasticMlpPolicy(nn.Module):
    """Non-recurrent stochastic policy for off-policy algos
    (stochastic_mlp_policy.py): MLPBase → ACTLayer, no masks/rnn."""

    action_space: object
    hidden_sizes: Sequence[int] = (128, 128)
    activation_func: str = "relu"
    use_feature_normalization: bool = True
    initialization_method: str = "orthogonal_"
    gain: float = 0.01

    @nn.compact
    def __call__(self, obs):
        x = MLPBase(
            self.hidden_sizes,
            self.activation_func,
            self.use_feature_normalization,
            self.initialization_method,
            name="base",
        )(obs)
        return ACTLayer(
            self.action_space, self.initialization_method, self.gain, name="act"
        )(x)


class SquashedGaussianPolicy(nn.Module):
    """SAC policy (squashed_gaussian_policy.py): PlainMLP torso → mu / log_std
    heads. Returns (mu, log_std); squashing + logprob correction happens in
    ``ops.distributions.squashed_gaussian_sample``."""

    act_dim: int
    hidden_sizes: Sequence[int] = (256, 256)
    activation_func: str = "relu"

    @nn.compact
    def __call__(self, obs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = PlainMLP(
            tuple(self.hidden_sizes),
            self.activation_func,
            final_activation_func=self.activation_func,
            name="net",
        )(obs)
        mu = nn.Dense(self.act_dim, name="mu")(x)
        log_std = nn.Dense(self.act_dim, name="log_std")(x)
        return mu, log_std


class DeterministicPolicy(nn.Module):
    """DDPG/TD3 actor (deterministic_policy.py): PlainMLP with final activation
    (tanh) affinely rescaled to the action bounds."""

    low: Tuple[float, ...]
    high: Tuple[float, ...]
    hidden_sizes: Sequence[int] = (256, 256)
    activation_func: str = "relu"
    final_activation_func: str = "tanh"

    @nn.compact
    def __call__(self, obs) -> jnp.ndarray:
        act_dim = len(self.low)
        x = PlainMLP(
            tuple(self.hidden_sizes) + (act_dim,),
            self.activation_func,
            final_activation_func=self.final_activation_func,
            name="pi",
        )(obs)
        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        return (high - low) / 2.0 * x + (high + low) / 2.0
