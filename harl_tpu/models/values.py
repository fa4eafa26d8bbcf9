"""Value-function models (flax.linen).

Parity targets: ``harl/models/value_function_models/*.py``.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from harl_tpu.models.cnn import CNNBase
from harl_tpu.models.mlp import MLPBase, PlainMLP, get_init
from harl_tpu.models.rnn import GRUStack


class VNet(nn.Module):
    """Centralized V(s) (v_net.py): MLPBase → optional GRU → scalar head.

    The value head uses the configured init method with default gain 1.0
    (v_net.py:41-44 — ``init_`` without an explicit gain).
    """

    hidden_sizes: Sequence[int] = (128, 128)
    activation_func: str = "relu"
    use_feature_normalization: bool = True
    initialization_method: str = "orthogonal_"
    use_recurrent_policy: bool = False
    recurrent_n: int = 1
    image_input: bool = False  # 3D state → CNNBase (v_net.py:30-32)

    @nn.compact
    def __call__(self, cent_obs, rnn_states=None, masks=None, seq: bool = False):
        if self.image_input:
            x = CNNBase(
                self.hidden_sizes, self.activation_func,
                self.initialization_method, name="base",
            )(cent_obs)
        else:
            x = MLPBase(
                self.hidden_sizes,
                self.activation_func,
                self.use_feature_normalization,
                self.initialization_method,
                name="base",
            )(cent_obs)
        if self.use_recurrent_policy:
            if rnn_states is None:  # e.g. during init
                rnn_states = jnp.zeros(
                    cent_obs.shape[:-1][-1:] + (self.recurrent_n, self.hidden_sizes[-1])
                )
            if masks is None:
                masks = jnp.ones(cent_obs.shape[:-1] + (1,))
            x, rnn_states = GRUStack(
                self.hidden_sizes[-1], self.recurrent_n, name="rnn"
            )(x, rnn_states, masks, seq=seq)
        v = nn.Dense(
            1,
            kernel_init=get_init(self.initialization_method, 1.0),
            bias_init=nn.initializers.zeros,
            name="v_out",
        )(x)
        return v, rnn_states


class ContinuousQNet(nn.Module):
    """Q(s, joint-a) (continuous_q_net.py): concat(state, joint onehot/box
    actions) → PlainMLP → scalar. Callers pre-concatenate the joint action
    encoding (one-hot for discrete spaces, continuous_q_net.py:8-20)."""

    hidden_sizes: Sequence[int] = (256, 256)
    activation_func: str = "relu"

    @nn.compact
    def __call__(self, cent_obs, joint_actions) -> jnp.ndarray:
        x = jnp.concatenate([cent_obs, joint_actions], axis=-1)
        return PlainMLP(
            tuple(self.hidden_sizes) + (1,), self.activation_func, name="mlp"
        )(x)


class DuelingQNet(nn.Module):
    """Dueling Q network (dueling_q_net.py): shared base → V head + A head,
    output = A − mean(A) + V."""

    output_dim: int
    base_hidden_sizes: Sequence[int] = (128, 128)
    base_activation_func: str = "relu"
    dueling_v_hidden_sizes: Sequence[int] = (128,)
    dueling_v_activation_func: str = "hardswish"
    dueling_a_hidden_sizes: Sequence[int] = (128,)
    dueling_a_activation_func: str = "hardswish"

    @nn.compact
    def __call__(self, obs) -> jnp.ndarray:
        x = PlainMLP(
            tuple(self.base_hidden_sizes),
            self.base_activation_func,
            final_activation_func=self.base_activation_func,
            name="base",
        )(obs)
        v = PlainMLP(
            tuple(self.dueling_v_hidden_sizes) + (1,),
            self.dueling_v_activation_func,
            name="dueling_v",
        )(x)
        a = PlainMLP(
            tuple(self.dueling_a_hidden_sizes) + (self.output_dim,),
            self.dueling_a_activation_func,
            name="dueling_a",
        )(x)
        return a - jnp.mean(a, axis=-1, keepdims=True) + v
