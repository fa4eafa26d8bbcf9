"""MLP building blocks (flax.linen).

Parity targets:
  * ``harl/models/base/mlp.py`` — MLPBase: optional input LayerNorm
    (use_feature_normalization), then [Linear → activation → LayerNorm] per
    hidden layer, orthogonal weight init with the activation's gain, zero bias.
  * ``harl/models/base/plain_mlp.py`` — PlainMLP: Linear+activation stacks
    without LayerNorm, used by off-policy networks; final activation
    configurable (e.g. tanh output for DeterministicPolicy).
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

# torch.nn.init.calculate_gain equivalents (models_tools.py:28-60)
ACTIVATION_GAIN = {
    "sigmoid": 1.0,
    "tanh": 5.0 / 3.0,
    "relu": math.sqrt(2.0),
    "leaky_relu": math.sqrt(2.0 / (1.0 + 0.01 ** 2)),
    "selu": 3.0 / 4.0,
    "identity": 1.0,
}

ACTIVATIONS: dict[str, Callable] = {
    "sigmoid": nn.sigmoid,
    "tanh": nn.tanh,
    "relu": nn.relu,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
    "selu": nn.selu,
    "identity": lambda x: x,
    "hardswish": nn.hard_swish,
}


def get_init(initialization_method: str, gain: float):
    """Weight initializer lookup (models_tools.py:38-60 + init helper :90-102)."""
    if initialization_method == "orthogonal_":
        return nn.initializers.orthogonal(scale=gain)
    if initialization_method == "xavier_uniform_":
        return nn.initializers.xavier_uniform()
    if initialization_method == "xavier_normal_":
        return nn.initializers.xavier_normal()
    if initialization_method == "kaiming_uniform_":
        return nn.initializers.he_uniform()
    if initialization_method == "kaiming_normal_":
        return nn.initializers.he_normal()
    raise ValueError(f"Unknown initialization method {initialization_method}")


class MLPBase(nn.Module):
    """Reference MLPBase (mlp.py:44-70): feature-norm + Linear/act/LayerNorm stack."""

    hidden_sizes: Sequence[int]
    activation_func: str = "relu"
    use_feature_normalization: bool = True
    initialization_method: str = "orthogonal_"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation_func]
        gain = ACTIVATION_GAIN.get(self.activation_func, 1.0)
        kernel_init = get_init(self.initialization_method, gain)
        if self.use_feature_normalization:
            x = nn.LayerNorm(name="feature_norm")(x)
        for i, h in enumerate(self.hidden_sizes):
            x = nn.Dense(h, kernel_init=kernel_init, bias_init=nn.initializers.zeros, name=f"fc{i}")(x)
            x = act(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
        return x


class PlainMLP(nn.Module):
    """Reference PlainMLP (plain_mlp.py): Linear+act stacks, no LayerNorm.

    ``sizes`` includes the output dim; the final layer uses
    ``final_activation_func`` (tanh for DeterministicPolicy outputs).
    """

    sizes: Sequence[int]
    activation_func: str = "relu"
    final_activation_func: str = "identity"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, h in enumerate(self.sizes):
            last = i == len(self.sizes) - 1
            x = nn.Dense(h, name=f"fc{i}")(x)
            x = ACTIVATIONS[self.final_activation_func if last else self.activation_func](x)
        return x
