"""CNN building blocks for pixel observations (flax.linen).

Parity targets: ``harl/models/base/cnn.py`` (CNNBase/CNNLayer — single 3×3
stride-1 conv → flatten → linear stack, with /255 input scaling and
orthogonal init) and ``harl/models/base/plain_cnn.py`` (PlainCNN used by
off-policy networks). Inputs are channel-last (H, W, C) — the TPU-native
layout — whereas the reference is channel-first.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from harl_tpu.models.mlp import ACTIVATION_GAIN, ACTIVATIONS, get_init


class CNNBase(nn.Module):
    """conv(k=3, s=1) → flatten → [Linear+act+LayerNorm]* (cnn.py:20-87)."""

    hidden_sizes: Sequence[int]
    activation_func: str = "relu"
    initialization_method: str = "orthogonal_"
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation_func]
        gain = ACTIVATION_GAIN.get(self.activation_func, 1.0)
        kernel_init = get_init(self.initialization_method, gain)
        x = x / 255.0  # cnn.py:62-64
        x = nn.Conv(
            features=self.hidden_sizes[0] // 2,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_init=kernel_init,
            name="conv",
        )(x)
        x = act(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        for i, h in enumerate(self.hidden_sizes):
            x = nn.Dense(h, kernel_init=kernel_init, name=f"fc{i}")(x)
            x = act(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
        return x


class PlainCNN(nn.Module):
    """Un-normalized conv feature extractor (plain_cnn.py): conv → flatten →
    Linear to ``out_dim``."""

    out_dim: int
    activation_func: str = "relu"
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation_func]
        x = x / 255.0
        x = nn.Conv(
            features=32, kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride), name="conv",
        )(x)
        x = act(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.Dense(self.out_dim, name="fc")(x)
        return act(x)
