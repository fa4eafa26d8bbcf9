"""Lightweight, framework-free action/observation space descriptions.

The reference uses gym.spaces objects throughout (e.g. selected by class name in
``harl/models/base/act.py:24-42``). We use small frozen dataclasses instead so that
spaces are hashable static metadata that can be closed over by jitted functions.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Box:
    """Continuous space with per-dim bounds (reference: gym.spaces.Box)."""

    low: Tuple[float, ...]
    high: Tuple[float, ...]

    @property
    def shape(self) -> Tuple[int, ...]:
        return (len(self.low),)

    @property
    def dim(self) -> int:
        return len(self.low)

    @staticmethod
    def create(low, high, dim=None):
        if np.isscalar(low):
            assert dim is not None
            low = [float(low)] * dim
            high = [float(high)] * dim
        return Box(tuple(float(x) for x in low), tuple(float(x) for x in high))


@dataclasses.dataclass(frozen=True)
class ImageBox:
    """Pixel observation space (H, W, C), channel-last — the TPU-native
    layout (reference: 3-dim gym Box routed to CNNBase,
    stochastic_policy.py:34-36)."""

    height: int
    width: int
    channels: int
    low: float = 0.0
    high: float = 255.0

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.height, self.width, self.channels)

    @property
    def dim(self) -> int:
        return self.height * self.width * self.channels


@dataclasses.dataclass(frozen=True)
class Discrete:
    """Single categorical action (reference: gym.spaces.Discrete)."""

    n: int

    @property
    def shape(self) -> Tuple[int, ...]:
        return (1,)

    @property
    def dim(self) -> int:
        return 1


@dataclasses.dataclass(frozen=True)
class MultiDiscrete:
    """Vector of categorical actions (reference: gym.spaces.MultiDiscrete)."""

    nvec: Tuple[int, ...]

    @property
    def shape(self) -> Tuple[int, ...]:
        return (len(self.nvec),)

    @property
    def dim(self) -> int:
        return len(self.nvec)


def space_kind(space) -> str:
    """Mirror the reference's class-name dispatch (act.py:24, envs_tools.py:15-46)."""
    if isinstance(space, Box):
        return "Box"
    if isinstance(space, ImageBox):
        return "ImageBox"
    if isinstance(space, Discrete):
        return "Discrete"
    if isinstance(space, MultiDiscrete):
        return "MultiDiscrete"
    # duck-typing for gym/gymnasium spaces
    name = type(space).__name__
    if name in ("Box", "Discrete", "MultiDiscrete"):
        return name
    raise TypeError(f"Unsupported space: {space!r}")


def get_shape_from_obs_space(obs_space):
    """Observation shape helper (reference: harl/utils/envs_tools.py:15-27)."""
    if isinstance(obs_space, (Box, Discrete, MultiDiscrete)):
        return obs_space.shape
    if hasattr(obs_space, "shape"):
        return tuple(obs_space.shape)
    raise TypeError(f"Unsupported obs space {obs_space!r}")


def get_dim_from_space(space) -> int:
    """Flattened action dim: Box→shape[0], Discrete→1, MultiDiscrete→len(nvec).

    Reference: harl/utils/envs_tools.py:30-46.
    """
    kind = space_kind(space)
    if kind == "Box":
        return space.shape[0]
    if kind == "Discrete":
        return 1
    return len(space.nvec if isinstance(space.nvec, tuple) else tuple(space.nvec))


def get_num_actions(space) -> int:
    """Number of logits needed: Box→dim, Discrete→n, MultiDiscrete→sum(nvec).

    Mirrors ``get_combined_dim`` usage (continuous_q_net.py:8-20).
    """
    kind = space_kind(space)
    if kind == "Box":
        return space.shape[0]
    if kind == "Discrete":
        return space.n
    return int(sum(space.nvec))
