"""Pure-JAX environment protocol and batching.

Replaces the reference's subprocess vec-env machinery
(``harl/envs/env_wrappers.py:220-366``) with ``jax.vmap`` over pytree env
states inside jit. An environment is a pair of pure functions over an
immutable params object:

    env.reset(key)                -> (state, TimeStep)
    env.step(state, action, key)  -> (state, TimeStep)

``TimeStep`` carries the reference 6-tuple step protocol (README.md:186-208):
per-agent obs, share_obs (EP: identical per agent), rewards, dones, the
``bad_transition`` truncation flag (env_wrappers worker info dict), and
available_actions. Static metadata (n_agents, spaces) lives on the env object.

Auto-reset matches the ``shareworker`` semantics (env_wrappers.py:166-217):
when all agents are done, the returned obs/state are those of a fresh episode
while rewards/dones/bad_transition describe the finishing step.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class TimeStep(NamedTuple):
    obs: jnp.ndarray                    # (n_agents, obs_dim)
    share_obs: jnp.ndarray              # (share_obs_dim,) — EP state
    rewards: jnp.ndarray                # (n_agents, 1)
    dones: jnp.ndarray                  # (n_agents,) bool
    bad_transition: jnp.ndarray         # () bool — truncation flag
    available_actions: Optional[jnp.ndarray]  # (n_agents, n_actions) or None
    agent_state: Optional[jnp.ndarray] = None  # (n_agents, ds_fp) — FP state
    metrics: Optional[dict] = None      # env metrics (e.g. {"won": bool})


class Transition(NamedTuple):
    """One auto-reset step: ``ts`` is post-reset where done, ``final`` is the
    pre-reset terminal timestep (the worker's ``original_obs`` stash,
    env_wrappers.py:171-189)."""

    state: Any
    ts: TimeStep
    final: TimeStep


def auto_reset_step(env, state, action, key) -> Transition:
    """Step then reset-where-done, with `where`-based state selection."""
    step_key, reset_key = jax.random.split(key)
    next_state, ts = env.step(state, action, step_key)
    done_env = jnp.all(ts.dones)
    reset_state, reset_ts = env.reset(reset_key)
    new_state = jax.tree.map(
        lambda a, b: jnp.where(_expand(done_env, a.ndim), b, a), next_state, reset_state
    )
    obs = jnp.where(_expand(done_env, ts.obs.ndim), reset_ts.obs, ts.obs)
    share_obs = jnp.where(_expand(done_env, ts.share_obs.ndim), reset_ts.share_obs, ts.share_obs)
    if ts.available_actions is not None:
        avail = jnp.where(
            _expand(done_env, ts.available_actions.ndim),
            reset_ts.available_actions,
            ts.available_actions,
        )
    else:
        avail = None
    if ts.agent_state is not None:
        agent_state = jnp.where(
            _expand(done_env, ts.agent_state.ndim), reset_ts.agent_state, ts.agent_state
        )
    else:
        agent_state = None
    post = TimeStep(
        obs, share_obs, ts.rewards, ts.dones, ts.bad_transition, avail,
        agent_state, ts.metrics,
    )
    return Transition(new_state, post, ts)


def _expand(x, ndim):
    return x.reshape((1,) * ndim) if ndim else x


class VecEnv:
    """vmap-batched environment: the TPU-native ShareSubprocVecEnv.

    All methods are jit-compatible; ``n_envs`` is the batch (thread) axis.
    """

    def __init__(self, env, n_envs: int):
        self.env = env
        self.n_envs = n_envs
        self.n_agents = env.n_agents
        self.observation_space = env.observation_space
        self.share_observation_space = env.share_observation_space
        self.action_space = env.action_space

    def reset(self, key) -> Tuple[Any, TimeStep]:
        keys = jax.random.split(key, self.n_envs)
        return jax.vmap(self.env.reset)(keys)

    def step(self, state, actions, key) -> Transition:
        keys = jax.random.split(key, self.n_envs)
        return jax.vmap(lambda s, a, k: auto_reset_step(self.env, s, a, k))(
            state, actions, keys
        )
