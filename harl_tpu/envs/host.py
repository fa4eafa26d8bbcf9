"""Host-side vectorized environment for external (non-JAX) simulators.

The TPU-native analogue of ``ShareDummyVecEnv``/``ShareSubprocVecEnv``
(``harl/envs/env_wrappers.py:220-366``) for env families whose physics runs in
external C/C++ engines (MuJoCo, SC2, gfootball): envs step on the host in
NumPy while policies/updates stay jitted on device. Auto-reset mirrors the
``shareworker`` loop (env_wrappers.py:166-217): when an env reports all-done,
it is reset and the FRESH obs replaces the terminal obs, with the terminal
("original") obs returned separately for off-policy next-obs bookkeeping.

Host envs implement the reference 6-tuple protocol (README.md:186-208):
    reset() -> (obs, share_obs, available_actions)
    step(actions) -> (obs, share_obs, rewards, dones, infos, available_actions)
plus attrs n_agents / observation_space / share_observation_space /
action_space and seed(int).
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np



class HostVecEnv:
    is_jax = False

    def __init__(self, env_fns, seed: int = 1):
        self.envs = [fn() for fn in env_fns]
        self.n_envs = len(self.envs)
        e = self.envs[0]
        self.n_agents = e.n_agents
        self.observation_space = e.observation_space
        self.share_observation_space = e.share_observation_space
        self.action_space = e.action_space
        for i, env in enumerate(self.envs):
            if hasattr(env, "seed"):
                env.seed(seed + i * 1000)  # per-rank seeds (envs_tools.py:99)
        # Per-env step/reset run on a thread pool so external engines
        # (gfootball C++, JSBSim, SC2 RPC) overlap instead of serializing —
        # the threaded analogue of the reference's subprocess workers
        # (env_wrappers.py:220-295). Each env is touched by exactly one task
        # per call, so no cross-env state is shared. Pool size is capped: the
        # wall-clock win comes from overlapping engine/GIL-released work, not
        # from oversubscribing the host cores.
        self._pool = (
            ThreadPoolExecutor(max_workers=min(self.n_envs, (os.cpu_count() or 2) * 4))
            if self.n_envs > 1
            else None
        )

    def _map(self, fn, *iterables):
        if self._pool is None:
            return [fn(*args) for args in zip(*iterables)]
        return list(self._pool.map(fn, *iterables))

    def reset(self):
        results = self._map(lambda env: env.reset(), self.envs)
        obs, share, avail = map(list, zip(*results))
        return (
            np.stack(obs),
            np.stack(share),
            None if avail[0] is None else np.stack(avail),
        )

    def step(self, actions: np.ndarray):
        """actions: (n_envs, n_agents, act_dim). Returns stacked arrays with
        auto-reset applied; ``final_obs``/``final_share`` hold pre-reset
        terminal observations where done. Envs step concurrently on the
        thread pool (shareworker auto-reset semantics preserved per env)."""

        def step_one(env, act):
            o, s, r, d, info, av = env.step(act)
            f_o, f_s = o, s
            if np.all(d):
                o2, s2, av = env.reset()
                o, s = o2, s2
            return o, s, r, d, info, av, f_o, f_s

        results = self._map(step_one, self.envs, list(actions))
        obs, share, rews, dones, infos, avails, final_obs, final_share = map(
            list, zip(*results)
        )
        return dict(
            obs=np.stack(obs).astype(np.float32),
            share_obs=np.stack(share).astype(np.float32),
            rewards=np.stack(rews).astype(np.float32),
            dones=np.stack(dones),
            infos=infos,
            available_actions=None if avails[0] is None else np.stack(avails).astype(np.float32),
            final_obs=np.stack(final_obs).astype(np.float32),
            final_share_obs=np.stack(final_share).astype(np.float32),
        )

    def close(self):
        for env in self.envs:
            if hasattr(env, "close"):
                env.close()
        if self._pool is not None:
            self._pool.shutdown(wait=False)
