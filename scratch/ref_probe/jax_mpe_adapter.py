"""Vec-env adapter: the repo's pure-JAX MPE behind the REFERENCE's
ShareVecEnv protocol (obs/share_obs/avail tuples, auto-reset with
original_obs/original_state in info[0], bad_transition flag — mirrors
harl/envs/env_wrappers.py shareworker semantics).

Lets the reference PyTorch HASAC run against the identical environment the
repo trains on, isolating algorithm-side divergence from env differences.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import gymnasium

from harl_tpu.envs.mpe.mpe import make_mpe


class JaxMPEShareVecEnv:
    def __init__(self, env_args, n_threads, seed):
        scenario = env_args["scenario"].replace("_v2", "").replace("_v3", "")
        self.env = make_mpe(
            scenario=scenario,
            continuous_actions=bool(env_args.get("continuous_actions", False)))
        self.n_threads = n_threads
        self.n_agents = self.env.n_agents
        self._reset1 = jax.jit(jax.vmap(self.env.reset))
        self._step1 = jax.jit(jax.vmap(self.env.step))
        self._key = jax.random.PRNGKey(seed)

        def conv(sp):
            if hasattr(sp, "n"):
                return gymnasium.spaces.Discrete(int(sp.n))
            low = np.asarray(sp.low, np.float32)
            high = np.asarray(sp.high, np.float32)
            if low.ndim == 0:
                low = np.full((int(sp.dim),), float(low), np.float32)
                high = np.full((int(sp.dim),), float(high), np.float32)
            return gymnasium.spaces.Box(low, high, dtype=np.float32)

        self.observation_space = [conv(s) for s in self.env.observation_space]
        self.share_observation_space = [
            conv(s) for s in self.env.share_observation_space]
        self.action_space = [conv(s) for s in self.env.action_space]
        self._state = None

    def _split(self, n):
        self._key, *ks = jax.random.split(self._key, n + 1)
        return jnp.stack(ks)

    def reset(self):
        self._state, ts = self._reset1(self._split(self.n_threads))
        obs = np.array(ts.obs, np.float32)
        share = np.repeat(
            np.asarray(ts.share_obs, np.float32)[:, None], self.n_agents, 1)
        return obs, share, [None] * self.n_threads

    def step(self, actions):
        actions = jnp.asarray(np.asarray(actions, np.float32))
        self._state, ts = self._step1(self._state, actions,
                                      self._split(self.n_threads))
        obs = np.array(ts.obs, np.float32)
        share = np.repeat(
            np.asarray(ts.share_obs, np.float32)[:, None], self.n_agents, 1)
        rew = np.asarray(ts.rewards, np.float32)            # (T, N, 1)
        dones = np.asarray(ts.dones)                        # (T, N)
        bad = np.asarray(ts.bad_transition)                 # (T,)
        infos = [[{} for _ in range(self.n_agents)] for _ in range(self.n_threads)]
        done_envs = np.nonzero(np.all(dones, axis=1))[0]
        if len(done_envs):
            for i in done_envs:
                for a in range(self.n_agents):
                    if bad[i]:
                        infos[i][a]["bad_transition"] = True
                infos[i][0]["original_obs"] = obs[i].copy()
                infos[i][0]["original_state"] = share[i].copy()
            # auto-reset the finished envs (shareworker :171-186)
            idx = jnp.asarray(done_envs)
            new_state, new_ts = self._reset1(self._split(len(done_envs)))
            self._state = jax.tree.map(
                lambda s, ns: s.at[idx].set(ns), self._state, new_state)
            obs[done_envs] = np.asarray(new_ts.obs, np.float32)
            share[done_envs] = np.repeat(
                np.asarray(new_ts.share_obs, np.float32)[:, None],
                self.n_agents, 1)
        return obs, share, rew, dones, infos, [None] * self.n_threads

    def close(self):
        pass
