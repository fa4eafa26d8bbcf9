"""Vec-env adapter: the repo's pure-JAX MAMuJoCo Humanoid behind the
REFERENCE's ShareVecEnv protocol (obs/share_obs/avail tuples, auto-reset with
original_obs/original_state in info[0], bad_transition flag — mirrors
harl/envs/env_wrappers.py shareworker semantics).

Round-5 fidelity probe (VERDICT item 4): run the UNMODIFIED reference PyTorch
HAPPO against the repo humanoid env WITH obs_standardize=True. If the
reference algorithm also caps at ~150-step survival, the standardized-obs
failure is a property of the repo's soft-contact physics (env-side), settling
the round-4 "Humanoid parity rests on disabling a reference obs
transformation" question the way the HASAC/HAA2C twins did.
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

from harl_tpu.envs.mamujoco_jax.humanoid import make_humanoid


class JaxMamujocoShareVecEnv:
    def __init__(self, env_args, n_threads, seed):
        self.env = make_humanoid(dict(env_args))
        self.n_threads = n_threads
        self.n_agents = self.env.n_agents
        self._reset1 = jax.jit(jax.vmap(self.env.reset))
        self._step1 = jax.jit(jax.vmap(self.env.step))
        self._key = jax.random.PRNGKey(seed)

        def conv(sp):
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

    def _share(self, ts):
        return np.repeat(
            np.asarray(ts.share_obs, np.float32)[:, None], self.n_agents, 1)

    def reset(self):
        self._state, ts = self._reset1(self._split(self.n_threads))
        return (np.array(ts.obs, np.float32), self._share(ts),
                [None] * self.n_threads)

    def step(self, actions):
        actions = jnp.asarray(np.asarray(actions, np.float32))
        self._state, ts = self._step1(self._state, actions,
                                      self._split(self.n_threads))
        obs = np.array(ts.obs, np.float32)
        share = self._share(ts)
        rew = np.asarray(ts.rewards, np.float32)            # (T, N, 1)
        dones = np.asarray(ts.dones)                        # (T, N)
        bad = np.asarray(ts.bad_transition)                 # (T,)
        infos = [[{} for _ in range(self.n_agents)]
                 for _ in range(self.n_threads)]
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
            share[done_envs] = self._share(new_ts)
        return obs, share, rew, dones, infos, [None] * self.n_threads

    def close(self):
        pass
