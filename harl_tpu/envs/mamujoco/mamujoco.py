"""Multi-Agent MuJoCo (host-backed, gymnasium + MuJoCo C engine).

Parity target: ``harl/envs/mamujoco/multiagent_mujoco/mujoco_multi.py`` — a
single-robot Gym MuJoCo task factorized into per-joint agents. Reproduced
semantics (as actually used by HARL; the vendored k-hop ``build_obs`` path is
bypassed there, mujoco_multi.py:200-213):

  * agents = contiguous partitions of the action vector by ``agent_conf``
    "NxM" (N agents × M joints; obsk.py partitions are contiguous in actuator
    order for the standard confs);
  * per-agent obs = concat(full state, one-hot agent id), standardized by the
    obs vector's own mean/std (mujoco_multi.py:208-211);
  * share_obs = raw full state; team reward repeated per agent;
  * actions arrive in [-1, 1] (NormalizedActions) and are rescaled to the
    robot's bounds; padding columns from wider agents are dropped
    (mujoco_multi.py:159-166);
  * truncation at ``episode_limit`` ⇒ ``bad_transition=True``
    (mujoco_multi.py:178-185).

Scenario names accept both the reference's "-v2" ids and current gymnasium
ids (mapped to the installed v5 tasks).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from harl_tpu.utils import spaces

_SCENARIO_MAP = {
    "HalfCheetah-v2": "HalfCheetah-v5",
    "Ant-v2": "Ant-v5",
    "Walker2d-v2": "Walker2d-v5",
    "Hopper-v2": "Hopper-v5",
    "Humanoid-v2": "Humanoid-v5",
    "HumanoidStandup-v2": "HumanoidStandup-v5",
    "Swimmer-v2": "Swimmer-v5",
    "Reacher-v2": "Reacher-v5",
}


class MAMuJoCoEnv:
    is_jax = False

    def __init__(self, env_args: dict):
        import gymnasium as gym

        self.scenario = env_args.get("scenario", "HalfCheetah-v2")
        self.agent_conf = env_args.get("agent_conf", "6x1")
        self.episode_limit = env_args.get("episode_limit", 1000)
        gym_id = _SCENARIO_MAP.get(self.scenario, self.scenario)
        self.env = gym.make(gym_id)
        self.steps = 0
        self._seed = 0

        total_act = self.env.action_space.shape[0]
        n_agents, joints = (int(x) for x in self.agent_conf.split("x"))
        assert n_agents * joints <= total_act, (
            f"agent_conf {self.agent_conf} exceeds action dim {total_act}"
        )
        self.n_agents = n_agents
        # contiguous action partition; leftover joints go to the last agent
        sizes = [joints] * n_agents
        sizes[-1] += total_act - n_agents * joints
        self._act_slices = []
        start = 0
        for s in sizes:
            self._act_slices.append((start, start + s))
            start += s
        self._low = np.asarray(self.env.action_space.low, np.float32)
        self._high = np.asarray(self.env.action_space.high, np.float32)

        state_dim = int(np.prod(self.env.observation_space.shape))
        obs_dim = state_dim + self.n_agents
        self.observation_space = [
            spaces.Box.create(-10.0, 10.0, obs_dim) for _ in range(self.n_agents)
        ]
        self.share_observation_space = [
            spaces.Box.create(-10.0, 10.0, state_dim) for _ in range(self.n_agents)
        ]
        self.action_space = [
            spaces.Box.create(-1.0, 1.0, sizes[i]) for i in range(self.n_agents)
        ]
        self._state = None

    # ------------------------------------------------------------------ api
    def seed(self, seed: int):
        self._seed = seed

    def reset(self):
        state, _ = self.env.reset(seed=self._seed)
        self._seed += 1
        self.steps = 0
        self._state = np.asarray(state, np.float32)
        return self._obs(), self._share_obs(), None

    def step(self, actions):
        """actions: (n_agents, max_act_dim) in [-1, 1]; padding dropped."""
        flat = np.concatenate(
            [
                np.asarray(actions[i])[: (e - s)]
                for i, (s, e) in enumerate(self._act_slices)
            ]
        ).astype(np.float32)
        flat = np.clip(flat, -1.0, 1.0)
        scaled = self._low + (flat + 1.0) * 0.5 * (self._high - self._low)
        state, reward, term, trunc, info = self.env.step(scaled)
        self.steps += 1
        self._state = np.asarray(state, np.float32)
        done = bool(term) or bool(trunc) or self.steps >= self.episode_limit
        bad = done and not bool(term)
        infos = [{"bad_transition": bad} for _ in range(self.n_agents)]
        rewards = np.full((self.n_agents, 1), float(reward), np.float32)
        dones = np.full((self.n_agents,), done)
        return self._obs(), self._share_obs(), rewards, dones, infos, None

    def _obs(self):
        out = []
        for i in range(self.n_agents):
            oh = np.zeros(self.n_agents, np.float32)
            oh[i] = 1.0
            o = np.concatenate([self._state, oh])
            o = (o - o.mean()) / (o.std() + 1e-8)
            out.append(o)
        return np.stack(out)

    def _share_obs(self):
        return self._state

    def close(self):
        self.env.close()


def make_mamujoco(env_args: dict) -> MAMuJoCoEnv:
    return MAMuJoCoEnv(env_args)
