"""Stub of ``bidexhands.utils.parse_task``: a fake batched MultiAgent task
with the IsaacGym tensor protocol (torch tensors in/out, one sim holding all
envs — multi_vec_task.py:164-240 shapes: per-agent obs views (n_envs, N, do),
shared state (n_envs, N, ds), actions arrive agent-major (N, n_envs, da))."""
import numpy as np
import torch

N_AGENTS = 2
OBS_DIM = 24
STATE_DIM = 48
ACT_DIM = 20


class _Box:
    def __init__(self, dim):
        self.shape = (dim,)
        self.low = np.full(dim, -1.0, np.float32)
        self.high = np.full(dim, 1.0, np.float32)


class FakeMultiVecTask:
    def __init__(self, num_envs):
        self.num_envs = num_envs
        self.num_agents = N_AGENTS
        self.observation_space = [_Box(OBS_DIM)] * N_AGENTS
        self.share_observation_space = [_Box(STATE_DIM)] * N_AGENTS
        self.action_space = [_Box(ACT_DIM)] * N_AGENTS
        self.step_actions = []  # shapes seen by step(), for test asserts
        self._t = 0

    def reset(self):
        self._t = 0
        obs = torch.zeros(self.num_envs, N_AGENTS, OBS_DIM)
        state = torch.zeros(self.num_envs, N_AGENTS, STATE_DIM)
        return obs, state, None

    def step(self, actions):
        assert isinstance(actions, torch.Tensor)
        self.step_actions.append(tuple(actions.shape))
        assert tuple(actions.shape) == (N_AGENTS, self.num_envs, ACT_DIM)
        self._t += 1
        obs = torch.full((self.num_envs, N_AGENTS, OBS_DIM), float(self._t))
        state = torch.full((self.num_envs, N_AGENTS, STATE_DIM), float(self._t))
        rew = torch.full((self.num_envs, N_AGENTS, 1), 0.5)
        done = torch.zeros(self.num_envs, N_AGENTS, dtype=torch.bool)
        return obs, state, rew, done, [{}] * self.num_envs, None


def parse_task(args, cfg, sim_params, agent_index):
    assert args.task_type == "MultiAgent"
    return FakeMultiVecTask(cfg["env"]["numEnvs"])
