"""Upstream-faithful ``smac.env`` stub.

API surface mirrors oxwhirl/smac's ``StarCraft2Env`` — in particular
``seed()`` takes NO argument (it returns the stored seed); only the
reference's vendored fork has ``def seed(self, seed)``
(/root/reference/harl/envs/smac/StarCraft2_Env.py:2247). The repo's adapter
must therefore never call ``env.seed(n)`` on the upstream class.
"""
import numpy as np

EPISODE_LIMIT = 5


class StarCraft2Env:
    constructed = []  # (map_name, seed) per construction, for test asserts

    def __init__(self, map_name="8m", difficulty="7", reward_scale=True,
                 state_last_action=True, obs_last_action=False, seed=None,
                 **kwargs):
        self.map_name = map_name
        self._seed = seed
        self.n_agents = 3
        self.n_actions = 9
        self.timeouts = 0
        self._t = 0
        self._closed = False
        StarCraft2Env.constructed.append((map_name, seed))

    def seed(self):
        # upstream signature: no argument
        return self._seed

    def get_env_info(self):
        return dict(state_shape=12, obs_shape=8, n_actions=self.n_actions,
                    n_agents=self.n_agents, episode_limit=EPISODE_LIMIT)

    def reset(self):
        self._t = 0
        return self.get_obs(), self.get_state()

    def get_obs(self):
        return [np.full(8, self._t + 0.1 * a, np.float32)
                for a in range(self.n_agents)]

    def get_state(self):
        return np.full(12, self._t, np.float32)

    def get_avail_actions(self):
        avail = np.ones((self.n_agents, self.n_actions), np.int64)
        avail[:, 0] = 0  # no-op illegal while alive (upstream convention)
        return avail.tolist()

    def step(self, actions):
        assert len(actions) == self.n_agents
        self._t += 1
        terminated = self._t >= EPISODE_LIMIT
        info = {"battle_won": False}
        if terminated:
            # episode-limit end: upstream increments the timeouts counter
            self.timeouts += 1
        return 1.5, terminated, info

    def close(self):
        self._closed = True
