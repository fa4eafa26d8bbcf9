"""Upstream-faithful ``smacv2.env.starcraft2.wrapper`` stub.

``StarCraftCapabilityEnvWrapper`` takes the FULL wrapper kwargs — the
capability distribution lives under the ``capability_config`` key and the
SC2 map under ``map_name`` (the reference passes its map-config yaml as
``StarCraftCapabilityEnvWrapper(seed=seed, **map_config)``,
/root/reference/harl/envs/smacv2/smacv2_env.py:48) — so the stub REJECTS
construction when the adapter splats a bare capability subtree as top-level
kwargs (the round-5 adapter bug class).
"""
import numpy as np

EPISODE_LIMIT = 5


class _Inner:
    def __init__(self):
        self.timeouts = 0


class StarCraftCapabilityEnvWrapper:
    constructed = []  # (map_name, seed, n_units) per construction

    def __init__(self, seed=None, capability_config=None, map_name=None,
                 **kwargs):
        if capability_config is None or map_name is None:
            raise TypeError(
                "StarCraftCapabilityEnvWrapper requires capability_config "
                "and map_name (full wrapper kwargs, not a bare capability "
                f"subtree); got kwargs={sorted(kwargs)}")
        if "n_units" in kwargs or "team_gen" in kwargs:
            raise TypeError("capability keys passed at top level")
        self.capability_config = capability_config
        self.n_units = int(capability_config["n_units"])
        self.env = _Inner()
        self._seed = seed
        self._t = 0
        self._closed = False
        StarCraftCapabilityEnvWrapper.constructed.append(
            (map_name, seed, self.n_units))

    def get_env_info(self):
        return dict(state_shape=16, obs_shape=10, n_actions=11,
                    n_agents=self.n_units, episode_limit=EPISODE_LIMIT)

    def reset(self):
        self._t = 0

    def get_obs(self):
        return [np.full(10, self._t + 0.1 * a, np.float32)
                for a in range(self.n_units)]

    def get_state(self):
        return np.full(16, self._t, np.float32)

    def get_avail_actions(self):
        return np.ones((self.n_units, 11), np.int64).tolist()

    def step(self, actions):
        assert len(actions) == self.n_units
        self._t += 1
        terminated = self._t >= EPISODE_LIMIT
        if terminated:
            self.env.timeouts += 1
        return 2.0, terminated, {"battle_won": False}

    def close(self):
        self._closed = True
