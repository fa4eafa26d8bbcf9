"""Host-env path tests: MAMuJoCo (MuJoCo C engine) + Gym wrapper + host runner."""
import numpy as np
import pytest

from harl_tpu.envs.mamujoco.mamujoco import make_mamujoco
from harl_tpu.envs.gym.gym_env import make_gym
from harl_tpu.runners.on_policy import OnPolicyRunner
from tests.test_happo import _cfg


def test_mamujoco_interface():
    env = make_mamujoco({"scenario": "HalfCheetah-v2", "agent_conf": "6x1", "episode_limit": 50})
    assert env.n_agents == 6
    assert all(sp.dim == 1 for sp in env.action_space)
    obs, share, avail = env.reset()
    assert obs.shape == (6, 17 + 6)  # state + one-hot id
    assert share.shape == (17,)
    # obs standardized per-vector
    np.testing.assert_allclose(obs[0].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(obs[0].std(), 1.0, atol=1e-4)
    acts = np.zeros((6, 1), np.float32)
    obs2, share2, rew, dones, infos, _ = env.step(acts)
    assert rew.shape == (6, 1)
    assert np.all(rew == rew[0])  # team reward repeated
    assert not dones.any()
    env.close()


def test_mamujoco_truncation_bad_transition():
    env = make_mamujoco({"scenario": "HalfCheetah-v2", "agent_conf": "2x3", "episode_limit": 3})
    assert env.n_agents == 2 and env.action_space[0].dim == 3
    env.reset()
    for _ in range(3):
        obs, share, rew, dones, infos, _ = env.step(np.zeros((2, 3), np.float32))
    assert dones.all()
    assert infos[0]["bad_transition"] is True
    env.close()


def test_gym_wrapper():
    env = make_gym({"scenario": "CartPole-v1"})
    obs, share, avail = env.reset()
    assert obs.shape == (1, 4) and avail.shape == (1, 2)
    obs2, share2, rew, dones, infos, avail2 = env.step(np.array([[1]]))
    assert rew.shape == (1, 1)
    env.close()


def test_happo_trains_on_mamujoco_host():
    """Full host-mode training loop: jitted policy/update + host MuJoCo."""
    cfg = _cfg()
    cfg["train"].update(n_rollout_threads=2, num_env_steps=2 * 10 * 2, episode_length=10)
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "mamujoco", "exp_name": "t"},
        cfg,
        {"scenario": "HalfCheetah-v2", "agent_conf": "3x2", "episode_limit": 20},
    )
    assert runner.host_mode
    state, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["mean_episode_return"])
    assert np.isfinite(history[-1]["value_loss"])


def test_gym_single_agent_training():
    cfg = _cfg()
    cfg["train"].update(n_rollout_threads=2, num_env_steps=2 * 10 * 2, episode_length=10)
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "gym", "exp_name": "t"},
        cfg,
        {"scenario": "CartPole-v1"},
    )
    state, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["mean_episode_return"])


def test_hatd3_trains_on_mamujoco_host():
    """Off-policy host mode: HATD3 on real MuJoCo with device replay/updates."""
    from harl_tpu.runners.off_policy import OffPolicyRunner
    from tests.test_off_policy import _off_cfg

    algo_args, _ = _off_cfg("hatd3")
    algo_args["train"].update(n_rollout_threads=2, num_env_steps=2 * 40, warmup_steps=20)
    runner = OffPolicyRunner(
        {"algo": "hatd3", "env": "mamujoco", "exp_name": "t"},
        algo_args,
        {"scenario": "HalfCheetah-v2", "agent_conf": "3x2", "episode_limit": 25},
    )
    assert runner.host_mode
    state, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["critic_loss"])


def test_host_vec_env_steps_concurrently():
    """N-env host step wall-clock ~= one env's, not N of them (the reference
    parallelizes every host env via subprocess workers, env_wrappers.py:
    220-295; HostVecEnv uses a thread pool). A sleep-env makes the latency
    difference unambiguous: 8 envs x 30ms serial would be ~240ms/step."""
    import time
    from harl_tpu.envs.host import HostVecEnv
    from harl_tpu.utils import spaces as _sp
    import gymnasium

    class SleepEnv:
        n_agents = 2
        observation_space = [gymnasium.spaces.Box(-1, 1, (3,))] * 2
        share_observation_space = [gymnasium.spaces.Box(-1, 1, (6,))] * 2
        action_space = [gymnasium.spaces.Box(-1, 1, (2,))] * 2

        def seed(self, s):
            pass

        def reset(self):
            return np.zeros((2, 3), np.float32), np.zeros((2, 6), np.float32), None

        def step(self, actions):
            time.sleep(0.03)  # emulate an external engine call
            return (np.zeros((2, 3), np.float32), np.zeros((2, 6), np.float32),
                    np.zeros((2, 1), np.float32), np.zeros((2,), bool),
                    [{} for _ in range(2)], None)

    n = 8
    vec = HostVecEnv([SleepEnv for _ in range(n)])
    vec.reset()
    acts = np.zeros((n, 2, 2), np.float32)
    vec.step(acts)  # warm the pool
    t0 = time.time()
    for _ in range(3):
        out = vec.step(acts)
    dt = (time.time() - t0) / 3
    assert out["obs"].shape == (n, 2, 3)
    # serial would be ~0.24s; concurrent should be close to a single env's
    # 30ms (allow generous slack for pool scheduling on a busy CI host)
    assert dt < 0.12, f"host vec step took {dt:.3f}s for {n} envs - serialized?"
    vec.close()


def test_real_binary_adapters_route_and_fail_informatively():
    """SMAC/SMACv2/dexhands real-binary adapter shells: backend=native raises
    an informative ImportError when the SC2/IsaacGym stack is absent (this
    image), and backend=auto falls back to the pure-JAX analogues."""
    import pytest
    from harl_tpu.envs import make_env

    with pytest.raises(ImportError, match="StarCraft II"):
        make_env("smac", {"map_name": "3m", "backend": "native"})
    with pytest.raises(ImportError, match="StarCraft II"):
        make_env("smacv2", {"map_name": "protoss_5_vs_5", "backend": "native"})
    with pytest.raises(ImportError, match="IsaacGym"):
        make_env("dexhands", {"task": "ShadowHandOver", "n_threads": 2,
                              "backend": "native"})
    # auto falls back to the JAX analogues
    env = make_env("smac", {"map_name": "3m"})
    assert env.n_agents == 3 and getattr(env, "is_jax", True) is not False
    env2 = make_env("smacv2", {"map_name": "protoss_5_vs_5"})
    assert env2.n_agents == 5
    env3 = make_env("dexhands", {"task": "ShadowHandOver"})
    assert env3.n_agents == 2


def test_smacv2_map_config_loader():
    """The real-binary SMACv2 adapter reads the ingested reference map-config
    yamls (all 15 present and well-formed)."""
    import glob, os
    from harl_tpu.envs.smacv2.smacv2_env import load_map_config, _MAP_CONFIG_DIR

    maps = sorted(
        os.path.basename(p)[:-5]
        for p in glob.glob(os.path.join(os.path.abspath(_MAP_CONFIG_DIR), "*.yaml"))
    )
    assert len(maps) == 15
    cfg = load_map_config(maps[0])
    assert "capability_config" in cfg or len(cfg) > 0
