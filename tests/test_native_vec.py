"""Native C++ vectorized MuJoCo engine tests (harl_tpu/native + native_vec).

The in-process thread-pool stepper replacing the reference's subprocess
vec-env (harl/envs/env_wrappers.py:220-295). Skipped when mujoco or a C++
toolchain is unavailable.
"""
import numpy as np
import pytest

try:
    from harl_tpu.envs.mamujoco.native_vec import NativeMAMuJoCoVec
    from harl_tpu.native.build import load

    load()
    HAVE_NATIVE = True
except Exception:  # pragma: no cover - environment-dependent
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native engine unavailable")


def _make(scenario="HalfCheetah-v2", conf="6x1", n=4, **kw):
    env = NativeMAMuJoCoVec({"scenario": scenario, "agent_conf": conf, **kw})
    env.ensure_envs(n, seed=0)
    return env


def test_dims_and_reset():
    env = _make()
    assert (env.nq, env.nv, env.nu) == (9, 9, 6)
    obs, share, avail = env.reset()
    assert obs.shape == (4, 6, 17 + 6)
    assert share.shape == (4, 17)
    assert avail is None
    env.close()


def test_step_protocol_and_determinism():
    env = _make(n=2)
    env.reset()
    a = np.full((2, 6, 1), 0.3)
    res = env.step(a)
    for k in ("obs", "share_obs", "rewards", "dones", "final_obs"):
        assert k in res
    assert res["rewards"].shape == (2, 6, 1)
    # same ctrl on identically-seeded engines → same trajectory
    env2 = _make(n=2)
    env2.reset()
    res2 = env2.step(a)
    np.testing.assert_allclose(res["share_obs"], res2["share_obs"], atol=1e-12)
    env.close()
    env2.close()


def test_team_reward_and_physics_moves():
    env = _make(n=2)
    env.reset()
    x0 = env._qpos[:, 0].copy()
    for _ in range(50):
        res = env.step(np.random.default_rng(0).uniform(-1, 1, (2, 6, 1)))
    assert np.any(env._qpos[:, 0] != x0)
    # identical team reward across agents
    assert np.all(res["rewards"] == res["rewards"][:, :1])
    env.close()


def test_truncation_and_autoreset():
    env = _make(n=2, episode_limit=5)
    env.reset()
    a = np.zeros((2, 6, 1))
    for i in range(5):
        res = env.step(a)
    assert res["dones"].all()
    assert all(info[0]["bad_transition"] for info in res["infos"])
    # auto-reset: fresh episode obs returned, step counter cleared
    assert (env.steps == 0).all()
    # final_obs holds the pre-reset terminal observation
    assert res["final_obs"].shape == res["obs"].shape


def test_hopper_termination_is_real_done():
    env = _make("Hopper-v2", "3x1", n=2, episode_limit=1000)
    env.reset()
    a = np.zeros((2, 3, 1))
    done_seen = False
    for _ in range(400):
        res = env.step(a)
        if res["dones"].any():
            done_seen = True
            idx = np.nonzero(res["dones"][:, 0])[0][0]
            assert not res["infos"][idx][0]["bad_transition"]
            break
    assert done_seen, "zero-torque hopper must eventually fall"
    env.close()


def test_humanoid_17x1():
    env = _make("Humanoid-v2", "17x1", n=2)
    assert env.n_agents == 17
    obs, share, _ = env.reset()
    assert obs.shape == (2, 17, env.state_dim + 17)
    res = env.step(np.zeros((2, 17, 1)))
    assert np.all(np.isfinite(res["share_obs"]))
    env.close()


def test_ant_4x2():
    env = _make("Ant-v2", "4x2", n=2)
    assert env.n_agents == 4
    env.reset()
    res = env.step(np.zeros((2, 4, 2)))
    assert np.all(np.isfinite(res["rewards"]))
    env.close()


def test_on_policy_runner_with_native_env():
    """HAPPO host-mode training on the native vectorized engine."""
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from harl_tpu.utils.config_tools import get_defaults_yaml_args

    algo_args, env_args = get_defaults_yaml_args("happo", "mamujoco")
    algo_args["train"].update(
        n_rollout_threads=4, episode_length=10, num_env_steps=4 * 10 * 2)
    algo_args["model"].update(hidden_sizes=[32, 32])
    algo_args["algo"].update(ppo_epoch=2, critic_epoch=2)
    env_args.update(scenario="HalfCheetah-v2", agent_conf="6x1",
                    backend="native", episode_limit=100)
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "mamujoco", "exp_name": "test"},
        algo_args, env_args)
    assert getattr(runner.vec, "is_vectorized", False), "native engine not used"
    state = runner.init_state(0)
    state, metrics = runner.host_train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
