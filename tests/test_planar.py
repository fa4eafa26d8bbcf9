"""Pure-JAX planar MuJoCo-class robots (HalfCheetah / Walker2d / Hopper).

Physics-sanity and interface tests for harl_tpu/envs/mamujoco_jax/planar.py —
the TPU-native counterpart of the reference's MuJoCo-backed MAMuJoCo
(harl/envs/mamujoco/multiagent_mujoco/mujoco_multi.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from harl_tpu.envs.mamujoco_jax.planar import PlanarDynamics, SPECS, make_planar


@pytest.mark.parametrize(
    "scenario,conf,n_agents,act_dim,obs_dim",
    [
        ("HalfCheetah-v2", "6x1", 6, 1, 17 + 6),
        ("HalfCheetah-v2", "2x3", 2, 3, 17 + 2),
        ("Walker2d-v2", "2x3", 2, 3, 17 + 2),
        ("Walker2d-v2", "6x1", 6, 1, 17 + 6),
        ("Hopper-v2", "3x1", 3, 1, 11 + 3),
    ],
)
def test_spaces(scenario, conf, n_agents, act_dim, obs_dim):
    env = make_planar({"scenario": scenario, "agent_conf": conf})
    assert env.n_agents == n_agents
    assert env.action_space[0].shape == (act_dim,)
    assert env.observation_space[0].shape == (obs_dim,)
    state, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (n_agents, obs_dim)
    # share_obs is the raw gym observation vector
    assert ts.share_obs.shape == env.share_observation_space[0].shape


def test_total_mass_rescale():
    # half_cheetah.xml: settotalmass="14"
    dyn = PlanarDynamics(SPECS["HalfCheetah"])
    assert np.isclose(float(jnp.sum(dyn.masses)), 14.0, atol=1e-4)


def test_cheetah_stable_under_random_actions():
    env = make_planar({"scenario": "HalfCheetah-v2", "agent_conf": "6x1"})
    key = jax.random.PRNGKey(0)
    state, _ = env.reset(key)
    step = jax.jit(env.step)
    for _ in range(150):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (6, 1), minval=-1, maxval=1)
        state, ts = step(state, a, k)
    q = np.asarray(state.q)
    assert np.all(np.isfinite(q))
    # torso stays near the ground plane, neither tunnelling nor launching
    assert -0.5 < q[1] < 1.0
    assert np.all(np.abs(np.asarray(state.qd)) < 100.0)


def test_contact_supports_resting_robot():
    """A hopper with zero action initially stands: contact forces must carry
    its weight (z stays near 1.25 for the first ~50 steps)."""
    env = make_planar({"scenario": "Hopper-v2", "agent_conf": "3x1"})
    state, _ = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for _ in range(50):
        state, ts = step(state, jnp.zeros((3, 1)), key)
    assert float(state.q[1]) > 1.0  # has not fallen through the floor
    assert not bool(ts.dones[0])


def test_energy_dissipates_without_input():
    """Zero torque + damping + friction: kinetic energy must not blow up."""
    env = make_planar({"scenario": "HalfCheetah-v2", "agent_conf": "6x1"})
    state, _ = env.reset(jax.random.PRNGKey(1))
    # kick it
    state = state._replace(qd=state.qd + 2.0)
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for _ in range(100):
        state, _ = step(state, jnp.zeros((6, 1)), key)
    ke = float(jnp.sum(state.qd**2))
    assert np.isfinite(ke) and ke < 50.0


def test_walker_terminates_unhealthy_with_real_done():
    """Walker falling over is a TERMINATION (bad_transition False), while
    hitting episode_limit is a truncation (bad_transition True) — the
    reference's bad_masks distinction (mujoco_multi.py:178-185)."""
    env = make_planar({"scenario": "Walker2d-v2", "agent_conf": "2x3",
                       "episode_limit": 1000})
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    done_at = None
    for i in range(300):
        state, ts = step(state, jnp.zeros((2, 3)), key)
        if bool(ts.dones[0]):
            done_at = i
            break
    assert done_at is not None, "walker with zero torque must fall"
    assert not bool(ts.bad_transition)

    env2 = make_planar({"scenario": "HalfCheetah-v2", "agent_conf": "6x1",
                        "episode_limit": 5})
    state, _ = env2.reset(jax.random.PRNGKey(0))
    step2 = jax.jit(env2.step)
    for _ in range(5):
        state, ts = step2(state, jnp.zeros((6, 1)), key)
    assert bool(ts.dones[0]) and bool(ts.bad_transition)


def test_forward_torque_moves_cheetah():
    """Deterministic: constant torque pattern produces sustained horizontal
    motion (the reward signal exists and reflects x-velocity)."""
    env = make_planar({"scenario": "HalfCheetah-v2", "agent_conf": "6x1"})
    state, _ = env.reset(jax.random.PRNGKey(7))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    total_r = 0.0
    a = jnp.array([[0.5], [-0.5], [0.3], [-0.5], [0.5], [-0.3]])
    for _ in range(100):
        state, ts = step(state, a, key)
        total_r += float(ts.rewards[0, 0])
    assert abs(float(state.q[0])) > 0.05  # it moved
    assert np.isfinite(total_r)


def test_vmap_batched_stepping():
    env = make_planar({"scenario": "HalfCheetah-v2", "agent_conf": "6x1"})
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states, ts = jax.vmap(env.reset)(keys)
    assert ts.obs.shape == (4, 6, 23)
    acts = jnp.zeros((4, 6, 1))
    states2, ts2 = jax.jit(jax.vmap(env.step))(states, acts, keys)
    assert ts2.obs.shape == (4, 6, 23)
    assert bool(jnp.all(jnp.isfinite(ts2.obs)))


def test_happo_trains_on_halfcheetah():
    """End-to-end: the fully-jitted HAPPO iteration runs on the planar
    cheetah and produces finite losses and improving (or at least finite)
    returns."""
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from harl_tpu.utils.config_tools import get_defaults_yaml_args

    algo_args, env_args = get_defaults_yaml_args("happo", "mamujoco_jax")
    algo_args["train"].update(
        n_rollout_threads=8, episode_length=16, num_env_steps=8 * 16 * 3)
    algo_args["model"].update(hidden_sizes=[32, 32])
    algo_args["algo"].update(ppo_epoch=2, critic_epoch=2)
    env_args.update(scenario="HalfCheetah-v2", agent_conf="6x1",
                    episode_limit=100)
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "mamujoco_jax", "exp_name": "test"},
        algo_args, env_args)
    state = runner.init_state(0)
    state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
    assert np.isfinite(float(metrics["mean_step_reward"]))
