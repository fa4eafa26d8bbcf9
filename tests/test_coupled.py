"""Pure-JAX coupled_half_cheetah tests.

Covers the reference env contract (coupled_half_cheetah.py: stacked-qpos obs
with qpos[1:]+qvel, mean team reward, no termination) and the tendon
coupling physics.
"""
import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.mamujoco_jax.coupled import make_coupled


def test_spaces_and_obs_layout():
    env = make_coupled({})
    assert env.n_agents == 2
    assert env.action_space[0].shape == (6,)
    # 18-dof stacked coords: state = 17 qpos + 18 qvel
    assert env.state_dim == 35
    assert env.obs_dim == 37
    state, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (2, 37)
    assert ts.share_obs.shape == (35,)
    # second cheetah's absolute x IS in the state (reference _get_obs quirk)
    sv = env._state_vec(state)
    np.testing.assert_allclose(float(sv[8]), float(state.q[1, 0]), rtol=1e-6)


def test_stable_rollout_and_truncation():
    env = make_coupled({"episode_limit": 12})
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for i in range(12):
        a = 0.3 * jnp.sin(0.2 * i) * jnp.ones((2, 6))
        state, ts = step(state, a, key)
    assert bool(ts.dones[0]) and bool(ts.bad_transition)
    assert bool(jnp.all(jnp.isfinite(ts.obs)))


def test_tendon_limits_hold_cheetahs_together():
    """Drag cheetah A far away: the tendon hard limit must pull the pair
    back within the limit length (planar separation < sqrt(3.5^2 - 4))."""
    env = make_coupled({})
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = state._replace(q=state.q.at[0, 0].set(5.0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for _ in range(120):
        state, ts = step(state, jnp.zeros((2, 6)), key)
    sep = abs(float(state.q[0, 0] - state.q[1, 0]))
    assert sep < 3.6  # pulled back near/inside the limit envelope
    assert bool(jnp.all(jnp.isfinite(state.q)))


def test_weak_spring_inside_limits():
    """Inside the limit range the coupling is nearly free (stiffness 0.1):
    a small separation stays essentially unchanged over a short horizon."""
    env = make_coupled({})
    f = env._tendon_force(jnp.array([1.0, 0.0]), jnp.zeros(2))
    # length = sqrt(1 + 4) ~ 2.24 -> tension 0.1 * 0.24 -> tiny force
    assert float(jnp.linalg.norm(f)) < 0.05


def test_happo_trains_on_coupled():
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from harl_tpu.utils.config_tools import get_defaults_yaml_args

    algo_args, env_args = get_defaults_yaml_args("happo", "mamujoco_jax")
    env_args.update(scenario="coupled_half_cheetah", agent_conf="1p1")
    algo_args["train"].update(
        n_rollout_threads=8, episode_length=16, num_env_steps=8 * 16 * 2)
    algo_args["model"].update(hidden_sizes=[32, 32])
    algo_args["algo"].update(ppo_epoch=2, critic_epoch=2)
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "mamujoco_jax", "exp_name": "test"},
        algo_args, env_args)
    state = runner.init_state(0)
    state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
