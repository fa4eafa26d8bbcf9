"""Tests for the pure-JAX MPE environments."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from harl_tpu.envs.core import VecEnv, auto_reset_step
from harl_tpu.envs.mpe.mpe import make_mpe


@pytest.mark.parametrize("scenario", ["simple_spread", "simple_reference", "simple_speaker_listener"])
@pytest.mark.parametrize("continuous", [True, False])
def test_reset_step_shapes(scenario, continuous):
    env = make_mpe(scenario, continuous_actions=continuous)
    state, ts = env.reset(jax.random.PRNGKey(0))
    n = env.n_agents
    assert ts.obs.shape[0] == n
    assert ts.rewards.shape == (n, 1)
    assert ts.dones.shape == (n,)
    if continuous:
        max_d = max(sp.dim for sp in env.action_space)
        actions = jnp.full((n, max_d), 0.5)
        assert ts.available_actions is None
    else:
        actions = jnp.zeros((n, 1), jnp.int32)
        assert ts.available_actions.shape == (n, env.max_action_n)
    state2, ts2 = env.step(state, actions, jax.random.PRNGKey(1))
    assert int(state2.t) == 1
    assert not bool(ts2.dones.any())
    assert np.isfinite(np.asarray(ts2.obs)).all()
    assert np.isfinite(float(ts2.rewards[0, 0]))


def test_truncation_at_max_cycles():
    env = make_mpe("simple_spread", max_cycles=5)
    state, ts = env.reset(jax.random.PRNGKey(0))
    actions = jnp.full((3, 5), 0.5)
    for t in range(5):
        state, ts = env.step(state, actions, jax.random.PRNGKey(t))
    assert bool(ts.dones.all())
    assert bool(ts.bad_transition)


def test_auto_reset_restores_fresh_episode():
    env = make_mpe("simple_spread", max_cycles=3)
    state, ts = env.reset(jax.random.PRNGKey(0))
    actions = jnp.full((3, 5), 0.5)
    key = jax.random.PRNGKey(42)
    for t in range(3):
        tr = auto_reset_step(env, state, actions, jax.random.fold_in(key, t))
        state = tr.state
    # final step of episode: pre-reset ts has done, post-reset state starts over
    assert bool(tr.final.dones.all())
    assert int(state.t) == 0
    assert not np.allclose(np.asarray(tr.final.obs), np.asarray(tr.ts.obs))


def test_physics_movement_and_damping():
    env = make_mpe("simple_spread")
    state, _ = env.reset(jax.random.PRNGKey(0))
    # push right: a[1]=1 → u_x = +5
    actions = jnp.zeros((3, 5)).at[:, 1].set(1.0)
    state2, _ = env.step(state, actions, jax.random.PRNGKey(0))
    # v = 0*(0.75) + 5*0.1 = 0.5 (ignoring collision forces); x moves by ≈0.05
    dv = np.asarray(state2.agent_vel - state.agent_vel)
    assert np.all(dv[:, 0] > 0.3)  # allow collision perturbation
    dx = np.asarray(state2.agent_pos - state.agent_pos)
    np.testing.assert_allclose(dx, np.asarray(state2.agent_vel) * 0.1, atol=1e-6)


def test_spread_reward_is_shared_and_negative_distance():
    env = make_mpe("simple_spread", local_ratio=0.0)
    state, _ = env.reset(jax.random.PRNGKey(3))
    actions = jnp.full((3, 5), 0.0)
    state2, ts = env.step(state, actions, jax.random.PRNGKey(0))
    d = np.linalg.norm(
        np.asarray(state2.landmark_pos)[:, None] - np.asarray(state2.agent_pos)[None], axis=-1
    )
    expected = -d.min(axis=1).sum() * 3  # summed team reward (global per agent ×3)
    np.testing.assert_allclose(float(ts.rewards[0, 0]), expected, rtol=1e-5)
    assert np.all(np.asarray(ts.rewards) == float(ts.rewards[0, 0]))


def test_vec_env_vmap_batch():
    env = make_mpe("simple_spread")
    vec = VecEnv(env, n_envs=8)
    state, ts = vec.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (8, 3, 18)
    actions = jnp.full((8, 3, 5), 0.5)
    tr = jax.jit(vec.step)(state, actions, jax.random.PRNGKey(1))
    assert tr.ts.obs.shape == (8, 3, 18)
    assert tr.ts.rewards.shape == (8, 3, 1)
    # different envs got different resets
    assert not np.allclose(np.asarray(ts.obs[0]), np.asarray(ts.obs[1]))


def test_share_obs_is_concat_of_obs():
    env = make_mpe("simple_spread")
    _, ts = env.reset(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(ts.share_obs), np.asarray(ts.obs).reshape(-1), rtol=1e-6
    )
