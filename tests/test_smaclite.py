"""Tests for the pure-JAX SMACLite combat environment."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from harl_tpu.envs.smaclite.smaclite import make_smaclite
from harl_tpu.envs.core import VecEnv


def test_shapes_and_spaces():
    env = make_smaclite("3m")
    assert env.n_agents == 3 and env.n_enemies == 3
    state, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (3, env.obs_dim)
    assert ts.share_obs.shape == (env.state_dim,)
    assert ts.available_actions.shape == (3, env.n_actions)
    env2 = make_smaclite("8m_vs_9m")
    assert env2.n_allies == 8 and env2.n_enemies == 9


def test_avail_actions_rules():
    env = make_smaclite("3m")
    state, ts = env.reset(jax.random.PRNGKey(0))
    av = np.asarray(ts.available_actions)
    # alive at spawn: no-op unavailable, stop+moves available
    assert np.all(av[:, 0] == 0) and np.all(av[:, 1:6] == 1)
    # spawn clusters are ~16 apart: no attacks available
    assert np.all(av[:, 6:] == 0)
    # kill an ally -> only no-op
    state = state._replace(ally_health=state.ally_health.at[0].set(0.0))
    ts2 = env._timestep(state, jnp.zeros(()), jnp.zeros((), bool), jnp.zeros((), bool), jnp.zeros((), bool))
    av2 = np.asarray(ts2.available_actions)
    assert av2[0, 0] == 1 and np.all(av2[0, 1:] == 0)
    # dead agent's done flag set even though battle continues
    assert bool(ts2.dones[0]) and not bool(ts2.dones[1])


def test_combat_and_win():
    env = make_smaclite("3m", episode_limit=200)
    state, ts = env.reset(jax.random.PRNGKey(1))
    # drive allies east toward enemies, then attack enemy 0 when possible
    total_reward = 0.0
    for t in range(200):
        av = np.asarray(ts.available_actions)
        acts = []
        for i in range(3):
            attack_ids = np.nonzero(av[i, 6:])[0]
            if len(attack_ids) > 0:
                acts.append(6 + attack_ids[0])
            elif av[i, 4] > 0:  # move east
                acts.append(4)
            else:
                acts.append(0)
        state, ts = env.step(state, jnp.asarray(acts)[:, None], jax.random.PRNGKey(t))
        total_reward += float(ts.rewards[0, 0])
        if bool(ts.dones.all()):
            break
    assert bool(ts.dones.all())
    # battle resolved one way or another; reward accumulated from damage
    assert total_reward != 0.0
    assert ts.metrics["won"] is not None


def test_truncation_at_limit():
    env = make_smaclite("3m", episode_limit=5)
    state, ts = env.reset(jax.random.PRNGKey(0))
    noop = jnp.ones((3, 1), jnp.int32)  # stop
    for t in range(5):
        state, ts = env.step(state, noop, jax.random.PRNGKey(t))
    assert bool(ts.dones.all())
    assert bool(ts.bad_transition)
    assert float(ts.metrics["won"]) == 0.0


def test_fp_agent_state():
    env = make_smaclite("3m", state_type="FP")
    state, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.agent_state.shape == (3, env.fp_state_dim)
    assert env.share_observation_space[0].dim == env.fp_state_dim
    # one-hot ids differ per agent
    assert not np.allclose(np.asarray(ts.agent_state[0]), np.asarray(ts.agent_state[1]))


def test_vmap_batch():
    env = make_smaclite("5m_vs_5m")
    vec = VecEnv(env, 8)
    state, ts = vec.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (8, 5, env.obs_dim)
    acts = jnp.ones((8, 5, 1), jnp.int32)
    tr = jax.jit(vec.step)(state, acts, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(tr.ts.obs)).all()


def test_happo_trains_on_smaclite():
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from tests.test_happo import _cfg

    runner = OnPolicyRunner(
        {"algo": "happo", "env": "smaclite", "exp_name": "t"},
        _cfg(),
        {"map_name": "3m", "episode_limit": 10},
    )
    state, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["mean_episode_return"])
    assert "win_rate" in history[-1]


def test_happo_fp_state_on_smaclite():
    """FP (agent-specific state) critic path end-to-end."""
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from tests.test_happo import _cfg

    runner = OnPolicyRunner(
        {"algo": "happo", "env": "smaclite", "exp_name": "t"},
        _cfg(),
        {"map_name": "3m", "episode_limit": 10, "state_type": "FP"},
    )
    assert runner.state_type == "FP"
    state = runner.init_state(1)
    assert state.carry.share_obs.ndim == 3  # (B, N, ds_fp)
    new_state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
    _, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["mean_episode_return"])


def test_smacv2_style_type_randomization():
    """SMACv2 capability-config analogue: per-episode random unit types."""
    env = make_smaclite("protoss_5_vs_5", episode_limit=20)
    assert env.randomize_types
    s1, ts1 = env.reset(jax.random.PRNGKey(0))
    s2, ts2 = env.reset(jax.random.PRNGKey(1))
    # different episodes draw different compositions (w.h.p.)
    assert not np.array_equal(np.asarray(s1.ally_type), np.asarray(s2.ally_type))
    # healths match type table
    from harl_tpu.envs.smaclite.smaclite import TYPE_HEALTH
    np.testing.assert_allclose(
        np.asarray(s1.ally_health), np.asarray(TYPE_HEALTH)[np.asarray(s1.ally_type)]
    )
    assert ts1.obs.shape == (5, env.obs_dim)
    assert ts1.share_obs.shape == (env.state_dim,)
    # trains end-to-end
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from tests.test_happo import _cfg

    runner = OnPolicyRunner(
        {"algo": "happo", "env": "smacv2", "exp_name": "t"},
        _cfg(),
        {"map_name": "protoss_3_vs_3", "episode_limit": 10},
    )
    _, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["mean_episode_return"])
