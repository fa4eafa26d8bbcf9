"""Pure-JAX many-agent swimmer tests."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import VecEnv
from harl_tpu.envs.mamujoco_jax.swimmer import make_swimmer


def test_shapes_and_conf():
    env = make_swimmer({"agent_conf": "3x2", "episode_limit": 50})
    assert env.n_agents == 3 and env.n_joints == 6 and env.n_links == 7
    state, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (3, env.obs_dim)
    assert ts.share_obs.shape == (env.state_dim,)
    assert env.action_space[0].dim == 2


def test_energy_dissipation_without_input():
    """Viscous drag must bleed physical kinetic energy when no torques act."""
    from harl_tpu.envs.mamujoco_jax.swimmer import LINK_LEN, LINK_MASS, _link_centers

    env = make_swimmer({"agent_conf": "2x2", "episode_limit": 1000})

    def kinetic_energy(state):
        J = jax.jacfwd(lambda q: _link_centers(q, env.n_links))(state.q)
        v = jnp.einsum("lcj,j->lc", J, state.qd)
        inertia = LINK_MASS * LINK_LEN**2 / 12.0
        return float(
            0.5 * LINK_MASS * jnp.sum(v**2) + 0.5 * inertia * jnp.sum(state.qd[2:] ** 2)
        )

    state, _ = env.reset(jax.random.PRNGKey(3))
    state = state._replace(qd=state.qd.at[:].set(1.0))
    e0 = kinetic_energy(state)
    for t in range(50):
        state, ts = env.step(state, jnp.zeros((2, 2)), jax.random.PRNGKey(t))
    e1 = kinetic_energy(state)
    assert e1 < e0 * 0.1
    assert np.isfinite(np.asarray(state.q)).all()


def test_torques_induce_motion_and_reward():
    env = make_swimmer({"agent_conf": "2x2", "episode_limit": 1000})
    state, _ = env.reset(jax.random.PRNGKey(0))
    moved = 0.0
    for t in range(100):
        a = jnp.sin(t * 0.3 + jnp.arange(4).reshape(2, 2)) * jnp.ones((2, 2))
        state, ts = env.step(state, a, jax.random.PRNGKey(t))
        moved += abs(float(ts.rewards[0, 0]))
    assert moved > 0.1  # swimming produces nonzero velocity rewards
    assert np.isfinite(np.asarray(state.qd)).all()


def test_truncation_only_episodes():
    env = make_swimmer({"agent_conf": "2x1", "episode_limit": 5})
    state, ts = env.reset(jax.random.PRNGKey(0))
    for t in range(5):
        state, ts = env.step(state, jnp.zeros((2, 1)), jax.random.PRNGKey(t))
    assert bool(ts.dones.all()) and bool(ts.bad_transition)


@pytest.mark.slow
def test_happo_trains_on_swimmer():
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from tests.test_happo import _cfg

    runner = OnPolicyRunner(
        {"algo": "happo", "env": "mamujoco_jax", "exp_name": "t"},
        _cfg(),
        {"agent_conf": "2x2", "episode_limit": 20},
    )
    state, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["mean_episode_return"])
