"""Tests for the pure-JAX 3D Ant (MAMuJoCo Ant-v2 scenarios on device)."""
import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import VecEnv
from harl_tpu.envs.mamujoco_jax.ant import TOTAL_MASS, AntState, make_ant


def test_mass_matches_mujoco_model():
    # ant.xml density 5.0 over sphere + 12 capsules → ≈ 0.91 kg
    assert abs(float(TOTAL_MASS) - 0.91) < 0.02


def test_spaces_and_confs():
    for conf, n, per in (("2x4", 2, 4), ("4x2", 4, 2), ("8x1", 8, 1)):
        env = make_ant({"agent_conf": conf})
        assert env.n_agents == n
        assert env.action_space[0].shape[0] == per
        s, ts = env.reset(jax.random.PRNGKey(0))
        assert ts.obs.shape == (n, env.obs_dim)
        assert ts.share_obs.shape == (env.state_dim,)


def test_passive_settle_stands():
    """Zero torque: the ant must come to rest standing on its feet (joint
    limits hold the legs), not collapse onto the torso sphere."""
    env = make_ant({"agent_conf": "4x2"})
    s, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(lambda s: env.step(s, jnp.zeros((4, 2)), jax.random.PRNGKey(0)))
    for _ in range(120):
        s, ts = step(s)
    q = np.asarray(s.q)
    assert q[2] > 0.3, f"torso z {q[2]} — collapsed"
    assert float(jnp.linalg.norm(s.qd)) < 0.05, "not at rest"
    feet = np.asarray(env.dyn._contacts(s.q))[1:, 2]
    assert np.all(feet < 0.12), f"feet not planted: {feet}"
    assert not bool(ts.dones.all())


def test_random_actions_stay_finite():
    env = make_ant({"agent_conf": "4x2"})
    vec = VecEnv(env, 8)
    key = jax.random.PRNGKey(0)
    s, ts = vec.reset(key)
    step = jax.jit(vec.step)
    for t in range(100):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (8, 4, 2), minval=-1, maxval=1)
        tr = step(s, a, k)
        s = tr.state
    assert np.isfinite(np.asarray(tr.ts.obs)).all()
    assert np.isfinite(np.asarray(tr.ts.rewards)).all()


def test_unhealthy_termination():
    env = make_ant({"agent_conf": "4x2"})
    s, _ = env.reset(jax.random.PRNGKey(0))
    # z > 1.0 is unhealthy and (unlike a crushed torso) isn't pushed back
    # into the healthy band by the contact spring within one env step
    high = AntState(q=s.q.at[2].set(1.5), qd=s.qd * 0.0, t=s.t)
    _, ts = env.step(high, jnp.zeros((4, 2)), jax.random.PRNGKey(0))
    assert bool(ts.dones.all())
    assert not bool(ts.bad_transition)  # termination, not truncation


def test_happo_trains_on_ant():
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from tests.test_happo import _cfg

    runner = OnPolicyRunner(
        {"algo": "happo", "env": "mamujoco_jax", "exp_name": "t"},
        _cfg(),
        {"scenario": "Ant-v2", "agent_conf": "4x2", "episode_limit": 8},
    )
    state, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["mean_episode_return"])
    assert np.isfinite(history[-1]["value_loss"])
