"""Tests for the pure-JAX Reacher-v2 (MAMuJoCo 2x1)."""
import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs import make_env
from harl_tpu.envs.core import VecEnv
from harl_tpu.envs.mamujoco_jax.reacher import fingertip, make_reacher


def test_spaces_and_reset():
    env = make_env("mamujoco_jax", {"scenario": "Reacher-v2", "agent_conf": "2x1"})
    assert env.n_agents == 2
    s, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (2, env.obs_dim)
    assert float(jnp.linalg.norm(s.target)) < 0.2
    # fingertip reachable ring: |L0−L1f| .. L0+L1f
    tip = fingertip(s.q)
    assert 0.0 < float(jnp.linalg.norm(tip)) <= 0.211 + 1e-6


def test_reward_is_neg_dist_minus_ctrl():
    env = make_reacher({})
    s, _ = env.reset(jax.random.PRNGKey(1))
    a = jnp.array([[0.5], [-0.25]])
    s2, ts = env.step(s, a, jax.random.PRNGKey(0))
    # gym v2 measures the distance from the PRE-step fingertip
    dist = float(jnp.linalg.norm(fingertip(s.q) - s.target))
    expect = -dist - (0.5 ** 2 + 0.25 ** 2)
    assert abs(float(ts.rewards[0, 0]) - expect) < 1e-5


def test_armature_dominated_response():
    """Unit torque for one env-step: Δqd ≈ gear·dt·frames / armature (link
    inertia is ~1e-3 of the armature, damping bleeds a little)."""
    env = make_reacher({})
    s, _ = env.reset(jax.random.PRNGKey(2))
    s = s._replace(qd=jnp.zeros(2))
    s2, _ = env.step(s, jnp.array([[1.0], [0.0]]), jax.random.PRNGKey(0))
    assert 3.5 < float(s2.qd[0]) < 4.05   # 200·0.01·2 = 4.0 ceiling


def test_truncates_at_50():
    env = make_reacher({})
    vec = VecEnv(env, 3)
    key = jax.random.PRNGKey(0)
    s, _ = vec.reset(key)
    step = jax.jit(vec.step)
    for t in range(50):
        key, k = jax.random.split(key)
        tr = step(s, jnp.zeros((3, 2, 1)), k)
        s = tr.state
    assert np.asarray(tr.final.dones).all()
    assert np.asarray(tr.final.bad_transition).all()   # pure truncation
