"""Tests for the pure-JAX manyagent_ant (rigid N-segment chain + 2N legs)."""
import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import VecEnv
from harl_tpu.envs import make_env
from harl_tpu.envs.mamujoco_jax.manyagent_ant import make_manyagent_ant


def test_spaces_and_confs():
    for conf, n, segs in (("2x3", 2, 3), ("3x2", 3, 2), ("6x1", 6, 1)):
        env = make_manyagent_ant({"agent_conf": conf})
        assert env.n_agents == n
        assert env.act_per_agent == 4 * segs
        assert env.dyn.dof == 6 + 4 * n * segs
        s, ts = env.reset(jax.random.PRNGKey(0))
        assert ts.obs.shape == (n, env.obs_dim)
        assert ts.share_obs.shape == (env.state_dim,)
        assert ts.rewards.shape == (n, 1)


def test_registry_dispatch():
    env = make_env("mamujoco_jax", {"scenario": "manyagent_ant",
                                    "agent_conf": "2x2"})
    assert env.n_agents == 2 and env.act_per_agent == 8


def test_passive_settle_is_stable():
    """Zero torque: the chain must settle near the ground without blowup,
    resting on torso capsules and/or feet (soft contacts)."""
    env = make_manyagent_ant({"agent_conf": "2x2"})
    s, _ = env.reset(jax.random.PRNGKey(1))
    zeros = jnp.zeros((2, env.act_per_agent))
    step = jax.jit(lambda s: env.step(s, zeros, jax.random.PRNGKey(0)))
    for _ in range(150):
        s, ts = step(s)
    q = np.asarray(s.q)
    assert np.all(np.isfinite(q)), "state blew up"
    assert 0.05 < q[2] < 0.8, f"root z {q[2]} not near ground"
    assert float(jnp.linalg.norm(s.qd)) < 0.5, "not settling"


def test_actuation_moves_forward_axis():
    """Torques change the state; chain nodes span the −x axis."""
    env = make_manyagent_ant({"agent_conf": "2x2"})
    s, _ = env.reset(jax.random.PRNGKey(2))
    nodes = np.asarray(env.dyn._contacts(s.q))[: env.dyn.n_segs]
    assert nodes[0, 0] > nodes[-1, 0] + 2.0, "chain not elongated along x"
    acts = jnp.ones((2, env.act_per_agent))
    s2, ts = env.step(s, acts, jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(s2.qd[6:]))) > 1e-3


def test_vmapped_rollout_and_truncation():
    env = make_manyagent_ant({"agent_conf": "2x1", "episode_limit": 8})
    vec = VecEnv(env, 4)
    key = jax.random.PRNGKey(0)
    s, ts = vec.reset(key)
    acts = jnp.zeros((4, 2, env.act_per_agent))
    step = jax.jit(vec.step)
    for t in range(8):
        key, k = jax.random.split(key)
        tr = step(s, acts, k)
        s = tr.state
    # every env reached its terminal/truncation boundary by step 8
    assert np.asarray(tr.final.dones).all()
    assert np.isfinite(np.asarray(tr.ts.obs)).all()
