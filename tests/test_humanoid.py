"""Tests for the pure-JAX Humanoid-v2 / HumanoidStandup-v2 (MAMuJoCo)."""
import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs import make_env
from harl_tpu.envs.core import VecEnv
from harl_tpu.envs.mamujoco_jax.humanoid import (
    TOTAL_MASS,
    _com,
    make_humanoid,
)


def test_mass_matches_mujoco_model():
    # gym humanoid.xml, density 1000 over 13 capsules + 4 spheres ≈ 40 kg
    assert 38.0 < TOTAL_MASS < 46.0


def test_confs_and_spaces():
    env = make_humanoid({"agent_conf": "17x1"})
    assert env.n_agents == 17
    assert all(sp.shape[0] == 1 for sp in env.action_space)
    env98 = make_humanoid({"agent_conf": "9|8"})
    assert env98.n_agents == 2
    assert env98.action_space[0].shape[0] == 9
    assert env98.action_space[1].shape[0] == 8
    s, ts = env98.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (2, env98.obs_dim)
    # reference obsk 9|8 split: agent 0 = abdomen+arms (upper body),
    # agent 1 = hips/knees (lower body) — not contiguous actuator slices
    from harl_tpu.envs.mamujoco_jax.humanoid import JOINTS
    names0 = {JOINTS[j][0] for j in env98.agent_joints[0]}
    names1 = {JOINTS[j][0] for j in env98.agent_joints[1]}
    assert names0 == {"abdomen_y", "abdomen_z", "abdomen_x",
                      "right_shoulder1", "right_shoulder2", "right_elbow",
                      "left_shoulder1", "left_shoulder2", "left_elbow"}
    assert all("hip" in n or "knee" in n for n in names1)


def test_untrained_falls_and_terminates():
    """Zero-action humanoid must fall (z < 1.0) within ~100 steps and emit
    a termination (not truncation) — the MuJoCo learning-signal profile."""
    env = make_humanoid({"agent_conf": "17x1"})
    s, _ = env.reset(jax.random.PRNGKey(0))
    a = [jnp.zeros(1)] * 17
    step = jax.jit(lambda s: env.step(s, a, jax.random.PRNGKey(0)))
    for i in range(100):
        s, ts = step(s)
        assert bool(jnp.isfinite(s.q).all()), f"blew up at step {i}"
        if bool(ts.dones[0]):
            break
    assert bool(ts.dones[0]), "never fell"
    assert not bool(ts.bad_transition), "fall must be termination, not trunc"
    assert float(ts.rewards[0, 0]) < 5.0  # healthy bonus gone on the last step


def test_standup_variant():
    env = make_env("mamujoco_jax", {"scenario": "HumanoidStandup-v2",
                                    "agent_conf": "17x1"})
    assert env.standup
    s, ts = env.reset(jax.random.PRNGKey(1))
    assert float(s.q[2]) < 0.5  # lying down
    a = [jnp.zeros(1)] * 17
    step = jax.jit(lambda s: env.step(s, a, jax.random.PRNGKey(0)))
    for _ in range(30):
        s, ts = step(s)
    # no termination while lying; reward ≈ z/0.003 + 1 ∈ (30, 200)
    assert not bool(ts.dones[0] & ~ts.bad_transition)
    assert 10.0 < float(ts.rewards[0, 0]) < 300.0
    assert bool(jnp.isfinite(s.q).all())


def test_vmapped_batch():
    env = make_humanoid({"agent_conf": "9|8", "episode_limit": 64})
    vec = VecEnv(env, 4)
    key = jax.random.PRNGKey(0)
    s, _ = vec.reset(key)
    step = jax.jit(vec.step)
    for t in range(10):
        key, k, ka = jax.random.split(key, 3)
        a = 0.4 * jax.random.uniform(ka, (4, 2, 9), minval=-1, maxval=1)
        tr = step(s, a, k)
        s = tr.state
    assert np.isfinite(np.asarray(tr.ts.obs)).all()
    assert np.isfinite(np.asarray(tr.ts.rewards)).all()
