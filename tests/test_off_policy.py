"""Off-policy family tests: replay buffer semantics + end-to-end smoke runs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from harl_tpu.buffers.off_policy import init_buffer, insert, sample
from harl_tpu.runners.off_policy import OffPolicyRunner


class TestReplayBuffer:
    def _small(self):
        return init_buffer(buffer_size=12, share_obs_dim=2, obs_dims=[3, 4], act_dims=[2, 2])

    def _batch(self, B, val, done=0.0, term=0.0):
        return dict(
            share_obs=jnp.full((B, 2), val),
            obs=(jnp.full((B, 3), val), jnp.full((B, 4), val)),
            actions=(jnp.full((B, 2), val), jnp.full((B, 2), val)),
            rewards=jnp.full((B, 1), val),
            dones=jnp.full((B, 1), done),
            valid_transitions=(jnp.ones((B, 1)), jnp.ones((B, 1))),
            terms=jnp.full((B, 1), term),
            next_share_obs=jnp.full((B, 2), val + 0.5),
            next_obs=(jnp.full((B, 3), val + 0.5), jnp.full((B, 4), val + 0.5)),
        )

    def test_insert_and_wraparound(self):
        buf = self._small()
        for i in range(5):  # 5 inserts × 4 rows = 20 > 12 → wraps
            buf = insert(buf, self._batch(4, float(i)))
        assert int(buf.cur_size) == 12
        assert int(buf.idx) == 20 % 12
        # rows 8..11 hold insert #2 (values 2.0); rows 0..7 hold inserts 3,4
        np.testing.assert_allclose(np.asarray(buf.rewards[8:12, 0]), 2.0)
        np.testing.assert_allclose(np.asarray(buf.rewards[0:4, 0]), 3.0)

    def test_nstep_reward_accumulation(self):
        # single thread layout: consecutive rows are consecutive steps
        buf = init_buffer(buffer_size=8, share_obs_dim=1, obs_dims=[1], act_dims=[1])
        for t in range(6):
            done = 1.0 if t == 3 else 0.0
            buf = insert(
                buf,
                dict(
                    share_obs=jnp.full((1, 1), float(t)),
                    obs=(jnp.full((1, 1), float(t)),),
                    actions=(jnp.zeros((1, 1)),),
                    rewards=jnp.full((1, 1), 1.0),
                    dones=jnp.full((1, 1), done),
                    valid_transitions=(jnp.ones((1, 1)),),
                    terms=jnp.full((1, 1), done),
                    next_share_obs=jnp.full((1, 1), float(t) + 0.5),
                    next_obs=(jnp.full((1, 1), float(t) + 0.5),),
                ),
            )
        gamma = 0.9
        # sample with full determinism by monkeypatching the start index:
        # instead, sample many and check consistency of (reward, gamma) pairs
        sp = sample(buf, jax.random.PRNGKey(0), 256, n_step=3, gamma=gamma, n_threads=1)
        rews = np.asarray(sp.rewards[:, 0])
        gams = np.asarray(sp.gamma[:, 0])
        starts = np.asarray(sp.share_obs[:, 0]).astype(int)
        for s, r, g in zip(starts, rews, gams):
            # episode ends at t=3 (done); last row (t=5) is the unfinished head
            steps = min(3, max(0, 3 - s) + 1) if s <= 3 else min(3, 5 - s + 1)
            expected_r = sum(gamma ** k for k in range(steps))
            np.testing.assert_allclose(r, expected_r, rtol=1e-5)
            np.testing.assert_allclose(g, gamma ** steps, rtol=1e-5)

    def test_next_obs_at_nstep_index(self):
        buf = init_buffer(buffer_size=8, share_obs_dim=1, obs_dims=[1], act_dims=[1])
        for t in range(6):
            buf = insert(
                buf,
                dict(
                    share_obs=jnp.full((1, 1), float(t)),
                    obs=(jnp.full((1, 1), float(t)),),
                    actions=(jnp.zeros((1, 1)),),
                    rewards=jnp.zeros((1, 1)),
                    dones=jnp.zeros((1, 1)),
                    valid_transitions=(jnp.ones((1, 1)),),
                    terms=jnp.zeros((1, 1)),
                    next_share_obs=jnp.full((1, 1), float(t) + 0.5),
                    next_obs=(jnp.full((1, 1), float(t) + 0.5),),
                ),
            )
        sp = sample(buf, jax.random.PRNGKey(1), 128, n_step=2, gamma=0.99, n_threads=1)
        starts = np.asarray(sp.share_obs[:, 0]).astype(int)
        next_vals = np.asarray(sp.next_share_obs[:, 0])
        for s, nv in zip(starts, next_vals):
            # 2-step walk from s: final index min(s+1, 5) (5 = unfinished head)
            expect = min(s + 1, 5) + 0.5
            np.testing.assert_allclose(nv, expect, rtol=1e-5)


def _off_cfg(algo):
    from harl_tpu.utils.config_tools import get_defaults_yaml_args

    algo_args, env_args = get_defaults_yaml_args(algo, "pettingzoo_mpe")
    algo_args["train"].update(
        n_rollout_threads=4, num_env_steps=4 * 40, warmup_steps=40,
        train_interval=5, update_per_train=1, eval_interval=20,
    )
    algo_args["algo"].update(buffer_size=512, batch_size=32, n_step=2)
    algo_args["model"]["hidden_sizes"] = [32, 32]
    if algo == "had3qn":
        algo_args["algo"].update(
            base_hidden_sizes=[32, 32], dueling_v_hidden_sizes=[32],
            dueling_a_hidden_sizes=[32],
        )
    return algo_args, env_args


CONT_ALGOS = ["haddpg", "hatd3", "maddpg", "matd3"]


@pytest.mark.parametrize("algo", CONT_ALGOS)
def test_continuous_off_policy_smoke(algo):
    algo_args, env_args = _off_cfg(algo)
    env_args = {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10}
    runner = OffPolicyRunner({"algo": algo, "env": "pettingzoo_mpe", "exp_name": "t"},
                             algo_args, env_args)
    state, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["critic_loss"])
    # params moved
    p0 = jax.tree_util.tree_leaves(runner.init_state(1).actors[0].params)[0]
    p1 = jax.tree_util.tree_leaves(state.actors[0].params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.parametrize("continuous", [True, False])
def test_hasac_smoke(continuous):
    algo_args, _ = _off_cfg("hasac")
    algo_args["algo"]["auto_alpha"] = True
    env_args = {"scenario": "simple_spread_v2", "continuous_actions": continuous, "max_cycles": 10}
    runner = OffPolicyRunner({"algo": "hasac", "env": "pettingzoo_mpe", "exp_name": "t"},
                             algo_args, env_args)
    state, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["critic_loss"])
    # auto-alpha moved off its init
    assert not np.isclose(float(state.actors[0].log_alpha), 0.0)


def test_had3qn_smoke():
    algo_args, _ = _off_cfg("had3qn")
    env_args = {"scenario": "simple_spread_v2", "continuous_actions": False, "max_cycles": 10}
    runner = OffPolicyRunner({"algo": "had3qn", "env": "pettingzoo_mpe", "exp_name": "t"},
                             algo_args, env_args)
    state, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["critic_loss"])


def test_discrete_q_critic_codecs():
    from harl_tpu.algos.q_critics import DiscreteQCritic
    from harl_tpu.utils import spaces

    crit = DiscreteQCritic(4, [spaces.Discrete(4), spaces.Discrete(3)],
                           {"critic_lr": 1e-3, "polyak": 0.005, "hidden_sizes": [16]})
    a0 = jnp.array([[1], [3]])
    a1 = jnp.array([[0], [2]])
    joint = crit.indiv_to_joint((a0, a1))
    np.testing.assert_array_equal(np.asarray(joint), [[1], [11]])
    back = crit.joint_to_indiv(joint)
    np.testing.assert_array_equal(np.asarray(back[0]), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(back[1]), np.asarray(a1))
    # joint idx: agent 0 free, agent 1 fixed
    ji = crit.get_joint_idx((a0, a1), 0)
    np.testing.assert_array_equal(np.asarray(ji), [[0, 1, 2, 3], [8, 9, 10, 11]])


def test_share_param_off_policy():
    algo_args, _ = _off_cfg("hatd3")
    algo_args["algo"]["share_param"] = True
    env_args = {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10}
    runner = OffPolicyRunner({"algo": "hatd3", "env": "pettingzoo_mpe", "exp_name": "t"},
                             algo_args, env_args)
    state = runner.init_state(1)
    assert len(state.actors) == 1
    state = runner._warmup(state)
    state, _ = runner._collect(state)
    state, m = runner._train(state)
    assert np.isfinite(float(m["critic_loss"]))


def test_hasac_fp_on_smaclite():
    """FP off-policy path: per-agent states, FP buffer walks, tiled critic."""
    algo_args, _ = _off_cfg("hasac")
    algo_args["algo"]["auto_alpha"] = True
    runner = OffPolicyRunner(
        {"algo": "hasac", "env": "smaclite", "exp_name": "t"},
        algo_args,
        {"map_name": "3m", "episode_limit": 10, "state_type": "FP"},
    )
    assert runner.state_type == "FP"
    state = runner.init_state(1)
    assert state.buffer.share_obs.ndim == 3  # (S, N, ds)
    state = runner._warmup(state)
    state, _ = runner._collect(state)
    state, m = runner._train(state)
    assert np.isfinite(float(m["critic_loss"]))


class _TinyFPBoxEnv:
    """Minimal continuous-action FP env: 2 agents on a 1-D point-mass each;
    agent_state = EP state ⊕ own view ⊕ one-hot id (the FP contract)."""

    n_agents = 2
    state_type = "FP"

    def __init__(self):
        from harl_tpu.utils import spaces as S

        self.observation_space = [S.Box.create(-10, 10, 2)] * 2
        self.share_observation_space = [S.Box.create(-10, 10, 8)] * 2
        self.action_space = [S.Box.create(-1.0, 1.0, 1)] * 2

    def _ts(self, pos, vel, rew, done, bad):
        from harl_tpu.envs.core import TimeStep

        obs = jnp.stack([jnp.stack([pos[0], vel[0]]), jnp.stack([pos[1], vel[1]])])
        ep = jnp.concatenate([pos, vel])
        agent_state = jnp.stack([
            jnp.concatenate([ep, obs[0], jnp.array([1.0, 0.0])]),
            jnp.concatenate([ep, obs[1], jnp.array([0.0, 1.0])]),
        ])
        return TimeStep(
            obs=obs, share_obs=ep,
            rewards=jnp.broadcast_to(rew, (2, 1)).astype(jnp.float32),
            dones=jnp.broadcast_to(done, (2,)),
            bad_transition=bad, available_actions=None,
            agent_state=agent_state)

    def reset(self, key):
        pos = jax.random.uniform(key, (2,), minval=-1, maxval=1)
        vel = jnp.zeros(2)
        state = (pos, vel, jnp.zeros((), jnp.int32))
        return state, self._ts(pos, vel, jnp.zeros(()), jnp.zeros((), bool),
                               jnp.zeros((), bool))

    def step(self, state, actions, key):
        del key
        pos, vel, t = state
        a = jnp.asarray(actions).reshape(2)
        vel = 0.9 * vel + 0.1 * a
        pos = pos + 0.1 * vel
        rew = -jnp.sum(pos ** 2)
        t = t + 1
        trunc = t >= 8
        return (pos, vel, t), self._ts(pos, vel, rew, trunc, trunc)


@pytest.mark.parametrize("algo", ["haddpg", "hatd3", "matd3"])
def test_continuous_fp_off_policy(algo):
    """FP buffers serve the whole continuous off-policy family, not just
    HASAC (reference off_policy_buffer_fp.py is algo-agnostic)."""
    algo_args, _ = _off_cfg(algo)
    runner = OffPolicyRunner(
        {"algo": algo, "env": "x", "exp_name": "t"}, algo_args, {},
        env=_TinyFPBoxEnv(),
    )
    assert runner.state_type == "FP"
    state = runner.init_state(1)
    state = runner._warmup(state)
    state, _ = runner._collect(state)
    state, m = runner._train(state)
    assert np.isfinite(float(m["critic_loss"]))
