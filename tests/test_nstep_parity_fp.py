"""Golden-parity test of the FP (agent-specific state) n-step replay sampler
against a NumPy oracle implementing the REFERENCE's exact semantics.

Oracle = a fresh NumPy transcription of the reference algorithm
(`harl/common/buffers/off_policy_buffer_fp.py:52-148` — PER-AGENT end flags
driving per-agent n-step index walks via
``next(idx)[:, a] = idx[:, a] + (1-end_flag[idx[:, a], a])*n_threads (mod S)``,
per-agent backwards reward accumulation with end-flag restarts, per-agent
effective gamma^n, agent-major (n_agents*batch, .) output concatenations, and
``update_end_flag`` (`:157-165`) marking per-agent episode ends plus the
newest unfinished rows per thread for ALL agents).

Both buffers are filled with IDENTICAL synthetic trajectories with
PER-AGENT done/term patterns — staggered per-agent deaths inside an episode,
episodes shorter than n_step, and ring wraparound — and every output
(rewards, gamma, dones, terms, next_share_obs, next_obs, start-index fields)
is compared element-wise over an exhaustive start-index set. This mirrors
tests/test_nstep_parity.py (the EP oracle) for the strictly trickier FP walk
(round-4 VERDICT weak #1).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from harl_tpu.buffers.off_policy import (
    init_buffer_fp,
    insert,
    sample_fp,
)


class OracleBufferFP:
    """NumPy oracle with the reference's OffPolicyBufferFP semantics."""

    def __init__(self, size, n_agents, ds, obs_dims, act_dims, n_threads):
        self.S = size
        self.N = n_agents
        self.n_threads = n_threads
        self.share_obs = np.zeros((size, n_agents, ds), np.float32)
        self.next_share_obs = np.zeros((size, n_agents, ds), np.float32)
        self.obs = [np.zeros((size, d), np.float32) for d in obs_dims]
        self.next_obs = [np.zeros((size, d), np.float32) for d in obs_dims]
        self.actions = [np.zeros((size, d), np.float32) for d in act_dims]
        self.valid_transitions = [
            np.ones((size, 1), np.float32) for _ in range(n_agents)
        ]
        self.rewards = np.zeros((size, n_agents, 1), np.float32)
        self.dones = np.zeros((size, n_agents, 1), np.float32)
        self.terms = np.zeros((size, n_agents, 1), np.float32)
        self.idx = 0
        self.cur_size = 0

    def insert(self, batch):
        B = batch["share_obs"].shape[0]
        rows = (self.idx + np.arange(B)) % self.S
        self.share_obs[rows] = batch["share_obs"]
        self.next_share_obs[rows] = batch["next_share_obs"]
        for i in range(len(self.obs)):
            self.obs[i][rows] = batch["obs"][i]
            self.next_obs[i][rows] = batch["next_obs"][i]
            self.actions[i][rows] = batch["actions"][i]
            self.valid_transitions[i][rows] = batch["valid_transitions"][i]
        self.rewards[rows] = batch["rewards"]
        self.dones[rows] = batch["dones"]
        self.terms[rows] = batch["terms"]
        self.idx = (self.idx + B) % self.S
        self.cur_size = min(self.cur_size + B, self.S)

    def update_end_flag(self):
        # off_policy_buffer_fp.py:157-165 (FP end_flag is (S, N))
        unfinished = (
            self.idx - np.arange(self.n_threads) - 1 + self.cur_size
        ) % self.cur_size
        end_flag = (self.dones[..., 0] > 0).copy()
        end_flag[unfinished, :] = True
        return end_flag

    def next(self, indices, end_flag):
        # off_policy_buffer_fp.py:150-155 — indices: (batch, N)
        ef = np.column_stack(
            [end_flag[indices[:, a], a] for a in range(self.N)]
        ).astype(np.int64)
        return (indices + (1 - ef) * self.n_threads) % self.S

    def sample_at(self, start, n_step, gamma):
        """Reference FP sample() (:52-148) with injected start indices."""
        end_flag = self.update_end_flag()
        B = len(start)
        sp_share_obs = np.concatenate(
            self.share_obs[start].transpose(1, 0, 2), axis=0
        )  # (N*B, ds), agent-major
        sp_obs = [self.obs[a][start] for a in range(self.N)]
        sp_actions = [self.actions[a][start] for a in range(self.N)]
        sp_valid_transitions = [
            self.valid_transitions[a][start] for a in range(self.N)
        ]
        indice = np.repeat(np.expand_dims(start, -1), self.N, axis=-1)
        indices = [indice]
        for _ in range(n_step - 1):
            indices.append(self.next(indices[-1], end_flag))
        final = indices[-1]  # (B, N)
        sp_done = np.concatenate(
            [self.dones[final[:, a], a] for a in range(self.N)]
        )
        sp_term = np.concatenate(
            [self.terms[final[:, a], a] for a in range(self.N)]
        )
        sp_next_share_obs = np.concatenate(
            [self.next_share_obs[final[:, a], a] for a in range(self.N)]
        )
        sp_next_obs = [self.next_obs[a][final[:, a]] for a in range(self.N)]
        sp_reward = np.zeros((B, self.N, 1))
        gammas = np.full((B, self.N), n_step)
        for n in range(n_step - 1, -1, -1):
            now = indices[n]
            ef = np.column_stack(
                [end_flag[now[:, a], a] for a in range(self.N)]
            )
            gammas[ef > 0] = n + 1
            sp_reward[ef > 0] = 0.0
            rewards = np.expand_dims(
                np.column_stack(
                    [self.rewards[now[:, a], a] for a in range(self.N)]
                ),
                axis=-1,
            )
            sp_reward = rewards + gamma * sp_reward
        sp_reward = np.concatenate(sp_reward.transpose(1, 0, 2), axis=0)
        sp_gamma = np.concatenate(
            [gamma ** gammas[:, a].astype(np.float64) for a in range(self.N)]
        ).reshape(-1, 1)
        return dict(
            share_obs=sp_share_obs,
            obs=sp_obs,
            actions=sp_actions,
            valid_transitions=sp_valid_transitions,
            rewards=sp_reward,
            dones=sp_done,
            terms=sp_term,
            next_share_obs=sp_next_share_obs,
            next_obs=sp_next_obs,
            gamma=sp_gamma,
        )


def _fill_fp(size, n_agents, n_threads, ep_lens, total_steps, seed=0):
    """Build repo + oracle FP buffers from identical synthetic trajectories.

    Per-agent done patterns: the env-level episode boundary marks ALL agents
    done, and on top of that each agent independently "dies" mid-episode with
    probability 0.15 per step (its done goes up early while the env
    continues, valid_transitions drops to 0 until the episode boundary) —
    the agent-death bookkeeping the FP walk exists for
    (off_policy_base_runner.py:371-399).
    """
    rng = np.random.RandomState(seed)
    ds, obs_dims, act_dims = 2, (2, 3), (1, 2)
    assert len(obs_dims) == n_agents
    buf = init_buffer_fp(size, n_agents, ds, obs_dims, act_dims)
    oracle = OracleBufferFP(size, n_agents, ds, obs_dims, act_dims, n_threads)
    t_in_ep = np.zeros(n_threads, np.int64)
    dead = np.zeros((n_threads, n_agents), bool)
    for t in range(total_steps):
        uid = (t * n_threads + np.arange(n_threads)).astype(np.float32)
        ep_end = np.zeros(n_threads, bool)
        for b in range(n_threads):
            if t_in_ep[b] + 1 >= ep_lens[b]:
                ep_end[b] = True
                t_in_ep[b] = 0
            else:
                t_in_ep[b] += 1
        new_deaths = (rng.rand(n_threads, n_agents) < 0.15) & ~ep_end[:, None]
        dead |= new_deaths
        done = (ep_end[:, None] | dead).astype(np.float32)[..., None]
        term = done * (rng.rand(n_threads, n_agents, 1) < 0.5)
        valid = (~dead).astype(np.float32)[..., None]  # (B, N, 1)
        dead[ep_end] = False  # episode boundary revives everyone
        peragent = uid[:, None] + 0.1 * np.arange(n_agents)[None, :]
        batch = dict(
            share_obs=np.stack([peragent, peragent + 0.5], axis=2),
            next_share_obs=np.stack([peragent + 0.25, peragent + 0.75], axis=2),
            obs=tuple(
                np.tile(uid[:, None], (1, d)) + 0.01 * i
                for i, d in enumerate(obs_dims)
            ),
            next_obs=tuple(
                np.tile(uid[:, None], (1, d)) + 0.02 * i
                for i, d in enumerate(obs_dims)
            ),
            actions=tuple(
                np.tile(uid[:, None], (1, d)) + 0.03 * i
                for i, d in enumerate(act_dims)
            ),
            rewards=rng.randn(n_threads, n_agents, 1).astype(np.float32),
            dones=done.astype(np.float32),
            terms=term.astype(np.float32),
            valid_transitions=tuple(
                valid[:, i] for i in range(n_agents)
            ),
        )
        jb = {
            k: (
                tuple(jnp.asarray(x) for x in v)
                if isinstance(v, tuple)
                else jnp.asarray(v)
            )
            for k, v in batch.items()
        }
        buf = insert(buf, jb)
        oracle.insert(batch)
    return buf, oracle


@pytest.mark.parametrize(
    "size,n_threads,ep_lens,total_steps,n_step",
    [
        # SMAC-FP-shaped: long episodes, n_step 20, staggered deaths
        (4000, 4, (25, 25, 25, 25), 120, 20),
        # mixed episode lengths incl. shorter than n_step
        (4000, 4, (25, 7, 3, 13), 90, 20),
        # ring wraparound: more inserts than capacity
        (160, 4, (25, 7, 3, 13), 90, 20),
        # buffer exactly full
        (160, 4, (10, 10, 10, 10), 40, 5),
        # n_step 1 degenerate
        (4000, 4, (25, 7, 3, 13), 60, 1),
    ],
)
def test_fp_nstep_sampler_matches_reference_oracle(
    size, n_threads, ep_lens, total_steps, n_step
):
    gamma = 0.99
    n_agents = 2
    buf, oracle = _fill_fp(size, n_agents, n_threads, ep_lens, total_steps)
    assert int(buf.idx) == oracle.idx
    assert int(buf.cur_size) == oracle.cur_size
    # exhaustive start coverage: every valid row is a start index
    start = np.arange(oracle.cur_size, dtype=np.int64)
    got = sample_fp(
        buf,
        jax.random.PRNGKey(0),
        len(start),
        n_step,
        gamma,
        n_threads,
        start=jnp.asarray(start),
    )
    want = oracle.sample_at(start, n_step, gamma)
    np.testing.assert_allclose(
        np.asarray(got.rewards), want["rewards"], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(got.gamma), want["gamma"], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.dones), want["dones"])
    np.testing.assert_array_equal(np.asarray(got.terms), want["terms"])
    np.testing.assert_array_equal(
        np.asarray(got.next_share_obs), want["next_share_obs"]
    )
    np.testing.assert_array_equal(
        np.asarray(got.share_obs), want["share_obs"]
    )
    for i in range(n_agents):
        np.testing.assert_array_equal(
            np.asarray(got.next_obs[i]), want["next_obs"][i]
        )
        np.testing.assert_array_equal(np.asarray(got.obs[i]), want["obs"][i])
        np.testing.assert_array_equal(
            np.asarray(got.actions[i]), want["actions"][i]
        )
        np.testing.assert_array_equal(
            np.asarray(got.valid_transitions[i]), want["valid_transitions"][i]
        )
