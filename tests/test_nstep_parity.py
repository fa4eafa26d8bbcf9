"""Golden-parity test of the n-step replay sampler against a NumPy oracle
implementing the REFERENCE's exact semantics.

Oracle = a fresh NumPy transcription of the reference algorithm
(`harl/common/buffers/off_policy_buffer_ep.py:106-164` — n-step index walk
via ``next(idx) = idx + (1-end_flag[idx])*n_threads (mod S)``, backwards
reward accumulation with end-flag restarts, per-sample effective gamma^n,
and ``update_end_flag`` marking episode ends plus the newest unfinished row
per thread, `off_policy_buffer_base.py:107-182` ring insert).

Both buffers are filled with IDENTICAL synthetic trajectories — mixed
episode lengths (including episodes shorter than n_step), term-vs-trunc
flags, and ring wraparound — and every output (rewards, gamma, dones,
terms, next_share_obs, next_obs) is compared element-wise over an
exhaustive start-index set. This is the round-3 verdict's requested test
localizing the HASAC n_step=20 question to (walk | target assembly |
insert bookkeeping).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from harl_tpu.buffers.off_policy import (
    ReplayBuffer,
    init_buffer,
    insert,
    sample,
)


class OracleBufferEP:
    """NumPy oracle with the reference's OffPolicyBufferEP semantics."""

    def __init__(self, size, ds, obs_dims, act_dims, n_threads):
        self.S = size
        self.n_threads = n_threads
        self.share_obs = np.zeros((size, ds), np.float32)
        self.next_share_obs = np.zeros((size, ds), np.float32)
        self.obs = [np.zeros((size, d), np.float32) for d in obs_dims]
        self.next_obs = [np.zeros((size, d), np.float32) for d in obs_dims]
        self.actions = [np.zeros((size, d), np.float32) for d in act_dims]
        self.rewards = np.zeros((size, 1), np.float32)
        self.dones = np.zeros((size, 1), np.float32)
        self.terms = np.zeros((size, 1), np.float32)
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
        self.rewards[rows] = batch["rewards"]
        self.dones[rows] = batch["dones"]
        self.terms[rows] = batch["terms"]
        self.idx = (self.idx + B) % self.S
        self.cur_size = min(self.cur_size + B, self.S)

    def update_end_flag(self):
        unfinished = (
            self.idx - np.arange(self.n_threads) - 1 + self.cur_size
        ) % self.cur_size
        end_flag = (self.dones[:, 0] > 0).copy()
        end_flag[unfinished] = True
        return end_flag

    def next(self, indices, end_flag):
        return (
            indices + (1 - end_flag[indices].astype(np.int64)) * self.n_threads
        ) % self.S

    def sample_at(self, start, n_step, gamma):
        """Reference sample() with injected start indices."""
        end_flag = self.update_end_flag()
        indices = [np.asarray(start)]
        for _ in range(n_step - 1):
            indices.append(self.next(indices[-1], end_flag))
        final = indices[-1]
        B = len(start)
        sp_reward = np.zeros((B, 1))
        gammas = np.full(B, n_step)
        for n in range(n_step - 1, -1, -1):
            now = indices[n]
            hit = end_flag[now] > 0
            gammas[hit] = n + 1
            sp_reward[hit] = 0.0
            sp_reward = self.rewards[now] + gamma * sp_reward
        sp_gamma = (gamma ** gammas.astype(np.float64)).reshape(B, 1)
        return dict(
            rewards=sp_reward,
            gamma=sp_gamma,
            dones=self.dones[final],
            terms=self.terms[final],
            next_share_obs=self.next_share_obs[final],
            next_obs=[o[final] for o in self.next_obs],
            share_obs=self.share_obs[start],
            obs=[o[start] for o in self.obs],
            actions=[a[start] for a in self.actions],
        )


def _fill(size, n_threads, ep_lens, total_steps, seed=0):
    """Build repo + oracle buffers from identical synthetic trajectories.

    ep_lens: per-thread episode length (varied so episode ends interleave,
    including episodes shorter than n_step). Every field value is unique
    per (thread, step) so any index mix-up shows up element-wise.
    """
    rng = np.random.RandomState(seed)
    ds, obs_dims, act_dims = 2, (2, 3), (1, 2)
    buf = init_buffer(size, ds, obs_dims, act_dims)
    oracle = OracleBufferEP(size, ds, obs_dims, act_dims, n_threads)
    t_in_ep = np.zeros(n_threads, np.int64)
    for t in range(total_steps):
        uid = (t * n_threads + np.arange(n_threads)).astype(np.float32)
        done = np.zeros((n_threads, 1), np.float32)
        for b in range(n_threads):
            if t_in_ep[b] + 1 >= ep_lens[b]:
                done[b, 0] = 1.0
                t_in_ep[b] = 0
            else:
                t_in_ep[b] += 1
        # alternate termination vs truncation at episode ends
        term = done * (rng.rand(n_threads, 1) < 0.5)
        batch = dict(
            share_obs=np.stack([uid, uid + 0.5], axis=1),
            next_share_obs=np.stack([uid + 0.25, uid + 0.75], axis=1),
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
            rewards=rng.randn(n_threads, 1).astype(np.float32),
            dones=done,
            terms=term.astype(np.float32),
            valid_transitions=tuple(
                np.ones((n_threads, 1), np.float32) for _ in obs_dims
            ),
        )
        jb = {
            k: (tuple(jnp.asarray(x) for x in v) if isinstance(v, tuple) else jnp.asarray(v))
            for k, v in batch.items()
        }
        buf = insert(buf, jb)
        oracle.insert(batch)
    return buf, oracle


@pytest.mark.parametrize(
    "size,n_threads,ep_lens,total_steps,n_step",
    [
        # MPE-shaped: 25-step episodes, n_step 20 (the reference HASAC config)
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
def test_nstep_sampler_matches_reference_oracle(
    size, n_threads, ep_lens, total_steps, n_step
):
    gamma = 0.99
    buf, oracle = _fill(size, n_threads, ep_lens, total_steps)
    assert int(buf.idx) == oracle.idx
    assert int(buf.cur_size) == oracle.cur_size
    # exhaustive start coverage: every valid row is a start index
    start = np.arange(oracle.cur_size, dtype=np.int64)
    got = sample(
        buf,
        jax.random.PRNGKey(0),
        len(start),
        n_step,
        gamma,
        n_threads,
        start=jnp.asarray(start),
    )
    want = oracle.sample_at(start, n_step, gamma)
    np.testing.assert_allclose(np.asarray(got.rewards), want["rewards"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.gamma), want["gamma"], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.dones), want["dones"])
    np.testing.assert_array_equal(np.asarray(got.terms), want["terms"])
    np.testing.assert_array_equal(np.asarray(got.next_share_obs), want["next_share_obs"])
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(got.next_obs[i]), want["next_obs"][i])
        np.testing.assert_array_equal(np.asarray(got.obs[i]), want["obs"][i])
        np.testing.assert_array_equal(np.asarray(got.actions[i]), want["actions"][i])
    np.testing.assert_array_equal(np.asarray(got.share_obs), want["share_obs"])


def test_end_flag_matches_reference_oracle():
    buf, oracle = _fill(4000, 4, (25, 7, 3, 13), 90)
    from harl_tpu.buffers.off_policy import _end_flag

    got = np.asarray(_end_flag(buf, 4))
    want = oracle.update_end_flag()
    # only rows < cur_size are meaningful (reference end_flag is full-size too
    # but indices never exceed cur_size when the walk starts in range)
    cur = oracle.cur_size
    np.testing.assert_array_equal(got[:cur], want[:cur])
