"""HBM-resident off-policy replay buffer with n-step sampling (jit-compatible).

Parity targets: ``harl/common/buffers/off_policy_buffer_base.py`` +
``off_policy_buffer_ep.py``. The NumPy ring buffer + host-side n-step index
walk become fixed-shape device arrays and ``lax`` loops:

  * layout: flat ring of ``buffer_size`` rows; consecutive inserts from the
    same thread are ``n_rollout_threads`` apart (buffer_base.py insert order);
  * ``next(idx) = (idx + (1−end_flag[idx])·n_threads) % buffer_size``
    (buffer_ep.py:150-154);
  * ``end_flag`` = dones OR the newest unfinished row per thread
    (buffer_ep.py:156-164);
  * n-step reward accumulation emits per-sample effective γⁿ
    (buffer_ep.py:106-117).

Heterogeneous per-agent obs/action widths are stored as tuples of arrays, so
no padding is needed. EP state layout (FP variant: see SURVEY §2.1 — later).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class ReplayBuffer(NamedTuple):
    share_obs: jnp.ndarray                  # (S, ds)
    next_share_obs: jnp.ndarray             # (S, ds)
    obs: Tuple[jnp.ndarray, ...]            # per-agent (S, do_i)
    next_obs: Tuple[jnp.ndarray, ...]       # per-agent (S, do_i)
    actions: Tuple[jnp.ndarray, ...]        # per-agent (S, da_i)
    available_actions: Optional[Tuple[jnp.ndarray, ...]]       # per-agent (S, n_i)
    next_available_actions: Optional[Tuple[jnp.ndarray, ...]]
    valid_transitions: Tuple[jnp.ndarray, ...]  # per-agent (S, 1)
    rewards: jnp.ndarray                    # (S, 1)
    dones: jnp.ndarray                      # (S, 1) float {0,1}
    terms: jnp.ndarray                      # (S, 1) float {0,1}
    idx: jnp.ndarray                        # () int32 — next insert row
    cur_size: jnp.ndarray                   # () int32


class Sample(NamedTuple):
    share_obs: jnp.ndarray
    obs: Tuple[jnp.ndarray, ...]
    actions: Tuple[jnp.ndarray, ...]
    available_actions: Optional[Tuple[jnp.ndarray, ...]]
    rewards: jnp.ndarray        # n-step accumulated
    dones: jnp.ndarray          # at last n-step index
    valid_transitions: Tuple[jnp.ndarray, ...]
    terms: jnp.ndarray          # at last n-step index
    next_share_obs: jnp.ndarray
    next_obs: Tuple[jnp.ndarray, ...]
    next_available_actions: Optional[Tuple[jnp.ndarray, ...]]
    gamma: jnp.ndarray          # per-sample effective γⁿ


def init_buffer(
    buffer_size: int,
    share_obs_dim: int,
    obs_dims,
    act_dims,
    avail_dims=None,
) -> ReplayBuffer:
    n = len(obs_dims)
    z = lambda *shape: jnp.zeros(shape, jnp.float32)
    return ReplayBuffer(
        share_obs=z(buffer_size, share_obs_dim),
        next_share_obs=z(buffer_size, share_obs_dim),
        obs=tuple(z(buffer_size, d) for d in obs_dims),
        next_obs=tuple(z(buffer_size, d) for d in obs_dims),
        actions=tuple(z(buffer_size, d) for d in act_dims),
        available_actions=None if avail_dims is None else tuple(z(buffer_size, d) for d in avail_dims),
        next_available_actions=None if avail_dims is None else tuple(z(buffer_size, d) for d in avail_dims),
        valid_transitions=tuple(jnp.ones((buffer_size, 1)) for _ in range(n)),
        rewards=z(buffer_size, 1),
        dones=z(buffer_size, 1),
        terms=z(buffer_size, 1),
        idx=jnp.zeros((), jnp.int32),
        cur_size=jnp.zeros((), jnp.int32),
    )


def insert(buf: ReplayBuffer, batch: dict) -> ReplayBuffer:
    """Insert one vectorized step (B = n_rollout_threads rows).

    batch keys mirror OffPolicyBufferBase.insert data tuple (EP layout):
    share_obs (B,ds), obs tuple (B,do_i), actions tuple (B,da_i),
    available_actions/next_* tuples or None, rewards (B,1), dones (B,1),
    valid_transitions tuple (B,1), terms (B,1), next_share_obs, next_obs.
    """
    S = buf.share_obs.shape[0]
    B = batch["share_obs"].shape[0]
    rows = (buf.idx + jnp.arange(B)) % S

    def put(arr, val):
        return arr.at[rows].set(val)

    new = ReplayBuffer(
        share_obs=put(buf.share_obs, batch["share_obs"]),
        next_share_obs=put(buf.next_share_obs, batch["next_share_obs"]),
        obs=tuple(put(a, v) for a, v in zip(buf.obs, batch["obs"])),
        next_obs=tuple(put(a, v) for a, v in zip(buf.next_obs, batch["next_obs"])),
        actions=tuple(put(a, v) for a, v in zip(buf.actions, batch["actions"])),
        available_actions=None
        if buf.available_actions is None
        else tuple(put(a, v) for a, v in zip(buf.available_actions, batch["available_actions"])),
        next_available_actions=None
        if buf.next_available_actions is None
        else tuple(
            put(a, v) for a, v in zip(buf.next_available_actions, batch["next_available_actions"])
        ),
        valid_transitions=tuple(
            put(a, v) for a, v in zip(buf.valid_transitions, batch["valid_transitions"])
        ),
        rewards=put(buf.rewards, batch["rewards"]),
        dones=put(buf.dones, batch["dones"]),
        terms=put(buf.terms, batch["terms"]),
        idx=(buf.idx + B) % S,
        cur_size=jnp.minimum(buf.cur_size + B, S),
    )
    return new


def _end_flag(buf: ReplayBuffer, n_threads: int) -> jnp.ndarray:
    """dones ∪ newest-unfinished rows (buffer_ep.py:156-164). Returns (S,)."""
    cur = jnp.maximum(buf.cur_size, 1)
    flag = buf.dones[:, 0] > 0
    unfinished = (buf.idx - jnp.arange(n_threads) - 1 + cur) % cur
    return flag.at[unfinished].set(True)


def sample(
    buf: ReplayBuffer,
    key,
    batch_size: int,
    n_step: int,
    gamma: float,
    n_threads: int,
    start: Optional[jnp.ndarray] = None,
) -> Sample:
    """Uniform sample of start indices + n-step walk (buffer_ep.py:40-148).

    ``start`` overrides the random index draw (golden-parity tests inject
    deterministic starts to compare element-wise against a NumPy oracle).
    """
    S = buf.share_obs.shape[0]
    cur = jnp.maximum(buf.cur_size, 1)
    end_flag = _end_flag(buf, n_threads).astype(jnp.int32)
    if start is None:
        # randint over cur_size (reference uses randperm[:batch]; uniform-
        # with-replacement is equivalent in distribution for large buffers)
        start = jax.random.randint(key, (batch_size,), 0, cur)

    def walk(idx, _):
        nxt = (idx + (1 - end_flag[idx]) * n_threads) % S
        return nxt, idx

    _, indices = jax.lax.scan(walk, start, None, length=n_step)
    # indices: (n_step, batch) — the visited rows
    final = indices[-1]

    # reward accumulation backwards with end-flag restarts (buffer_ep.py:106-117):
    # gammas[n]=n+1 where end_flag at step n (scanning n from n_step−1 down to
    # 0), else n_step; rewards reset to 0 past an episode end
    rew = jnp.zeros((batch_size, 1))
    gammas = jnp.full((batch_size,), n_step)
    for n in range(n_step - 1, -1, -1):
        now = indices[n]
        ef = end_flag[now] > 0
        gammas = jnp.where(ef, n + 1, gammas)
        rew = jnp.where(ef[:, None], 0.0, rew)
        rew = buf.rewards[now] + gamma * rew
    sp_gamma = (gamma ** gammas.astype(jnp.float32))[:, None]

    take = lambda arr, idx: jnp.take(arr, idx, axis=0)
    return Sample(
        share_obs=take(buf.share_obs, start),
        obs=tuple(take(o, start) for o in buf.obs),
        actions=tuple(take(a, start) for a in buf.actions),
        available_actions=None
        if buf.available_actions is None
        else tuple(take(a, start) for a in buf.available_actions),
        rewards=rew,
        dones=take(buf.dones, final),
        valid_transitions=tuple(take(v, start) for v in buf.valid_transitions),
        terms=take(buf.terms, final),
        next_share_obs=take(buf.next_share_obs, final),
        next_obs=tuple(take(o, final) for o in buf.next_obs),
        next_available_actions=None
        if buf.next_available_actions is None
        else tuple(take(a, final) for a in buf.next_available_actions),
        gamma=sp_gamma,
    )


# ---------------------------------------------------------------------------
# FP (agent-specific state) variant — off_policy_buffer_fp.py
# ---------------------------------------------------------------------------

def init_buffer_fp(
    buffer_size: int,
    n_agents: int,
    share_obs_dim: int,
    obs_dims,
    act_dims,
    avail_dims=None,
) -> ReplayBuffer:
    """Per-agent state/reward/done/term arrays: env-level fields get an agent
    axis (S, N, ·) (off_policy_buffer_fp.py)."""
    z = lambda *shape: jnp.zeros(shape, jnp.float32)
    base = init_buffer(buffer_size, share_obs_dim, obs_dims, act_dims, avail_dims)
    return base._replace(
        share_obs=z(buffer_size, n_agents, share_obs_dim),
        next_share_obs=z(buffer_size, n_agents, share_obs_dim),
        rewards=z(buffer_size, n_agents, 1),
        dones=z(buffer_size, n_agents, 1),
        terms=z(buffer_size, n_agents, 1),
    )


def sample_fp(
    buf: ReplayBuffer,
    key,
    batch_size: int,
    n_step: int,
    gamma: float,
    n_threads: int,
    start: Optional[jnp.ndarray] = None,
) -> Sample:
    """FP sampling: per-agent end flags drive per-agent n-step walks
    (off_policy_buffer_fp.py:52-148). Env-level outputs are (N·batch, ·)
    agent-major concatenations. ``start`` injects deterministic indices
    (golden-parity tests)."""
    S, N = buf.dones.shape[0], buf.dones.shape[1]
    cur = jnp.maximum(buf.cur_size, 1)
    # per-agent end flags + unfinished heads (off_policy_buffer_fp.py:157-165)
    flag = buf.dones[..., 0] > 0  # (S, N)
    unfinished = (buf.idx - jnp.arange(n_threads) - 1 + cur) % cur
    end_flag = flag.at[unfinished, :].set(True).astype(jnp.int32)

    if start is None:
        start = jax.random.randint(key, (batch_size,), 0, cur)

    def agent_walk(agent_end_flag):
        def walk(idx, _):
            nxt = (idx + (1 - agent_end_flag[idx]) * n_threads) % S
            return nxt, idx

        _, indices = jax.lax.scan(walk, start, None, length=n_step)
        return indices  # (n_step, batch)

    indices = jax.vmap(agent_walk, in_axes=1, out_axes=0)(end_flag)  # (N, n_step, batch)
    final = indices[:, -1, :]  # (N, batch)

    rew = jnp.zeros((N, batch_size, 1))
    gammas = jnp.full((N, batch_size), n_step)
    for n in range(n_step - 1, -1, -1):
        now = indices[:, n, :]                                   # (N, batch)
        ef = jax.vmap(lambda idx, a: end_flag[idx, a])(now, jnp.arange(N)) > 0
        gammas = jnp.where(ef, n + 1, gammas)
        rew = jnp.where(ef[..., None], 0.0, rew)
        r_now = jax.vmap(lambda idx, a: buf.rewards[idx, a])(now, jnp.arange(N))
        rew = r_now + gamma * rew
    sp_gamma = (gamma ** gammas.astype(jnp.float32))[..., None]

    take_agent = lambda arr: jax.vmap(lambda idx, a: arr[idx, a])(final, jnp.arange(N))
    flatten = lambda x: x.reshape((N * batch_size,) + x.shape[2:])
    start_agent = lambda arr: jnp.swapaxes(jnp.take(arr, start, axis=0), 0, 1)  # (N, batch, ·)

    return Sample(
        share_obs=flatten(start_agent(buf.share_obs)),
        obs=tuple(jnp.take(o, start, axis=0) for o in buf.obs),
        actions=tuple(jnp.take(a, start, axis=0) for a in buf.actions),
        available_actions=None
        if buf.available_actions is None
        else tuple(jnp.take(a, start, axis=0) for a in buf.available_actions),
        rewards=flatten(rew),
        dones=flatten(take_agent(buf.dones)),
        valid_transitions=tuple(jnp.take(v, start, axis=0) for v in buf.valid_transitions),
        terms=flatten(take_agent(buf.terms)),
        next_share_obs=flatten(take_agent(buf.next_share_obs)),
        next_obs=tuple(
            jnp.take(buf.next_obs[i], final[i], axis=0) for i in range(N)
        ),
        next_available_actions=None
        if buf.next_available_actions is None
        else tuple(
            jnp.take(buf.next_available_actions[i], final[i], axis=0) for i in range(N)
        ),
        gamma=flatten(sp_gamma),
    )
