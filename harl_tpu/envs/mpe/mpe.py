"""Pure-JAX Multi-agent Particle Environments (MPE).

TPU-native reimplementation of the PettingZoo MPE suite used by the reference
(``harl/envs/pettingzoo_mpe/pettingzoo_mpe_env.py``): scenarios
``simple_spread``, ``simple_reference``, ``simple_speaker_listener`` with both
continuous and discrete actions. Physics follows the MPE core integrator:

    dt = 0.1, damping = 0.25, contact_force = 100, contact_margin = 1e-3
    u = (a[1]−a[2], a[3]−a[4]) · sensitivity(=5)        (continuous)
    soft-core collision force: f = cf · Δp/‖Δp‖ · margin·log(1+exp(−(d−dmin)/margin))
    v ← v·(1−damping) + (F/m)·dt ;  p ← p + v·dt

Episode semantics mirror the reference adapter (pettingzoo_mpe_env.py:42-66):
episodes always end by truncation after ``max_cycles`` steps, with
``bad_transition=True``; rewards are the summed team reward repeated per agent;
share_obs (EP state) is the concatenation of all agents' observations
(pettingzoo ``env.state()``).

Unlike the reference, per-agent obs/action spaces are NOT supersuit-padded to a
common size — the framework handles heterogeneous agents natively.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from harl_tpu.envs.core import TimeStep
from harl_tpu.utils import spaces

DT = 0.1
DAMPING = 0.25
CONTACT_FORCE = 100.0
CONTACT_MARGIN = 1e-3
SENSITIVITY = 5.0

LANDMARK_COLORS = jnp.array(
    [[0.75, 0.25, 0.25], [0.25, 0.75, 0.25], [0.25, 0.25, 0.75]], jnp.float32
)


class MPEState(NamedTuple):
    agent_pos: jnp.ndarray     # (N, 2)
    agent_vel: jnp.ndarray     # (N, 2)
    agent_comm: jnp.ndarray    # (N, dim_c)
    landmark_pos: jnp.ndarray  # (L, 2)
    goals: jnp.ndarray         # scenario-specific int goals, shape (N,)
    t: jnp.ndarray             # () int32 step counter


def _move_force_continuous(a_move: jnp.ndarray) -> jnp.ndarray:
    """a_move: (..., 5) in [0,1] → force (…, 2): (a1−a2, a3−a4)·sens."""
    return jnp.stack(
        [a_move[..., 1] - a_move[..., 2], a_move[..., 3] - a_move[..., 4]], axis=-1
    ) * SENSITIVITY


def _move_force_discrete(a_idx: jnp.ndarray) -> jnp.ndarray:
    """a_idx: (...) int in [0,5) → force via one-hot mapping."""
    onehot = jax.nn.one_hot(a_idx, 5)
    return _move_force_continuous(onehot)


def _integrate(pos, vel, force, movable, max_speed=None):
    vel = vel * (1.0 - DAMPING) + force * DT
    vel = jnp.where(movable[:, None], vel, 0.0)
    if max_speed is not None:
        speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
        scale = jnp.where(speed > max_speed, max_speed / jnp.maximum(speed, 1e-8), 1.0)
        vel = vel * scale
    return pos + vel * DT, vel


def _collision_forces(pos, sizes, collide_mask):
    """Pairwise soft-core forces among colliding, same-team entities.

    pos: (N,2); sizes: (N,); collide_mask: (N,) bool. Returns (N,2) force sum.
    """
    delta = pos[:, None, :] - pos[None, :, :]          # (N, N, 2)
    dist = jnp.sqrt(jnp.sum(delta ** 2, axis=-1) + 1e-8)
    dist_min = sizes[:, None] + sizes[None, :]
    k = CONTACT_MARGIN
    # stable softplus — naive log1p(exp(x)) overflows float32 for deep overlaps
    penetration = jax.nn.softplus(-(dist - dist_min) / k) * k
    fmag = CONTACT_FORCE * penetration / dist
    pair = collide_mask[:, None] & collide_mask[None, :]
    eye = jnp.eye(pos.shape[0], dtype=bool)
    fmag = jnp.where(pair & ~eye, fmag, 0.0)
    return jnp.sum(fmag[..., None] * delta, axis=1)


@dataclasses.dataclass(frozen=True)
class MPEScenario:
    """Static scenario description; subclass-free — behavior switched on name."""

    scenario: str = "simple_spread"
    continuous_actions: bool = True
    max_cycles: int = 25
    local_ratio: float = 0.5  # pettingzoo simple_spread default

    # ----- static metadata -------------------------------------------------
    @property
    def n_agents(self) -> int:
        return {"simple_spread": 3, "simple_reference": 2, "simple_speaker_listener": 2}[
            self.scenario
        ]

    @property
    def n_landmarks(self) -> int:
        return 3

    @property
    def dim_c(self) -> int:
        return {"simple_spread": 2, "simple_reference": 10, "simple_speaker_listener": 3}[
            self.scenario
        ]

    @property
    def agent_sizes(self) -> Tuple[float, ...]:
        if self.scenario == "simple_spread":
            return (0.15,) * 3
        if self.scenario == "simple_reference":
            return (0.05, 0.05)
        return (0.075, 0.075)  # speaker, listener

    @property
    def movable(self) -> Tuple[bool, ...]:
        if self.scenario == "simple_speaker_listener":
            return (False, True)  # speaker static, listener moves
        return (True,) * self.n_agents

    @property
    def collide(self) -> Tuple[bool, ...]:
        if self.scenario == "simple_spread":
            return (True,) * 3
        return (False,) * self.n_agents

    @property
    def obs_dims(self) -> Tuple[int, ...]:
        if self.scenario == "simple_spread":
            # vel(2)+pos(2)+landmark_rel(6)+other_rel(4)+comm(4)
            return (18, 18, 18)
        if self.scenario == "simple_reference":
            # vel(2)+landmark_rel(6)+goal_color(3)+other_comm(10)
            return (21, 21)
        # speaker: goal_color(3); listener: vel(2)+landmark_rel(6)+comm(3)
        return (3, 11)

    @property
    def observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, d) for d in self.obs_dims]

    @property
    def share_observation_space(self):
        d = sum(self.obs_dims)
        return [spaces.Box.create(-jnp.inf, jnp.inf, d) for _ in range(self.n_agents)]

    @property
    def action_space(self):
        s = self.scenario
        if self.continuous_actions:
            if s == "simple_spread":
                return [spaces.Box.create(0.0, 1.0, 5) for _ in range(3)]
            if s == "simple_reference":
                return [spaces.Box.create(0.0, 1.0, 5 + self.dim_c) for _ in range(2)]
            return [spaces.Box.create(0.0, 1.0, self.dim_c), spaces.Box.create(0.0, 1.0, 5)]
        if s == "simple_spread":
            return [spaces.Discrete(5) for _ in range(3)]
        if s == "simple_reference":
            return [spaces.Discrete(5 * self.dim_c) for _ in range(2)]
        return [spaces.Discrete(self.dim_c), spaces.Discrete(5)]

    # ----- dynamics --------------------------------------------------------
    def reset(self, key) -> Tuple[MPEState, TimeStep]:
        k1, k2, k3 = jax.random.split(key, 3)
        n, L = self.n_agents, self.n_landmarks
        agent_pos = jax.random.uniform(k1, (n, 2), minval=-1.0, maxval=1.0)
        landmark_pos = jax.random.uniform(k2, (L, 2), minval=-0.9, maxval=0.9)
        if self.scenario == "simple_spread":
            goals = jnp.zeros((n,), jnp.int32)
        else:
            # goal landmark index per agent (reference: goal_b; speaker_listener:
            # shared goal stored at index 0)
            goals = jax.random.randint(k3, (n,), 0, L)
        state = MPEState(
            agent_pos=agent_pos,
            agent_vel=jnp.zeros((n, 2)),
            agent_comm=jnp.zeros((n, self.dim_c)),
            landmark_pos=landmark_pos,
            goals=goals,
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._timestep(state, rewards=jnp.zeros((n, 1)), done=jnp.zeros((), bool))

    def step(self, state: MPEState, actions, key) -> Tuple[MPEState, TimeStep]:
        """actions: continuous (N, act_dim) stacked ragged-padded per agent OR
        discrete (N, 1) int. For heterogeneous action dims the caller passes a
        list; internally we handle per-agent slices statically."""
        del key  # MPE dynamics are deterministic
        n = self.n_agents
        move_force, comm = self._decode_actions(actions)
        sizes = jnp.asarray(self.agent_sizes)
        movable = jnp.asarray(self.movable)
        collide = jnp.asarray(self.collide)
        force = move_force + _collision_forces(state.agent_pos, sizes, collide)
        pos, vel = _integrate(state.agent_pos, state.agent_vel, force, movable)
        new_state = state._replace(agent_pos=pos, agent_vel=vel, agent_comm=comm, t=state.t + 1)
        rewards = self._rewards(new_state)
        done = new_state.t >= self.max_cycles
        return new_state, self._timestep(new_state, rewards, done)

    def _decode_actions(self, actions):
        """Split per-agent action vectors into (move force (N,2), comm (N,dim_c))."""
        n = self.n_agents
        s = self.scenario
        if self.continuous_actions:
            if s == "simple_spread":
                return _move_force_continuous(actions), jnp.zeros((n, self.dim_c))
            if s == "simple_reference":
                return _move_force_continuous(actions[:, :5]), actions[:, 5:]
            # speaker_listener: actions padded to max dim by caller? No — list in,
            # stacked (N, max_dim): speaker uses [:dim_c], listener uses [:5].
            comm = jnp.zeros((n, self.dim_c)).at[0].set(actions[0, : self.dim_c])
            mf = jnp.zeros((n, 2)).at[1].set(_move_force_continuous(actions[1, :5]))
            return mf, comm
        a = actions[..., 0].astype(jnp.int32)
        if s == "simple_spread":
            return _move_force_discrete(a), jnp.zeros((n, self.dim_c))
        if s == "simple_reference":
            move_idx = a % 5
            comm_idx = a // 5
            return _move_force_discrete(move_idx), jax.nn.one_hot(comm_idx, self.dim_c)
        comm = jnp.zeros((n, self.dim_c)).at[0].set(jax.nn.one_hot(a[0], self.dim_c))
        mf = jnp.zeros((n, 2)).at[1].set(_move_force_discrete(a[1]))
        return mf, comm

    def _rewards(self, state: MPEState) -> jnp.ndarray:
        """Summed team reward repeated per agent (pettingzoo_mpe_env.py:56-57)."""
        n = self.n_agents
        if self.scenario == "simple_spread":
            d = jnp.linalg.norm(
                state.landmark_pos[:, None, :] - state.agent_pos[None, :, :], axis=-1
            )  # (L, N)
            global_rew = -jnp.sum(jnp.min(d, axis=1))
            sizes = jnp.asarray(self.agent_sizes)
            delta = state.agent_pos[:, None] - state.agent_pos[None, :]
            dist = jnp.sqrt(jnp.sum(delta ** 2, axis=-1) + 1e-8)
            dmin = sizes[:, None] + sizes[None, :]
            # pettingzoo 1.22.2 (the reference pin) counts SELF-collision:
            # `for a in world.agents: if is_collision(a, agent)` has no
            # a-is-agent guard and dist(agent, agent)=0 < dmin, so every
            # agent pays a constant −1/step — keep the diagonal for
            # return-scale parity with the reference learning curves
            coll = dist < dmin
            local = -jnp.sum(coll, axis=1).astype(jnp.float32)
            per_agent = global_rew * (1 - self.local_ratio) + local * self.local_ratio
            total = jnp.sum(per_agent)
        elif self.scenario == "simple_reference":
            # agent i's reward: −dist²(other agent, landmark goals[i])
            other = jnp.array([1, 0])
            tgt = state.landmark_pos[state.goals]            # (2, 2)
            d2 = jnp.sum((state.agent_pos[other] - tgt) ** 2, axis=-1)
            total = jnp.sum(-d2)
        else:  # speaker_listener: shared −dist²(listener, goal landmark)
            tgt = state.landmark_pos[state.goals[0]]
            d2 = jnp.sum((state.agent_pos[1] - tgt) ** 2)
            total = -d2 * n
        return jnp.broadcast_to(total, (n, 1)).astype(jnp.float32)

    def _obs(self, state: MPEState) -> jnp.ndarray:
        """Per-agent observations, zero-padded to max obs dim, shape (N, max_d)."""
        s = self.scenario
        if s == "simple_spread":
            rows = []
            for i in range(3):
                lm_rel = (state.landmark_pos - state.agent_pos[i]).reshape(-1)
                others = [j for j in range(3) if j != i]
                other_rel = (state.agent_pos[jnp.array(others)] - state.agent_pos[i]).reshape(-1)
                comm = state.agent_comm[jnp.array(others)].reshape(-1)
                rows.append(
                    jnp.concatenate([state.agent_vel[i], state.agent_pos[i], lm_rel, other_rel, comm])
                )
            return jnp.stack(rows)
        if s == "simple_reference":
            rows = []
            for i in range(2):
                lm_rel = (state.landmark_pos - state.agent_pos[i]).reshape(-1)
                goal_color = LANDMARK_COLORS[state.goals[i]]
                other_comm = state.agent_comm[1 - i]
                rows.append(
                    jnp.concatenate([state.agent_vel[i], lm_rel, goal_color, other_comm])
                )
            return jnp.stack(rows)
        # speaker_listener — ragged dims, zero-padded to 11
        goal_color = LANDMARK_COLORS[state.goals[0]]
        speaker_obs = jnp.concatenate([goal_color, jnp.zeros(8)])
        lm_rel = (state.landmark_pos - state.agent_pos[1]).reshape(-1)
        listener_obs = jnp.concatenate([state.agent_vel[1], lm_rel, state.agent_comm[0]])
        return jnp.stack([speaker_obs, listener_obs])

    def _timestep(self, state, rewards, done) -> TimeStep:
        obs = self._obs(state)
        share_obs = self._share_obs(obs)
        n = self.n_agents
        dones = jnp.broadcast_to(done, (n,))
        if self.continuous_actions:
            avail = None
        else:
            # all actions always available; padding columns (heterogeneous
            # action-space widths stacked to max_action_n) are masked out
            avail = jnp.stack(
                [
                    jnp.concatenate(
                        [jnp.ones(sp.n), jnp.zeros(self.max_action_n - sp.n)]
                    )
                    for sp in self.action_space
                ]
            ).astype(jnp.float32)
        return TimeStep(
            obs=obs,
            share_obs=share_obs,
            rewards=rewards,
            dones=dones,
            bad_transition=done,  # MPE episodes only end by truncation
            available_actions=avail,
        )

    def _share_obs(self, obs: jnp.ndarray) -> jnp.ndarray:
        """EP state: concat of all true (unpadded) agent observations."""
        parts = [obs[i, : d] for i, d in enumerate(self.obs_dims)]
        return jnp.concatenate(parts)

    @property
    def max_action_n(self) -> int:
        if self.continuous_actions:
            return max(sp.dim for sp in self.action_space)
        return max(sp.n for sp in self.action_space)


def make_mpe(scenario: str = "simple_spread", continuous_actions: bool = True, **kwargs) -> MPEScenario:
    assert scenario in ("simple_spread", "simple_reference", "simple_speaker_listener"), scenario
    return MPEScenario(scenario=scenario, continuous_actions=continuous_actions, **kwargs)
