"""Pure-JAX many-agent swimmer: TPU-native continuous-control MAMuJoCo analogue.

Reference counterpart: the MAMuJoCo ``manyagent_swimmer`` custom scenario
(``harl/envs/mamujoco/multiagent_mujoco/manyagent_swimmer.py``) — an N-link
planar swimmer whose joints are partitioned across agents. Here the physics is
an original JAX implementation of the classic viscous-swimmer model
(Coulom 2002, as in Gym's swimmer): generalized coordinates
q = (x, y, θ₁…θ_L) with link positions from forward kinematics, anisotropic
per-link viscous drag, and Lagrangian dynamics assembled **by autodiff**:

    pᵢ(q)            — link-center forward kinematics
    Jᵢ = ∂pᵢ/∂q      — via jax.jacfwd
    M(q) = Σ mᵢ JᵢᵀJᵢ + Σ Iᵢ gᵢgᵢᵀ    (gᵢ = ∂θ̄ᵢ/∂q)
    Q    = Σ Jᵢᵀ Fᵢ(drag) + Bτ − coriolis(q, q̇)
    q̈    = M⁻¹ Q,  semi-implicit Euler integration

Everything is a few (L+2)-dim matvecs/solves — tiny, batched, MXU-friendly.
Thousands of instances step in lockstep under vmap+jit, which is what makes
the ≥1M env-steps/s continuous-control target reachable on TPU
(BASELINE.md).

Interface matches the MAMuJoCo adapter semantics as used by HARL
(mujoco_multi.py:200-213): obs = standardized concat(full state, one-hot id);
share_obs = full state; team reward = forward CoM velocity − ctrl cost;
episodes end only by truncation (bad_transition=True) at ``episode_limit``.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from harl_tpu.envs.core import TimeStep
from harl_tpu.utils import spaces

DT = 0.05
LINK_LEN = 0.15
LINK_MASS = 1.0
DRAG_NORMAL = 25.0    # viscous drag ⟂ to the link
DRAG_TANGENT = 0.3    # viscous drag ∥ to the link
TORQUE_SCALE = 2.0
CTRL_COST = 1e-4
JOINT_LIMIT = 100.0   # rad/s velocity clamp for stability


class SwimmerState(NamedTuple):
    q: jnp.ndarray    # (L+2,) — x, y, θ₁…θ_L (absolute link angles)
    qd: jnp.ndarray   # (L+2,)
    t: jnp.ndarray    # () int32


def _link_centers(q: jnp.ndarray, n_links: int) -> jnp.ndarray:
    """(L, 2) link-center positions from generalized coordinates."""
    x, y = q[0], q[1]
    th = q[2:]
    dx = LINK_LEN * jnp.cos(th)
    dy = LINK_LEN * jnp.sin(th)
    # joint positions: cumulative sums starting at head (x, y)
    jx = jnp.concatenate([jnp.array([x]), x + jnp.cumsum(dx)])
    jy = jnp.concatenate([jnp.array([y]), y + jnp.cumsum(dy)])
    cx = 0.5 * (jx[:-1] + jx[1:])
    cy = 0.5 * (jy[:-1] + jy[1:])
    return jnp.stack([cx, cy], axis=1)


@dataclasses.dataclass(frozen=True)
class ManyAgentSwimmer:
    """agent_conf "NxM": N agents × M joints; n_links = N·M + 1."""

    n_agents: int = 4
    joints_per_agent: int = 2
    episode_limit: int = 1000

    @property
    def n_links(self) -> int:
        return self.n_agents * self.joints_per_agent + 1

    @property
    def n_joints(self) -> int:
        return self.n_links - 1

    @property
    def state_dim(self) -> int:
        # θ angles + all velocities (exclude absolute x, y — gym swimmer style)
        return self.n_links + (self.n_links + 2)

    @property
    def obs_dim(self) -> int:
        return self.state_dim + self.n_agents

    @property
    def observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.obs_dim)] * self.n_agents

    @property
    def share_observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.state_dim)] * self.n_agents

    @property
    def action_space(self):
        return [spaces.Box.create(-1.0, 1.0, self.joints_per_agent)] * self.n_agents

    # -------------------------------------------------------------- dynamics
    def _substep(self, q, qd, torques, dt):
        """One semi-implicit Euler substep with IMPLICIT viscous drag:
        (M + dt·G) q̇′ = M q̇ + dt·(Bτ − h),  q′ = q + dt·q̇′
        where G = Σ Jᵀ D J is the generalized drag matrix — unconditionally
        stable for stiff drag."""
        L = self.n_links
        centers_fn = lambda qq: _link_centers(qq, L)
        J = jax.jacfwd(centers_fn)(q)              # (L, 2=c, L+2=dof)
        th = q[2:]
        tang = jnp.stack([jnp.cos(th), jnp.sin(th)], axis=1)   # (L, 2)
        norm = jnp.stack([-jnp.sin(th), jnp.cos(th)], axis=1)
        # per-link anisotropic drag D_l = k_t t tᵀ + k_n n nᵀ → generalized G
        Jt = jnp.einsum("lc,lcj->lj", tang, J)     # (L, dof)
        Jn = jnp.einsum("lc,lcj->lj", norm, J)
        G = DRAG_TANGENT * jnp.einsum("li,lj->ij", Jt, Jt) + DRAG_NORMAL * jnp.einsum(
            "li,lj->ij", Jn, Jn
        )
        # joint torques: torque k acts +on link k+1, −on link k (relative joint)
        tau = jnp.zeros(L).at[1:].add(torques).at[:-1].add(-torques)
        Q = jnp.zeros(L + 2).at[2:].add(tau)
        # mass matrix via autodiff kinematics + link rotational inertia
        M = LINK_MASS * jnp.einsum("lci,lcj->ij", J, J)
        I_link = LINK_MASS * LINK_LEN ** 2 / 12.0
        M = M.at[2:, 2:].add(I_link * jnp.eye(L))
        M = M + 1e-6 * jnp.eye(L + 2)
        # Coriolis term: h = m Jᵀ (∂(Jq̇)/∂q) q̇. The inner contraction is a
        # second-order directional derivative along q̇ — two nested JVPs
        # (O(1) extra evaluations) instead of O(dof²) jacfwd-of-jacfwd,
        # which matters for many-agent swimmers with dozens of links.
        dJv_qd = jax.jvp(
            lambda qq: jax.jvp(centers_fn, (qq,), (qd,))[1], (q,), (qd,)
        )[1]                                                   # (L, 2)
        corio = LINK_MASS * jnp.einsum("lcj,lc->j", J, dJv_qd)
        rhs = M @ qd + dt * (Q - corio)
        qd_new = jnp.linalg.solve(M + dt * G, rhs)
        qd_new = jnp.clip(qd_new, -JOINT_LIMIT, JOINT_LIMIT)
        return q + dt * qd_new, qd_new

    def reset(self, key) -> Tuple[SwimmerState, TimeStep]:
        L = self.n_links
        k1, k2 = jax.random.split(key)
        q = jnp.zeros(L + 2).at[2:].set(
            jax.random.uniform(k1, (L,), minval=-0.1, maxval=0.1)
        )
        qd = jax.random.uniform(k2, (L + 2,), minval=-0.1, maxval=0.1)
        state = SwimmerState(q=q, qd=qd, t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool))

    def step(self, state: SwimmerState, actions, key) -> Tuple[SwimmerState, TimeStep]:
        """actions: (n_agents, joints_per_agent) in [-1, 1]."""
        del key
        torques = jnp.clip(actions.reshape(-1), -1.0, 1.0) * TORQUE_SCALE
        q, qd = state.q, state.qd
        for _ in range(2):
            q, qd = self._substep(q, qd, torques, DT / 2)
        com_vx = (q[0] - state.q[0]) / DT
        reward = com_vx - CTRL_COST * jnp.sum(torques ** 2)
        new_t = state.t + 1
        done = new_t >= self.episode_limit
        new_state = SwimmerState(q=q, qd=qd, t=new_t)
        return new_state, self._timestep(new_state, reward, done)

    # ---------------------------------------------------------- observation
    def _state_vec(self, state: SwimmerState) -> jnp.ndarray:
        return jnp.concatenate([state.q[2:], state.qd])

    def _timestep(self, state, reward, done) -> TimeStep:
        N = self.n_agents
        sv = self._state_vec(state)
        ids = jnp.eye(N)
        obs = jnp.concatenate(
            [jnp.broadcast_to(sv[None], (N, sv.shape[0])), ids], axis=-1
        )
        # per-obs standardization (mujoco_multi.py:208-211)
        mean = jnp.mean(obs, axis=-1, keepdims=True)
        std = jnp.std(obs, axis=-1, keepdims=True) + 1e-8
        obs = (obs - mean) / std
        return TimeStep(
            obs=obs,
            share_obs=sv,
            rewards=jnp.broadcast_to(reward, (N, 1)).astype(jnp.float32),
            dones=jnp.broadcast_to(done, (N,)),
            bad_transition=done,  # truncation-only episodes
            available_actions=None,
        )


def make_swimmer(env_args: dict) -> ManyAgentSwimmer:
    conf = env_args.get("agent_conf", "4x2")
    n_agents, joints = (int(x) for x in conf.split("x"))
    return ManyAgentSwimmer(
        n_agents=n_agents,
        joints_per_agent=joints,
        episode_limit=env_args.get("episode_limit", 1000),
    )
