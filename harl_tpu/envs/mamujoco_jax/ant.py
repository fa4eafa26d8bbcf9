"""Pure-JAX 3D Ant: the MAMuJoCo Ant-v2 scenarios on device.

TPU-native counterpart of the reference's Ant factorizations
(``harl/envs/mamujoco/multiagent_mujoco/obsk.py:184-866`` — Ant-v2 2x4 /
2x4d / 4x2 / 8x1) without the MuJoCo C engine, so thousands of instances
step in lockstep under ``vmap``+``jit``. Extends the Lagrangian scheme of
``planar.py`` from planar chains to a full 3D free-floating tree:

  q = (x, y, z, r₁ r₂ r₃, θ₁…θ₈)   — root position + rotation VECTOR
                                      (axis·angle; smooth chart, no
                                      quaternion normalization constraint)
  p(q)  — world positions of point masses distributed over the bodies so
          that Σ mᵢ and the second moments match each capsule/sphere
          (rod ends carry m/6, sphere surface points m/10 — the classic
          equivalent-inertia point systems), assembled by Rodrigues
          kinematics over the torso→hip→ankle tree of ant.xml
  J = ∂p/∂q          via jax.jacfwd (traced once, fused by XLA)
  a_bias = ∂(J q̇)/∂q · q̇   via nested jax.jvp (no Hessian materialized)
  M(q) = Σ mᵢ JᵢᵀJᵢ + diag(armature)
  (M + dt·D) q̇′ = M q̇ + dt·(Q − Σ mᵢ Jᵢᵀ a_bias)   — implicit damping
                                                     Euler (joint dampers,
                                                     contact normal dampers,
                                                     2-D regularized Coulomb
                                                     friction)

Geometry, masses (density 5.0), joint ranges/armature/damping, gear 150,
frame_skip 5 × dt 0.01, reset noise, and the Ant-v2 reward
(forward x-velocity + healthy 1.0 − 0.5·ctrl − 5e-4·contact) follow Gym's
``ant.xml``/``AntEnv``; the contact solver is the same soft-penalty
re-design as ``planar.py`` rather than MuJoCo's LCP. Torso z ∉ (0.2, 1.0)
or |rotation vector| near the chart boundary terminates (unhealthy).

Agent factorization follows this repo's MAMuJoCo convention: contiguous
actuator-order partitions by ``agent_conf`` (actuator order hip₄,ankle₄,
hip₁,ankle₁,hip₂,ankle₂,hip₃,ankle₃ as in ant.xml, so "4x2" gives one leg
per agent exactly like the reference's obsk partition); per-agent obs =
standardized concat(state, one-hot id); share_obs = state; team reward.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import TimeStep
from harl_tpu.utils import spaces

GRAVITY = 9.81
DT = 0.01
FRAME_SKIP = 5
GEAR = 150.0
ARMATURE = 1.0
JOINT_DAMPING = 1.0
DENSITY = 5.0
TORSO_R = 0.25
CAP_R = 0.08
L_LINK = 0.2 * math.sqrt(2.0)    # aux geom |(0.2,0.2,0)|
L_UPPER = 0.2 * math.sqrt(2.0)   # leg geom
L_LOWER = 0.4 * math.sqrt(2.0)   # ankle geom
QPOS0_Z = 0.75
CONTACT_K = 1500.0
CONTACT_C = 40.0
FRICTION_MU = 1.0
FRICTION_VREG = 0.1
LIMIT_K = 300.0
LIMIT_C = 10.0
CTRL_COST = 0.5
CONTACT_COST = 5e-4
HEALTHY_REWARD = 1.0
HEALTHY_Z = (0.2, 1.0)
ROTVEC_MAX = 1.9 * math.pi       # chart-safety termination

# legs in ant.xml body order 1..4: azimuths of (0.2,0.2), (-0.2,0.2),
# (-0.2,-0.2), (0.2,-0.2)
LEG_PHI = (45.0, 135.0, 225.0, 315.0)
# actuator order (ant.xml <actuator>): hip_4, ankle_4, hip_1, ankle_1,
# hip_2, ankle_2, hip_3, ankle_3 → (leg index, is_ankle)
ACTUATORS = ((3, 0), (3, 1), (0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1))
HIP_RANGE = (-math.radians(30.0), math.radians(30.0))
ANKLE_RANGE = {  # per leg, radians (ant.xml ankle_1..4)
    0: (math.radians(30.0), math.radians(70.0)),
    1: (-math.radians(70.0), -math.radians(30.0)),
    2: (-math.radians(70.0), -math.radians(30.0)),
    3: (math.radians(30.0), math.radians(70.0)),
}
# ankle rotation axes in the hip frame (ant.xml, normalized)
ANKLE_AXIS = {
    0: (-1.0, 1.0, 0.0),
    1: (1.0, 1.0, 0.0),
    2: (-1.0, 1.0, 0.0),
    3: (1.0, 1.0, 0.0),
}

DOF = 14                          # 3 pos + 3 rotvec + 8 joints
N_JOINTS = 8
# q index (within q[6:]) of each leg's hip/ankle under the actuator ordering
Q_HIP = {leg: 6 + ACTUATORS.index((leg, 0)) for leg in range(4)}
Q_ANKLE = {leg: 6 + ACTUATORS.index((leg, 1)) for leg in range(4)}


def _capsule_mass(length: float) -> float:
    r = CAP_R
    return DENSITY * (math.pi * r * r * length + (4.0 / 3.0) * math.pi * r ** 3)


def _rodrigues(rv):
    """Rotation matrix from a rotation vector, Taylor-safe at 0."""
    th2 = jnp.sum(rv * rv)
    th = jnp.sqrt(th2 + 1e-12)
    k = rv / th
    K = jnp.array([
        [0.0, -k[2], k[1]],
        [k[2], 0.0, -k[0]],
        [-k[1], k[0], 0.0],
    ])
    s = jnp.sin(th)
    c = jnp.cos(th)
    R = jnp.eye(3) + s * K + (1.0 - c) * (K @ K)
    # θ → 0: R → I + [rv]ₓ (the limit of the expression is fine numerically
    # thanks to the 1e-12 guard, but blend for extra safety)
    Rsmall = jnp.eye(3) + jnp.array([
        [0.0, -rv[2], rv[1]],
        [rv[2], 0.0, -rv[0]],
        [-rv[1], rv[0], 0.0],
    ])
    return jnp.where(th < 1e-4, Rsmall, R)


def _axis_rot(axis, th):
    """Rotation about a fixed unit axis by angle th."""
    k = jnp.asarray(axis)
    k = k / jnp.linalg.norm(k)
    K = jnp.array([
        [0.0, -k[2], k[1]],
        [k[2], 0.0, -k[0]],
        [-k[1], k[0], 0.0],
    ])
    return jnp.eye(3) + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)


class AntState(NamedTuple):
    q: jnp.ndarray    # (14,)
    qd: jnp.ndarray   # (14,)
    t: jnp.ndarray    # () int32


def _build_points():
    """Static point-mass table: (attach body id, local offset frac, mass).

    Bodies: 0 torso (incl. the 4 fixed link capsules), 1+2k upper leg k,
    2+2k lower leg k. Offsets are expressed as fractions along each segment
    (resolved to world space inside ``_points``)."""
    m_sph = DENSITY * (4.0 / 3.0) * math.pi * TORSO_R ** 3
    m_link = _capsule_mass(L_LINK)
    m_up = _capsule_mass(L_UPPER)
    m_low = _capsule_mass(L_LOWER)
    return m_sph, m_link, m_up, m_low


M_SPH, M_LINK, M_UP, M_LOW = _build_points()
TOTAL_MASS = M_SPH + 4 * (M_LINK + M_UP + M_LOW)


@dataclasses.dataclass(frozen=True)
class AntDynamics:
    """Batched 3D ant physics (one instance; vmap over envs)."""

    def _points(self, q):
        """World positions + masses of the equivalent point-mass system.

        Returns (P, 3) positions; masses are the static ``self.masses``."""
        o = q[0:3]
        R = _rodrigues(q[3:6])
        pts = []
        # torso sphere: center (0.4 m) + 6 surface points (m/10 each)
        pts.append(o)
        for ax in range(3):
            e = jnp.zeros(3).at[ax].set(TORSO_R)
            pts.append(o + R @ e)
            pts.append(o - R @ e)
        for leg in range(4):
            phi = math.radians(LEG_PHI[leg])
            u = jnp.array([math.cos(phi), math.sin(phi), 0.0])
            th_hip = q[Q_HIP[leg]]
            th_ank = q[Q_ANKLE[leg]]
            Rh = R @ _axis_rot((0.0, 0.0, 1.0), th_hip)
            Ra = Rh @ _axis_rot(ANKLE_AXIS[leg], th_ank)
            hip = o + R @ (L_LINK * u)
            knee = hip + Rh @ (L_UPPER * u)
            foot = knee + Ra @ (L_LOWER * u)
            # fixed link capsule (torso body): ends + mid
            pts += [o, o + R @ (L_LINK * 0.5 * u), hip]
            # upper leg: ends + mid
            pts += [hip, hip + Rh @ (L_UPPER * 0.5 * u), knee]
            # lower leg: ends + mid
            pts += [knee, knee + Ra @ (L_LOWER * 0.5 * u), foot]
        return jnp.stack(pts)

    @property
    def masses(self):
        m = [0.4 * M_SPH] + [M_SPH / 10.0] * 6
        for _ in range(4):
            m += [M_LINK / 6, 2 * M_LINK / 3, M_LINK / 6]
            m += [M_UP / 6, 2 * M_UP / 3, M_UP / 6]
            m += [M_LOW / 6, 2 * M_LOW / 3, M_LOW / 6]
        return jnp.asarray(m)

    def _contacts(self, q):
        """Contact sphere centers (feet tips + torso) and radii."""
        o = q[0:3]
        R = _rodrigues(q[3:6])
        pts = [o]
        for leg in range(4):
            phi = math.radians(LEG_PHI[leg])
            u = jnp.array([math.cos(phi), math.sin(phi), 0.0])
            Rh = R @ _axis_rot((0.0, 0.0, 1.0), q[Q_HIP[leg]])
            Ra = Rh @ _axis_rot(ANKLE_AXIS[leg], q[Q_ANKLE[leg]])
            hip = o + R @ (L_LINK * u)
            knee = hip + Rh @ (L_UPPER * u)
            foot = knee + Ra @ (L_LOWER * u)
            pts.append(foot)
        return jnp.stack(pts)

    @property
    def contact_radii(self):
        return jnp.asarray([TORSO_R] + [CAP_R] * 4)

    # joint limits in actuator/q order
    @property
    def q_limits(self):
        lo, hi = [], []
        for leg, is_ank in ACTUATORS:
            rng = ANKLE_RANGE[leg] if is_ank else HIP_RANGE
            lo.append(rng[0])
            hi.append(rng[1])
        return jnp.asarray(lo), jnp.asarray(hi)

    def _substep(self, q, qd, tau):
        dt = DT
        J = jax.jacfwd(self._points)(q)                       # (P, 3, dof)
        # bias acceleration ∂(J q̇)/∂q · q̇ via nested JVPs
        vel_of_q = lambda qq: jax.jvp(self._points, (qq,), (qd,))[1]
        _, a_bias = jax.jvp(vel_of_q, (q,), (qd,))            # (P, 3)
        m = self.masses
        M = jnp.einsum("p,pci,pcj->ij", m, J, J)
        M = M + jnp.diag(
            jnp.concatenate([jnp.zeros(6), jnp.full((N_JOINTS,), ARMATURE)]))
        M = M + 1e-8 * jnp.eye(DOF)
        corio = jnp.einsum("p,pci,pc->i", m, J, a_bias)
        Q = -GRAVITY * jnp.einsum("p,pi->i", m, J[:, 2, :])
        Q = Q.at[6:].add(GEAR * tau)
        # joint limits (explicit spring, implicit damper)
        q_lo, q_hi = self.q_limits
        over = (jnp.maximum(q[6:] - q_hi, 0.0)
                - jnp.maximum(q_lo - q[6:], 0.0))
        outside = (over != 0.0).astype(q.dtype)
        Q = Q.at[6:].add(-LIMIT_K * over)
        D = jnp.diag(jnp.concatenate(
            [jnp.zeros(6), JOINT_DAMPING + LIMIT_C * outside]))
        # ground contacts: penalty normal + implicit 2-D Coulomb friction
        Jc = jax.jacfwd(self._contacts)(q)                    # (C, 3, dof)
        cpos = self._contacts(q)
        v = jnp.einsum("pcj,j->pc", Jc, qd)
        pen = jnp.maximum(self.contact_radii - cpos[:, 2], 0.0)
        active = (pen > 0.0).astype(q.dtype)
        N = CONTACT_K * pen
        Q = Q + jnp.einsum("p,pj->j", N, Jc[:, 2, :])
        D = D + CONTACT_C * jnp.einsum(
            "p,pi,pj->ij", active, Jc[:, 2, :], Jc[:, 2, :])
        vt = jnp.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2) + FRICTION_VREG
        ct = FRICTION_MU * N / vt
        for ax in range(2):
            D = D + jnp.einsum("p,pi,pj->ij", ct, Jc[:, ax, :], Jc[:, ax, :])
        rhs = M @ qd + dt * (Q - corio)
        qd_new = jnp.linalg.solve(M + dt * D, rhs)
        qd_new = jnp.clip(qd_new, -100.0, 100.0)
        return q + dt * qd_new, qd_new, jnp.sum(N)

    def physics_step(self, q, qd, actions):
        tau = jnp.clip(actions, -1.0, 1.0)
        n_total = jnp.zeros(())
        for _ in range(FRAME_SKIP):
            q, qd, n = self._substep(q, qd, tau)
            n_total = n_total + n
        return q, qd, n_total / FRAME_SKIP


@dataclasses.dataclass(frozen=True)
class AntMAMuJoCo:
    """MAMuJoCo factorization of the 3D ant (Ant-v2 2x4 / 4x2 / 8x1)."""

    n_agents: int = 4
    joints_per_agent: int = 2
    episode_limit: int = 1000

    dyn: AntDynamics = AntDynamics()

    @property
    def state_dim(self) -> int:
        return (DOF - 2) + DOF  # qpos[2:] (z + rotvec + joints) + qvel

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
        sizes = self._agent_sizes()
        return [spaces.Box.create(-1.0, 1.0, s) for s in sizes]

    def _agent_sizes(self):
        sizes = [self.joints_per_agent] * self.n_agents
        sizes[-1] += N_JOINTS - self.n_agents * self.joints_per_agent
        return sizes

    # ------------------------------------------------------------------ api
    def reset(self, key) -> Tuple[AntState, TimeStep]:
        k1, k2 = jax.random.split(key)
        q = jnp.zeros(DOF).at[2].set(QPOS0_Z)
        q = q + jax.random.uniform(k1, (DOF,), minval=-0.1, maxval=0.1)
        qd = 0.1 * jax.random.normal(k2, (DOF,))
        state = AntState(q=q, qd=qd, t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool))

    def step(self, state: AntState, actions, key) -> Tuple[AntState, TimeStep]:
        del key
        sizes = self._agent_sizes()
        flat = jnp.concatenate(
            [jnp.asarray(actions[i])[: sizes[i]] for i in range(self.n_agents)])
        q, qd, contact_n = self.dyn.physics_step(state.q, state.qd, flat)
        dt_env = DT * FRAME_SKIP
        vel_x = (q[0] - state.q[0]) / dt_env
        ctrl = CTRL_COST * jnp.sum(jnp.clip(flat, -1.0, 1.0) ** 2)
        contact_cost = CONTACT_COST * contact_n ** 2
        healthy = self._is_healthy(q, qd)
        reward = vel_x + HEALTHY_REWARD * healthy - ctrl - contact_cost
        new_t = state.t + 1
        trunc = new_t >= self.episode_limit
        term = ~healthy
        done = term | trunc
        bad = trunc & ~term
        new_state = AntState(q=q, qd=qd, t=new_t)
        return new_state, self._timestep(new_state, reward, done, bad)

    def _is_healthy(self, q, qd):
        ok = (q[2] > HEALTHY_Z[0]) & (q[2] < HEALTHY_Z[1])
        ok = ok & (jnp.linalg.norm(q[3:6]) < ROTVEC_MAX)
        ok = ok & jnp.all(jnp.isfinite(q)) & jnp.all(jnp.isfinite(qd))
        return ok

    # ---------------------------------------------------------- observation
    def _state_vec(self, state: AntState) -> jnp.ndarray:
        return jnp.concatenate([state.q[2:], state.qd]).astype(jnp.float32)

    def _timestep(self, state, reward, done, bad) -> TimeStep:
        N = self.n_agents
        sv = self._state_vec(state)
        ids = jnp.eye(N)
        obs = jnp.concatenate(
            [jnp.broadcast_to(sv[None], (N, sv.shape[0])), ids], axis=-1)
        mean = jnp.mean(obs, axis=-1, keepdims=True)
        std = jnp.std(obs, axis=-1, keepdims=True) + 1e-8
        obs = (obs - mean) / std
        return TimeStep(
            obs=obs,
            share_obs=sv,
            rewards=jnp.broadcast_to(reward, (N, 1)).astype(jnp.float32),
            dones=jnp.broadcast_to(done, (N,)),
            bad_transition=bad,
            available_actions=None,
        )


def make_ant(env_args: dict) -> AntMAMuJoCo:
    conf = env_args.get("agent_conf", "4x2")
    n_agents, joints = (int(x) for x in conf.split("x"))
    if n_agents * joints > N_JOINTS:
        raise ValueError(f"agent_conf {conf} exceeds {N_JOINTS} joints")
    return AntMAMuJoCo(
        n_agents=n_agents,
        joints_per_agent=joints,
        episode_limit=env_args.get("episode_limit", 1000),
    )
