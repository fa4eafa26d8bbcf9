"""Pure-JAX manyagent_ant: the MAMuJoCo custom N-segment ant on device.

Reference counterpart: ``harl/envs/mamujoco/multiagent_mujoco/manyagent_ant.py``
(jinja-generated MuJoCo XML) + the obsk partition at ``obsk.py:756-866``. The
generated model is a **rigid** chain — the inter-segment joint is commented out
in the body template (``manyagent_ant.py:47``) — of ``n_segs`` torso capsules
(length 1, radius 0.1, density 100; segment 0's torso geom is also commented
out, so it carries leg mass only), each segment with two diagonal legs:

  hip   — z-axis hinge, range ±30°, at the aux-capsule end
  ankle — diagonal-axis hinge ((±1,1,0)), range (30°,70°) on segment 0 and
          (−70°,−30°) on trailing segments (whose legs point backwards)

Actuators gear 150 in document order hip1,ankle1,hip2,ankle2 per segment;
``agent_conf = NxM`` gives N agents × M segments (4 actuators each)
(``obsk.py:858-864``). Reward (``manyagent_ant.py:97-112``): torso_0 forward
x-velocity + 1.0 survive − 0.5·‖a‖² − contact cost; unhealthy when root z
leaves [0.2, 1.0] or the state is non-finite.

The dynamics reuse the 3D Lagrangian point-mass scheme of :mod:`.ant`
(rotation-vector root chart, autodiff jacobians/bias, implicit-damping Euler
with penalty contacts) — one rigid root with 2·n_segs legs is exactly the
Ant tree with more legs and an elongated torso, so the same machinery
applies; n_segs is static so XLA unrolls the per-leg assembly into one
fused program, vmapped over thousands of env instances.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from harl_tpu.envs.core import TimeStep
from harl_tpu.envs.mamujoco_jax.ant import _axis_rot, _rodrigues
from harl_tpu.utils import spaces

GRAVITY = 9.81
DT = 0.01
FRAME_SKIP = 5
GEAR = 150.0
ARMATURE = 1.0
JOINT_DAMPING = 1.0
TORSO_DENSITY = 100.0
TORSO_R = 0.1
TORSO_LEN = 1.0
LEG_R = 0.08
L_AUX = 0.2 * math.sqrt(2.0)     # seg-0 aux |(0.2,0.2,0)|; trailing aux len 0.2
L_UPPER = 0.2 * math.sqrt(2.0)
L_LOWER = 0.4 * math.sqrt(2.0)
QPOS0_Z = 0.55                   # template custom init_qpos z
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
ROTVEC_MAX = 1.9 * math.pi

HIP_RANGE = (-math.radians(30.0), math.radians(30.0))
ANKLE_RANGE_FRONT = (math.radians(30.0), math.radians(70.0))
ANKLE_RANGE_BACK = (-math.radians(70.0), -math.radians(30.0))


def _leg_table(n_segs: int):
    """Static per-leg geometry, one row per (segment, side) in q order.

    Returns a list of dicts with: attach point (3,), aux/upper/lower segment
    direction unit vectors (legs are straight chains of capsules along a
    diagonal), ankle axis, ankle range. Document order per segment:
    side +1 ("front"/left, +y) then side −1 ("back"/right, −y), matching the
    actuator order hip1,ankle1,hip2,ankle2.
    """
    legs = []
    for si in range(n_segs):
        for s in (+1.0, -1.0):
            attach = (-float(si), 0.0, 0.0)
            if si == 0:
                # template: aux fromto (0,0,0)→(0.2, s·0.2, 0), leg +(0.2,s·0.2),
                # ankle +(0.4, s·0.4)
                u = (1.0 / math.sqrt(2.0), s / math.sqrt(2.0), 0.0)
                aux_vec = (0.2, s * 0.2, 0.0)
                ankle_axis = (-1.0, 1.0, 0.0) if s > 0 else (1.0, 1.0, 0.0)
                ankle_range = ANKLE_RANGE_FRONT
            else:
                # body template: aux (0, s·0.2, 0) straight lateral, leg
                # (−0.2, s·0.2), ankle (−0.4, s·0.4)
                u = (-1.0 / math.sqrt(2.0), s / math.sqrt(2.0), 0.0)
                aux_vec = (0.0, s * 0.2, 0.0)
                ankle_axis = (1.0, 1.0, 0.0) if s > 0 else (-1.0, 1.0, 0.0)
                ankle_range = ANKLE_RANGE_BACK
            legs.append(dict(attach=attach, u=u, aux_vec=aux_vec,
                             ankle_axis=ankle_axis, ankle_range=ankle_range,
                             aux_len=L_AUX if si == 0 else 0.2))
    return legs


class ManyAntState(NamedTuple):
    q: jnp.ndarray    # (6 + 4·n_segs,)
    qd: jnp.ndarray
    t: jnp.ndarray    # () int32


@dataclasses.dataclass(frozen=True)
class ManyAntDynamics:
    """Rigid n_segs-chain with 2·n_segs legs (one instance; vmap over envs)."""

    n_segs: int

    @property
    def dof(self) -> int:
        return 6 + 4 * self.n_segs

    @property
    def n_joints(self) -> int:
        return 4 * self.n_segs

    def _legs(self):
        return _leg_table(self.n_segs)

    def _leg_points(self, q, leg, hip_idx, ankle_idx):
        """World hip/knee/foot + capsule sample points for one leg."""
        o = q[0:3]
        R = _rodrigues(q[3:6])
        attach = o + R @ jnp.asarray(leg["attach"])
        hip = attach + R @ jnp.asarray(leg["aux_vec"])
        Rh = R @ _axis_rot((0.0, 0.0, 1.0), q[6 + hip_idx])
        Ra = Rh @ _axis_rot(leg["ankle_axis"], q[6 + ankle_idx])
        u = jnp.asarray(leg["u"])
        knee = hip + Rh @ (L_UPPER * u)
        foot = knee + Ra @ (L_LOWER * u)
        upper_mid = hip + Rh @ (L_UPPER * 0.5 * u)
        lower_mid = knee + Ra @ (L_LOWER * 0.5 * u)
        aux_mid = 0.5 * (attach + hip)
        return attach, aux_mid, hip, upper_mid, knee, lower_mid, foot

    def _points(self, q):
        """World positions of the equivalent point-mass system (P, 3)."""
        o = q[0:3]
        R = _rodrigues(q[3:6])
        pts = []
        # trailing torso capsules: chain nodes 0,−1,…,−(n_segs−1) + midpoints
        for si in range(1, self.n_segs):
            a = o + R @ jnp.array([-(si - 1.0), 0.0, 0.0])
            b = o + R @ jnp.array([-float(si), 0.0, 0.0])
            pts += [a, 0.5 * (a + b), b]
        for li, leg in enumerate(self._legs()):
            hip_idx, ankle_idx = 2 * li, 2 * li + 1
            attach, aux_mid, hip, up_mid, knee, lo_mid, foot = self._leg_points(
                q, leg, hip_idx, ankle_idx)
            pts += [attach, aux_mid, hip]       # aux capsule (torso body)
            pts += [hip, up_mid, knee]          # upper leg
            pts += [knee, lo_mid, foot]         # lower leg
        return jnp.stack(pts)

    @property
    def masses(self):
        # capsule mass at density ρ, radius r, length L
        def cap(rho, r, L):
            return rho * (math.pi * r * r * L + (4.0 / 3.0) * math.pi * r ** 3)

        m = []
        mt = cap(TORSO_DENSITY, TORSO_R, TORSO_LEN)
        for _ in range(1, self.n_segs):
            m += [mt / 6, 2 * mt / 3, mt / 6]
        m_up = cap(5.0, LEG_R, L_UPPER)
        m_low = cap(5.0, LEG_R, L_LOWER)
        for leg in self._legs():
            m_aux = cap(5.0, LEG_R, leg["aux_len"])
            m += [m_aux / 6, 2 * m_aux / 3, m_aux / 6]
            m += [m_up / 6, 2 * m_up / 3, m_up / 6]
            m += [m_low / 6, 2 * m_low / 3, m_low / 6]
        return jnp.asarray(m)

    def _contacts(self, q):
        """Contact sphere centers: chain nodes + foot tips."""
        o = q[0:3]
        R = _rodrigues(q[3:6])
        pts = [o + R @ jnp.array([-float(si), 0.0, 0.0])
               for si in range(self.n_segs)]
        for li, leg in enumerate(self._legs()):
            *_, foot = self._leg_points(q, leg, 2 * li, 2 * li + 1)
            pts.append(foot)
        return jnp.stack(pts)

    @property
    def contact_radii(self):
        return jnp.asarray([TORSO_R] * self.n_segs + [LEG_R] * (2 * self.n_segs))

    @property
    def q_limits(self):
        lo, hi = [], []
        for leg in self._legs():
            lo += [HIP_RANGE[0], leg["ankle_range"][0]]
            hi += [HIP_RANGE[1], leg["ankle_range"][1]]
        return jnp.asarray(lo), jnp.asarray(hi)

    def _substep(self, q, qd, tau):
        dt = DT
        dof = self.dof
        J = jax.jacfwd(self._points)(q)
        vel_of_q = lambda qq: jax.jvp(self._points, (qq,), (qd,))[1]
        _, a_bias = jax.jvp(vel_of_q, (q,), (qd,))
        m = self.masses
        M = jnp.einsum("p,pci,pcj->ij", m, J, J)
        M = M + jnp.diag(jnp.concatenate(
            [jnp.zeros(6), jnp.full((self.n_joints,), ARMATURE)]))
        M = M + 1e-8 * jnp.eye(dof)
        corio = jnp.einsum("p,pci,pc->i", m, J, a_bias)
        Q = -GRAVITY * jnp.einsum("p,pi->i", m, J[:, 2, :])
        Q = Q.at[6:].add(GEAR * tau)
        q_lo, q_hi = self.q_limits
        over = (jnp.maximum(q[6:] - q_hi, 0.0)
                - jnp.maximum(q_lo - q[6:], 0.0))
        outside = (over != 0.0).astype(q.dtype)
        Q = Q.at[6:].add(-LIMIT_K * over)
        D = jnp.diag(jnp.concatenate(
            [jnp.zeros(6), JOINT_DAMPING + LIMIT_C * outside]))
        Jc = jax.jacfwd(self._contacts)(q)
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
class ManyAgentAnt:
    """MAMuJoCo partition of the N-segment ant (``agent_conf = NxM``)."""

    n_agents: int = 2
    segs_per_agent: int = 3
    episode_limit: int = 1000

    @property
    def dyn(self) -> ManyAntDynamics:
        return ManyAntDynamics(n_segs=self.n_agents * self.segs_per_agent)

    @property
    def act_per_agent(self) -> int:
        return 4 * self.segs_per_agent

    @property
    def state_dim(self) -> int:
        dof = self.dyn.dof
        return (dof - 2) + dof  # qpos[2:] + qvel

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
        return [spaces.Box.create(-1.0, 1.0, self.act_per_agent)] * self.n_agents

    # ------------------------------------------------------------------ api
    def reset(self, key) -> Tuple[ManyAntState, TimeStep]:
        dyn = self.dyn
        k1, k2 = jax.random.split(key)
        q_lo, q_hi = dyn.q_limits
        q0_joints = 0.5 * (q_lo + q_hi)   # mid-range (qpos0 clamped in range)
        q = jnp.concatenate([
            jnp.array([0.0, 0.0, QPOS0_Z, 0.0, 0.0, 0.0]), q0_joints])
        q = q + jax.random.uniform(k1, (dyn.dof,), minval=-0.1, maxval=0.1)
        qd = 0.1 * jax.random.normal(k2, (dyn.dof,))
        state = ManyAntState(q=q, qd=qd, t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool))

    def step(self, state: ManyAntState, actions, key) -> Tuple[ManyAntState, TimeStep]:
        del key
        dyn = self.dyn
        flat = jnp.concatenate(
            [jnp.asarray(actions[i])[: self.act_per_agent]
             for i in range(self.n_agents)])
        q, qd, contact_n = dyn.physics_step(state.q, state.qd, flat)
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
        new_state = ManyAntState(q=q, qd=qd, t=new_t)
        return new_state, self._timestep(new_state, reward, done, bad)

    def _is_healthy(self, q, qd):
        ok = (q[2] > HEALTHY_Z[0]) & (q[2] < HEALTHY_Z[1])
        ok = ok & (jnp.linalg.norm(q[3:6]) < ROTVEC_MAX)
        ok = ok & jnp.all(jnp.isfinite(q)) & jnp.all(jnp.isfinite(qd))
        return ok

    # ---------------------------------------------------------- observation
    def _state_vec(self, state: ManyAntState) -> jnp.ndarray:
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


def make_manyagent_ant(env_args: dict) -> ManyAgentAnt:
    conf = env_args.get("agent_conf", "2x3")
    n_agents, segs = (int(x) for x in conf.split("x"))
    return ManyAgentAnt(
        n_agents=n_agents,
        segs_per_agent=segs,
        episode_limit=env_args.get("episode_limit", 1000),
    )
