"""Pure-JAX planar MuJoCo-class locomotion: HalfCheetah / Walker2d / Hopper.

TPU-native counterpart of the MAMuJoCo scenarios backed by the MuJoCo C engine
in the reference (``harl/envs/mamujoco/multiagent_mujoco/mujoco_multi.py`` with
Gym's HalfCheetah-v2 / Walker2d-v2 / Hopper-v2). Instead of wrapping a host
simulator, the robots are re-implemented as batched JAX physics so thousands
of instances step in lockstep under ``vmap``+``jit`` — the design that makes
the ≥1M env-steps/s continuous-control target reachable on TPU (BASELINE.md).

The model is an articulated planar rigid-body tree in generalized coordinates
q = (x, z, pitch, θ₁…θ_J) with dynamics assembled by autodiff (the same
scheme as ``swimmer.py``):

    coms(q), angles(q)        — forward kinematics over the body tree
    J = ∂coms/∂q              — via jax.jacfwd (traced once, fused by XLA)
    M(q) = Σ mᵢ JᵢᵀJᵢ + Σ Iᵢ gᵢgᵢᵀ + diag(armature)
    Q    = Bτ + spring/limit + gravity + contact − coriolis
    (M + dt·D) q̇′ = M q̇ + dt·Q     — semi-implicit Euler, IMPLICIT damping
                                      (joint dampers, contact normal dampers,
                                      regularized-Coulomb friction), uncond.
                                      stable for the stiff terms
    q′ = q + dt·q̇′

Ground contact is a penalty model on capsule endpoint/center spheres: explicit
normal spring k·penetration, implicit normal damper, and implicit regularized
Coulomb friction c_t = μN/(|v_t|+v₀) — so friction ≈ μN when sliding without
explicit-integration chatter.

Geometry, masses (inertiafromgeom + settotalmass), joint ranges/damping/
stiffness/armature, gears, reset noise, reward shaping, and healthy-
termination rules are transcribed from Gym's public model XMLs
(gymnasium/envs/mujoco/assets/{half_cheetah,walker2d,hopper}.xml), so the
tasks are the same control problems the reference trains on; the contact
solver is a soft-penalty re-design rather than MuJoCo's LCP.

Agent factorization follows the reference adapter semantics (see
``harl_tpu/envs/mamujoco/mamujoco.py``): contiguous actuator-order partitions
by ``agent_conf`` "NxM"; per-agent obs = standardized concat(full gym obs,
one-hot agent id); share_obs = raw gym obs; team reward; truncation at
``episode_limit`` ⇒ ``bad_transition``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import TimeStep
from harl_tpu.utils import spaces

GRAVITY = 9.81


# =============================================================== robot specs
@dataclasses.dataclass(frozen=True)
class Geom:
    body: int
    pos: Tuple[float, float]      # capsule center in body frame (x, z)
    axis: Tuple[float, float]     # unit direction of the capsule axis (x, z)
    half_len: float
    radius: float
    friction: float = 0.9


@dataclasses.dataclass(frozen=True)
class RobotSpec:
    name: str
    # bodies ---------------------------------------------------------------
    parents: Tuple[int, ...]              # per body; -1 = root (body 0)
    body_pos: Tuple[Tuple[float, float], ...]   # body origin in parent frame
    joint_pos: Tuple[Tuple[float, float], ...]  # hinge anchor in body frame
    joint_sign: Tuple[float, ...]         # +1: hinge about +y; -1: about -y
    geoms: Tuple[Geom, ...]
    # joints (bodies 1..B-1, actuator order == body order) ----------------
    joint_range: Tuple[Tuple[float, float], ...]  # radians
    joint_damping: Tuple[float, ...]
    joint_stiffness: Tuple[float, ...]
    joint_armature: Tuple[float, ...]
    gears: Tuple[float, ...]
    # world / integration ---------------------------------------------------
    total_mass: Optional[float]           # settotalmass rescale (None: density)
    z_off: float                          # world z of root at qpos_z = 0
    qpos0_z: float                        # initial qpos z (walker/hopper: ref)
    dt: float
    frame_skip: int
    # contact ---------------------------------------------------------------
    contact_stiffness: float
    contact_damping: float
    friction_vreg: float = 0.1
    limit_stiffness: float = 4000.0
    limit_damping: float = 40.0
    # reset noise -----------------------------------------------------------
    reset_qpos_noise: float = 5e-3        # uniform half-width
    reset_qvel_noise: float = 5e-3
    reset_qvel_normal: bool = False       # cheetah: qvel = scale * N(0,1)
    # reward / termination --------------------------------------------------
    forward_reward_weight: float = 1.0
    ctrl_cost_weight: float = 1e-3
    healthy_reward: float = 0.0
    terminate_when_unhealthy: bool = False
    healthy_z_range: Tuple[float, float] = (-np.inf, np.inf)
    healthy_angle_range: Tuple[float, float] = (-np.inf, np.inf)
    healthy_state_range: Tuple[float, float] = (-np.inf, np.inf)
    clip_qvel_obs: float = 0.0            # 0: no clipping (cheetah)

    @property
    def n_bodies(self) -> int:
        return len(self.parents)

    @property
    def n_joints(self) -> int:
        return self.n_bodies - 1

    @property
    def dof(self) -> int:
        return self.n_joints + 3

    @property
    def obs_dim(self) -> int:
        return (self.dof - 1) + self.dof  # qpos[1:] + qvel


def _capsule_mass_inertia(half_len: float, radius: float, density: float = 1000.0):
    """Mass and perpendicular-axis moment of inertia (about COM) of a capsule."""
    r, h = radius, half_len
    m_cyl = density * math.pi * r * r * (2 * h)
    m_cap = density * (4.0 / 3.0) * math.pi * r ** 3  # both hemispheres
    # cylinder about perpendicular axis through COM (length L = 2h)
    i_cyl = m_cyl * ((2 * h) ** 2 / 12.0 + r * r / 4.0)
    # hemispheres: I_com = 83/320 m r², COM at h + 3r/8 from capsule center
    d = h + 3.0 * r / 8.0
    i_cap = 2 * ((83.0 / 320.0) * (m_cap / 2) * r * r + (m_cap / 2) * d * d)
    return m_cyl + m_cap, i_cyl + i_cap


def _ax(a: float) -> Tuple[float, float]:
    """Capsule axis direction from MuJoCo ``axisangle="0 1 0 a"`` (z-axis
    capsule rotated about +y): (sin a, cos a) in the (x, z) plane."""
    return (math.sin(a), math.cos(a))


HALF_CHEETAH = RobotSpec(
    name="HalfCheetah",
    parents=(-1, 0, 1, 2, 0, 4, 5),
    body_pos=((0, 0), (-0.5, 0), (0.16, -0.25), (-0.28, -0.14),
              (0.5, 0), (-0.14, -0.24), (0.13, -0.18)),
    joint_pos=((0, 0),) * 7,
    joint_sign=(1.0,) * 6,
    geoms=(
        Geom(0, (0.0, 0.0), (1.0, 0.0), 0.5, 0.046, 0.4),          # torso
        Geom(0, (0.6, 0.1), _ax(0.87), 0.15, 0.046, 0.4),          # head
        Geom(1, (0.1, -0.13), _ax(-3.8), 0.145, 0.046, 0.4),       # bthigh
        Geom(2, (-0.14, -0.07), _ax(-2.03), 0.15, 0.046, 0.4),     # bshin
        Geom(3, (0.03, -0.097), _ax(-0.27), 0.094, 0.046, 0.4),    # bfoot
        Geom(4, (-0.07, -0.12), _ax(0.52), 0.133, 0.046, 0.4),     # fthigh
        Geom(5, (0.065, -0.09), _ax(-0.6), 0.106, 0.046, 0.4),     # fshin
        Geom(6, (0.045, -0.07), _ax(-0.6), 0.07, 0.046, 0.4),      # ffoot
    ),
    joint_range=((-0.52, 1.05), (-0.785, 0.785), (-0.4, 0.785),
                 (-1.0, 0.7), (-1.2, 0.87), (-0.5, 0.5)),
    joint_damping=(6.0, 4.5, 3.0, 4.5, 3.0, 1.5),
    joint_stiffness=(240.0, 180.0, 120.0, 180.0, 120.0, 60.0),
    joint_armature=(0.1,) * 6,
    gears=(120.0, 90.0, 60.0, 120.0, 60.0, 30.0),
    total_mass=14.0,
    z_off=0.7,
    qpos0_z=0.0,
    dt=0.01,
    frame_skip=5,
    contact_stiffness=8000.0,
    contact_damping=250.0,
    reset_qpos_noise=0.1,
    reset_qvel_noise=0.1,
    reset_qvel_normal=True,
    forward_reward_weight=1.0,
    ctrl_cost_weight=0.1,
)

_W_RANGE = ((-150 * math.pi / 180, 0.0), (-150 * math.pi / 180, 0.0),
            (-45 * math.pi / 180, 45 * math.pi / 180))

WALKER2D = RobotSpec(
    name="Walker2d",
    parents=(-1, 0, 1, 2, 0, 4, 5),
    body_pos=((0, 0), (0, -0.2), (0, -0.7), (0.2, -0.35),
              (0, -0.2), (0, -0.7), (0.2, -0.35)),
    joint_pos=((0, 0), (0, 0), (0, 0.25), (-0.2, 0.1),
               (0, 0), (0, 0.25), (-0.2, 0.1)),
    joint_sign=(-1.0,) * 6,
    geoms=(
        Geom(0, (0.0, 0.0), (0.0, 1.0), 0.2, 0.05, 0.9),           # torso
        Geom(1, (0.0, -0.225), (0.0, 1.0), 0.225, 0.05, 0.9),      # thigh
        Geom(2, (0.0, 0.0), (0.0, 1.0), 0.25, 0.04, 0.9),          # leg
        Geom(3, (-0.1, 0.1), (-1.0, 0.0), 0.1, 0.06, 0.9),         # foot
        Geom(4, (0.0, -0.225), (0.0, 1.0), 0.225, 0.05, 0.9),      # thigh_left
        Geom(5, (0.0, 0.0), (0.0, 1.0), 0.25, 0.04, 0.9),          # leg_left
        Geom(6, (-0.1, 0.1), (-1.0, 0.0), 0.1, 0.06, 1.9),         # foot_left
    ),
    joint_range=_W_RANGE + _W_RANGE,
    joint_damping=(0.1,) * 6,
    joint_stiffness=(0.0,) * 6,
    joint_armature=(0.01,) * 6,
    gears=(100.0,) * 6,
    total_mass=None,
    z_off=0.0,
    qpos0_z=1.25,
    dt=0.002,
    frame_skip=4,
    contact_stiffness=20000.0,
    contact_damping=500.0,
    forward_reward_weight=1.0,
    ctrl_cost_weight=1e-3,
    healthy_reward=1.0,
    terminate_when_unhealthy=True,
    healthy_z_range=(0.8, 2.0),
    healthy_angle_range=(-1.0, 1.0),
    clip_qvel_obs=10.0,
)

HOPPER = RobotSpec(
    name="Hopper",
    parents=(-1, 0, 1, 2),
    body_pos=((0, 0), (0, -0.2), (0, -0.7), (0.13, -0.35)),
    joint_pos=((0, 0), (0, 0), (0, 0.25), (-0.13, 0.1)),
    joint_sign=(-1.0,) * 3,
    geoms=(
        Geom(0, (0.0, 0.0), (0.0, 1.0), 0.2, 0.05, 0.9),           # torso
        Geom(1, (0.0, -0.225), (0.0, 1.0), 0.225, 0.05, 0.9),      # thigh
        Geom(2, (0.0, 0.0), (0.0, 1.0), 0.25, 0.04, 0.9),          # leg
        Geom(3, (-0.065, 0.1), (-1.0, 0.0), 0.195, 0.06, 2.0),     # foot
    ),
    joint_range=_W_RANGE,
    joint_damping=(1.0,) * 3,
    joint_stiffness=(0.0,) * 3,
    joint_armature=(1.0,) * 3,
    gears=(200.0,) * 3,
    total_mass=None,
    z_off=0.0,
    qpos0_z=1.25,
    dt=0.002,
    frame_skip=4,
    contact_stiffness=20000.0,
    contact_damping=500.0,
    forward_reward_weight=1.0,
    ctrl_cost_weight=1e-3,
    healthy_reward=1.0,
    terminate_when_unhealthy=True,
    healthy_z_range=(0.7, np.inf),
    healthy_angle_range=(-0.2, 0.2),
    healthy_state_range=(-100.0, 100.0),
    clip_qvel_obs=10.0,
)

SPECS = {"HalfCheetah": HALF_CHEETAH, "Walker2d": WALKER2D, "Hopper": HOPPER}


def _gauss_solve_batched(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batch-minor Gauss–Jordan: A (n, n, B), b (n, B) → x (n, B).

    Same unrolled elimination as ``_gauss_solve`` but with the batch on the
    minor (lane) axis so every rank-1 update is a dense (n, B) vector op."""
    n = A.shape[0]
    for j in range(n):
        inv = 1.0 / A[j, j]                     # (B,)
        pivot_row = A[j] * inv                  # (n, B)
        pivot_b = b[j] * inv                    # (B,)
        factor = A[:, j].at[j].set(0.0)         # (n, B)
        A = A - factor[:, None, :] * pivot_row[None, :, :]
        A = A.at[j].set(pivot_row)
        b = b - factor * pivot_b[None, :]
        b = b.at[j].set(pivot_b)
    return b


def _gauss_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for small SPD A by UNROLLED Gauss–Jordan elimination.

    XLA's batched Cholesky lowers to a serial loop with dynamic slicing that
    wastes the TPU's vector lanes on a 9×9 problem; this unrolled version is
    n static iterations of pure elementwise rank-1 updates, which vmap/XLA
    vectorize perfectly across thousands of envs (no pivoting — A is SPD and
    well-conditioned by construction: M ≽ armature·I and D ≽ 0)."""
    n = A.shape[-1]
    for j in range(n):
        pivot_row = A[j] / A[j, j]              # (n,)
        pivot_b = b[j] / A[j, j]                # ()
        factor = A[:, j].at[j].set(0.0)         # eliminate all other rows
        A = A - factor[:, None] * pivot_row[None, :]
        A = A.at[j].set(pivot_row)
        b = b - factor * pivot_b
        b = b.at[j].set(pivot_b)
    return b


# ============================================================== the dynamics
class PlanarState(NamedTuple):
    q: jnp.ndarray   # (dof,)
    qd: jnp.ndarray  # (dof,)
    t: jnp.ndarray   # () int32


class PlanarDynamics:
    """Precomputes constant arrays from a RobotSpec and exposes pure
    jit/vmap-compatible ``physics_step``/kinematics functions."""

    def __init__(self, spec: RobotSpec):
        self.spec = spec
        B = spec.n_bodies
        # body mass / inertia aggregated from geoms (inertiafromgeom)
        masses = np.zeros(B)
        coms = np.zeros((B, 2))
        inertias = np.zeros(B)
        per_geom = [np.array(_capsule_mass_inertia(g.half_len, g.radius))
                    for g in spec.geoms]
        for g, (m, _) in zip(spec.geoms, per_geom):
            masses[g.body] += m
            coms[g.body] += m * np.asarray(g.pos)
        coms /= masses[:, None]
        for g, (m, i) in zip(spec.geoms, per_geom):
            d2 = np.sum((np.asarray(g.pos) - coms[g.body]) ** 2)
            inertias[g.body] += i + m * d2
        if spec.total_mass is not None:
            scale = spec.total_mass / masses.sum()
            masses *= scale
            inertias *= scale
        self.masses = jnp.asarray(masses, jnp.float32)
        self.coms = jnp.asarray(coms, jnp.float32)
        self.inertias = jnp.asarray(inertias, jnp.float32)
        # constant angle selector: abs_angle = G_ang @ q
        G = np.zeros((B, spec.dof))
        G[:, 2] = 1.0
        for b in range(1, B):
            G[b] = G[spec.parents[b]].copy()
            G[b, 3 + b - 1] = spec.joint_sign[b - 1]
        self.G_ang = jnp.asarray(G, jnp.float32)
        # contact points: endpoints + center of every geom, in body frame
        pts, rads, mus, bodies = [], [], [], []
        for g in spec.geoms:
            c = np.asarray(g.pos)
            d = np.asarray(g.axis)
            for s in (-g.half_len, 0.0, g.half_len):
                pts.append(c + s * d)
                rads.append(g.radius)
                mus.append(g.friction)
                bodies.append(g.body)
        self.cpts = jnp.asarray(np.stack(pts), jnp.float32)        # (C, 2)
        self.crad = jnp.asarray(rads, jnp.float32)
        self.cmu = jnp.asarray(mus, jnp.float32)
        self.cbody = tuple(bodies)
        self.armature = jnp.asarray(
            np.concatenate([np.zeros(3), spec.joint_armature]), jnp.float32)
        self.joint_damp = jnp.asarray(
            np.concatenate([np.zeros(3), spec.joint_damping]), jnp.float32)
        self.joint_stiff = jnp.asarray(
            np.concatenate([np.zeros(3), spec.joint_stiffness]), jnp.float32)
        jr = np.asarray(spec.joint_range)
        self.q_lo = jnp.asarray(
            np.concatenate([np.full(3, -np.inf), jr[:, 0]]), jnp.float32)
        self.q_hi = jnp.asarray(
            np.concatenate([np.full(3, np.inf), jr[:, 1]]), jnp.float32)
        self.gears = jnp.asarray(spec.gears, jnp.float32)

        # ---- analytic-kinematics term table --------------------------------
        # Every body origin decomposes into root + Σ_t A[b,t]·R(ang_{tb_t})·V_t
        # (each body b>0 contributes the two terms of _frames:365:
        # +R(ang_p)(bp+jp) and −R(ang_b)(jp), inherited by all descendants).
        # This gives closed-form jacobians and Coriolis terms as small einsums
        # — no autodiff in the dynamics hot path.
        nT = max(2 * (B - 1), 1)
        A = np.zeros((B, nT), np.float32)
        tb = np.zeros(nT, np.int64)
        V = np.zeros((nT, 2), np.float32)
        for b in range(1, B):
            p = spec.parents[b]
            t1, t2 = 2 * (b - 1), 2 * (b - 1) + 1
            tb[t1] = p
            V[t1] = np.asarray(spec.body_pos[b]) + np.asarray(spec.joint_pos[b])
            tb[t2] = b
            V[t2] = -np.asarray(spec.joint_pos[b])
            A[b] = A[p]
            A[b, t1] = 1.0
            A[b, t2] = 1.0
        self.kin_A = jnp.asarray(A)
        self.kin_tb = jnp.asarray(tb)
        self.kin_V = jnp.asarray(V)
        self.kin_Gt = jnp.asarray(np.asarray(G)[tb], jnp.float32)     # (T, dof)
        cb = np.asarray(bodies)
        self.kin_cb = jnp.asarray(cb)
        self.kin_Gc = jnp.asarray(np.asarray(G)[cb], jnp.float32)     # (C, dof)

    # ------------------------------------------------------------ kinematics
    def _frames(self, q):
        """World origins (B,2) and absolute angles (B,) of every body frame."""
        spec = self.spec
        ang = self.G_ang @ q
        c, s = jnp.cos(ang), jnp.sin(ang)

        def rot(b, v):  # R_y(ang_b) applied to body-frame (x, z)
            return jnp.stack([c[b] * v[0] + s[b] * v[1],
                              -s[b] * v[0] + c[b] * v[1]])

        origins = [jnp.stack([q[0], q[1] + spec.z_off])]
        for b in range(1, spec.n_bodies):
            p = spec.parents[b]
            bp = jnp.asarray(spec.body_pos[b])
            jp = jnp.asarray(spec.joint_pos[b])
            o = origins[p] + rot(p, bp + jp) - rot(b, jp)
            origins.append(o)
        return jnp.stack(origins), ang

    def _coms(self, q):
        origins, ang = self._frames(q)
        c, s = jnp.cos(ang), jnp.sin(ang)
        cx = c * self.coms[:, 0] + s * self.coms[:, 1]
        cz = -s * self.coms[:, 0] + c * self.coms[:, 1]
        return origins + jnp.stack([cx, cz], axis=1)

    def _contact_pos(self, q):
        origins, ang = self._frames(q)
        b = jnp.asarray(self.cbody)
        a = ang[jnp.asarray(self.cbody)]
        c, s = jnp.cos(a), jnp.sin(a)
        px = c * self.cpts[:, 0] + s * self.cpts[:, 1]
        pz = -s * self.cpts[:, 0] + c * self.cpts[:, 1]
        return origins[b] + jnp.stack([px, pz], axis=1)  # (C, 2)

    # ------------------------------------------------- analytic kinematics
    def _kin_analytic(self, q, qd):
        """Closed-form COM/contact positions, jacobians and Coriolis
        accelerations for the planar chain.

        With origin_b = root + Σ_t A[b,t]·R(ang_t)·V_t and ang linear in q
        (ang = G_ang·q), the jacobian of each rotated term is
        (dR/dang·V) ⊗ G_ang[term_body] and its second directional derivative
        along q̇ is −R·V·ω² — everything reduces to small einsums over
        (bodies, terms, dof). Replaces jacfwd/jvp in the hot substep;
        validated against the autodiff formulation in tests/test_planar.py.

        Returns (Jc (B,2,dof), Cc (B,2), cpos (C,2), Jp (C,2,dof)).
        """
        ang = self.G_ang @ q
        w = self.G_ang @ qd
        c, s = jnp.cos(ang), jnp.sin(ang)
        ct, st, wt = c[self.kin_tb], s[self.kin_tb], w[self.kin_tb]   # (T,)
        vx, vz = self.kin_V[:, 0], self.kin_V[:, 1]
        rot = jnp.stack([ct * vx + st * vz, -st * vx + ct * vz], -1)   # (T,2)
        drot = jnp.stack([-st * vx + ct * vz, -ct * vx - st * vz], -1)
        Jo = jnp.einsum("bt,tc,tj->bcj", self.kin_A, drot, self.kin_Gt)
        Jo = Jo.at[:, 0, 0].add(1.0).at[:, 1, 1].add(1.0)             # root x/z
        Co = -jnp.einsum("bt,tc->bc", self.kin_A, rot * (wt ** 2)[:, None])
        root = jnp.stack([q[0], q[1] + self.spec.z_off])
        origins = root[None, :] + self.kin_A @ rot                     # (B,2)
        # body COMs: own rotated offset on top of the origin
        rx, rz = self.coms[:, 0], self.coms[:, 1]
        drc = jnp.stack([-s * rx + c * rz, -c * rx - s * rz], -1)
        rc = jnp.stack([c * rx + s * rz, -s * rx + c * rz], -1)
        Jc = Jo + jnp.einsum("bc,bj->bcj", drc, self.G_ang)
        Cc = Co - rc * (w ** 2)[:, None]
        # contact spheres
        cb = self.kin_cb
        px, pz = self.cpts[:, 0], self.cpts[:, 1]
        cc, sc = c[cb], s[cb]
        rp = jnp.stack([cc * px + sc * pz, -sc * px + cc * pz], -1)
        drp = jnp.stack([-sc * px + cc * pz, -cc * px - sc * pz], -1)
        cpos = origins[cb] + rp
        Jp = Jo[cb] + jnp.einsum("pc,pj->pcj", drp, self.kin_Gc)
        return Jc, Cc, cpos, Jp

    # -------------------------------------------------------------- substep
    def _substep(self, q, qd, tau, root_force=None):
        """One implicit-damping Euler substep. ``root_force`` (2,) is an
        optional external force on the root body origin (x, z) — used by the
        coupled_half_cheetah tendon (see ``coupled.py``)."""
        spec = self.spec
        dt = spec.dt
        dof = spec.dof

        # closed-form kinematics: jacobians + Coriolis without autodiff
        Jc, Cc, p, Jp = self._kin_analytic(q, qd)
        # mass matrix
        M = jnp.einsum("b,bci,bcj->ij", self.masses, Jc, Jc)
        M = M + jnp.einsum("b,bi,bj->ij", self.inertias, self.G_ang, self.G_ang)
        M = M + jnp.diag(self.armature) + 1e-9 * jnp.eye(dof)
        # coriolis: Σ m Jᵀ (∂(J q̇)/∂q) q̇   (angle rows are linear in q → 0)
        corio = jnp.einsum("b,bci,bc->i", self.masses, Jc, Cc)
        # gravity
        Q = -GRAVITY * jnp.einsum("b,bi->i", self.masses, Jc[:, 1, :])
        # actuators + joint springs + joint limits (explicit)
        Q = Q.at[3:].add(self.gears * tau)
        if root_force is not None:
            Q = Q.at[:2].add(root_force)
        Q = Q - self.joint_stiff * q
        over = jnp.maximum(q - self.q_hi, 0.0) - jnp.maximum(self.q_lo - q, 0.0)
        outside = (over != 0.0).astype(q.dtype)
        Q = Q - spec.limit_stiffness * over
        # implicit damping matrix: joints + limit dampers
        D = jnp.diag(self.joint_damp + spec.limit_damping * outside)
        # contacts (p and Jp from the analytic kinematics above)
        v = jnp.einsum("pcj,j->pc", Jp, qd)                  # (C, 2)
        pen = jnp.maximum(self.crad - p[:, 1], 0.0)          # penetration ≥ 0
        active = (pen > 0.0).astype(q.dtype)
        N = spec.contact_stiffness * pen                     # explicit spring
        # explicit normal spring force, implicit normal damper
        Q = Q + jnp.einsum("p,pj->j", N, Jp[:, 1, :])
        D = D + spec.contact_damping * jnp.einsum(
            "p,pi,pj->ij", active, Jp[:, 1, :], Jp[:, 1, :])
        # implicit regularized Coulomb friction: c_t = μN/(|v_t|+v₀)
        ct = self.cmu * N / (jnp.abs(v[:, 0]) + spec.friction_vreg)
        D = D + jnp.einsum("p,pi,pj->ij", ct, Jp[:, 0, :], Jp[:, 0, :])

        rhs = M @ qd + dt * (Q - corio)
        A = M + dt * D
        qd_new = _gauss_solve(A, rhs)
        qd_new = jnp.clip(qd_new, -100.0, 100.0)
        return q + dt * qd_new, qd_new

    # --------------------------------------------------- batch-minor layout
    # NOTE: measured on v5e, dispatching VecEnv's vmap to this batch-minor
    # ((…, B)) formulation via jax.custom_batching was ~12% SLOWER than the
    # per-env vmapped path — XLA's layout assignment already handles the
    # small-minor-dim intermediates. Kept (with parity tests) as the basis for
    # a future fully-fused Pallas substep kernel; not wired into physics_step.
    def _kin_analytic_b(self, q, qd):
        """Batch-minor twin of ``_kin_analytic``: q, qd (dof, B)."""
        ang = self.G_ang @ q                 # (Bo, B)
        w = self.G_ang @ qd
        c, s = jnp.cos(ang), jnp.sin(ang)
        ct, st, wt = c[self.kin_tb], s[self.kin_tb], w[self.kin_tb]   # (T, B)
        vx = self.kin_V[:, 0:1]
        vz = self.kin_V[:, 1:2]
        rot = jnp.stack([ct * vx + st * vz, -st * vx + ct * vz], 1)    # (T,2,B)
        drot = jnp.stack([-st * vx + ct * vz, -ct * vx - st * vz], 1)
        Jo = jnp.einsum("bt,tcx,tj->bcjx", self.kin_A, drot, self.kin_Gt)
        Jo = Jo.at[:, 0, 0].add(1.0).at[:, 1, 1].add(1.0)
        Co = -jnp.einsum("bt,tcx->bcx", self.kin_A, rot * (wt ** 2)[:, None])
        root = jnp.stack([q[0], q[1] + self.spec.z_off])               # (2, B)
        origins = root[None] + jnp.einsum("bt,tcx->bcx", self.kin_A, rot)
        rx = self.coms[:, 0:1]
        rz = self.coms[:, 1:2]
        rc = jnp.stack([c * rx + s * rz, -s * rx + c * rz], 1)          # (Bo,2,B)
        drc = jnp.stack([-s * rx + c * rz, -c * rx - s * rz], 1)
        Jc = Jo + jnp.einsum("bcx,bj->bcjx", drc, self.G_ang)
        Cc = Co - rc * (w ** 2)[:, None]
        cb = self.kin_cb
        px = self.cpts[:, 0:1]
        pz = self.cpts[:, 1:2]
        cc, sc = c[cb], s[cb]
        rp = jnp.stack([cc * px + sc * pz, -sc * px + cc * pz], 1)      # (C,2,B)
        drp = jnp.stack([-sc * px + cc * pz, -cc * px - sc * pz], 1)
        cpos = origins[cb] + rp
        Jp = Jo[cb] + jnp.einsum("pcx,pj->pcjx", drp, self.kin_Gc)
        return Jc, Cc, cpos, Jp

    def _substep_b(self, q, qd, tau):
        """Batch-minor twin of ``_substep``: q, qd (dof, B), tau (n_joints, B)."""
        spec = self.spec
        dt = spec.dt
        dof = spec.dof
        Jc, Cc, p, Jp = self._kin_analytic_b(q, qd)
        M = jnp.einsum("b,bcix,bcjx->ijx", self.masses, Jc, Jc)
        M = M + (
            jnp.einsum("b,bi,bj->ij", self.inertias, self.G_ang, self.G_ang)
            + jnp.diag(self.armature) + 1e-9 * jnp.eye(dof)
        )[..., None]
        corio = jnp.einsum("b,bcix,bcx->ix", self.masses, Jc, Cc)
        Q = -GRAVITY * jnp.einsum("b,bix->ix", self.masses, Jc[:, 1])
        Q = Q.at[3:].add(self.gears[:, None] * tau)
        Q = Q - self.joint_stiff[:, None] * q
        over = jnp.maximum(q - self.q_hi[:, None], 0.0) - jnp.maximum(
            self.q_lo[:, None] - q, 0.0)
        outside = (over != 0.0).astype(q.dtype)
        Q = Q - spec.limit_stiffness * over
        D = jnp.eye(dof)[..., None] * (
            self.joint_damp[:, None] + spec.limit_damping * outside)[None]
        v = jnp.einsum("pcjx,jx->pcx", Jp, qd)
        pen = jnp.maximum(self.crad[:, None] - p[:, 1], 0.0)            # (C, B)
        active = (pen > 0.0).astype(q.dtype)
        N = spec.contact_stiffness * pen
        Q = Q + jnp.einsum("px,pjx->jx", N, Jp[:, 1])
        D = D + spec.contact_damping * jnp.einsum(
            "px,pix,pjx->ijx", active, Jp[:, 1], Jp[:, 1])
        ct = self.cmu[:, None] * N / (jnp.abs(v[:, 0]) + spec.friction_vreg)
        D = D + jnp.einsum("px,pix,pjx->ijx", ct, Jp[:, 0], Jp[:, 0])
        rhs = jnp.einsum("ijx,jx->ix", M, qd) + dt * (Q - corio)
        A = M + dt * D
        qd_new = _gauss_solve_batched(A, rhs)
        qd_new = jnp.clip(qd_new, -100.0, 100.0)
        return q + dt * qd_new, qd_new

    def _physics_step_impl(self, q, qd, actions):
        tau = jnp.clip(actions, -1.0, 1.0)
        for _ in range(self.spec.frame_skip):
            q, qd = self._substep(q, qd, tau)
        return q, qd

    def physics_step(self, q, qd, actions):
        """frame_skip substeps; actions in [-1, 1] per joint."""
        return self._physics_step_impl(q, qd, actions)


# ============================================================ the MARL env
@dataclasses.dataclass(frozen=True)
class PlanarMAMuJoCo:
    """MAMuJoCo factorization of a planar robot (reference:
    harl/envs/mamujoco/multiagent_mujoco/mujoco_multi.py)."""

    dyn: PlanarDynamics
    n_agents: int
    joints_per_agent: int
    episode_limit: int = 1000

    @property
    def spec(self) -> RobotSpec:
        return self.dyn.spec

    @property
    def state_dim(self) -> int:
        return self.spec.obs_dim

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
        sizes[-1] += self.spec.n_joints - self.n_agents * self.joints_per_agent
        return sizes

    # ------------------------------------------------------------------ api
    def reset(self, key) -> Tuple[PlanarState, TimeStep]:
        spec = self.spec
        k1, k2 = jax.random.split(key)
        q0 = jnp.zeros(spec.dof).at[1].set(spec.qpos0_z)
        q = q0 + jax.random.uniform(
            k1, (spec.dof,), minval=-spec.reset_qpos_noise,
            maxval=spec.reset_qpos_noise)
        if spec.reset_qvel_normal:
            qd = spec.reset_qvel_noise * jax.random.normal(k2, (spec.dof,))
        else:
            qd = jax.random.uniform(
                k2, (spec.dof,), minval=-spec.reset_qvel_noise,
                maxval=spec.reset_qvel_noise)
        state = PlanarState(q=q, qd=qd, t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool))

    def step(self, state: PlanarState, actions, key) -> Tuple[PlanarState, TimeStep]:
        """actions: (n_agents, max_act) in [-1,1]; padding columns dropped."""
        del key
        spec = self.spec
        sizes = self._agent_sizes()
        flat = jnp.concatenate(
            [jnp.asarray(actions[i])[: sizes[i]] for i in range(self.n_agents)])
        q, qd = self.dyn.physics_step(state.q, state.qd, flat)
        dt_env = spec.dt * spec.frame_skip
        vel = (q[0] - state.q[0]) / dt_env
        ctrl = jnp.sum(jnp.clip(flat, -1.0, 1.0) ** 2)
        healthy = self._is_healthy(q, qd)
        reward = (spec.forward_reward_weight * vel
                  - spec.ctrl_cost_weight * ctrl
                  + spec.healthy_reward * (healthy if spec.terminate_when_unhealthy
                                           else jnp.ones(())))
        new_t = state.t + 1
        trunc = new_t >= self.episode_limit
        term = (~healthy) if spec.terminate_when_unhealthy else jnp.zeros((), bool)
        done = jnp.logical_or(term, trunc)
        bad = jnp.logical_and(trunc, ~term)
        new_state = PlanarState(q=q, qd=qd, t=new_t)
        return new_state, self._timestep(new_state, reward, done, bad)

    def _is_healthy(self, q, qd):
        spec = self.spec
        z = q[1] + (spec.z_off if spec.qpos0_z == 0.0 else 0.0)
        ok = jnp.logical_and(z > spec.healthy_z_range[0],
                             z < spec.healthy_z_range[1])
        ok = jnp.logical_and(ok, q[2] > spec.healthy_angle_range[0])
        ok = jnp.logical_and(ok, q[2] < spec.healthy_angle_range[1])
        if np.isfinite(spec.healthy_state_range[0]):
            sv = jnp.concatenate([q[2:], qd])
            ok = jnp.logical_and(ok, jnp.all(jnp.abs(sv) < spec.healthy_state_range[1]))
        return ok

    # ---------------------------------------------------------- observation
    def _state_vec(self, state: PlanarState) -> jnp.ndarray:
        qd = state.qd
        if self.spec.clip_qvel_obs > 0:
            qd = jnp.clip(qd, -self.spec.clip_qvel_obs, self.spec.clip_qvel_obs)
        return jnp.concatenate([state.q[1:], qd]).astype(jnp.float32)

    def _timestep(self, state, reward, done, bad) -> TimeStep:
        N = self.n_agents
        sv = self._state_vec(state)
        ids = jnp.eye(N)
        obs = jnp.concatenate(
            [jnp.broadcast_to(sv[None], (N, sv.shape[0])), ids], axis=-1)
        # per-obs standardization (mujoco_multi.py:208-211)
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


def make_planar(env_args: dict) -> PlanarMAMuJoCo:
    scenario = env_args.get("scenario", "HalfCheetah-v2")
    base = scenario.split("-")[0]
    if base not in SPECS:
        raise ValueError(f"No pure-JAX planar spec for scenario {scenario!r}; "
                         f"available: {sorted(SPECS)} (+ manyagent_swimmer)")
    spec = SPECS[base]
    conf = env_args.get("agent_conf", "6x1" if base == "HalfCheetah" else
                        ("2x3" if base == "Walker2d" else "3x1"))
    n_agents, joints = (int(x) for x in conf.split("x"))
    if n_agents * joints > spec.n_joints:
        raise ValueError(f"agent_conf {conf} exceeds {spec.n_joints} joints")
    return PlanarMAMuJoCo(
        dyn=PlanarDynamics(spec),
        n_agents=n_agents,
        joints_per_agent=joints,
        episode_limit=env_args.get("episode_limit", 1000),
    )
