"""Pure-JAX Humanoid: MAMuJoCo Humanoid-v2 / HumanoidStandup-v2 on device.

Reference counterpart: the MAMuJoCo Humanoid partitions
(``harl/envs/mamujoco/multiagent_mujoco/obsk.py:260-428`` — 17x1 and 9|8)
over Gym's 17-actuator humanoid; the reference README's flagship figure is
the Humanoid-v2 17x1 HAPPO curve (``/root/reference/README.md:254-256``).

The kinematic tree, joint axes/anchors/ranges/armature/damping/stiffness,
geom masses (density 1000), gear table, ctrlrange ±0.4, ``dt 0.003 ×
frame_skip 5``, reset noise ±0.01, and the Humanoid-v2 reward
(1.25·com-x-velocity + 5 healthy − 0.1·‖a‖² − contact, unhealthy when
torso z ∉ (1.0, 2.0)) are transcribed from ``gymnasium``'s
``humanoid.xml`` into the static tables below. The dynamics are the same
autodiff Lagrangian point-mass scheme as :mod:`.ant` (rotation-vector root
chart, jacfwd mass matrix, nested-JVP bias, implicit-damping Euler with
penalty contacts); the tree walk is table-driven, so XLA sees one fused
23-DOF program, vmapped over thousands of envs.

An untrained humanoid falls and terminates within tens of steps — exactly
like the MuJoCo original — so the learning signal profile matches the
reference even though the contact solver is a soft-penalty re-design
rather than MuJoCo's LCP.

``HumanoidStandup-v2`` reuses the model with the lying-on-back initial
pose, the standup reward (z-height/dt − 0.1·‖a‖² − impact + 1), and no
termination (gymnasium ``humanoidstandup.py``).
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
DT = 0.003
FRAME_SKIP = 5
DENSITY = 1000.0
CONTACT_K = 20000.0
CONTACT_C = 300.0
FRICTION_MU = 1.0
FRICTION_VREG = 0.1
LIMIT_K = 600.0
LIMIT_C = 20.0
CTRL_RANGE = 0.4
CTRL_COST = 0.1
CONTACT_COST = 5e-7
CONTACT_COST_MAX = 10.0
HEALTHY_REWARD = 5.0
FORWARD_WEIGHT = 1.25
HEALTHY_Z = (1.0, 2.0)
ROTVEC_MAX = 1.9 * math.pi
TORSO_Z0 = 1.4

D2R = math.pi / 180.0


def _norm(v):
    n = math.sqrt(sum(x * x for x in v))
    return tuple(x / n for x in v)


# ---------------------------------------------------------------------------
# static model tables (humanoid.xml). Joint order = actuator order:
JOINTS = [
    # (name, body, axis, anchor, range_deg, armature, damping, stiffness, gear)
    ("abdomen_y", "lwaist", (0, 1, 0), (0, 0, 0.065), (-75, 30), 0.02, 5, 10, 100),
    ("abdomen_z", "lwaist", (0, 0, 1), (0, 0, 0.065), (-45, 45), 0.02, 5, 20, 100),
    ("abdomen_x", "pelvis", (1, 0, 0), (0, 0, 0.1), (-35, 35), 0.02, 5, 10, 100),
    ("right_hip_x", "right_thigh", (1, 0, 0), (0, 0, 0), (-25, 5), 0.01, 5, 10, 100),
    ("right_hip_z", "right_thigh", (0, 0, 1), (0, 0, 0), (-60, 35), 0.01, 5, 10, 100),
    ("right_hip_y", "right_thigh", (0, 1, 0), (0, 0, 0), (-110, 20), 0.008, 5, 20, 300),
    ("right_knee", "right_shin", (0, -1, 0), (0, 0, 0.02), (-160, -2), 0.006, 1, 0, 200),
    ("left_hip_x", "left_thigh", (-1, 0, 0), (0, 0, 0), (-25, 5), 0.01, 5, 10, 100),
    ("left_hip_z", "left_thigh", (0, 0, -1), (0, 0, 0), (-60, 35), 0.01, 5, 10, 100),
    ("left_hip_y", "left_thigh", (0, 1, 0), (0, 0, 0), (-110, 20), 0.01, 5, 20, 300),
    ("left_knee", "left_shin", (0, -1, 0), (0, 0, 0.02), (-160, -2), 0.006, 1, 1, 200),
    ("right_shoulder1", "right_upper_arm", _norm((2, 1, 1)), (0, 0, 0), (-85, 60), 0.0068, 1, 1, 25),
    ("right_shoulder2", "right_upper_arm", _norm((0, -1, 1)), (0, 0, 0), (-85, 60), 0.0051, 1, 1, 25),
    ("right_elbow", "right_lower_arm", _norm((0, -1, 1)), (0, 0, 0), (-90, 50), 0.0028, 1, 0, 25),
    ("left_shoulder1", "left_upper_arm", _norm((2, -1, 1)), (0, 0, 0), (-60, 85), 0.0068, 1, 1, 25),
    ("left_shoulder2", "left_upper_arm", _norm((0, 1, 1)), (0, 0, 0), (-60, 85), 0.0051, 1, 1, 25),
    ("left_elbow", "left_lower_arm", _norm((0, -1, -1)), (0, 0, 0), (-90, 50), 0.0028, 1, 0, 25),
]
N_JOINTS = len(JOINTS)
DOF = 6 + N_JOINTS

# (name, parent, pos) — document order so parents precede children
BODIES = [
    ("torso", None, (0, 0, 0)),
    ("lwaist", "torso", (-0.01, 0, -0.26)),
    ("pelvis", "lwaist", (0, 0, -0.165)),
    ("right_thigh", "pelvis", (0, -0.1, -0.04)),
    ("right_shin", "right_thigh", (0, 0.01, -0.403)),
    ("right_foot", "right_shin", (0, 0, -0.45)),
    ("left_thigh", "pelvis", (0, 0.1, -0.04)),
    ("left_shin", "left_thigh", (0, -0.01, -0.403)),
    ("left_foot", "left_shin", (0, 0, -0.45)),
    ("right_upper_arm", "torso", (0, -0.17, 0.06)),
    ("right_lower_arm", "right_upper_arm", (0.18, -0.18, -0.18)),
    ("left_upper_arm", "torso", (0, 0.17, 0.06)),
    ("left_lower_arm", "left_upper_arm", (0.18, 0.18, -0.18)),
]

# geoms: (body, kind, a, b_or_None, radius)
GEOMS = [
    ("torso", "cap", (0, -0.07, 0), (0, 0.07, 0), 0.07),
    ("torso", "sph", (0, 0, 0.19), None, 0.09),                       # head
    ("torso", "cap", (-0.01, -0.06, -0.12), (-0.01, 0.06, -0.12), 0.06),
    ("lwaist", "cap", (0, -0.06, 0), (0, 0.06, 0), 0.06),
    ("pelvis", "cap", (-0.02, -0.07, 0), (-0.02, 0.07, 0), 0.09),     # butt
    ("right_thigh", "cap", (0, 0, 0), (0, 0.01, -0.34), 0.06),
    ("right_shin", "cap", (0, 0, 0), (0, 0, -0.3), 0.049),
    ("right_foot", "sph", (0, 0, 0.1), None, 0.075),
    ("left_thigh", "cap", (0, 0, 0), (0, -0.01, -0.34), 0.06),
    ("left_shin", "cap", (0, 0, 0), (0, 0, -0.3), 0.049),
    ("left_foot", "sph", (0, 0, 0.1), None, 0.075),
    ("right_upper_arm", "cap", (0, 0, 0), (0.16, -0.16, -0.16), 0.04),
    ("right_lower_arm", "cap", (0.01, 0.01, 0.01), (0.17, 0.17, 0.17), 0.031),
    ("right_lower_arm", "sph", (0.18, 0.18, 0.18), None, 0.04),       # hand
    ("left_upper_arm", "cap", (0, 0, 0), (0.16, 0.16, -0.16), 0.04),
    ("left_lower_arm", "cap", (0.01, -0.01, 0.01), (0.17, -0.17, 0.17), 0.031),
    ("left_lower_arm", "sph", (0.18, -0.18, 0.18), None, 0.04),       # hand
]

# contact spheres: (body, local pos, radius) — extremities + trunk so the
# humanoid can fall and lie on the ground without sinking through it
CONTACT_SPHERES = [
    ("right_foot", (0, 0, 0.1), 0.075),
    ("left_foot", (0, 0, 0.1), 0.075),
    ("right_lower_arm", (0.18, 0.18, 0.18), 0.04),
    ("left_lower_arm", (0.18, -0.18, 0.18), 0.04),
    ("torso", (0, 0, 0.19), 0.09),                   # head
    ("torso", (0, -0.07, 0), 0.07),
    ("torso", (0, 0.07, 0), 0.07),
    ("pelvis", (-0.02, -0.07, 0), 0.09),
    ("pelvis", (-0.02, 0.07, 0), 0.09),
    ("right_shin", (0, 0, 0), 0.049),                # knees
    ("left_shin", (0, 0, 0), 0.049),
    ("right_upper_arm", (0.16, -0.16, -0.16), 0.04),  # elbows
    ("left_upper_arm", (0.16, 0.16, -0.16), 0.04),
]

_BODY_IDX = {name: i for i, (name, _, _) in enumerate(BODIES)}
# joints grouped by body, in table order
_BODY_JOINTS = {
    name: [j for j, row in enumerate(JOINTS) if row[1] == name]
    for name, _, _ in BODIES
}


def _cap_mass(a, b, r):
    L = math.dist(a, b)
    return DENSITY * (math.pi * r * r * L + (4.0 / 3.0) * math.pi * r ** 3)


def _sph_mass(r):
    return DENSITY * (4.0 / 3.0) * math.pi * r ** 3


def _body_frames(q):
    """World (origin, R) for every body from the 23-DOF configuration."""
    o_root = q[0:3]
    R_root = _rodrigues(q[3:6])
    frames = {}
    for name, parent, pos in BODIES:
        if parent is None:
            O, R = o_root, R_root
        else:
            Op, Rp = frames[parent]
            O = Op + Rp @ jnp.asarray(pos, jnp.float32)
            R = Rp
        for j in _BODY_JOINTS[name]:
            _, _, axis, anchor, *_ = JOINTS[j]
            Rj = _axis_rot(axis, q[6 + j])
            a = jnp.asarray(anchor, jnp.float32)
            A = O + R @ a
            R = R @ Rj
            O = A - R @ a
        frames[name] = (O, R)
    return frames


def _points(q):
    """Equivalent point-mass world positions (P, 3)."""
    frames = _body_frames(q)
    pts = []
    for body, kind, a, b, r in GEOMS:
        O, R = frames[body]
        av = O + R @ jnp.asarray(a, jnp.float32)
        if kind == "sph":
            pts.append(av)
        else:
            bv = O + R @ jnp.asarray(b, jnp.float32)
            pts += [av, 0.5 * (av + bv), bv]
    return jnp.stack(pts)


def _contacts(q):
    frames = _body_frames(q)
    return jnp.stack([
        frames[body][0] + frames[body][1] @ jnp.asarray(pos, jnp.float32)
        for body, pos, _ in CONTACT_SPHERES
    ])


def _masses():
    m = []
    for body, kind, a, b, r in GEOMS:
        if kind == "sph":
            m.append(_sph_mass(r))
        else:
            mc = _cap_mass(a, b, r)
            m += [mc / 6, 2 * mc / 3, mc / 6]
    return jnp.asarray(m)


PT_MASS = _masses()
TOTAL_MASS = float(jnp.sum(PT_MASS))
CONTACT_RADII = jnp.asarray([r for _, _, r in CONTACT_SPHERES])
GEARS = jnp.asarray([row[8] for row in JOINTS], jnp.float32)
ARMATURES = jnp.asarray([row[5] for row in JOINTS], jnp.float32)
DAMPINGS = jnp.asarray([row[6] for row in JOINTS], jnp.float32)
STIFFNESS = jnp.asarray([row[7] for row in JOINTS], jnp.float32)
Q_LO = jnp.asarray([row[4][0] * D2R for row in JOINTS], jnp.float32)
Q_HI = jnp.asarray([row[4][1] * D2R for row in JOINTS], jnp.float32)
# qpos0 clamped into the limit band (knee ranges exclude 0)
Q0 = jnp.clip(jnp.zeros(N_JOINTS), Q_LO, Q_HI)


class HumanoidState(NamedTuple):
    q: jnp.ndarray
    qd: jnp.ndarray
    t: jnp.ndarray


def _substep(q, qd, tau, vreg=FRICTION_VREG):
    J = jax.jacfwd(_points)(q)
    vel_of_q = lambda qq: jax.jvp(_points, (qq,), (qd,))[1]
    _, a_bias = jax.jvp(vel_of_q, (q,), (qd,))
    M = jnp.einsum("p,pci,pcj->ij", PT_MASS, J, J)
    M = M + jnp.diag(jnp.concatenate([jnp.zeros(6), ARMATURES]))
    M = M + 1e-6 * jnp.eye(DOF)
    corio = jnp.einsum("p,pci,pc->i", PT_MASS, J, a_bias)
    Q = -GRAVITY * jnp.einsum("p,pi->i", PT_MASS, J[:, 2, :])
    Q = Q.at[6:].add(GEARS * tau - STIFFNESS * (q[6:] - Q0))
    over = (jnp.maximum(q[6:] - Q_HI, 0.0) - jnp.maximum(Q_LO - q[6:], 0.0))
    outside = (over != 0.0).astype(q.dtype)
    Q = Q.at[6:].add(-LIMIT_K * over)
    D = jnp.diag(jnp.concatenate([jnp.zeros(6), DAMPINGS + LIMIT_C * outside]))
    Jc = jax.jacfwd(_contacts)(q)
    cpos = _contacts(q)
    v = jnp.einsum("pcj,j->pc", Jc, qd)
    pen = jnp.maximum(CONTACT_RADII - cpos[:, 2], 0.0)
    active = (pen > 0.0).astype(q.dtype)
    N = CONTACT_K * pen
    Q = Q + jnp.einsum("p,pj->j", N, Jc[:, 2, :])
    D = D + CONTACT_C * jnp.einsum("p,pi,pj->ij", active, Jc[:, 2, :], Jc[:, 2, :])
    vt = jnp.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2) + vreg
    ct = FRICTION_MU * N / vt
    for ax in range(2):
        D = D + jnp.einsum("p,pi,pj->ij", ct, Jc[:, ax, :], Jc[:, ax, :])
    rhs = M @ qd + DT * (Q - corio)
    qd_new = jnp.linalg.solve(M + DT * D, rhs)
    qd_new = jnp.clip(qd_new, -100.0, 100.0)
    return q + DT * qd_new, qd_new, jnp.sum(N)


def _com(q):
    return jnp.einsum("p,pi->i", PT_MASS, _points(q)) / TOTAL_MASS


def physics_step(q, qd, actions, vreg=FRICTION_VREG):
    tau = jnp.clip(actions, -CTRL_RANGE, CTRL_RANGE)
    n_total = jnp.zeros(())
    for _ in range(FRAME_SKIP):
        q, qd, n = _substep(q, qd, tau, vreg)
        n_total = n_total + n
    return q, qd, n_total / FRAME_SKIP


# reference obsk.py 9|8: agent 0 = upper body (abdomen + shoulders/elbows),
# agent 1 = lower body (hips/knees) — NOT contiguous actuator slices
_JOINT_IDX = {name: i for i, (name, *_rest) in enumerate(JOINTS)}
_PART_9_8 = (
    tuple(_JOINT_IDX[n] for n in (
        "abdomen_y", "abdomen_z", "abdomen_x",
        "right_shoulder1", "right_shoulder2", "right_elbow",
        "left_shoulder1", "left_shoulder2", "left_elbow")),
    tuple(_JOINT_IDX[n] for n in (
        "right_hip_x", "right_hip_z", "right_hip_y", "right_knee",
        "left_hip_x", "left_hip_z", "left_hip_y", "left_knee")),
)


def _parse_conf(conf: str):
    """'17x1' → 17 one-joint agents; '9|8' → upper/lower body partition.

    Returns per-agent tuples of joint (=actuator) indices.
    """
    if conf == "9|8":
        groups = [list(g) for g in _PART_9_8]
    elif "|" in conf:
        sizes = [int(x) for x in conf.split("|")]
        starts = [sum(sizes[:i]) for i in range(len(sizes))]
        groups = [list(range(s, s + sz)) for s, sz in zip(starts, sizes)]
    else:
        n, per = (int(x) for x in conf.split("x"))
        groups = [list(range(i * per, (i + 1) * per)) for i in range(n)]
    if sorted(j for g in groups for j in g) != list(range(N_JOINTS)):
        raise ValueError(f"agent_conf {conf!r} must partition {N_JOINTS} joints")
    return groups


@dataclasses.dataclass(frozen=True)
class HumanoidMAMuJoCo:
    """MAMuJoCo Humanoid-v2 (17x1 / 9|8); ``standup=True`` → standup task."""

    agent_joints: Tuple[Tuple[int, ...], ...] = tuple(
        (i,) for i in range(17))
    episode_limit: int = 1000
    standup: bool = False
    # Ground grip: the regularized-Coulomb vt+vreg denominator halves the
    # available friction at foot speeds ~vreg, letting the point feet creep
    # (MuJoCo's LCP contacts are sticky). env_args["friction_vreg"] tightens
    # it for the balance probes.
    friction_vreg: float = FRICTION_VREG
    # Reference MAMuJoCo observation factorization (obsk.py + the tuned
    # configs' agent_obsk: 0): each agent observes ONLY its own joints'
    # local features — joint angle/velocity plus the linked body's pose and
    # world velocity (the cvel/cinert analogue) — while the centralized
    # critic sees the full state. None (default) keeps the repo's original
    # full-state-plus-id per-agent obs.
    agent_obsk: object = None
    # Per-observation standardization warps the state manifold step-by-step
    # (the normalizer depends on the current obs itself); balance around an
    # unstable equilibrium may need the raw coordinates + the model's own
    # learnable input LayerNorm instead. env_args["obs_standardize"]=False
    # switches to fixed physical scaling (qd/10).
    obs_standardize: bool = True

    @property
    def n_agents(self) -> int:
        return len(self.agent_joints)

    @property
    def state_dim(self) -> int:
        return (DOF - 2) + DOF

    @property
    def obs_dim(self) -> int:
        if self.agent_obsk is not None:
            return self.LOCAL_FEATS_PER_JOINT * max(
                len(g) for g in self.agent_joints)
        return self.state_dim + self.n_agents

    @property
    def observation_space(self):
        if self.agent_obsk is not None:
            return [
                spaces.Box.create(
                    -jnp.inf, jnp.inf, self.LOCAL_FEATS_PER_JOINT * len(g))
                for g in self.agent_joints
            ]
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.obs_dim)] * self.n_agents

    @property
    def share_observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.state_dim)] * self.n_agents

    @property
    def action_space(self):
        return [spaces.Box.create(-CTRL_RANGE, CTRL_RANGE, len(g))
                for g in self.agent_joints]

    # ------------------------------------------------------------------ api
    def reset(self, key) -> Tuple[HumanoidState, TimeStep]:
        k1, k2 = jax.random.split(key)
        if self.standup:
            # lying on the back (pitch −π/2), pelvis-height root
            base = jnp.concatenate([
                jnp.array([0.0, 0.0, 0.28, 0.0, -0.5 * math.pi, 0.0]), Q0])
        else:
            base = jnp.concatenate([
                jnp.array([0.0, 0.0, TORSO_Z0, 0.0, 0.0, 0.0]), Q0])
        q = base + jax.random.uniform(k1, (DOF,), minval=-0.01, maxval=0.01)
        qd = jax.random.uniform(k2, (DOF,), minval=-0.01, maxval=0.01)
        state = HumanoidState(q=q, qd=qd, t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool))

    def step(self, state: HumanoidState, actions, key):
        del key
        flat = jnp.zeros((N_JOINTS,))
        for i, joints in enumerate(self.agent_joints):
            flat = flat.at[jnp.array(joints)].set(
                jnp.asarray(actions[i])[: len(joints)])
        com0 = _com(state.q)
        q, qd, contact_n = physics_step(state.q, state.qd, flat,
                                        self.friction_vreg)
        # gym v2 semantics: standup's uph_cost divides by opt.timestep
        # (0.003); the walking lin_vel_cost is 0.25*dx/opt.timestep,
        # i.e. 1.25·vel with vel over the full frame-skipped step
        a = jnp.clip(flat, -CTRL_RANGE, CTRL_RANGE)
        ctrl = CTRL_COST * jnp.sum(a ** 2)
        impact = jnp.minimum(CONTACT_COST * contact_n ** 2, CONTACT_COST_MAX)
        if self.standup:
            reward = q[2] / DT - ctrl - impact + 1.0
            term = jnp.zeros((), bool)
        else:
            # gym v2: lin_vel_cost = 0.25*dx/opt.timestep ≡ 1.25*dx/dt with
            # dt = timestep·frame_skip = 0.015 (humanoid.py v2)
            vel_x = (_com(q)[0] - com0[0]) / (DT * FRAME_SKIP)
            healthy = self._is_healthy(q, qd)
            reward = (FORWARD_WEIGHT * vel_x + HEALTHY_REWARD * healthy
                      - ctrl - impact)
            term = ~healthy
        new_t = state.t + 1
        trunc = new_t >= self.episode_limit
        done = term | trunc
        bad = trunc & ~term
        new_state = HumanoidState(q=q, qd=qd, t=new_t)
        return new_state, self._timestep(new_state, reward, done, bad)

    def _is_healthy(self, q, qd):
        ok = (q[2] > HEALTHY_Z[0]) & (q[2] < HEALTHY_Z[1])
        ok = ok & (jnp.linalg.norm(q[3:6]) < ROTVEC_MAX)
        ok = ok & jnp.all(jnp.isfinite(q)) & jnp.all(jnp.isfinite(qd))
        return ok

    # ---------------------------------------------------------- observation
    def _state_vec(self, state: HumanoidState) -> jnp.ndarray:
        return jnp.concatenate([state.q[2:], state.qd]).astype(jnp.float32)

    # per-joint local features (obsk=0 mode): joint angle + velocity plus the
    # linked body's height, root-relative xy, world velocity and z-axis —
    # the analogue of the reference's {qpos, qvel, cvel, cinert} body fields
    LOCAL_FEATS_PER_JOINT = 11

    def _local_obs(self, state: HumanoidState) -> jnp.ndarray:
        q, qd = state.q, state.qd

        def origins(qq):
            fr = _body_frames(qq)
            return jnp.stack(
                [fr[JOINTS[j][1]][0] for j in range(N_JOINTS)])  # (J, 3)

        O, dO = jax.jvp(origins, (q,), (qd,))
        frames = _body_frames(q)
        Rz = jnp.stack(
            [frames[JOINTS[j][1]][1][:, 2] for j in range(N_JOINTS)])
        feats = jnp.concatenate([
            q[6:, None],                     # own joint angle
            0.1 * qd[6:, None],              # own joint velocity
            O[:, 2:3],                       # body height
            O[:, :2] - q[None, :2],          # body xy relative to root
            0.1 * dO,                        # body world velocity
            Rz,                              # body orientation z-axis
        ], axis=1)                           # (J, 11)
        max_j = max(len(g) for g in self.agent_joints)
        rows = []
        for g in self.agent_joints:
            v = feats[jnp.asarray(g)].reshape(-1)
            rows.append(jnp.pad(
                v, (0, self.LOCAL_FEATS_PER_JOINT * max_j - v.shape[0])))
        return jnp.stack(rows).astype(jnp.float32)  # (N, 11*max_j)

    def _timestep(self, state, reward, done, bad) -> TimeStep:
        N = self.n_agents
        sv = self._state_vec(state)
        if self.agent_obsk is not None:
            obs = self._local_obs(state)
        else:
            ids = jnp.eye(N)
            obs = jnp.concatenate(
                [jnp.broadcast_to(sv[None], (N, sv.shape[0])), ids], axis=-1)
            if self.obs_standardize:
                mean = jnp.mean(obs, axis=-1, keepdims=True)
                std = jnp.std(obs, axis=-1, keepdims=True) + 1e-8
                obs = (obs - mean) / std
            else:
                # fixed physical scaling: positions O(1), velocities /10
                scale = jnp.concatenate(
                    [jnp.ones(DOF - 2), jnp.full(DOF, 0.1), jnp.ones(N)])
                obs = obs * scale
        return TimeStep(
            obs=obs,
            share_obs=sv,
            rewards=jnp.broadcast_to(reward, (N, 1)).astype(jnp.float32),
            dones=jnp.broadcast_to(done, (N,)),
            bad_transition=bad,
            available_actions=None,
        )


def make_humanoid(env_args: dict) -> HumanoidMAMuJoCo:
    scenario = env_args.get("scenario", "Humanoid-v2")
    conf = env_args.get("agent_conf", "17x1")
    return HumanoidMAMuJoCo(
        agent_joints=tuple(tuple(g) for g in _parse_conf(conf)),
        episode_limit=env_args.get("episode_limit", 1000),
        standup=scenario.startswith("HumanoidStandup"),
        obs_standardize=env_args.get("obs_standardize", True),
        friction_vreg=env_args.get("friction_vreg", FRICTION_VREG),
        agent_obsk=env_args.get("agent_obsk", None),
    )
