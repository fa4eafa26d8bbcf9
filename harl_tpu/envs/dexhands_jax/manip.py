"""Pure-JAX Bi-DexterousHands manipulation family: doors, cup, table tasks.

Extends the catch family (``handover.py``) with the reference's second task
group (``DexterousHands/bidexhands/tasks/shadow_hand_door_*.py``,
``shadow_hand_swing_cup.py``, ``shadow_hand_lift_underarm.py``,
``shadow_hand_push_block.py``, ``shadow_hand_block_stack.py``): two
fixed-base hands cooperating on ARTICULATED or TABLE-SUPPORTED objects
instead of free flying ones.

Same design stance as handover.py — a TPU-first re-design preserving the
task/interface contract, not an IsaacGym physics port:

* **Hinge tasks** (4 door variants + swing cup): one revolute DOF about the
  vertical axis; fingertips push spherical handles whose velocity is ω×arm;
  the contact wrench projects onto the hinge (I θ̈ = τ − cθ̇ − limits).
  Door open swings the handle away from / toward the hands (outward /
  inward); close starts open with goal θ=0; swing cup rotates two opposed
  handles to θ=π.
* **Table tasks** (lift / push ×2 / stack): spheres rest on a support plane
  (normal spring + regularized Coulomb friction) between the hands;
  LiftUnderarm's pot is heavy enough that both hands must scoop it to the
  raised goal; PushBlock gives each hand its own block and target;
  BlockStack's second block must end on top of the first (sphere-sphere
  contacts carry friction so the stack is stable).

Each task: 2 agents × Box(-1,1,20), per-hand obs views + EP share state,
distance shaping + success bonus + drop penalty, done on
success/drop/timeout, metrics["won"] — the bidexhands "always done" batched
pattern the dexhands logger special-cases.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import TimeStep
from harl_tpu.envs.dexhands_jax.handover import (
    CONTACT_D,
    CONTACT_K,
    DT,
    FLEX_HI,
    FLEX_LO,
    FRICTION_VREG,
    GRAVITY,
    JOINT_VMAX,
    N_FINGERS,
    N_JOINTS,
    SERVO_GAIN,
    SUBSTEPS,
    _fingertips,
)

# manip keeps the contact constants its task family was VALIDATED with
# (DoorOpenOutward won=1.0 @10M, validation/r3/) — the catch family later
# retuned its own TIP_RADIUS/FRICTION_MU for ball-cradle carries and those
# must not silently leak into the hinge/table tasks
TIP_RADIUS = 0.012
FRICTION_MU = 1.0

HANDLE_R = 0.025
TABLE_Z = -0.05
# table-task hand mount offset (see _hand): gives the fingertips ~7 mm of
# working margin below the smallest object's rest height instead of -0.8 mm
TABLE_HAND_DZ = -0.025

# task configs ---------------------------------------------------------------
# hands: palm-up, facing each other across the workspace origin
_HANDS = dict(hand_pos=((0.0, -0.11, 0.0), (0.0, 0.11, 0.0)),
              fwd=(1.0, -1.0), up=(1.0, 1.0))

# hinge tasks: hinge at (-0.12, 0, z), handle arm reaches the origin at θ=0
# heavy damping + a return spring toward closed: the door must be DRIVEN
# through its swing by sustained coordinated pushing, not flicked open by
# stray contact impulses (random-policy success ≈ 0)
_DOOR = dict(
    kind="hinge", **_HANDS,
    hinge_pos=(-0.12, 0.0, 0.05),
    arms=((0.12, 0.0, 0.0),),          # one handle between the hands
    inertia=0.08, damping=2.0, spring=0.6, theta_limits=(-0.8, 0.8),
    success_tol=0.1,
)
_CUP = dict(
    kind="hinge", **_HANDS,
    hinge_pos=(0.0, 0.0, 0.04),
    arms=((0.08, 0.0, 0.0), (-0.08, 0.0, 0.0)),   # two opposed handles
    inertia=0.004, damping=0.05, spring=0.0, theta_limits=(-0.3, 3.6),
    success_tol=0.25,
)

MANIP_TASKS = {
    # door opens away from (+) / toward (−) the hands; close starts open
    "ShadowHandDoorOpenOutward": {**_DOOR, "theta0": 0.0, "theta_goal": 0.5},
    "ShadowHandDoorOpenInward": {**_DOOR, "theta0": 0.0, "theta_goal": -0.5},
    "ShadowHandDoorCloseOutward": {**_DOOR, "theta0": 0.5, "theta_goal": 0.0},
    "ShadowHandDoorCloseInward": {**_DOOR, "theta0": -0.5, "theta_goal": 0.0},
    "ShadowHandSwingCup": {**_CUP, "theta0": 0.0, "theta_goal": float(np.pi)},
    # scissors (shadow_hand_scissors.py): one hinge blade pair, spring toward
    # closed — both hands must pry the handles apart to the open angle
    "ShadowHandScissors": dict(
        kind="hinge", **_HANDS,
        hinge_pos=(0.0, 0.0, 0.04),
        arms=((0.07, 0.0, 0.0), (-0.07, 0.0, 0.0)),
        inertia=0.006, damping=0.2, spring=0.8, theta_limits=(-0.1, 1.0),
        success_tol=0.12, theta0=0.0, theta_goal=0.6,
    ),
    # switch (shadow_hand_switch.py): lever pressed through −θ against a
    # return spring toward up
    "ShadowHandSwitch": dict(
        kind="hinge", **_HANDS,
        hinge_pos=(-0.10, 0.0, 0.06),
        arms=((0.10, 0.0, 0.0),),
        inertia=0.02, damping=0.8, spring=1.2, theta_limits=(-0.8, 0.1),
        success_tol=0.1, theta0=0.0, theta_goal=-0.5,
    ),
    # bottle cap (shadow_hand_bottle_cap.py): one hand steadies, the other
    # twists the low-inertia cap through a large unscrewing angle
    "ShadowHandBottleCap": dict(
        kind="hinge", **_HANDS,
        hinge_pos=(0.0, 0.0, 0.05),
        arms=((0.06, 0.0, 0.0),),
        inertia=0.002, damping=0.04, spring=0.0, theta_limits=(-0.2, 2.4),
        success_tol=0.25, theta0=0.0, theta_goal=1.8,
    ),
    # table tasks: (radius, mass, start xy, goal offset) per object
    "ShadowHandLiftUnderarm": dict(
        kind="table", **_HANDS,
        radii=(0.06,), masses=(1.0,),
        starts=((0.0, 0.0),), goals=((0.0, 0.0, 0.22),),
        success_tol=0.06,
    ),
    "ShadowHandPushBlock": dict(
        kind="table", **_HANDS,
        radii=(0.03, 0.03), masses=(0.10, 0.10),
        starts=((-0.03, -0.03), (0.03, 0.03)),
        goals=((-0.09, 0.0, 0.0), (0.09, 0.0, 0.0)),   # targets on the table
        success_tol=0.05,
    ),
    "ShadowHandBlockStack": dict(
        kind="table", **_HANDS,
        radii=(0.035, 0.035), masses=(0.10, 0.10),
        starts=((-0.04, 0.0), (0.05, 0.0)),
        # block 0 to the target point; block 1 on top of block 0
        goals=((0.0, 0.0, 0.0), (0.0, 0.0, 0.07)),
        success_tol=0.045,
    ),
    # pen (shadow_hand_pen.py): one hand holds, the other pulls the light
    # cap up and off-axis to the removed pose
    "ShadowHandPen": dict(
        kind="table", **_HANDS,
        radii=(0.02,), masses=(0.05,),
        starts=((0.0, 0.0),), goals=((0.06, 0.0, 0.12),),
        success_tol=0.05,
    ),
    # grasp-and-place (shadow_hand_grasp_and_place.py): carry the block
    # sideways into the bucket position
    "ShadowHandGraspAndPlace": dict(
        kind="table", **_HANDS,
        radii=(0.03,), masses=(0.15,),
        starts=((0.0, -0.02),), goals=((0.12, 0.0, 0.0),),
        success_tol=0.04,
    ),
    # kettle (shadow_hand_kettle.py): both hands raise the heavy kettle to
    # the tilted pour pose above the bucket
    "ShadowHandKettle": dict(
        kind="table", **_HANDS,
        radii=(0.05,), masses=(0.8,),
        starts=((0.0, 0.0),), goals=((0.06, 0.0, 0.18),),
        success_tol=0.06,
    ),
}

DEXHANDS_MANIP_TASKS = tuple(MANIP_TASKS)


class ManipState(NamedTuple):
    theta: jnp.ndarray       # (2, 20)
    theta_t: jnp.ndarray     # (2, 20)
    hinge: jnp.ndarray       # () hinge angle (hinge tasks; 0 otherwise)
    hinge_vel: jnp.ndarray   # ()
    obj_pos: jnp.ndarray     # (n_obj, 3) table tasks; (0, 3) for hinge
    obj_vel: jnp.ndarray     # (n_obj, 3)
    t: jnp.ndarray           # () int32


def _tip_sphere_contact(tips, tips_v, pos, vel, radius):
    """Penalty forces of 5 fingertips on one sphere (force only)."""
    d = pos[None, :] - tips
    dist = jnp.linalg.norm(d, axis=1) + 1e-8
    n = d / dist[:, None]
    pen = jnp.maximum(radius + TIP_RADIUS - dist, 0.0)
    v_rel = vel[None, :] - tips_v
    vn = jnp.sum(v_rel * n, axis=1)
    N = jnp.maximum(CONTACT_K * pen - CONTACT_D * vn * (pen > 0), 0.0)
    vt = v_rel - vn[:, None] * n
    ft = -FRICTION_MU * N[:, None] * vt / (
        jnp.linalg.norm(vt, axis=1) + FRICTION_VREG)[:, None]
    return jnp.sum(N[:, None] * n + ft, axis=0)


@dataclasses.dataclass(frozen=True)
class ShadowHandManip:
    """2-agent manipulation task; agent h controls hand h's 20 joints."""

    task: str = "ShadowHandDoorOpenOutward"
    episode_length: int = 125
    n_agents: int = 2
    metric_keys = ("won",)

    @property
    def _cfg(self):
        return MANIP_TASKS[self.task]

    @property
    def is_hinge(self) -> bool:
        return self._cfg["kind"] == "hinge"

    @property
    def n_obj(self) -> int:
        return 0 if self.is_hinge else len(self._cfg["radii"])

    @property
    def n_handles(self) -> int:
        return len(self._cfg["arms"]) if self.is_hinge else 0

    @property
    def _task_obs_dim(self) -> int:
        if self.is_hinge:
            # sin/cos θ, θ̇, handle xyz each, goal sin/cos, Δθ
            return 3 + 3 * self.n_handles + 3
        # per object: pos, vel, goal, rel
        return self.n_obj * 12

    @property
    def obs_dim(self) -> int:
        return 20 + 20 + 15 + self._task_obs_dim

    @property
    def state_dim(self) -> int:
        return 40 + 40 + 30 + self._task_obs_dim

    @property
    def observation_space(self):
        return [spaces_box(self.obs_dim)] * 2

    @property
    def share_observation_space(self):
        return [spaces_box(self.state_dim)] * 2

    @property
    def action_space(self):
        return [spaces_box(N_JOINTS, lo=-1.0, hi=1.0)] * 2

    def _hand(self, h: int):
        c = self._cfg
        pos = np.asarray(c["hand_pos"][h])
        # table tasks mount the hands lower: the fingertip envelope bottoms
        # out at z ≈ -0.032 from the z=0 mount, which leaves the smallest
        # table object (Pen cap, r=0.02 resting at z=-0.03) geometrically
        # unreachable (min tip→center distance 0.0328 vs the 0.032 contact
        # threshold — measured over 20k random joint configs). The hinge
        # tasks keep the z=0 mount their validated door curves used
        # (handle at z=+0.05). Reference mounts the hands above a table and
        # points them down (bidexhands shadow_hand_pen.py table asset).
        if c["kind"] == "table":
            pos = pos + np.array([0.0, 0.0, TABLE_HAND_DZ])
        return pos, c["fwd"][h], c["up"][h]

    # ------------------------------------------------------------- geometry
    def _handles(self, theta):
        """World handle-sphere centers for hinge angle theta: (H, 3)."""
        c = self._cfg
        hp = jnp.asarray(c["hinge_pos"])
        ct, st = jnp.cos(theta), jnp.sin(theta)
        out = []
        for arm in c["arms"]:
            a = jnp.asarray(arm)
            out.append(hp + jnp.stack(
                [ct * a[0] - st * a[1], st * a[0] + ct * a[1], a[2]]))
        return jnp.stack(out)

    def _obj_goals(self):
        c = self._cfg
        goals = []
        for o in range(self.n_obj):
            g = jnp.asarray(c["goals"][o])
            # table-level goals sit at sphere-rest height
            rest = TABLE_Z + c["radii"][o]
            goals.append(g + jnp.array([0.0, 0.0, rest]))
        return jnp.stack(goals)

    # ------------------------------------------------------------------ api
    def reset(self, key) -> Tuple[ManipState, TimeStep]:
        c = self._cfg
        k1, k2 = jax.random.split(key)
        theta = jnp.zeros((2, N_JOINTS))
        if self.is_hinge:
            # one dummy row, not (0, 3): zero-size leaves break orbax
            # checkpointing of the env carry
            obj_pos = jnp.zeros((1, 3))
            obj_vel = jnp.zeros((1, 3))
            hinge = jnp.asarray(c["theta0"]) + 0.02 * jax.random.normal(k1, ())
        else:
            starts = jnp.asarray([
                (s[0], s[1], TABLE_Z + c["radii"][o])
                for o, s in enumerate(c["starts"])])
            obj_pos = starts + 0.005 * jax.random.normal(k1, (self.n_obj, 3))
            obj_vel = jnp.zeros((self.n_obj, 3))
            hinge = jnp.zeros(())
        state = ManipState(
            theta=theta, theta_t=theta, hinge=hinge,
            hinge_vel=jnp.zeros(()), obj_pos=obj_pos, obj_vel=obj_vel,
            t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool), jnp.zeros((), bool))

    def step(self, state: ManipState, actions, key):
        del key
        c = self._cfg
        a = jnp.clip(jnp.asarray(actions).reshape(2, N_JOINTS), -1.0, 1.0)
        tgt = a.reshape(2, N_FINGERS, 4)
        tgt = jnp.concatenate(
            [tgt[..., :1],
             FLEX_LO + (tgt[..., 1:] + 1.0) * 0.5 * (FLEX_HI - FLEX_LO)],
            axis=-1).reshape(2, N_JOINTS)

        theta, hinge, hinge_vel = state.theta, state.hinge, state.hinge_vel
        obj_pos, obj_vel = state.obj_pos, state.obj_vel
        for _ in range(SUBSTEPS):
            theta, hinge, hinge_vel, obj_pos, obj_vel = self._substep(
                theta, tgt, hinge, hinge_vel, obj_pos, obj_vel)

        if self.is_hinge:
            err = jnp.abs(hinge - c["theta_goal"])
            success = err < c["success_tol"]
            handles = self._handles(hinge)
            app = 0.0
            for h in range(2):
                pos, fwd, up = self._hand(h)
                tips = _fingertips(theta[h], pos, fwd, up)
                dmin = jnp.min(jnp.linalg.norm(
                    tips[:, None, :] - handles[None], axis=-1))
                app = app + dmin
            reward = (-2.0 * err - 0.5 * app
                      + 5.0 * success.astype(jnp.float32))
            dropped = jnp.zeros((), bool)
        else:
            goals = self._obj_goals()
            dist = jnp.linalg.norm(obj_pos - goals, axis=1)
            # "at the goal AND held there" — a flicked object flying through
            # the goal region does not count (bidexhands lift semantics)
            slow = jnp.all(jnp.linalg.norm(obj_vel, axis=1) < 0.5)
            success = jnp.all(dist < c["success_tol"]) & slow
            app = 0.0
            for h in range(2):
                pos, fwd, up = self._hand(h)
                tips = _fingertips(theta[h], pos, fwd, up)
                # each hand approaches its nearest object
                dmin = jnp.min(jnp.linalg.norm(
                    tips[:, None, :] - obj_pos[None], axis=-1))
                app = app + dmin
            dropped = jnp.any(
                (obj_pos[:, 2] < TABLE_Z - 0.05)
                | (jnp.linalg.norm(obj_pos[:, :2], axis=1) > 0.3))
            reward = (jnp.sum(-2.0 * dist) - 0.5 * app
                      + 5.0 * success.astype(jnp.float32)
                      - 2.0 * dropped.astype(jnp.float32))

        new_t = state.t + 1
        trunc = new_t >= self.episode_length
        done = success | dropped | trunc
        bad = trunc & ~(success | dropped)
        new_state = ManipState(
            theta=theta, theta_t=tgt, hinge=hinge, hinge_vel=hinge_vel,
            obj_pos=obj_pos, obj_vel=obj_vel, t=new_t)
        return new_state, self._timestep(new_state, reward, done, bad, success)

    # ------------------------------------------------------------- dynamics
    def _substep(self, theta, tgt, hinge, hinge_vel, obj_pos, obj_vel):
        c = self._cfg
        theta_dot = jnp.clip(SERVO_GAIN * (tgt - theta), -JOINT_VMAX, JOINT_VMAX)
        new_theta = theta + DT * theta_dot
        new_theta = jnp.concatenate(
            [jnp.clip(new_theta.reshape(2, N_FINGERS, 4)[..., :1], -1.0, 1.0),
             jnp.clip(new_theta.reshape(2, N_FINGERS, 4)[..., 1:],
                      FLEX_LO, FLEX_HI)], axis=-1).reshape(2, N_JOINTS)

        tips_all, tipsv_all = [], []
        for h in range(2):
            pos, fwd, up = self._hand(h)
            tips, tips_v = jax.jvp(
                lambda th: _fingertips(th, pos, fwd, up), (new_theta[h],),
                ((new_theta[h] - theta[h]) / DT,))
            tips_all.append(tips)
            tipsv_all.append(tips_v)
        tips = jnp.concatenate(tips_all)      # (10, 3)
        tips_v = jnp.concatenate(tipsv_all)

        if self.is_hinge:
            hp = jnp.asarray(c["hinge_pos"])
            handles = self._handles(hinge)    # (H, 3)
            torque = jnp.zeros(())
            for i in range(self.n_handles):
                arm = handles[i] - hp
                hv = jnp.cross(jnp.array([0.0, 0.0, hinge_vel]), arm)
                f = _tip_sphere_contact(tips[:5], tips_v[:5], handles[i], hv,
                                        HANDLE_R)
                f = f + _tip_sphere_contact(tips[5:], tips_v[5:], handles[i],
                                            hv, HANDLE_R)
                torque = torque + jnp.cross(arm, f)[2]
            lo, hi = c["theta_limits"]
            over = (jnp.maximum(hinge - hi, 0.0) - jnp.maximum(lo - hinge, 0.0))
            # return spring anchors at the START angle, so open AND close
            # variants both fight it toward the goal
            acc = (torque - c["damping"] * hinge_vel
                   - c.get("spring", 0.0) * (hinge - c["theta0"])
                   - 50.0 * over) / c["inertia"]
            new_vel = jnp.clip(hinge_vel + DT * acc, -20.0, 20.0)
            return new_theta, hinge + DT * new_vel, new_vel, obj_pos, obj_vel

        radii = jnp.asarray(c["radii"])
        masses = jnp.asarray(c["masses"])
        force = jnp.tile(jnp.array([[0.0, 0.0, -GRAVITY]]), (self.n_obj, 1)) \
            * masses[:, None]
        for o in range(self.n_obj):
            f = _tip_sphere_contact(tips, tips_v, obj_pos[o], obj_vel[o],
                                    radii[o])
            # table support: normal spring + friction against the plane
            pen = jnp.maximum(TABLE_Z + radii[o] - obj_pos[o, 2], 0.0)
            N = jnp.maximum(
                CONTACT_K * pen - CONTACT_D * obj_vel[o, 2] * (pen > 0), 0.0)
            vt = obj_pos[o] * 0.0
            vt = vt.at[:2].set(obj_vel[o, :2])
            ft = -FRICTION_MU * N * vt / (jnp.linalg.norm(vt) + FRICTION_VREG)
            f = f + jnp.array([0.0, 0.0, 1.0]) * N + ft
            # sphere-sphere contacts WITH friction (stacking stability)
            for o2 in range(self.n_obj):
                if o2 == o:
                    continue
                d = obj_pos[o] - obj_pos[o2]
                dist = jnp.linalg.norm(d) + 1e-8
                n = d / dist
                pen2 = jnp.maximum(radii[o] + radii[o2] - dist, 0.0)
                v_rel = obj_vel[o] - obj_vel[o2]
                vn = jnp.sum(v_rel * n)
                N2 = jnp.maximum(
                    CONTACT_K * pen2 - CONTACT_D * vn * (pen2 > 0), 0.0)
                vt2 = v_rel - vn * n
                ft2 = -FRICTION_MU * N2 * vt2 / (
                    jnp.linalg.norm(vt2) + FRICTION_VREG)
                f = f + N2 * n + ft2
            force = force.at[o].add(f)
        new_vel = obj_vel + DT * force / masses[:, None]
        new_pos = obj_pos + DT * new_vel
        return new_theta, hinge, hinge_vel, new_pos, new_vel

    # ---------------------------------------------------------- observation
    def _task_obs(self, state: ManipState):
        c = self._cfg
        if self.is_hinge:
            handles = self._handles(state.hinge).reshape(-1)
            return jnp.concatenate([
                jnp.stack([jnp.sin(state.hinge), jnp.cos(state.hinge),
                           state.hinge_vel]),
                handles,
                jnp.stack([jnp.sin(jnp.asarray(c["theta_goal"])),
                           jnp.cos(jnp.asarray(c["theta_goal"])),
                           jnp.asarray(c["theta_goal"]) - state.hinge]),
            ])
        goals = self._obj_goals()
        return jnp.concatenate([
            state.obj_pos.reshape(-1), state.obj_vel.reshape(-1),
            goals.reshape(-1), (goals - state.obj_pos).reshape(-1)])

    def _timestep(self, state, reward, done, bad, success) -> TimeStep:
        theta_dot = jnp.clip(
            SERVO_GAIN * (state.theta_t - state.theta), -JOINT_VMAX, JOINT_VMAX)
        p0, f0, u0 = self._hand(0)
        p1, f1, u1 = self._hand(1)
        tips0 = _fingertips(state.theta[0], p0, f0, u0).reshape(-1)
        tips1 = _fingertips(state.theta[1], p1, f1, u1).reshape(-1)
        tobs = self._task_obs(state)
        obs0 = jnp.concatenate([state.theta[0], theta_dot[0], tips0, tobs])
        obs1 = jnp.concatenate([state.theta[1], theta_dot[1], tips1, tobs])
        share = jnp.concatenate(
            [state.theta.reshape(-1), theta_dot.reshape(-1), tips0, tips1,
             tobs])
        return TimeStep(
            obs=jnp.stack([obs0, obs1]).astype(jnp.float32),
            share_obs=share.astype(jnp.float32),
            rewards=jnp.broadcast_to(reward, (2, 1)).astype(jnp.float32),
            dones=jnp.broadcast_to(done, (2,)),
            bad_transition=bad,
            available_actions=None,
            metrics={"won": success.astype(jnp.float32)},
        )


def spaces_box(dim, lo=-np.inf, hi=np.inf):
    from harl_tpu.utils import spaces

    return spaces.Box.create(lo, hi, dim)


def make_manip(env_args: dict) -> ShadowHandManip:
    task = env_args.get("task", "ShadowHandDoorOpenOutward")
    if task not in MANIP_TASKS:
        raise NotImplementedError(
            f"dexhands_jax manip task {task!r}: available {DEXHANDS_MANIP_TASKS}")
    return ShadowHandManip(
        task=task,
        episode_length=env_args.get("hands_episode_length",
                                    env_args.get("episode_limit", 125)))
