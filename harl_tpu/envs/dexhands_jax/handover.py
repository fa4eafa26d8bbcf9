"""Pure-JAX Bi-DexterousHands task family: the TPU-native dexhands analogue.

Reference counterpart: ``harl/envs/dexhands/dexhands_env.py`` +
``DexterousHands/bidexhands/tasks/shadow_hand_*.py`` — IsaacGym tasks where
two Shadow Hands manipulate free objects, with per-hand observation views
sliced from one batched obs buffer (``tasks/hand_base/multi_vec_task.py:164-240``)
and envs batched on the accelerator.

This is a from-scratch re-design for TPU, not a physics port: IsaacGym's PhysX
hands (24-DoF tendon-driven) are replaced by a differentiable simplified hand —
5 fingers x 4 servo-driven joints (abduction + 3 flexion), fingertip positions
by forward kinematics, velocities by jvp — interacting with free rigid
sphere-inertia objects through penalty contacts (spring + damping + regularized
Coulomb friction), everything batched under vmap+jit like the rest of
``envs/mamujoco_jax``. What is preserved is the TASK AND INTERFACE CONTRACT:

  * 2 heterogeneous agents, each a Box(-1,1,20) action space (the reference's
    20 actuated DoF per hand);
  * per-agent obs views + a shared global state (EP);
  * reward = distance + orientation shaping toward a goal pose with a success
    bonus and a drop penalty (shadow_hand_over.py reward structure);
  * episodes end on success / drop / ``episode_length`` timeout — the
    "always done" batched-env pattern the dexhands logger special-cases
    (``dexhands_logger.py``).

The IsaacGym catch family maps to one parametrized layout (hand poses +
object/goal placement + object count):

  * ``ShadowHandOver``            — two palm-up hands at one height, the
    receiver yaw-mirrored; short lateral toss (``tasks/shadow_hand_over.py``
    :490-519 — hands 180°-rotated, goal 0.25 toward the receiver).
  * ``ShadowHandCatchUnderarm``   — same geometry over a wider gap;
    lob across (``tasks/shadow_hand_catch_underarm.py``).
  * ``ShadowHandCatchOver2Underarm`` — palm-down above drops/guides into a
    palm-up catcher (``tasks/shadow_hand_catch_over2underarm.py``).
  * ``ShadowHandCatchAbreast``    — hands abreast, lateral toss
    (``tasks/shadow_hand_catch_abreast.py``; approximated palm-up).
  * ``ShadowHandTwoCatchUnderarm`` — both hands each toss an object to the
    other simultaneously (``tasks/shadow_hand_two_catch_underarm.py``).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import TimeStep
from harl_tpu.utils import spaces

# hand geometry -------------------------------------------------------------
N_FINGERS = 5
N_JOINTS = 4 * N_FINGERS                  # 20 per hand: abduction + 3 flexion
SEG_LEN = jnp.array([0.045, 0.03, 0.025])  # finger segment lengths (m)
FINGER_BASE_X = np.array([-0.04, -0.02, 0.0, 0.02, 0.04])   # spread across palm
FINGER_BASE_Y = np.array([0.05, 0.055, 0.06, 0.055, 0.05])  # palm edge
ABDUCT_RANGE = 0.35                        # rad
FLEX_LO, FLEX_HI = -0.2, 1.7               # rad per flexion joint
SERVO_GAIN = 20.0                          # 1/s toward target
# Joint speed cap sets the throw range: tip speed ~ VMAX·reach(0.18 m).
# At 12 rad/s the max exit velocity (~2.2 m/s) could not cross
# CatchUnderarm's 0.45 m gap (scripted full-power toss peaked at y −0.33
# vs goal −0.52 — physically unsolvable); 18 rad/s gives ~3.2 m/s, range
# ~1 m, making the whole catch family reachable. The IsaacGym originals
# get their throw range from wrist/arm DOFs this 20-DoF hand model lacks.
JOINT_VMAX = 18.0                          # rad/s
# fingertip contact radius: sized so a 5-tip cradle can carry the ball
# through a lift without it slipping between fingers (the IsaacGym hands
# have full finger capsules; tips-only contact needs the fatter pads)
TIP_RADIUS = 0.016
# proximal/middle/tip pad radii — every phalanx endpoint is a contact pad
PAD_RADII = jnp.array([0.013, 0.014, TIP_RADIUS])

# object / world ------------------------------------------------------------
OBJ_RADIUS = 0.035
OBJ_MASS = 0.08
OBJ_INERTIA = 0.4 * OBJ_MASS * OBJ_RADIUS ** 2   # solid sphere
GRAVITY = 9.81
PALM_HALF = 0.07                           # palm half-extent (square pad)
CONTACT_K = 1500.0
# APPROACH-ONLY contact damping (impact model): the damping term
# D·max(−vn,0) absorbs incoming kinetic energy during compression (low
# restitution, matching PhysX's zero-restitution defaults — the r4 policy
# probe showed 84% of tosses REACH the receiver but 62% bounced off and
# dropped at the old symmetric D=8) while NEVER weakening the spring force
# during separation, so the throwing flick keeps its full release impulse
# (symmetric D=16 damping killed throw discovery: return flatlined at ~2.5
# over 50M steps). Explicit Euler stability bounds D ≲ 0.5·m/dt → the
# halved substep below (stable limit 19.2 at 1/480).
CONTACT_D = 16.0
FRICTION_MU = 1.2
FRICTION_VREG = 0.05
DT = 1.0 / 480.0
SUBSTEPS = 8                               # control at 60 Hz

SUCCESS_DIST = 0.05


class HandOverState(NamedTuple):
    theta: jnp.ndarray     # (2, 20) joint angles
    theta_t: jnp.ndarray   # (2, 20) servo targets
    obj_pos: jnp.ndarray   # (n_obj, 3)
    obj_quat: jnp.ndarray  # (n_obj, 4) wxyz
    obj_vel: jnp.ndarray   # (n_obj, 3)
    obj_omg: jnp.ndarray   # (n_obj, 3)
    goal_pos: jnp.ndarray  # (n_obj, 3)
    goal_quat: jnp.ndarray  # (n_obj, 4)
    succeeded: jnp.ndarray  # (n_obj,) bool — sticky per-object success flag
    layout: jnp.ndarray    # () int32 — sampled layout index (meta tasks)
    t: jnp.ndarray         # () int32


def _finger_base(n_fingers: int):
    """Per-finger base offsets across the palm edge (arch layout)."""
    if n_fingers == N_FINGERS:
        return FINGER_BASE_X, FINGER_BASE_Y
    x = np.linspace(-0.04, 0.04, n_fingers)
    y = 0.05 + 0.01 * np.sin(np.linspace(0.0, np.pi, n_fingers))
    return x, y


def _finger_points(theta: jnp.ndarray, base_pos, fwd: float, up: float
                   ) -> jnp.ndarray:
    """(F, 3, 3) world positions of every phalanx ENDPOINT for one hand
    (F = len(theta)//4; [:, -1] are the fingertips).

    All three per-finger joints carry contact pads (not just the tips), so
    curled fingers form a real barrier/cup the way the IsaacGym hands' full
    finger capsules do — with tips-only contact a fast toss sails between
    or over the fingers (r4 probe: 96% of tosses reached the receiver but
    59% still dropped; failures overshot the fingertip backstop).

    ``fwd`` = finger extension direction along y (+1/-1); ``up`` = palm
    normal / curl direction along z (+1 palm-up, -1 palm-down).
    """
    F = theta.shape[0] // 4
    th = theta.reshape(F, 4)
    abduct = th[:, 0] * ABDUCT_RANGE
    flex = jnp.cumsum(jnp.clip(th[:, 1:], FLEX_LO, FLEX_HI), axis=1)  # (F, 3)
    bx, by = _finger_base(F)
    base = jnp.stack(
        [jnp.asarray(bx), fwd * jnp.asarray(by), jnp.zeros(F)], axis=1)
    base = base + jnp.asarray(base_pos)
    # in-palm-plane finger direction rotated by abduction about palm normal
    ca, sa = jnp.cos(abduct), jnp.sin(abduct)
    dir_xy = jnp.stack([sa, fwd * ca], axis=1)             # (F, 2)
    # each segment: in-plane component shrinks with curl, normal grows
    seg_inplane = jnp.cos(flex) * SEG_LEN[None, :]          # (F, 3)
    seg_normal = jnp.sin(flex) * SEG_LEN[None, :]
    cum_in = jnp.cumsum(seg_inplane, axis=1)                # (F, 3)
    cum_up = up * jnp.cumsum(seg_normal, axis=1)            # (F, 3)
    xy = base[:, None, :2] + dir_xy[:, None, :] * cum_in[:, :, None]
    z = base[:, None, 2] + cum_up
    return jnp.concatenate([xy, z[..., None]], axis=-1)     # (F, 3, 3)


def _fingertips(theta: jnp.ndarray, base_pos, fwd: float, up: float
                ) -> jnp.ndarray:
    """(F, 3) world fingertip positions (last phalanx endpoints)."""
    return _finger_points(theta, base_pos, fwd, up)[:, -1, :]


def _hand_contact_points(theta: jnp.ndarray, base_pos, fwd: float, up: float
                         ) -> jnp.ndarray:
    """(3F, 3) flattened per-phalanx contact-pad centers for one hand."""
    return _finger_points(theta, base_pos, fwd, up).reshape(-1, 3)


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _quat_angle(a, b):
    """Rotation angle between two unit quaternions."""
    d = jnp.abs(jnp.sum(a * b, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0))


# task layouts ---------------------------------------------------------------
# (hand_pos[2], fwd[2], up[2], obj_start_hand[n_obj], goal_hand[n_obj])
# obj starts resting on (palm-up) / hanging under (palm-down) its start hand;
# each goal sits in the grasp region of its goal hand.
# Optional keys: ``n_fingers`` (4 = Allegro: 16 actuated DoF per hand,
# allegro_hand_over.py numActions=16; default 5 = Shadow), ``success``
# ("dist" | "rot" | "both" — re_orientation judges orientation,
# success_tolerance 0.1), ``layouts`` (meta tasks: a list of base-task
# names sampled uniformly per episode, shadow_hand_meta/*_task_info.py),
# ``goal_noise`` (meta goal-variation half-width).
_TASKS = {
    # Reference-true geometry (shadow_hand_over.py:490-519, 1270): the two
    # hands sit at the SAME height, the second yaw-rotated by pi (fwd=-1:
    # its fingers extend back toward the thrower's side and its curl forms
    # a backstop), and the goal is ~0.25-0.35 m toward the receiver — a
    # short LATERAL toss along the thrower's natural curl-swat direction
    # (-y). Holding still earns almost nothing (income ~0.03/step at
    # dist 0.36) while delivering onto the receiving palm earns ~0.6/step,
    # so the hold-still local optimum of the earlier vertical layouts is
    # gone, and random exploration lands the ball in the receiver region in
    # ~40% of episodes. (History: receiver above at z=0.24 was physically
    # unreachable — won 0.02 @30M; z=0.16 needed a precision toss PPO never
    # found; z=0.13 overlap still converged to ball-holding — won 0 @20M.)
    "ShadowHandOver": dict(
        hand_pos=((0.0, 0.0, 0.0), (0.0, -0.30, 0.0)),
        fwd=(1.0, -1.0), up=(1.0, 1.0),
        obj_start_hand=(0,), goal_hand=(1,)),
    "ShadowHandCatchUnderarm": dict(
        hand_pos=((0.0, 0.0, 0.0), (0.0, -0.45, 0.0)),
        fwd=(1.0, -1.0), up=(1.0, 1.0),
        obj_start_hand=(0,), goal_hand=(1,)),
    # thrower y=0.12 puts the object's free-fall track (y≈0.075) inside the
    # catcher's palm region (|y| < PALM_HALF + OBJ_RADIUS), matching the
    # reference layout where the drop lands in the catch region
    "ShadowHandCatchOver2Underarm": dict(
        hand_pos=((0.0, 0.12, 0.30), (0.0, 0.0, 0.0)),
        fwd=(-1.0, 1.0), up=(-1.0, 1.0),
        obj_start_hand=(0,), goal_hand=(1,)),
    # abreast: hands side by side in x, lateral toss (palm-up approximation
    # of the reference's sideways palms)
    "ShadowHandCatchAbreast": dict(
        hand_pos=((-0.16, 0.0, 0.0), (0.16, 0.0, 0.0)),
        fwd=(1.0, 1.0), up=(1.0, 1.0),
        obj_start_hand=(0,), goal_hand=(1,)),
    "ShadowHandTwoCatchUnderarm": dict(
        hand_pos=((0.0, 0.0, 0.0), (0.0, -0.45, 0.0)),
        fwd=(1.0, -1.0), up=(1.0, 1.0),
        obj_start_hand=(0, 1), goal_hand=(1, 0)),
    # in-hand re-orientation: both palms up, each hand rotates its own
    # object in place to a random goal orientation; success is rotational
    # (shadow_hand_re_orientation.py)
    "ShadowHandReOrientation": dict(
        hand_pos=((-0.16, 0.0, 0.0), (0.16, 0.0, 0.0)),
        fwd=(1.0, 1.0), up=(1.0, 1.0),
        obj_start_hand=(0, 1), goal_hand=(0, 1), success="rot"),
    # Allegro variants: 4-finger hands, 16 actuated DoF per agent
    # (allegro_hand_over.py / allegro_hand_catch_underarm.py)
    "AllegroHandOver": dict(
        hand_pos=((0.0, 0.0, 0.0), (0.0, -0.30, 0.0)),
        fwd=(1.0, -1.0), up=(1.0, 1.0),
        obj_start_hand=(0,), goal_hand=(1,), n_fingers=4),
    "AllegroHandCatchUnderarm": dict(
        hand_pos=((0.0, 0.0, 0.0), (0.0, -0.45, 0.0)),
        fwd=(1.0, -1.0), up=(1.0, 1.0),
        obj_start_hand=(0,), goal_hand=(1,), n_fingers=4),
    # meta family (shadow_hand_meta/): MT1/ML1 train on catch_underarm with
    # wider goal variation; MT4 samples a catch-family layout per episode
    # (the reference's MT4 set swaps two_catch for catch_over2underarm here
    # to keep one object slot — static shapes under vmap)
    "ShadowHandMetaMT1": dict(
        hand_pos=((0.0, 0.0, 0.0), (0.0, -0.45, 0.0)),
        fwd=(1.0, -1.0), up=(1.0, 1.0),
        obj_start_hand=(0,), goal_hand=(1,), goal_noise=0.03),
    "ShadowHandMetaML1": dict(
        hand_pos=((0.0, 0.0, 0.0), (0.0, -0.45, 0.0)),
        fwd=(1.0, -1.0), up=(1.0, 1.0),
        obj_start_hand=(0,), goal_hand=(1,), goal_noise=0.03),
    "ShadowHandMetaMT4": dict(
        layouts=("ShadowHandOver", "ShadowHandCatchUnderarm",
                 "ShadowHandCatchOver2Underarm", "ShadowHandCatchAbreast"),
        obj_start_hand=(0,), goal_hand=(1,), goal_noise=0.03),
}

DEXHANDS_TASKS = tuple(_TASKS)


@dataclasses.dataclass(frozen=True)
class ShadowHandOver:
    """2-agent bimanual manipulation; agent h controls hand h's joints
    (20 for Shadow, 16 for Allegro). Meta tasks sample a layout per episode
    (the ``layout`` state field indexes the stacked layout tables)."""

    task: str = "ShadowHandOver"
    episode_length: int = 75
    n_agents: int = 2
    # Arrival-speed shaping (off by default): the round-4 eval probes showed
    # the catch family's residual failure mode is overshoot scatter past the
    # receiver (41% of HandOver eval drops arrived in the receiver region but
    # sailed past/over the finger backstop). A mild speed penalty gated to
    # the goal neighbourhood — coef * |v| * exp(-20*dist) — prefers low-speed
    # arrivals (softer lobs) without touching throw discovery: at the start
    # distance 0.36 the gate is exp(-7.2) ~ 7e-4, and a settled ball pays
    # nothing. The reference task needs no such term because PhysX hands have
    # wrist/arm DOFs that can chase and absorb fast arrivals
    # (shadow_hand_over.py:490-519 reward is pure pose proximity).
    vel_pen_coef: float = 0.0
    # Gate width of the arrival-speed penalty: coef * |v| * exp(-width*dist).
    # The r5 behavioral probe of the best CatchUnderarm policy showed its
    # failures are OVERSHOOT (97% of throws reach the receiver region, failed
    # balls sail a median ~1 m past it, fail min-dist median 0.12 m): at the
    # default width 20 a fast pass-by at 12 cm sees gate exp(-2.4) ~ 0.09 and
    # pays almost nothing. Width ~8 makes the pass-by pay (gate 0.38 at
    # 12 cm) while the release point at the 0.45 m start distance still sees
    # only exp(-3.6) ~ 0.03 — throw discovery keeps its income.
    vel_pen_width: float = 20.0
    metric_keys = ("won",)

    @property
    def _cfg(self):
        return _TASKS[self.task]

    @property
    def _layout_names(self):
        return self._cfg.get("layouts", (self.task,))

    def _layout_table(self, key):
        """Stacked per-layout arrays: [L, ...]."""
        rows = []
        for name in self._layout_names:
            c = _TASKS[name] if "layouts" in self._cfg else self._cfg
            rows.append(np.asarray(c[key], np.float32))
        return jnp.asarray(np.stack(rows))

    @property
    def n_fingers(self) -> int:
        return int(self._cfg.get("n_fingers", N_FINGERS))

    @property
    def n_joints(self) -> int:
        return 4 * self.n_fingers

    @property
    def success_mode(self) -> str:
        return self._cfg.get("success", "dist")

    @property
    def n_objects(self) -> int:
        return len(self._cfg["obj_start_hand"])

    @property
    def obs_dim(self) -> int:
        return (2 * self.n_joints + 3 * self.n_fingers
                + self.n_objects * (13 + 7 + 3))

    @property
    def state_dim(self) -> int:
        return (4 * self.n_joints + 6 * self.n_fingers
                + self.n_objects * (13 + 7 + 3))

    @property
    def observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.obs_dim)] * 2

    @property
    def share_observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.state_dim)] * 2

    @property
    def action_space(self):
        return [spaces.Box.create(-1.0, 1.0, self.n_joints)] * 2

    def _hand(self, state: HandOverState, h: int):
        """Layout-resolved (pos, fwd, up) for hand h."""
        L = state.layout
        return (self._layout_table("hand_pos")[L, h],
                self._layout_table("fwd")[L, h],
                self._layout_table("up")[L, h])

    @property
    def _drop_z(self) -> float:
        zs = [p[2]
              for name in self._layout_names
              for p in (_TASKS[name] if "layouts" in self._cfg
                        else self._cfg)["hand_pos"]]
        return min(zs) - 0.08

    # ------------------------------------------------------------------ api
    def reset(self, key) -> Tuple[HandOverState, TimeStep]:
        c = self._cfg
        k0, k1, k2, k3, k4 = jax.random.split(key, 5)
        layout = jax.random.randint(k0, (), 0, len(self._layout_names))
        theta = jnp.zeros((2, self.n_joints))
        hp = self._layout_table("hand_pos")[layout]       # (2, 3)
        fw = self._layout_table("fwd")[layout]            # (2,)
        up = self._layout_table("up")[layout]             # (2,)
        sh = jnp.asarray(c["obj_start_hand"])
        gh = jnp.asarray(c["goal_hand"])
        # rest on a palm-up hand; hang just under a palm-down hand
        starts = hp[sh] + jnp.stack(
            [jnp.zeros(self.n_objects), fw[sh] * 0.045,
             up[sh] * (OBJ_RADIUS + 0.002)], axis=1)
        # Reference goal semantics (shadow_hand_over.py reset_target_pose and
        # every catch-family task): the goal is the object's INITIAL pose
        # translated laterally into the receiver's region — i.e. the goal
        # height equals the ball's natural RESTING height on a palm
        # (goal_states = goal_init_state; y -= 0.25). The earlier +0.06 goal
        # sat 2.5 cm above resting height, eating 83% of the 3 cm success
        # tolerance and demanding a precision hold — the r3 0.42 ceiling.
        goals = hp[gh] + jnp.stack(
            [jnp.zeros(self.n_objects), fw[gh] * 0.045,
             up[gh] * (OBJ_RADIUS + 0.002)], axis=1)
        noise = float(c.get("goal_noise", 0.01))
        obj_pos = starts + 0.01 * jax.random.normal(k1, (self.n_objects, 3))
        goal_pos = goals + noise * jax.random.normal(k2, (self.n_objects, 3))
        ax = jax.random.normal(k3, (self.n_objects, 3))
        ax = ax / (jnp.linalg.norm(ax, axis=1, keepdims=True) + 1e-8)
        ang = jax.random.uniform(
            k4, (self.n_objects,), minval=-np.pi, maxval=np.pi)
        goal_quat = jnp.concatenate(
            [jnp.cos(ang / 2)[:, None], jnp.sin(ang / 2)[:, None] * ax],
            axis=1)
        eye_quat = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (self.n_objects, 1))
        state = HandOverState(
            theta=theta, theta_t=theta,
            obj_pos=obj_pos, obj_quat=eye_quat,
            obj_vel=jnp.zeros((self.n_objects, 3)),
            obj_omg=jnp.zeros((self.n_objects, 3)),
            goal_pos=goal_pos, goal_quat=goal_quat,
            succeeded=jnp.zeros((self.n_objects,), bool),
            layout=layout,
            t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool), jnp.zeros((), bool))

    def step(self, state: HandOverState, actions, key):
        del key
        a = jnp.clip(jnp.asarray(actions).reshape(2, self.n_joints), -1.0, 1.0)
        # servo targets from actions (abduction symmetric, flexion to range)
        tgt = a.reshape(2, self.n_fingers, 4)
        tgt = jnp.concatenate(
            [tgt[..., :1],
             FLEX_LO + (tgt[..., 1:] + 1.0) * 0.5 * (FLEX_HI - FLEX_LO)],
            axis=-1).reshape(2, self.n_joints)

        hp = self._layout_table("hand_pos")[state.layout]
        fw = self._layout_table("fwd")[state.layout]
        upv = self._layout_table("up")[state.layout]
        theta, obj_pos, obj_quat, obj_vel, obj_omg = (
            state.theta, state.obj_pos, state.obj_quat, state.obj_vel,
            state.obj_omg)
        for _ in range(SUBSTEPS):
            theta, obj_pos, obj_quat, obj_vel, obj_omg = self._substep(
                theta, tgt, obj_pos, obj_quat, obj_vel, obj_omg, hp, fw, upv)

        dist = jnp.linalg.norm(obj_pos - state.goal_pos, axis=1)  # (n_obj,)
        rot = _quat_angle(obj_quat, state.goal_quat)
        # shadow_hand_over.py compute_hand_reward semantics: a strictly
        # POSITIVE proximity income exp(-0.2*(50*dist + rot)) per object plus
        # a tiny action penalty; dropping terminates with NO extra penalty
        # (fallPenalty: 0.0 in ShadowHandOver.yaml) — losing the income
        # stream is the punishment. Success is a sticky dist<0.03 flag and
        # does NOT terminate. (The previous shaping was a negative per-step
        # drain with termination on drop, making early dropping
        # return-maximizing — the won=0.02 plateau of round 2.)
        reward = (jnp.sum(jnp.exp(-0.2 * (50.0 * dist + rot)))
                  - 0.0002 * jnp.sum(a ** 2))
        if self.vel_pen_coef:
            speed = jnp.linalg.norm(obj_vel, axis=1)
            reward = reward - self.vel_pen_coef * jnp.sum(
                speed * jnp.exp(-self.vel_pen_width * dist))
        # success criterion per task: positional (catch family), rotational
        # (re_orientation, success_tolerance 0.1), or both
        ok_dist, ok_rot = dist < 0.03, rot < 0.1
        if self.success_mode == "rot":
            ok = ok_rot
        elif self.success_mode == "both":
            ok = ok_dist & ok_rot
        else:
            ok = ok_dist
        succeeded = state.succeeded | ok
        success = jnp.all(succeeded)
        dropped = jnp.any(obj_pos[:, 2] < self._drop_z)
        new_t = state.t + 1
        trunc = new_t >= self.episode_length
        done = jnp.logical_or(dropped, trunc)
        bad = jnp.logical_and(trunc, ~dropped)
        new_state = HandOverState(
            theta=theta, theta_t=tgt, obj_pos=obj_pos, obj_quat=obj_quat,
            obj_vel=obj_vel, obj_omg=obj_omg, goal_pos=state.goal_pos,
            goal_quat=state.goal_quat, succeeded=succeeded,
            layout=state.layout, t=new_t)
        return new_state, self._timestep(new_state, reward, done, bad, success)

    # ------------------------------------------------------------- dynamics
    def _substep(self, theta, tgt, obj_pos, obj_quat, obj_vel, obj_omg,
                 hp, fw, upv):
        # servo joints
        theta_dot = jnp.clip(SERVO_GAIN * (tgt - theta), -JOINT_VMAX, JOINT_VMAX)
        new_theta = theta + DT * theta_dot
        F = self.n_fingers
        new_theta = new_theta.at[:, :].set(jnp.concatenate(
            [jnp.clip(new_theta.reshape(2, F, 4)[..., :1], -1.0, 1.0),
             jnp.clip(new_theta.reshape(2, F, 4)[..., 1:],
                      FLEX_LO, FLEX_HI)], axis=-1).reshape(2, self.n_joints))

        force = jnp.tile(jnp.array([[0.0, 0.0, -OBJ_MASS * GRAVITY]]),
                         (self.n_objects, 1))
        torque = jnp.zeros((self.n_objects, 3))
        for h in range(2):
            pos, fwd, up = hp[h], fw[h], upv[h]
            pads, pads_v = jax.jvp(
                lambda th: _hand_contact_points(th, pos, fwd, up),
                (new_theta[h],), ((new_theta[h] - theta[h]) / DT,))
            f, tq = jax.vmap(
                lambda p, v, w: self._tip_contacts(pads, pads_v, p, v, w)
            )(obj_pos, obj_vel, obj_omg)
            force = force + f
            torque = torque + tq
            pf, pt = jax.vmap(
                lambda p, v, w: self._palm_contact(p, v, w, pos, up)
            )(obj_pos, obj_vel, obj_omg)
            force = force + pf
            torque = torque + pt
        if self.n_objects == 2:
            f01 = self._sphere_contact(obj_pos[0], obj_vel[0],
                                       obj_pos[1], obj_vel[1])
            force = force + jnp.stack([f01, -f01])

        new_vel = obj_vel + DT * force / OBJ_MASS
        new_pos = obj_pos + DT * new_vel
        new_omg = obj_omg + DT * torque / OBJ_INERTIA
        dq = 0.5 * jax.vmap(
            lambda w, q: _quat_mul(jnp.concatenate([jnp.zeros(1), w]), q)
        )(new_omg, obj_quat)
        new_quat = obj_quat + DT * dq
        new_quat = new_quat / (
            jnp.linalg.norm(new_quat, axis=1, keepdims=True) + 1e-8)
        return new_theta, new_pos, new_quat, new_vel, new_omg

    def _tip_contacts(self, tips, tips_v, obj_pos, obj_vel, obj_omg):
        """Contacts between the object and all phalanx pads (3F, 3)."""
        F = tips.shape[0] // 3
        radii = jnp.tile(PAD_RADII, (F,))                 # (3F,)
        d = obj_pos[None, :] - tips                       # (3F, 3)
        dist = jnp.linalg.norm(d, axis=1) + 1e-8
        n = d / dist[:, None]
        pen = jnp.maximum(OBJ_RADIUS + radii - dist, 0.0)
        # contact point on object surface; relative velocity there
        rc = -OBJ_RADIUS * n                              # from object center
        v_obj = obj_vel[None, :] + jnp.cross(
            jnp.broadcast_to(obj_omg, tips.shape), rc)
        v_rel = v_obj - tips_v
        vn = jnp.sum(v_rel * n, axis=1)
        N = CONTACT_K * pen + CONTACT_D * jnp.maximum(-vn, 0.0) * (pen > 0)
        vt = v_rel - vn[:, None] * n
        vt_mag = jnp.linalg.norm(vt, axis=1) + FRICTION_VREG
        ft = -FRICTION_MU * N[:, None] * vt / vt_mag[:, None]
        f = N[:, None] * n + ft                           # (5, 3) on object
        torque = jnp.sum(jnp.cross(rc, f), axis=0)
        return jnp.sum(f, axis=0), torque

    def _palm_contact(self, obj_pos, obj_vel, obj_omg, palm, up):
        palm = jnp.asarray(palm)
        gap = up * (obj_pos[2] - palm[2]) - OBJ_RADIUS
        inside = jnp.logical_and(
            jnp.abs(obj_pos[0] - palm[0]) < PALM_HALF + OBJ_RADIUS,
            jnp.abs(obj_pos[1] - palm[1]) < PALM_HALF + OBJ_RADIUS)
        pen = jnp.maximum(-gap, 0.0) * inside
        n = jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.asarray(up)])
        rc = -OBJ_RADIUS * n
        v_c = obj_vel + jnp.cross(obj_omg, rc)
        vn = jnp.sum(v_c * n)
        N = CONTACT_K * pen + CONTACT_D * jnp.maximum(-vn, 0.0) * (pen > 0)
        vt = v_c - vn * n
        ft = -FRICTION_MU * N * vt / (jnp.linalg.norm(vt) + FRICTION_VREG)
        f = N * n + ft
        return f, jnp.cross(rc, f)

    def _sphere_contact(self, p0, v0, p1, v1):
        """Penalty force on object 0 from object 1 (TwoCatch collisions).

        Deliberately frictionless and torque-free, unlike tip/palm contacts
        (regularized Coulomb): the two flying objects touch only in brief
        mid-air bounces where the normal impulse dominates; tangential
        coupling there is negligible for task dynamics."""
        d = p0 - p1
        dist = jnp.linalg.norm(d) + 1e-8
        n = d / dist
        pen = jnp.maximum(2 * OBJ_RADIUS - dist, 0.0)
        vn = jnp.sum((v0 - v1) * n)
        N = CONTACT_K * pen + CONTACT_D * jnp.maximum(-vn, 0.0) * (pen > 0)
        return N * n

    # ---------------------------------------------------------- observation
    def _timestep(self, state, reward, done, bad, success) -> TimeStep:
        theta_dot = jnp.clip(
            SERVO_GAIN * (state.theta_t - state.theta), -JOINT_VMAX, JOINT_VMAX)
        p0, f0, u0 = self._hand(state, 0)
        p1, f1, u1 = self._hand(state, 1)
        tips0 = _fingertips(state.theta[0], p0, f0, u0).reshape(-1)
        tips1 = _fingertips(state.theta[1], p1, f1, u1).reshape(-1)
        obj = jnp.concatenate(
            [state.obj_pos, state.obj_quat, state.obj_vel, state.obj_omg],
            axis=1).reshape(-1)
        goal = jnp.concatenate([state.goal_pos, state.goal_quat],
                               axis=1).reshape(-1)
        rel = (state.goal_pos - state.obj_pos).reshape(-1)
        obs0 = jnp.concatenate(
            [state.theta[0], theta_dot[0], tips0, obj, goal, rel])
        obs1 = jnp.concatenate(
            [state.theta[1], theta_dot[1], tips1, obj, goal, rel])
        share = jnp.concatenate(
            [state.theta.reshape(-1), theta_dot.reshape(-1), tips0, tips1,
             obj, goal, rel])
        return TimeStep(
            obs=jnp.stack([obs0, obs1]).astype(jnp.float32),
            share_obs=share.astype(jnp.float32),
            rewards=jnp.broadcast_to(reward, (2, 1)).astype(jnp.float32),
            dones=jnp.broadcast_to(done, (2,)),
            bad_transition=bad,
            available_actions=None,
            metrics={"won": success.astype(jnp.float32)},
        )


def make_handover(env_args: dict) -> ShadowHandOver:
    task = env_args.get("task", "ShadowHandOver")
    if task not in _TASKS:
        raise NotImplementedError(
            f"dexhands_jax task {task!r}: available tasks are {DEXHANDS_TASKS}")
    return ShadowHandOver(
        task=task,
        episode_length=env_args.get("hands_episode_length",
                                    env_args.get("episode_limit", 75)),
        vel_pen_coef=float(env_args.get("vel_pen_coef", 0.0)),
        vel_pen_width=float(env_args.get("vel_pen_width", 20.0)))
