"""Pure-JAX academy soccer: the TPU-native Google Research Football analogue.

Reference counterpart: ``harl/envs/football/football_env.py`` — HARL trains
GRF *academy* scenarios (3_vs_1_with_keeper, pass_and_shoot, counterattack…)
with the Discrete(19) GRF action set and ``scoring,checkpoints`` rewards,
logging score rate (``football_logger.py``).

The gfootball C++ engine is replaced by a from-scratch 2D soccer model in GRF
field coordinates (x ∈ [-1,1], y ∈ [-0.42,0.42], right goal at x=+1,
|y| < 0.044): point-mass players with speed caps, a ball with ground friction
that is either loose (free physics) or possessed (follows the carrier),
kicks/passes/shots from the GRF action ids, possession steals by proximity,
and scripted defenders (ball-chasing) + a goal-line-tracking keeper.
Everything is batched under vmap+jit like the other pure-JAX envs.

Preserved contract:
  * left-team agents with Discrete(19) actions (GRF ids: idle, 8 move
    directions, long/high/short pass, shot, sprint, release-direction,
    release-sprint, sliding, dribble, release-dribble — movement-irrelevant
    ids are no-ops here);
  * team reward: +1 on scoring (episode ends, ``"score"`` → win metric) plus
    GRF ``checkpoints`` shaping (+0.1 the first time the ball enters each of
    10 goal-distance rings while possessed by the team);
  * episode ends on goal / possession lost+cleared / ball out / timeout
    (timeout ⇒ ``bad_transition``);
  * share_obs is a Simple115-style global state (all positions, velocities,
    ball, possession flags) as built by the reference adapter
    (football_env.py:81-130).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import TimeStep
from harl_tpu.utils import spaces

DT = 0.1
PLAYER_SPEED = 0.012       # field units / step (GRF-ish pace)
SPRINT_MULT = 1.5
BALL_FRICTION = 0.95
POSSESS_RADIUS = 0.02
STEAL_RADIUS = 0.015
SHOT_POWER = 0.06
LONG_PASS_POWER = 0.045
SHORT_PASS_POWER = 0.03
GOAL_X, GOAL_HALF_W = 1.0, 0.044
FIELD_Y = 0.42

# GRF action ids
IDLE = 0
MOVE0 = 1                   # 1..8: L, TL, T, TR, R, BR, B, BL
LONG_PASS, HIGH_PASS, SHORT_PASS, SHOT = 9, 10, 11, 12
SPRINT, REL_DIR, REL_SPRINT, SLIDE, DRIBBLE, REL_DRIBBLE = 13, 14, 15, 16, 17, 18
N_ACTIONS = 19

_DIRS = np.array([
    [-1, 0], [-1, 1], [0, 1], [1, 1], [1, 0], [1, -1], [0, -1], [-1, -1]
], dtype=np.float64)
_DIRS = _DIRS / np.linalg.norm(_DIRS, axis=1, keepdims=True)


class SoccerState(NamedTuple):
    left_pos: jnp.ndarray    # (N, 2) agents
    left_vel: jnp.ndarray
    right_pos: jnp.ndarray   # (M, 2) scripted defenders; last is the keeper
    right_vel: jnp.ndarray
    ball_pos: jnp.ndarray    # (2,)
    ball_vel: jnp.ndarray
    owner: jnp.ndarray       # () int32: 0 none/loose, 1 left, 2 right
    carrier: jnp.ndarray     # () int32 index within owning team
    checkpoints: jnp.ndarray  # (10,) bool — collected shaping rings
    sprint: jnp.ndarray      # (N,) bool
    t: jnp.ndarray           # () int32


SCENARIOS = {
    # name: (n_agents, n_defenders incl. keeper, attacker spawn x, chase,
    #        outfield-defender spawn x, defender y half-spread)
    # chase is the outfield-defender speed multiplier (0 → "lazy" statues,
    # the gfootball 11_vs_11 single_goal_versus_lazy setup).
    # The original scenarios keep their validated (0.75, ±0.05) defender
    # spawn; scenarios added later use the deeper/wider line they were
    # validated with.
    "academy_3_vs_1_with_keeper": (3, 2, 0.45, 1.05, 0.75, 0.05),
    "academy_pass_and_shoot_with_keeper": (2, 2, 0.45, 1.05, 0.75, 0.05),
    "academy_run_pass_and_shoot_with_keeper": (2, 2, 0.45, 1.05, 0.75, 0.05),
    "academy_counterattack_easy": (4, 2, 0.45, 1.05, 0.75, 0.05),
    "academy_counterattack_hard": (4, 3, 0.45, 1.05, 0.875, 0.15),
    "academy_corner": (4, 3, 0.45, 1.05, 0.75, 0.05),
    "academy_run_to_score_with_keeper": (1, 1, -0.3, 1.05, 0.9, 0.15),
    "academy_single_goal_versus_lazy": (10, 11, 0.0, 0.0, 0.65, 0.15),
}


@dataclasses.dataclass(frozen=True)
class AcademySoccer:
    n_agents: int = 3
    n_defenders: int = 2          # scripted, last one is the keeper
    episode_limit: int = 400
    rewards: str = "scoring,checkpoints"
    representation: str = "simple"   # "simple" (vector) | "pixels" (SMM-style)
    spawn_x: float = 0.45            # attacker spawn line
    chase: float = 1.05              # outfield-defender speed multiplier
    def_spawn_x: float = 0.75        # outfield-defender spawn line
    def_spread: float = 0.05         # outfield-defender y half-spread
    metric_keys = ("won",)

    # super-minimap raster (the gfootball pixel path, football_env.py:34-35,
    # 132-154): channels = [teammates, opponents, ball, self]
    SMM_H = 24
    SMM_W = 32

    @property
    def obs_dim(self) -> int:
        # own pos/vel/sprint + teammates pos/vel + defenders pos/vel +
        # ball pos/vel + possession one-hot(3) + carrier-is-me
        return 5 + 4 * (self.n_agents - 1) + 4 * self.n_defenders + 4 + 3 + 1

    @property
    def state_dim(self) -> int:
        return 4 * self.n_agents + 4 * self.n_defenders + 4 + 3

    @property
    def observation_space(self):
        if self.representation == "pixels":
            return [spaces.ImageBox(self.SMM_H, self.SMM_W, 4)] * self.n_agents
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.obs_dim)] * self.n_agents

    @property
    def share_observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.state_dim)] * self.n_agents

    @property
    def action_space(self):
        return [spaces.Discrete(N_ACTIONS)] * self.n_agents

    # ------------------------------------------------------------------ api
    def reset(self, key) -> Tuple[SoccerState, TimeStep]:
        N, M = self.n_agents, self.n_defenders
        k1, k2, k3 = jax.random.split(key, 3)
        lx = self.spawn_x + 0.05 * jax.random.normal(k1, (N,))
        ly = jnp.linspace(-0.15, 0.15, N) + 0.02 * jax.random.normal(k2, (N,))
        left = jnp.stack([lx, ly], axis=1)
        # outfield defenders spawn between the attackers and the goal
        dx = (self.def_spawn_x + 0.03 * jax.random.normal(k3, (M - 1,))
              if M > 1 else jnp.zeros((0,)))
        dy = jnp.linspace(-self.def_spread, self.def_spread,
                          max(M - 1, 1))[: M - 1]
        defs = jnp.stack([dx, dy], axis=1) if M > 1 else jnp.zeros((0, 2))
        keeper = jnp.array([[0.99, 0.0]])
        right = jnp.concatenate([defs, keeper], axis=0)
        state = SoccerState(
            left_pos=left, left_vel=jnp.zeros((N, 2)),
            right_pos=right, right_vel=jnp.zeros((M, 2)),
            ball_pos=left[0] + jnp.array([0.01, 0.0]),
            ball_vel=jnp.zeros(2),
            owner=jnp.asarray(1, jnp.int32), carrier=jnp.asarray(0, jnp.int32),
            checkpoints=jnp.zeros(10, bool),
            sprint=jnp.zeros(N, bool),
            t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool), jnp.zeros(()))

    def step(self, state: SoccerState, actions, key):
        N, M = self.n_agents, self.n_defenders
        acts = jnp.asarray(actions).reshape(N).astype(jnp.int32)

        # ---- movement ----------------------------------------------------
        move_idx = jnp.clip(acts - MOVE0, 0, 7)
        moving = (acts >= MOVE0) & (acts <= MOVE0 + 7)
        sprint = jnp.where(acts == SPRINT, True,
                           jnp.where(acts == REL_SPRINT, False, state.sprint))
        dirs = jnp.asarray(_DIRS)[move_idx] * moving[:, None]
        speed = PLAYER_SPEED * jnp.where(sprint, SPRINT_MULT, 1.0)[:, None]
        # keep previous direction when not issuing a move (GRF sticky dirs)
        vel = jnp.where(moving[:, None], dirs * speed,
                        state.left_vel * 0.9)
        left_pos = state.left_pos + vel
        left_pos = jnp.stack(
            [jnp.clip(left_pos[:, 0], -1.0, 1.0),
             jnp.clip(left_pos[:, 1], -FIELD_Y, FIELD_Y)], axis=1)

        # ---- scripted defense -------------------------------------------
        ball = state.ball_pos
        chase = ball[None, :] - state.right_pos[: M - 1]
        chase = chase / (jnp.linalg.norm(chase, axis=1, keepdims=True) + 1e-8)
        dvel = chase * PLAYER_SPEED * self.chase
        keeper_y = jnp.clip(ball[1], -GOAL_HALF_W, GOAL_HALF_W)
        kvel = jnp.stack([jnp.zeros(()), jnp.clip(
            keeper_y - state.right_pos[-1, 1], -PLAYER_SPEED, PLAYER_SPEED)])
        right_vel = jnp.concatenate([dvel, kvel[None, :]], axis=0)
        right_pos = state.right_pos + right_vel

        # ---- ball: kicks by the carrier ---------------------------------
        owner, carrier = state.owner, state.carrier
        carrier_pos = jnp.where(owner == 1, left_pos[carrier], ball)
        goal = jnp.array([GOAL_X, 0.0])
        to_goal = goal - carrier_pos
        to_goal = to_goal / (jnp.linalg.norm(to_goal) + 1e-8)
        # nearest teammate of the carrier (for passes)
        dmat = jnp.linalg.norm(left_pos - carrier_pos[None, :], axis=1)
        dmat = dmat.at[carrier].set(1e9)
        mate = jnp.argmin(dmat)
        to_mate = left_pos[mate] - carrier_pos
        to_mate = to_mate / (jnp.linalg.norm(to_mate) + 1e-8)
        act_c = acts[carrier]
        is_shot = (act_c == SHOT) & (owner == 1)
        is_long = ((act_c == LONG_PASS) | (act_c == HIGH_PASS)) & (owner == 1)
        is_short = (act_c == SHORT_PASS) & (owner == 1)
        kicked = is_shot | is_long | is_short
        kick_vel = jnp.where(
            is_shot, SHOT_POWER * to_goal,
            jnp.where(is_long, LONG_PASS_POWER * to_mate,
                      SHORT_PASS_POWER * to_mate))

        # ball physics: follows carrier unless loose or just kicked
        loose_vel = state.ball_vel * BALL_FRICTION
        ball_vel = jnp.where(kicked, kick_vel,
                             jnp.where(owner == 0, loose_vel, jnp.zeros(2)))
        ball_pos = jnp.where(
            kicked | (owner == 0), ball + ball_vel,
            jnp.where(owner == 1, left_pos[carrier] + 0.01 * to_goal,
                      right_pos[jnp.minimum(carrier, M - 1)]))
        owner = jnp.where(kicked, 0, owner)

        # ---- possession changes -----------------------------------------
        dl = jnp.linalg.norm(left_pos - ball_pos[None, :], axis=1)
        dr = jnp.linalg.norm(right_pos - ball_pos[None, :], axis=1)
        near_l, near_r = jnp.min(dl), jnp.min(dr)
        take_l = (owner == 0) & (near_l < POSSESS_RADIUS) & (near_l <= near_r)
        take_r = (owner == 0) & (near_r < POSSESS_RADIUS) & (near_r < near_l)
        steal_r = (owner == 1) & (near_r < STEAL_RADIUS)
        # keeper save: a loose ball whose path segment passes close to the
        # keeper is caught even at shot speed (no tunnelling through the box)
        seg = ball_pos - ball
        seg_len2 = jnp.sum(seg * seg) + 1e-12
        tproj = jnp.clip(jnp.dot(right_pos[-1] - ball, seg) / seg_len2, 0.0, 1.0)
        closest = ball + tproj * seg
        keeper_save = (owner == 0) & (
            jnp.linalg.norm(right_pos[-1] - closest) < 0.025)
        new_owner = jnp.where(take_l, 1,
                              jnp.where(take_r | steal_r | keeper_save, 2, owner))
        new_carrier = jnp.where(new_owner == 1, jnp.argmin(dl),
                                jnp.where(new_owner == 2, jnp.argmin(dr),
                                          carrier)).astype(jnp.int32)

        # ---- scoring / termination --------------------------------------
        goal_scored = (ball_pos[0] >= GOAL_X) & (jnp.abs(ball_pos[1]) < GOAL_HALF_W)
        out = ((jnp.abs(ball_pos[1]) > FIELD_Y) | (ball_pos[0] <= -1.0)
               | ((ball_pos[0] >= GOAL_X) & ~goal_scored))
        lost = (new_owner == 2)
        new_t = state.t + 1
        trunc = new_t >= self.episode_limit
        done = goal_scored | out | lost | trunc
        bad = trunc & ~(goal_scored | out | lost)

        # ---- reward: scoring + checkpoints ------------------------------
        reward = goal_scored.astype(jnp.float32)
        checkpoints = state.checkpoints
        if "checkpoints" in self.rewards:
            d_goal = jnp.linalg.norm(ball_pos - goal)
            # 10 rings at distances 1.0 … 0.1 (GRF checkpoint shaping)
            ring = jnp.clip((10.0 * (1.0 - d_goal)).astype(jnp.int32), 0, 9)
            reach = (jnp.arange(10) <= ring) & (new_owner == 1)
            fresh = reach & ~checkpoints
            reward = reward + 0.1 * jnp.sum(fresh.astype(jnp.float32))
            # on a goal, GRF grants all remaining checkpoints
            reward = reward + 0.1 * jnp.where(
                goal_scored, jnp.sum((~(checkpoints | fresh)).astype(jnp.float32)), 0.0)
            checkpoints = checkpoints | fresh

        new_state = SoccerState(
            left_pos=left_pos, left_vel=vel, right_pos=right_pos,
            right_vel=right_vel, ball_pos=ball_pos, ball_vel=ball_vel,
            owner=new_owner.astype(jnp.int32), carrier=new_carrier,
            checkpoints=checkpoints, sprint=sprint, t=new_t)
        return new_state, self._timestep(
            new_state, reward, done, bad, goal_scored.astype(jnp.float32))

    # ---------------------------------------------------------- observation
    def _pixel_obs(self, state) -> jnp.ndarray:
        """(N, H, W, 4) super-minimap rasters: [teammates, opponents, ball,
        self] painted at 255 — the gfootball 'extracted' SMM convention."""
        H, W = self.SMM_H, self.SMM_W

        def to_idx(pos):  # pitch x∈[-1.05,1.05], y∈[-0.45,0.45] → (row, col)
            col = jnp.clip(((pos[..., 0] + 1.05) / 2.1 * (W - 1)).astype(jnp.int32), 0, W - 1)
            row = jnp.clip(((pos[..., 1] + 0.45) / 0.9 * (H - 1)).astype(jnp.int32), 0, H - 1)
            return row, col

        lr, lc = to_idx(state.left_pos)
        rr, rc = to_idx(state.right_pos)
        br, bc = to_idx(state.ball_pos)
        team = jnp.zeros((H, W)).at[lr, lc].set(255.0)
        opp = jnp.zeros((H, W)).at[rr, rc].set(255.0)
        ball = jnp.zeros((H, W)).at[br, bc].set(255.0)
        rows = []
        for i in range(self.n_agents):
            me = jnp.zeros((H, W)).at[lr[i], lc[i]].set(255.0)
            rows.append(jnp.stack([team, opp, ball, me], axis=-1))
        return jnp.stack(rows)

    def _timestep(self, state, reward, done, bad, scored) -> TimeStep:
        N = self.n_agents
        own_flags = jax.nn.one_hot(state.owner, 3)
        share = jnp.concatenate(
            [state.left_pos.reshape(-1), state.left_vel.reshape(-1),
             state.right_pos.reshape(-1), state.right_vel.reshape(-1),
             state.ball_pos, state.ball_vel, own_flags])
        rows = []
        for i in range(N):
            parts = [state.left_pos[i], state.left_vel[i],
                     state.sprint[i].astype(jnp.float32)[None]]
            for j in range(N):
                if j != i:
                    parts += [state.left_pos[j] - state.left_pos[i],
                              state.left_vel[j]]
            for j in range(self.n_defenders):
                parts += [state.right_pos[j] - state.left_pos[i],
                          state.right_vel[j]]
            parts += [state.ball_pos - state.left_pos[i], state.ball_vel,
                      own_flags,
                      ((state.owner == 1) & (state.carrier == i)
                       ).astype(jnp.float32)[None]]
            rows.append(jnp.concatenate(parts))
        obs = jnp.stack(rows)
        if self.representation == "pixels":
            obs = self._pixel_obs(state)
        return TimeStep(
            obs=obs.astype(jnp.float32),
            share_obs=share.astype(jnp.float32),
            rewards=jnp.broadcast_to(reward, (N, 1)).astype(jnp.float32),
            dones=jnp.broadcast_to(done, (N,)),
            bad_transition=bad,
            available_actions=jnp.ones((N, N_ACTIONS), jnp.float32),
            metrics={"won": scored},
        )


def make_soccer(env_args: dict) -> AcademySoccer:
    scenario = env_args.get("env_name",
                            env_args.get("scenario",
                                         "academy_3_vs_1_with_keeper"))
    if scenario not in SCENARIOS:
        raise ValueError(f"Unknown academy scenario {scenario!r}; "
                         f"available: {sorted(SCENARIOS)}")
    n_agents, n_defs, spawn_x, chase, def_x, def_spread = SCENARIOS[scenario]
    n_agents = env_args.get("num_agents", n_agents)
    return AcademySoccer(
        n_agents=n_agents, n_defenders=n_defs,
        episode_limit=env_args.get("episode_limit", 400),
        rewards=env_args.get("rewards", "scoring,checkpoints"),
        representation=env_args.get("representation", "simple"),
        spawn_x=spawn_x, chase=chase,
        def_spawn_x=def_x, def_spread=def_spread)
