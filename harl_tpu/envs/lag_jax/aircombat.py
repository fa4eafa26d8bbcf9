"""Pure-JAX multi-aircraft air combat: the TPU-native LAG/CloseAirCombat analogue.

Reference counterpart: ``harl/envs/lag/lag_env.py`` + the vendored JSBSim
wrapper (``harl/envs/lag/JSBSim/``) — HARL trains MultipleCombat scenarios
(e.g. 2v2 NoWeapon) where each agent flies one aircraft with MultiDiscrete
controls and rewards come from posture (orientation/range advantage) plugin
classes (``JSBSim/reward_functions/postural_reward.py``).

This is a from-scratch re-design, not a JSBSim port: the 6-DoF JSBSim
airframe is replaced by the classic 3-DoF point-mass flight model

    v̇ = (T·thr − k_d v²)/m − g sin γ        (thrust / drag / gravity)
    γ → first-order toward commanded climb angle (rate-limited)
    ψ̇ = turn command · min(1, v_ref/v)       (load-factor-limited turn)
    ẋ, ẏ, ż = v·(cos γ cos ψ, cos γ sin ψ, sin γ)

batched under vmap+jit like every other pure-JAX env here. Preserved contract:

  * N agents (allies) vs E scripted enemies (pure-pursuit AI), default 2v2;
  * MultiDiscrete([turn_bins, climb_bins, throttle_bins]) actions — the
    reference's binned stick/throttle control discretization;
  * posture shaping reward (aspect-angle × range advantage) + event rewards
    (enemy down / ally down) + win bonus, shared team reward (EP state);
  * aircraft die in the gun envelope (range + aspect angle, sustained) or on
    altitude violation; episode ends on team elimination or truncation at
    ``episode_limit`` (⇒ ``bad_transition``), win metric emitted like the
    SMAC loggers' win rate.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import TimeStep
from harl_tpu.utils import spaces

DT = 0.2                      # s per control step
G = 9.81
MASS = 9000.0                 # kg
T_MAX = 160000.0              # N max thrust
K_DRAG = 2.2                  # N/(m/s)^2
V_MIN, V_MAX = 60.0, 340.0    # m/s
V_REF = 200.0                 # turn-rate reference speed
TURN_MAX = 0.35               # rad/s at V_REF
GAMMA_MAX = 0.5               # rad max climb angle
GAMMA_RATE = 0.3              # rad/s toward command
ALT_MIN, ALT_MAX = 100.0, 12000.0
GUN_RANGE = 1000.0            # m
GUN_AO = 0.35                 # rad (~20 deg)
GUN_DPS = 1.0                 # health/s in envelope (~1s sustained kill)
TURN_BINS, CLIMB_BINS, THR_BINS = 11, 11, 10


class AirCombatState(NamedTuple):
    pos: jnp.ndarray      # (A, 3) all aircraft, allies first
    v: jnp.ndarray        # (A,)
    psi: jnp.ndarray      # (A,) heading
    gamma: jnp.ndarray    # (A,) climb angle
    health: jnp.ndarray   # (A,)
    alive: jnp.ndarray    # (A,) bool
    t: jnp.ndarray        # () int32


@dataclasses.dataclass(frozen=True)
class AirCombat:
    """n_allies agents vs n_enemies scripted aircraft."""

    n_allies: int = 2
    n_enemies: int = 2
    episode_limit: int = 500
    enemy_skill: float = 0.5   # scripted-AI turn-rate handicap (0..1)
    metric_keys = ("won",)

    @property
    def n_agents(self) -> int:
        return self.n_allies

    @property
    def A(self) -> int:
        return self.n_allies + self.n_enemies

    @property
    def obs_dim(self) -> int:
        own = 7
        mate = 6 * (self.n_allies - 1)
        foe = 9 * self.n_enemies
        return own + mate + foe

    @property
    def state_dim(self) -> int:
        return 7 * self.A

    @property
    def observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.obs_dim)] * self.n_allies

    @property
    def share_observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.state_dim)] * self.n_allies

    @property
    def action_space(self):
        return [spaces.MultiDiscrete((TURN_BINS, CLIMB_BINS, THR_BINS))
                ] * self.n_allies

    # ------------------------------------------------------------------ api
    def reset(self, key) -> Tuple[AirCombatState, TimeStep]:
        ka, ke, kv = jax.random.split(key, 3)
        A = self.A
        # allies head east at west side; enemies head west at east side
        ax = -5000.0 + 500.0 * jax.random.normal(ka, (self.n_allies,))
        ay = jnp.linspace(-1000.0, 1000.0, self.n_allies)
        ex = 5000.0 + 500.0 * jax.random.normal(ke, (self.n_enemies,))
        ey = jnp.linspace(-1000.0, 1000.0, self.n_enemies)
        pos = jnp.zeros((A, 3))
        pos = pos.at[: self.n_allies, 0].set(ax)
        pos = pos.at[: self.n_allies, 1].set(ay)
        pos = pos.at[self.n_allies:, 0].set(ex)
        pos = pos.at[self.n_allies:, 1].set(ey)
        pos = pos.at[:, 2].set(
            5000.0 + 300.0 * jax.random.normal(kv, (A,)))
        psi = jnp.concatenate(
            [jnp.zeros(self.n_allies), jnp.full(self.n_enemies, np.pi)])
        state = AirCombatState(
            pos=pos, v=jnp.full(A, 220.0), psi=psi, gamma=jnp.zeros(A),
            health=jnp.ones(A), alive=jnp.ones(A, bool),
            t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool), jnp.zeros(()))

    def step(self, state: AirCombatState, actions, key):
        del key
        acts = jnp.asarray(actions).reshape(self.n_allies, 3)
        turn_a = (acts[:, 0] / (TURN_BINS - 1) * 2.0 - 1.0) * TURN_MAX
        gam_a = (acts[:, 1] / (CLIMB_BINS - 1) * 2.0 - 1.0) * GAMMA_MAX
        thr_a = acts[:, 2] / (THR_BINS - 1)
        turn_e, gam_e, thr_e = self._enemy_ai(state)
        turn = jnp.concatenate([turn_a, turn_e])
        gam_cmd = jnp.concatenate([gam_a, gam_e])
        thr = jnp.concatenate([thr_a, thr_e])

        # --- point-mass dynamics -----------------------------------------
        alive_f = state.alive.astype(jnp.float32)
        v = state.v
        vdot = (T_MAX * thr - K_DRAG * v * v) / MASS - G * jnp.sin(state.gamma)
        v_new = jnp.clip(v + DT * vdot, V_MIN, V_MAX)
        gamma_new = state.gamma + jnp.clip(
            gam_cmd - state.gamma, -GAMMA_RATE * DT, GAMMA_RATE * DT)
        psi_new = state.psi + DT * turn * jnp.minimum(1.0, V_REF / v_new)
        dirv = jnp.stack(
            [jnp.cos(gamma_new) * jnp.cos(psi_new),
             jnp.cos(gamma_new) * jnp.sin(psi_new),
             jnp.sin(gamma_new)], axis=1)
        pos_new = state.pos + DT * (v_new * alive_f)[:, None] * dirv

        # --- gun engagements ---------------------------------------------
        # pairwise: shooter i, target j on opposite teams
        rel = pos_new[None, :, :] - pos_new[:, None, :]       # (A, A, 3)
        rng = jnp.linalg.norm(rel, axis=-1) + 1e-6
        # aspect angle of target j from shooter i's velocity direction
        ao = jnp.arccos(jnp.clip(
            jnp.einsum("ijc,ic->ij", rel, dirv) / rng, -1.0, 1.0))
        team = jnp.concatenate(
            [jnp.zeros(self.n_allies), jnp.ones(self.n_enemies)])
        hostile = (team[:, None] != team[None, :]).astype(jnp.float32)
        both_alive = alive_f[:, None] * alive_f[None, :]
        in_env = ((rng < GUN_RANGE) & (ao < GUN_AO)).astype(jnp.float32)
        dmg = GUN_DPS * DT * jnp.sum(in_env * hostile * both_alive, axis=0)
        health_new = jnp.clip(state.health - dmg, 0.0, 1.0)
        alt_ok = (pos_new[:, 2] > ALT_MIN) & (pos_new[:, 2] < ALT_MAX)
        alive_new = state.alive & (health_new > 0.0) & alt_ok

        # --- reward (posture shaping + events, JSBSim postural_reward) ---
        ally = slice(0, self.n_allies)
        foe = slice(self.n_allies, self.A)
        adv = (1.0 - ao[ally, foe] / np.pi) * jnp.exp(-rng[ally, foe] / 3000.0)
        adv = adv * both_alive[ally, foe]
        posture = jnp.sum(adv) / max(self.n_allies, 1)
        foes_downed = jnp.sum(
            state.alive[foe] & ~alive_new[foe]).astype(jnp.float32)
        allies_downed = jnp.sum(
            state.alive[ally] & ~alive_new[ally]).astype(jnp.float32)
        win = ~jnp.any(alive_new[foe])
        lose = ~jnp.any(alive_new[ally])
        reward = (1.0 * posture + 20.0 * foes_downed - 20.0 * allies_downed
                  + 200.0 * win.astype(jnp.float32))

        new_t = state.t + 1
        trunc = new_t >= self.episode_limit
        done = jnp.logical_or(jnp.logical_or(win, lose), trunc)
        bad = jnp.logical_and(trunc, ~jnp.logical_or(win, lose))
        new_state = AirCombatState(
            pos=pos_new, v=v_new, psi=psi_new, gamma=gamma_new,
            health=health_new, alive=alive_new, t=new_t)
        return new_state, self._timestep(
            new_state, reward, done, bad, win.astype(jnp.float32))

    # -------------------------------------------------------- enemy pilot
    def _enemy_ai(self, state: AirCombatState):
        """Pure pursuit of the nearest living ally + altitude matching."""
        epos = state.pos[self.n_allies:]
        apos = state.pos[: self.n_allies]
        a_alive = state.alive[: self.n_allies].astype(jnp.float32)
        rel = apos[None, :, :] - epos[:, None, :]             # (E, N, 3)
        rng = jnp.linalg.norm(rel, axis=-1) + 1e-6
        rng_masked = jnp.where(a_alive[None, :] > 0, rng, 1e9)
        tgt = jnp.argmin(rng_masked, axis=1)                  # (E,)
        tvec = jnp.take_along_axis(rel, tgt[:, None, None], axis=1)[:, 0, :]
        brg = jnp.arctan2(tvec[:, 1], tvec[:, 0])
        epsi = state.psi[self.n_allies:]
        dpsi = jnp.arctan2(jnp.sin(brg - epsi), jnp.cos(brg - epsi))
        max_turn = self.enemy_skill * TURN_MAX
        turn = jnp.clip(dpsi / DT, -max_turn, max_turn)
        dz = tvec[:, 2]
        gam = jnp.clip(jnp.arctan2(dz, jnp.linalg.norm(tvec[:, :2], axis=1)),
                       -GAMMA_MAX, GAMMA_MAX)
        thr = jnp.ones(self.n_enemies) * 0.9
        return turn, gam, thr

    # ---------------------------------------------------------- observation
    def _timestep(self, state, reward, done, bad, won) -> TimeStep:
        N, A = self.n_allies, self.A
        alive_f = state.alive.astype(jnp.float32)
        own = jnp.stack(
            [state.pos[:, 2] / 5000.0, state.v / V_MAX,
             jnp.sin(state.psi), jnp.cos(state.psi), state.gamma,
             state.health, alive_f], axis=1)                  # (A, 7)
        share = own.reshape(-1)

        rel = state.pos[None, :, :] - state.pos[:, None, :]   # (A, A, 3)
        rng = jnp.linalg.norm(rel, axis=-1) + 1e-6
        brg = jnp.arctan2(rel[..., 1], rel[..., 0])
        obs_rows = []
        for i in range(N):
            row = [own[i]]
            for j in range(N):
                if j == i:
                    continue
                row.append(jnp.concatenate(
                    [rel[i, j] / 5000.0,
                     jnp.stack([jnp.sin(state.psi[j]), jnp.cos(state.psi[j]),
                                state.v[j] / V_MAX])]) * alive_f[j])
            for j in range(N, A):
                ao_ij = brg[i, j] - state.psi[i]
                row.append(jnp.concatenate(
                    [rel[i, j] / 5000.0,
                     jnp.stack([rng[i, j] / 5000.0,
                                jnp.sin(ao_ij), jnp.cos(ao_ij),
                                state.v[j] / V_MAX, state.health[j],
                                alive_f[j]])]) * alive_f[j])
            obs_rows.append(jnp.concatenate(row))
        obs = jnp.stack(obs_rows)
        # dead allies are masked out (active-mask path); whole-team dones only
        dones = jnp.broadcast_to(done, (N,)) | ~state.alive[:N]
        return TimeStep(
            obs=obs.astype(jnp.float32),
            share_obs=share.astype(jnp.float32),
            rewards=jnp.broadcast_to(reward, (N, 1)).astype(jnp.float32),
            dones=dones,
            bad_transition=bad,
            available_actions=None,
            metrics={"won": won},
        )


def make_aircombat(env_args: dict) -> AirCombat:
    scenario = env_args.get("scenario", "2v2")
    if "v" in scenario:
        n_allies, n_enemies = (int(x) for x in scenario.split("/")[-1].split("v"))
    else:
        n_allies, n_enemies = 2, 2
    return AirCombat(
        n_allies=n_allies, n_enemies=n_enemies,
        episode_limit=env_args.get("episode_limit", 500),
        enemy_skill=env_args.get("enemy_skill", 0.5))
