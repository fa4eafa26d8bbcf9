"""SMACLite: pure-JAX StarCraft-style micromanagement environment.

A TPU-native cooperative combat benchmark with the full SMAC interface
contract of the reference's vendored fork (``harl/envs/smac/StarCraft2_Env.py``)
— without the StarCraft II binary/protobuf dependency, so thousands of
instances step in lockstep under ``vmap``+``jit``. Faithfully reproduced
surface semantics:

  * discrete actions {no-op, stop, move N/S/E/W, attack enemy j}
    with SMAC availability rules (StarCraft2_Env.py:2188-2240): dead agents
    get no-op only; attacks need a living target within shoot range;
  * per-agent observations structured like ``get_obs_agent``
    (StarCraft2_Env.py:1083): move feats, enemy feats (visible-gated
    [avail, dist, dx, dy, health]), ally feats, own feats;
  * EP global state (``get_state``, :1276) and FP agent-specific state
    (``get_state_agent``, :1613-1831 — here: EP state ⊕ own features ⊕
    one-hot agent id);
  * team reward shaped like ``reward_battle``: damage dealt + ``reward_death_value``
    per kill + ``reward_win``, optionally normalized by the max total;
  * dones[i] = battle over ∨ agent i dead (StarCraft2_Env.py:571-577);
    ``bad_transition`` at the episode limit; ``metrics["won"]``.

Enemies are controlled by a built-in attack-closest scripted AI (the SC2 bot's
role). Unit stats are marine-like; symmetric maps "Nm_vs_Nm" are parameterized
by army size.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from harl_tpu.envs.core import TimeStep
from harl_tpu.utils import spaces

# unit-type tables: marine-, marauder-, stalker-like (SMACv2 capability
# randomization analogue — unit types drawn per episode when
# ``randomize_types`` is on, smacv2_env.py / capability config)
N_TYPES = 3
TYPE_HEALTH = jnp.array([45.0, 125.0, 80.0])
TYPE_DAMAGE = jnp.array([6.0, 10.0, 13.0])
UNIT_HEALTH = 45.0    # marine default (fixed-type maps)
UNIT_DAMAGE = 6.0
MAX_HEALTH = 125.0
SHOOT_RANGE = 6.0
SIGHT_RANGE = 9.0
MOVE_AMOUNT = 2.0
ARENA = 16.0          # half-size of the square arena
REWARD_DEATH = 10.0
REWARD_WIN = 200.0

N_MOVE_ACTIONS = 6    # no-op, stop, N, S, E, W

_DIRS = jnp.array([[0.0, 1.0], [0.0, -1.0], [1.0, 0.0], [-1.0, 0.0]])


class SMACLiteState(NamedTuple):
    ally_pos: jnp.ndarray      # (A, 2)
    ally_health: jnp.ndarray   # (A,)
    enemy_pos: jnp.ndarray     # (E, 2)
    enemy_health: jnp.ndarray  # (E,)
    ally_type: jnp.ndarray     # (A,) int32 unit-type index
    enemy_type: jnp.ndarray    # (E,) int32
    t: jnp.ndarray             # () int32
    battle_over: jnp.ndarray   # () bool (set the step the battle ends)


@dataclasses.dataclass(frozen=True)
class SMACLite:
    n_allies: int = 5
    n_enemies: int = 5
    episode_limit: int = 100
    state_type: str = "EP"     # EP | FP (selects share/agent state exposure)
    reward_scale: bool = True
    randomize_types: bool = False  # SMACv2-style per-episode unit types
    metric_keys = ("won",)      # episode metrics emitted in TimeStep.metrics

    # ------------------------------------------------------------- metadata
    @property
    def n_agents(self) -> int:
        return self.n_allies

    @property
    def n_actions(self) -> int:
        return N_MOVE_ACTIONS + self.n_enemies

    @property
    def unit_feat(self) -> int:
        # [avail/visible, dist, dx, dy, health] (+ type one-hot when random)
        return 5 + (N_TYPES if self.randomize_types else 0)

    @property
    def obs_dim(self) -> int:
        own = 1 + (N_TYPES if self.randomize_types else 0)
        return 4 + self.n_enemies * self.unit_feat + (self.n_allies - 1) * self.unit_feat + own

    @property
    def state_dim(self) -> int:
        per_unit = 3 + (N_TYPES if self.randomize_types else 0)
        return self.n_allies * per_unit + self.n_enemies * per_unit

    @property
    def fp_state_dim(self) -> int:
        return self.state_dim + 3 + self.n_allies  # + own feats + one-hot id

    @property
    def observation_space(self):
        return [spaces.Box.create(-1.0, 1.0, self.obs_dim) for _ in range(self.n_allies)]

    @property
    def share_observation_space(self):
        d = self.fp_state_dim if self.state_type == "FP" else self.state_dim
        return [spaces.Box.create(-1.0, 1.0, d) for _ in range(self.n_allies)]

    @property
    def action_space(self):
        return [spaces.Discrete(self.n_actions) for _ in range(self.n_allies)]

    @property
    def max_reward(self) -> float:
        h = MAX_HEALTH if self.randomize_types else UNIT_HEALTH
        return self.n_enemies * (REWARD_DEATH + h) + REWARD_WIN

    # -------------------------------------------------------------- dynamics
    def reset(self, key) -> Tuple[SMACLiteState, TimeStep]:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        A, E = self.n_allies, self.n_enemies
        # two opposing clusters with jitter (SMAC-style spawn)
        ally_pos = jnp.stack(
            [jnp.full((A,), -ARENA / 2), jnp.linspace(-A, A, A)], axis=1
        ) + jax.random.uniform(k1, (A, 2), minval=-1.0, maxval=1.0)
        enemy_pos = jnp.stack(
            [jnp.full((E,), ARENA / 2), jnp.linspace(-E, E, E)], axis=1
        ) + jax.random.uniform(k2, (E, 2), minval=-1.0, maxval=1.0)
        if self.randomize_types:
            ally_type = jax.random.randint(k3, (A,), 0, N_TYPES)
            enemy_type = jax.random.randint(k4, (E,), 0, N_TYPES)
        else:
            ally_type = jnp.zeros((A,), jnp.int32)
            enemy_type = jnp.zeros((E,), jnp.int32)
        state = SMACLiteState(
            ally_pos=ally_pos,
            ally_health=TYPE_HEALTH[ally_type],
            enemy_pos=enemy_pos,
            enemy_health=TYPE_HEALTH[enemy_type],
            ally_type=ally_type,
            enemy_type=enemy_type,
            t=jnp.zeros((), jnp.int32),
            battle_over=jnp.zeros((), bool),
        )
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool), jnp.zeros((), bool))

    def step(self, state: SMACLiteState, actions, key) -> Tuple[SMACLiteState, TimeStep]:
        """actions: (A, 1) int32."""
        del key
        a = actions[..., 0].astype(jnp.int32)
        A, E = self.n_allies, self.n_enemies
        ally_alive = state.ally_health > 0
        enemy_alive = state.enemy_health > 0

        # --- ally movement ------------------------------------------------
        is_move = (a >= 2) & (a < 6) & ally_alive
        direction = _DIRS[jnp.clip(a - 2, 0, 3)]
        new_ally_pos = state.ally_pos + jnp.where(
            is_move[:, None], direction * MOVE_AMOUNT, 0.0
        )
        new_ally_pos = jnp.clip(new_ally_pos, -ARENA, ARENA)

        # --- ally attacks -------------------------------------------------
        tgt = jnp.clip(a - N_MOVE_ACTIONS, 0, E - 1)         # (A,)
        dist_ae = jnp.linalg.norm(
            new_ally_pos[:, None, :] - state.enemy_pos[None, :, :], axis=-1
        )  # (A, E)
        attack_ok = (
            (a >= N_MOVE_ACTIONS)
            & ally_alive
            & enemy_alive[tgt]
            & (jnp.take_along_axis(dist_ae, tgt[:, None], axis=1)[:, 0] <= SHOOT_RANGE)
        )
        dmg_to_enemy = jnp.zeros((E,)).at[tgt].add(
            jnp.where(attack_ok, TYPE_DAMAGE[state.ally_type], 0.0)
        )

        # --- enemy AI: move toward / attack closest living ally ------------
        big = 1e9
        dist_ea = dist_ae.T  # (E, A)
        dist_ea_masked = jnp.where(ally_alive[None, :], dist_ea, big)
        closest = jnp.argmin(dist_ea_masked, axis=1)          # (E,)
        closest_dist = jnp.min(dist_ea_masked, axis=1)
        any_ally = jnp.any(ally_alive)
        e_attacks = enemy_alive & (closest_dist <= SHOOT_RANGE) & any_ally
        e_moves = enemy_alive & (closest_dist > SHOOT_RANGE) & any_ally
        to_ally = new_ally_pos[closest] - state.enemy_pos
        norm = jnp.maximum(jnp.linalg.norm(to_ally, axis=-1, keepdims=True), 1e-6)
        new_enemy_pos = state.enemy_pos + jnp.where(
            e_moves[:, None], to_ally / norm * MOVE_AMOUNT, 0.0
        )
        dmg_to_ally = jnp.zeros((A,)).at[closest].add(
            jnp.where(e_attacks, TYPE_DAMAGE[state.enemy_type], 0.0)
        )

        # --- apply damage --------------------------------------------------
        new_ally_health = jnp.maximum(state.ally_health - dmg_to_ally, 0.0)
        new_enemy_health = jnp.maximum(state.enemy_health - dmg_to_enemy, 0.0)

        # --- reward (reward_battle-style) ----------------------------------
        dealt = jnp.sum(state.enemy_health - new_enemy_health)
        kills = jnp.sum((state.enemy_health > 0) & (new_enemy_health <= 0))
        all_enemies_dead = jnp.all(new_enemy_health <= 0)
        all_allies_dead = jnp.all(new_ally_health <= 0)
        won = all_enemies_dead
        reward = dealt + kills * REWARD_DEATH + jnp.where(won, REWARD_WIN, 0.0)
        if self.reward_scale:
            reward = reward / self.max_reward * 20.0  # SMAC reward_scale_rate

        new_t = state.t + 1
        time_up = new_t >= self.episode_limit
        terminated = all_enemies_dead | all_allies_dead
        done = terminated | time_up
        bad_transition = time_up & ~terminated

        new_state = SMACLiteState(
            ally_pos=new_ally_pos,
            ally_health=new_ally_health,
            enemy_pos=new_enemy_pos,
            enemy_health=new_enemy_health,
            ally_type=state.ally_type,
            enemy_type=state.enemy_type,
            t=new_t,
            battle_over=done,
        )
        return new_state, self._timestep(new_state, reward, done, bad_transition, won)

    # ---------------------------------------------------------- observation
    def _obs(self, state: SMACLiteState) -> jnp.ndarray:
        A, E = self.n_allies, self.n_enemies
        ally_alive = state.ally_health > 0
        enemy_alive = state.enemy_health > 0
        pos = state.ally_pos
        # move feats: all 4 moves available while alive (boundary-free arena)
        move_feats = jnp.tile(ally_alive[:, None].astype(jnp.float32), (1, 4))
        # enemy feats per agent
        delta_e = state.enemy_pos[None, :, :] - pos[:, None, :]     # (A,E,2)
        dist_e = jnp.linalg.norm(delta_e, axis=-1)
        visible_e = (dist_e <= SIGHT_RANGE) & enemy_alive[None, :] & ally_alive[:, None]
        shootable = (dist_e <= SHOOT_RANGE) & enemy_alive[None, :] & ally_alive[:, None]
        e_maxh = TYPE_HEALTH[state.enemy_type]
        ef_parts = [
            shootable.astype(jnp.float32),
            dist_e / SIGHT_RANGE,
            delta_e[..., 0] / SIGHT_RANGE,
            delta_e[..., 1] / SIGHT_RANGE,
            jnp.broadcast_to((state.enemy_health / e_maxh)[None, :], dist_e.shape),
        ]
        ef = jnp.stack(ef_parts, axis=-1)  # (A, E, 5)
        if self.randomize_types:
            e_oh = jnp.broadcast_to(
                jax.nn.one_hot(state.enemy_type, N_TYPES)[None], (A, E, N_TYPES)
            )
            ef = jnp.concatenate([ef, e_oh], axis=-1)
        ef = jnp.where(visible_e[..., None], ef, 0.0).reshape(A, E * self.unit_feat)
        # ally feats (excluding self)
        delta_a = pos[None, :, :] - pos[:, None, :]
        dist_a = jnp.linalg.norm(delta_a, axis=-1)
        visible_a = (dist_a <= SIGHT_RANGE) & ally_alive[None, :] & ally_alive[:, None]
        a_maxh = TYPE_HEALTH[state.ally_type]
        af_parts = [
            visible_a.astype(jnp.float32),
            dist_a / SIGHT_RANGE,
            delta_a[..., 0] / SIGHT_RANGE,
            delta_a[..., 1] / SIGHT_RANGE,
            jnp.broadcast_to((state.ally_health / a_maxh)[None, :], dist_a.shape),
        ]
        af = jnp.stack(af_parts, axis=-1)  # (A, A, 5)
        if self.randomize_types:
            a_oh = jnp.broadcast_to(
                jax.nn.one_hot(state.ally_type, N_TYPES)[None], (A, A, N_TYPES)
            )
            af = jnp.concatenate([af, a_oh], axis=-1)
        af = jnp.where(visible_a[..., None], af, 0.0)
        af = _drop_diag(af)  # remove each agent's self row → (A, (A−1)·uf)
        own = (state.ally_health / a_maxh)[:, None]
        if self.randomize_types:
            own = jnp.concatenate(
                [own, jax.nn.one_hot(state.ally_type, N_TYPES)], axis=-1
            )
        return jnp.concatenate([move_feats, ef, af, own], axis=-1)

    def _state(self, state: SMACLiteState) -> jnp.ndarray:
        a_parts = [
            (state.ally_health / TYPE_HEALTH[state.ally_type])[:, None],
            state.ally_pos / ARENA,
        ]
        e_parts = [
            (state.enemy_health / TYPE_HEALTH[state.enemy_type])[:, None],
            state.enemy_pos / ARENA,
        ]
        if self.randomize_types:
            a_parts.append(jax.nn.one_hot(state.ally_type, N_TYPES))
            e_parts.append(jax.nn.one_hot(state.enemy_type, N_TYPES))
        allies = jnp.concatenate(a_parts, axis=-1).reshape(-1)
        enemies = jnp.concatenate(e_parts, axis=-1).reshape(-1)
        return jnp.concatenate([allies, enemies])

    def _agent_state(self, state: SMACLiteState, ep_state) -> jnp.ndarray:
        """FP: EP state ⊕ own (health, x, y) ⊕ one-hot id, per agent."""
        A = self.n_allies
        own = jnp.concatenate(
            [(state.ally_health / UNIT_HEALTH)[:, None], state.ally_pos / ARENA],
            axis=-1,
        )
        ids = jnp.eye(A)
        base = jnp.broadcast_to(ep_state[None, :], (A, ep_state.shape[0]))
        return jnp.concatenate([base, own, ids], axis=-1)

    def _avail(self, state: SMACLiteState) -> jnp.ndarray:
        A, E = self.n_allies, self.n_enemies
        alive = state.ally_health > 0
        enemy_alive = state.enemy_health > 0
        dist_ae = jnp.linalg.norm(
            state.ally_pos[:, None, :] - state.enemy_pos[None, :, :], axis=-1
        )
        attack_avail = (
            (dist_ae <= SHOOT_RANGE) & enemy_alive[None, :] & alive[:, None]
        ).astype(jnp.float32)
        noop = (~alive).astype(jnp.float32)[:, None]
        stop = alive.astype(jnp.float32)[:, None]
        moves = jnp.tile(alive.astype(jnp.float32)[:, None], (1, 4))
        return jnp.concatenate([noop, stop, moves, attack_avail], axis=-1)

    def _timestep(self, state, reward, done, bad_transition, won) -> TimeStep:
        A = self.n_allies
        dead = state.ally_health <= 0
        dones = jnp.broadcast_to(done, (A,)) | dead  # StarCraft2_Env.py:571-577
        ep_state = self._state(state)
        return TimeStep(
            obs=self._obs(state),
            share_obs=ep_state,
            rewards=jnp.broadcast_to(reward, (A, 1)).astype(jnp.float32),
            dones=dones,
            bad_transition=bad_transition,
            available_actions=self._avail(state),
            agent_state=self._agent_state(state, ep_state)
            if self.state_type == "FP"
            else None,
            metrics={"won": won.astype(jnp.float32)},
        )


def _drop_diag(af: jnp.ndarray) -> jnp.ndarray:
    """(A, A, F) → (A, (A−1)·F) removing each agent's self row."""
    A, _, F = af.shape
    rows = []
    for i in range(A):
        others = [j for j in range(A) if j != i]
        rows.append(af[i, jnp.array(others)].reshape(-1))
    return jnp.stack(rows)


def make_smaclite(map_name: str = "5m_vs_5m", **kwargs) -> SMACLite:
    """Map names like '3m', '5m_vs_5m', '8m_vs_9m' set army sizes.

    SMACv2-style names ('protoss_5_vs_5', 'terran_10_vs_10', …) switch on
    per-episode unit-type randomization (the capability-config analogue)."""
    if any(map_name.startswith(race) for race in ("protoss", "terran", "zerg")):
        parts = map_name.split("_")
        n_allies = int(parts[1])
        n_enemies = int(parts[3]) if len(parts) > 3 else n_allies
        kwargs.setdefault("randomize_types", True)
        return SMACLite(n_allies=n_allies, n_enemies=n_enemies, **kwargs)
    name = map_name.replace("m", "").split("_vs_")
    if len(name) == 2:
        n_allies, n_enemies = int(name[0]), int(name[1])
    else:
        n_allies = n_enemies = int(name[0])
    return SMACLite(n_allies=n_allies, n_enemies=n_enemies, **kwargs)
