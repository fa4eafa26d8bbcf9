"""SMACLite: pure-JAX StarCraft-style micromanagement environment.

A TPU-native cooperative combat benchmark with the interface contract and
feature layouts of the reference's vendored SMAC fork
(``harl/envs/smac/StarCraft2_Env.py``) — without the StarCraft II binary, so
thousands of instances step in lockstep under ``vmap``+``jit``.

Fidelity surface (reference anchors):

* **Map registry** (``harl/envs/smac/smac_maps.py:16-454``): named maps with
  real unit compositions — marine maps (3m…27m_vs_30m), stalker/zealot maps
  (2s3z, 3s5z, 3s5z_vs_3s6z, …), colossus maps (1c3s5z, 2c_vs_64zg),
  MMM/MMM2 with medivac heal, hydralisk/zergling/baneling maps
  (6h_vs_8z, corridor, so_many_baneling, bane_vs_bane), 2s_vs_1sc.
* **Unit stats**: per-type health/shield/damage/cooldown/range/speed from the
  SC2 balance values the reference env inherits from the game binary
  (``unit_max_cooldown`` StarCraft2_Env.py:988-1001, ``unit_max_shield``
  :1012-1019).
* **Mechanics**: weapon cooldowns in game loops (8 loops per env step,
  ``step_mul``); damage hits Protoss shields first; shield regeneration after
  a no-damage delay; medivac heal with energy (MMM maps, :782-834); baneling
  suicide splash; attack commands chase out-of-range targets at unit speed.
* **Action space** (``get_avail_agent_actions`` :2188-2240): no-op (dead
  only), stop, move N/S/E/W (bounds-checked), attack enemy j within shoot
  range 6; medivacs target allies (heal) instead of enemies.
* **Observations** (``get_obs_agent`` :1083-1266, HARL-fork layout): ally
  feats, enemy feats, move feats, own feats, one-hot agent id; with
  obs_all_health / obs_last_action=True / obs_agent_id=True defaults.
* **EP state** (``get_global_state`` :1476-1611 with EP.yaml flags): per-ally
  [health, cooldown|energy, center-xy, shield, type, last_action], per-enemy
  [health, center-xy, shield, type], per-agent full avail-action move state,
  timestep number.
* **FP state** (``get_state_agent`` :1613-1831 with FP.yaml flags): per-agent
  [ally feats | enemy feats | move feats | own feats | agent id] with
  center-xy and last actions, zeroed when the agent is dead (use_mustalive).
* **Reward** (``reward_battle`` :916-965): damage dealt to enemy
  health+shield + reward_death_value per kill + reward_win, reward_only_
  positive, scaled by 20 / max_reward.
* dones[i] = battle over ∨ agent i dead (:571-577); ``bad_transition`` at the
  episode limit; metrics ``won`` / ``dead_allies`` / ``dead_enemies``.

Simplifications vs the real game (flat-arena physics): no pathing grid or
terrain height (those state slots are emitted as constants). Enemy AI models
the built-in bot's attack-move behavior: per-unit target acquisition with
persistence (keep the target while alive and in weapon range, switch to
another in-range ally when it leaves, advance without firing when none in
range) — the spread/overkill/chase waste that rotation-tanking and kiting
micro exploit. Ground units collide via soft footprint push-out (SC2 hitbox
radii); melee weapon range 1 ≈ touching hitboxes under those radii. SMACv2-style names (``protoss_5_vs_5`` …) draw per-episode unit
types from the race pools with the capability-config weights
(``configs/envs_cfgs/smacv2_map_config/*.yaml``: 0.45/0.45/0.1) and use
reflected random spawns.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import TimeStep
from harl_tpu.utils import spaces

# ----------------------------------------------------------- unit type table
# global type ids
MARINE, MARAUDER, MEDIVAC, STALKER, ZEALOT, COLOSSUS, HYDRALISK, ZERGLING, \
    BANELING, SPINECRAWLER = range(10)

TYPE_HEALTH = jnp.array(
    [45.0, 125.0, 150.0, 80.0, 100.0, 200.0, 80.0, 35.0, 30.0, 300.0])
TYPE_SHIELD = jnp.array(
    [0.0, 0.0, 0.0, 80.0, 50.0, 150.0, 0.0, 0.0, 0.0, 0.0])
TYPE_DAMAGE = jnp.array(
    [6.0, 10.0, 0.0, 13.0, 16.0, 20.0, 12.0, 5.0, 20.0, 25.0])
# weapon cooldown in game loops (unit_max_cooldown; medivac slot = max energy)
TYPE_COOLDOWN = jnp.array(
    [15.0, 25.0, 200.0, 35.0, 22.0, 24.0, 10.0, 11.0, 1.0, 27.0])
# weapon (or heal) range in world units; melee ≈ 1
TYPE_RANGE = jnp.array(
    [5.0, 6.0, 4.0, 6.0, 1.0, 7.0, 5.0, 1.0, 0.25, 7.0])
TYPE_SPEED = jnp.array(
    [3.15, 3.15, 3.5, 4.13, 3.15, 3.15, 3.15, 4.13, 4.13, 0.0])
# unit footprint radii (SC2 hitbox radii) for ground collision
TYPE_RADIUS = jnp.array(
    [0.375, 0.5625, 0.75, 0.625, 0.5, 1.0, 0.625, 0.375, 0.375, 0.75])
PROTOSS_TYPES = (STALKER, ZEALOT, COLOSSUS)

SHOOT_RANGE = 6.0          # unit_shoot_range: constant 6 for availability
SIGHT_RANGE = 9.0          # unit_sight_range
MOVE_AMOUNT = 2.0          # _move_amount
STEP_LOOPS = 8.0           # step_mul: game loops per env step
ARENA = 16.0               # half-size; map 32×32 like the SC2 micro maps
MAP_XY = 2 * ARENA
SPLASH_RADIUS = 2.2        # baneling acid splash
SHIELD_REGEN_DELAY = 18    # steps (~10 s) without damage before regen
SHIELD_REGEN = 2.0         # per step
HEAL_PER_STEP = 7.0        # medivac heal hp / step (≈12.6 hp/s approximation)
HEAL_ENERGY_COST = 4.0     # energy / heal step
ENERGY_REGEN = 0.5         # medivac energy / step
REWARD_DEATH = 10.0        # reward_death_value
REWARD_WIN = 200.0         # reward_win
REWARD_SCALE_RATE = 20.0   # reward_scale_rate

N_MOVE_ACTIONS = 6         # no-op, stop, N, S, E, W
N_PATHING = 8              # n_obs_pathing (flat arena → constants)
N_HEIGHT = 9               # n_obs_height

_DIRS = jnp.array([[0.0, 1.0], [0.0, -1.0], [1.0, 0.0], [-1.0, 0.0]])

# ------------------------------------------------------------- map registry
# name → (ally type ids, enemy type ids, episode limit, unit_type_bits)
# compositions per smac_maps.py map_type + the canonical SMAC army makeups
def _reg():
    def m(n):  # n marines
        return (MARINE,) * n

    def sz(s, z):  # s stalkers + z zealots
        return (STALKER,) * s + (ZEALOT,) * z

    mmm = (MARINE,) * 7 + (MARAUDER,) * 2 + (MEDIVAC,)
    mmm2_e = (MARINE,) * 8 + (MARAUDER,) * 3 + (MEDIVAC,)
    bane = (ZERGLING,) * 20 + (BANELING,) * 4
    return {
        # marines
        "3m": (m(3), m(3), 60, 0),
        "8m": (m(8), m(8), 120, 0),
        "25m": (m(25), m(25), 150, 0),
        "5m_vs_5m": (m(5), m(5), 100, 0),
        "5m_vs_6m": (m(5), m(6), 70, 0),
        "8m_vs_9m": (m(8), m(9), 120, 0),
        "10m_vs_11m": (m(10), m(11), 150, 0),
        "27m_vs_30m": (m(27), m(30), 180, 0),
        "2m_vs_1z": (m(2), (ZEALOT,), 150, 0),
        # stalkers & zealots (unit_type_bits=2)
        "2s3z": (sz(2, 3), sz(2, 3), 120, 2),
        "3s5z": (sz(3, 5), sz(3, 5), 150, 2),
        "3s5z_vs_3s6z": (sz(3, 5), sz(3, 6), 170, 2),
        "3s6z_vs_3s6z": (sz(3, 6), sz(3, 6), 170, 2),
        "3s5z_vs_4s4z": (sz(3, 5), sz(4, 4), 150, 2),
        "4s4z_vs_4s4z": (sz(4, 4), sz(4, 4), 150, 2),
        "5s3z_vs_4s4z": (sz(5, 3), sz(4, 4), 150, 2),
        "6s2z_vs_4s4z": (sz(6, 2), sz(4, 4), 150, 2),
        "2s6z_vs_4s4z": (sz(2, 6), sz(4, 4), 150, 2),
        # stalkers vs zealots (homogeneous per side → bits 0)
        "3s_vs_3z": ((STALKER,) * 3, (ZEALOT,) * 3, 150, 0),
        "3s_vs_4z": ((STALKER,) * 3, (ZEALOT,) * 4, 200, 0),
        "3s_vs_5z": ((STALKER,) * 3, (ZEALOT,) * 5, 250, 0),
        "2s_vs_1sc": ((STALKER,) * 2, (SPINECRAWLER,), 300, 0),
        # colossi
        "1c3s5z": ((COLOSSUS,) + sz(3, 5), (COLOSSUS,) + sz(3, 5), 180, 3),
        "2c_vs_64zg": ((COLOSSUS,) * 2, (ZERGLING,) * 64, 400, 0),
        # MMM (unit_type_bits=3, medivac heal)
        "MMM": (mmm, mmm, 150, 3),
        "MMM2": (mmm, mmm2_e, 180, 3),
        # zerg
        "6h_vs_8z": ((HYDRALISK,) * 6, (ZEALOT,) * 8, 150, 0),
        "7h_vs_8z": ((HYDRALISK,) * 7, (ZEALOT,) * 8, 150, 0),
        "corridor": ((ZEALOT,) * 6, (ZERGLING,) * 24, 400, 0),
        "so_many_baneling": ((ZEALOT,) * 7, (BANELING,) * 32, 100, 0),
        "bane_vs_bane": (bane, bane, 200, 2),
    }


MAP_REGISTRY = _reg()

# local type-id maps per map family (get_unit_type_id, StarCraft2_Env.py:
# 2157-2186): ally ids are relative to the map's min unit type; enemy ids use
# the fixed SC2 ids. Encoded as global-id → local-slot lookup tables.
def _local_maps(ally_types, enemy_types, bits):
    def table(order):
        t = np.zeros(10, np.int32)
        for i, g in enumerate(order):
            t[g] = i
        return jnp.asarray(t)

    kinds = set(ally_types) | set(enemy_types)
    if bits == 0:
        return table(()), table(())
    if kinds <= {STALKER, ZEALOT}:
        # ally: stalker=0, zealot=1; enemy: zealot(73)=0, stalker(74)=1
        return table((STALKER, ZEALOT)), table((ZEALOT, STALKER))
    if kinds <= {COLOSSUS, STALKER, ZEALOT}:
        o = (COLOSSUS, STALKER, ZEALOT)
        return table(o), table(o)
    if kinds <= {MARINE, MARAUDER, MEDIVAC}:
        o = (MARAUDER, MARINE, MEDIVAC)
        return table(o), table(o)
    if kinds <= {BANELING, ZERGLING}:
        o = (BANELING, ZERGLING)
        return table(o), table(o)
    # SMACv2 race pools (sampled order = local id)
    o = tuple(sorted(kinds))
    return table(o), table(o)


# SMACv2 race pools with capability-config weights (smacv2_map_config yamls);
# the name→id table mirrors the reference unit_types strings
SMACV2_UNIT_IDS = {
    "marine": MARINE, "marauder": MARAUDER, "medivac": MEDIVAC,
    "stalker": STALKER, "zealot": ZEALOT, "colossus": COLOSSUS,
    "zergling": ZERGLING, "baneling": BANELING, "hydralisk": HYDRALISK,
}
SMACV2_POOLS = {
    "terran": ((MARINE, MARAUDER, MEDIVAC), (0.45, 0.45, 0.1)),
    "protoss": ((STALKER, ZEALOT, COLOSSUS), (0.45, 0.45, 0.1)),
    "zerg": ((ZERGLING, HYDRALISK, BANELING), (0.45, 0.45, 0.1)),
}


def load_smacv2_map_config(map_name: str):
    """Resolve a SMACv2 capability config by name from the per-map yamls
    (mirrors /root/reference/harl/configs/envs_cfgs/smacv2_map_config/*.yaml:
    unit pools, weights, exception types, n_units asymmetries, spawn params).
    Returns None when no yaml exists for the name."""
    import pathlib

    import yaml

    path = (pathlib.Path(__file__).resolve().parents[2] / "configs"
            / "envs_cfgs" / "smacv2_map_config" / f"{map_name}.yaml")
    if not path.exists():
        return None
    cfg = yaml.safe_load(path.read_text())
    # the yamls carry the FULL StarCraftCapabilityEnvWrapper kwargs (the
    # real-binary smacv2 adapter splats them directly); the JAX analogue
    # only consumes the capability_config subtree
    cfg = cfg.get("capability_config", cfg)
    tg = cfg["team_gen"]
    pool = tuple(SMACV2_UNIT_IDS[u] for u in tg["unit_types"])
    weights = tuple(float(w) for w in tg["weights"])
    exc = tuple(SMACV2_UNIT_IDS[u] for u in tg.get("exception_unit_types", ()))
    sp = cfg.get("start_positions", {})
    return dict(
        n_units=int(cfg["n_units"]), n_enemies=int(cfg["n_enemies"]),
        pool=pool, weights=weights, exception_types=exc,
        surround_p=float(sp.get("p", 0.5)),
    )


class SMACLiteState(NamedTuple):
    ally_pos: jnp.ndarray      # (A, 2)
    ally_health: jnp.ndarray   # (A,)
    ally_shield: jnp.ndarray   # (A,)
    ally_cd: jnp.ndarray       # (A,) weapon cooldown in loops (medivac: energy)
    ally_hit_t: jnp.ndarray    # (A,) steps since last damage taken
    enemy_pos: jnp.ndarray
    enemy_health: jnp.ndarray
    enemy_shield: jnp.ndarray
    enemy_cd: jnp.ndarray
    enemy_hit_t: jnp.ndarray
    ally_type: jnp.ndarray     # (A,) int32 global unit-type ids
    enemy_type: jnp.ndarray    # (E,)
    last_action: jnp.ndarray   # (A,) int32
    enemy_tgt: jnp.ndarray     # (E,) int32 persistent acquired target (−1 none)
    t: jnp.ndarray             # () int32
    battle_over: jnp.ndarray   # () bool


@dataclasses.dataclass(frozen=True)
class SMACLite:
    ally_types: Tuple[int, ...] = (MARINE,) * 5
    enemy_types: Tuple[int, ...] = (MARINE,) * 5
    episode_limit: int = 100
    unit_type_bits: int = 0
    state_type: str = "EP"     # EP | FP (selects share/agent state exposure)
    reward_scale: bool = True
    randomize_types: bool = False  # SMACv2 capability randomization
    race_pool: Tuple[int, ...] = PROTOSS_TYPES
    race_weights: Tuple[float, ...] = (0.45, 0.45, 0.1)
    # SMACv2 capability-config extras: unit types a team may not consist of
    # exclusively (terran: medivac, zerg: baneling) and the probability of
    # the "surrounded" spawn branch (start_positions dist surrounded_and_
    # reflect with p)
    exception_types: Tuple[int, ...] = ()
    surround_p: float = 0.5
    metric_keys = ("won", "dead_allies", "dead_enemies")

    # ------------------------------------------------------------- metadata
    @property
    def n_allies(self) -> int:
        return len(self.ally_types)

    @property
    def n_enemies(self) -> int:
        return len(self.enemy_types)

    @property
    def n_agents(self) -> int:
        return self.n_allies

    @property
    def n_actions(self) -> int:
        return N_MOVE_ACTIONS + self.n_enemies

    @property
    def shield_bits_ally(self) -> int:
        kinds = set(self.race_pool) if self.randomize_types else set(self.ally_types)
        return 1 if kinds & set(PROTOSS_TYPES) else 0

    @property
    def shield_bits_enemy(self) -> int:
        kinds = set(self.race_pool) if self.randomize_types else set(self.enemy_types)
        return 1 if kinds & set(PROTOSS_TYPES) else 0

    @property
    def _bits(self) -> int:
        return 3 if self.randomize_types else self.unit_type_bits

    # ---- feature row sizes (get_obs_*_feats_size / get_state_*_feats_size)
    @property
    def _nf_obs_ally(self) -> int:
        # [visible, dist, dx, dy, health] + shield + type + last_action
        return 5 + self.shield_bits_ally + self._bits + self.n_actions

    @property
    def _nf_obs_enemy(self) -> int:
        return 5 + self.shield_bits_enemy + self._bits

    @property
    def _nf_obs_own(self) -> int:
        return 5 + self.shield_bits_ally + self._bits + self.n_actions

    @property
    def obs_dim(self) -> int:
        A = self.n_allies
        return ((A - 1) * self._nf_obs_ally + self.n_enemies * self._nf_obs_enemy
                + 4 + self._nf_obs_own + A)

    @property
    def _nf_state_ally(self) -> int:
        # [health, cooldown|energy, cx, cy] + shield + type + last_action
        return 4 + self.shield_bits_ally + self._bits + self.n_actions

    @property
    def _nf_state_enemy(self) -> int:
        return 3 + self.shield_bits_enemy + self._bits

    @property
    def state_dim(self) -> int:
        # get_global_state: ally + enemy + per-agent move state
        # (n_actions + pathing + height) + timestep
        A = self.n_allies
        mv = self.n_actions + N_PATHING + N_HEIGHT
        return (A * self._nf_state_ally + self.n_enemies * self._nf_state_enemy
                + A * mv + 1)

    @property
    def _nf_fp_ally(self) -> int:
        # [visible, dist, dx, dy, cd|energy, health] + shield + cxy + type + last_a
        return 6 + self.shield_bits_ally + 2 + self._bits + self.n_actions

    @property
    def _nf_fp_enemy(self) -> int:
        # [avail, dist, dx, dy, visible, health] + shield + type + cxy
        return 6 + self.shield_bits_enemy + self._bits + 2

    @property
    def _nf_fp_own(self) -> int:
        # [1, 0, 0, 0, health] + shield + cxy + type + last_action
        return 5 + self.shield_bits_ally + 2 + self._bits + self.n_actions

    @property
    def fp_state_dim(self) -> int:
        A = self.n_allies
        return ((A - 1) * self._nf_fp_ally + self.n_enemies * self._nf_fp_enemy
                + 4 + self._nf_fp_own + A)

    @property
    def observation_space(self):
        return [spaces.Box.create(-1.0, 1.0, self.obs_dim)] * self.n_allies

    @property
    def share_observation_space(self):
        d = self.fp_state_dim if self.state_type == "FP" else self.state_dim
        return [spaces.Box.create(-1.0, 1.0, d)] * self.n_allies

    @property
    def action_space(self):
        return [spaces.Discrete(self.n_actions) for _ in range(self.n_allies)]

    @property
    def max_reward(self) -> float:
        # n_enemies*death + win + Σ enemy (health+shield) at full
        et = np.asarray(self.enemy_types)
        hp = float(np.asarray(TYPE_HEALTH)[et].sum()
                   + np.asarray(TYPE_SHIELD)[et].sum())
        if self.randomize_types:  # upper-bound with the beefiest pool unit
            pool = np.asarray(self.race_pool)
            hp = float(self.n_enemies * (np.asarray(TYPE_HEALTH)[pool]
                                         + np.asarray(TYPE_SHIELD)[pool]).max())
        return self.n_enemies * REWARD_DEATH + REWARD_WIN + hp

    @property
    def _locals(self):
        return _local_maps(
            tuple(self.race_pool) if self.randomize_types else self.ally_types,
            tuple(self.race_pool) if self.randomize_types else self.enemy_types,
            self._bits,
        )

    # -------------------------------------------------------------- dynamics
    def reset(self, key) -> Tuple[SMACLiteState, TimeStep]:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        A, E = self.n_allies, self.n_enemies
        if self.randomize_types:
            # SMACv2 weighted team generation (smacv2 weighted_teams): draw
            # types from the race pool with capability weights; a team may
            # not consist exclusively of exception types (terran medivac,
            # zerg baneling) — force unit 0 to the heaviest non-exception
            # type when that happens
            pool = jnp.asarray(self.race_pool)
            w = jnp.asarray(self.race_weights)
            ally_type = pool[jax.random.choice(k3, len(pool), (A,), p=w)]
            enemy_type = pool[jax.random.choice(k4, len(pool), (E,), p=w)]
            if self.exception_types:
                exc = jnp.asarray(self.exception_types)
                w_ok = jnp.where(
                    jnp.isin(pool, exc), 0.0, jnp.asarray(self.race_weights))
                fallback = pool[jnp.argmax(w_ok)]

                def fix(team):
                    all_exc = jnp.all(jnp.isin(team, exc))
                    return team.at[0].set(
                        jnp.where(all_exc, fallback, team[0]))

                ally_type = fix(ally_type)
                enemy_type = fix(enemy_type)
            # start_positions surrounded_and_reflect: with prob p the allies
            # spawn clustered at the map center with enemies on a ring
            # around them; otherwise reflected random spawns
            ks, kr1, kr2, kr3, kr4, kang = jax.random.split(k1, 6)
            surround = jax.random.uniform(ks) < self.surround_p
            # --- reflect branch (independent keys per uniform draw: enemy
            # y, enemy x-jitter, and the surround radius must not correlate)
            ally_refl = jax.random.uniform(
                kr1, (A, 2), minval=jnp.array([-ARENA * 0.8, -ARENA * 0.5]),
                maxval=jnp.array([-2.0, ARENA * 0.5]))
            ey = jax.random.uniform(kr2, (E,), minval=-ARENA * 0.5,
                                    maxval=ARENA * 0.5)
            ex = -ally_refl[:, 0].mean() + jax.random.uniform(
                kr3, (E,), minval=-2.0, maxval=2.0)
            enemy_refl = jnp.stack([ex, ey], axis=1)
            # --- surrounded branch
            ally_sur = 2.0 * jax.random.normal(kr1, (A, 2))
            ang = jax.random.uniform(kang, (E,), minval=0.0,
                                     maxval=2.0 * jnp.pi)
            radius = jax.random.uniform(kr4, (E,), minval=8.0, maxval=11.0)
            enemy_sur = jnp.stack(
                [radius * jnp.cos(ang), radius * jnp.sin(ang)], axis=1)
            ally_pos = jnp.where(surround, ally_sur, ally_refl)
            enemy_pos = jnp.where(surround, enemy_sur, enemy_refl)
        else:
            ally_type = jnp.asarray(self.ally_types, jnp.int32)
            enemy_type = jnp.asarray(self.enemy_types, jnp.int32)
            ally_pos = jnp.stack(
                [jnp.full((A,), -6.0), jnp.linspace(-A / 2, A / 2, A)], axis=1
            ) + jax.random.uniform(k1, (A, 2), minval=-1.0, maxval=1.0)
            enemy_pos = jnp.stack(
                [jnp.full((E,), 6.0), jnp.linspace(-E / 2, E / 2, E)], axis=1
            ) + jax.random.uniform(k2, (E, 2), minval=-1.0, maxval=1.0)
        is_med_a = ally_type == MEDIVAC
        is_med_e = enemy_type == MEDIVAC
        state = SMACLiteState(
            ally_pos=ally_pos,
            ally_health=TYPE_HEALTH[ally_type],
            ally_shield=TYPE_SHIELD[ally_type],
            # medivacs start with full energy in the cd slot
            ally_cd=jnp.where(is_med_a, TYPE_COOLDOWN[ally_type], 0.0),
            ally_hit_t=jnp.full((A,), 100.0),
            enemy_pos=enemy_pos,
            enemy_health=TYPE_HEALTH[enemy_type],
            enemy_shield=TYPE_SHIELD[enemy_type],
            enemy_cd=jnp.where(is_med_e, TYPE_COOLDOWN[enemy_type], 0.0),
            enemy_hit_t=jnp.full((E,), 100.0),
            ally_type=ally_type,
            enemy_type=enemy_type,
            last_action=jnp.zeros((A,), jnp.int32),
            enemy_tgt=jnp.full((E,), -1, jnp.int32),
            t=jnp.zeros((), jnp.int32),
            battle_over=jnp.zeros((), bool),
        )
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool), jnp.zeros((), bool))

    def _attack_phase(self, att_pos, att_type, att_alive, att_cd, want_attack,
                      tgt, tgt_pos, tgt_alive, n_tgt):
        """One side's attack resolution: chase-or-fire per attacker.

        Returns (damage (n_tgt,), splash centers mask, new_pos, new_cd,
        fired mask). ``tgt`` indexes the target side's units."""
        dist = jnp.linalg.norm(tgt_pos[tgt] - att_pos, axis=-1)
        w_range = TYPE_RANGE[att_type]
        can_fire = want_attack & att_alive & tgt_alive[tgt] & (att_cd <= 0.0)
        in_range = dist <= w_range
        fires = can_fire & in_range
        chases = want_attack & att_alive & tgt_alive[tgt] & ~in_range
        # chase at unit speed (normalized to the marine's MOVE_AMOUNT step)
        to_t = tgt_pos[tgt] - att_pos
        nrm = jnp.maximum(jnp.linalg.norm(to_t, axis=-1, keepdims=True), 1e-6)
        step_len = jnp.minimum(
            MOVE_AMOUNT * TYPE_SPEED[att_type] / 3.15,
            jnp.maximum(dist - 0.8 * w_range, 0.0),
        )
        new_pos = att_pos + jnp.where(
            chases[:, None], to_t / nrm * step_len[:, None], 0.0)
        is_bane = att_type == BANELING
        point_dmg = jnp.where(fires & ~is_bane, TYPE_DAMAGE[att_type], 0.0)
        dmg = jnp.zeros((n_tgt,)).at[tgt].add(point_dmg)
        # baneling suicide splash: AoE around the exploding unit
        bane_fire = fires & is_bane
        d_bt = jnp.linalg.norm(
            tgt_pos[None, :, :] - att_pos[:, None, :], axis=-1)  # (att, tgt)
        splash = (d_bt <= SPLASH_RADIUS) & bane_fire[:, None] & tgt_alive[None, :]
        dmg = dmg + jnp.sum(
            jnp.where(splash, TYPE_DAMAGE[att_type][:, None], 0.0), axis=0)
        new_cd = jnp.where(fires, TYPE_COOLDOWN[att_type], att_cd)
        return dmg, bane_fire, new_pos, new_cd, fires

    def _resolve_collisions(self, ally_pos, enemy_pos, a_solid, e_solid,
                            ally_type, enemy_type):
        """One relaxation pass of pairwise footprint separation.

        Living ground units (medivacs fly) are pushed apart symmetrically
        where their SC2 hitbox radii overlap. A single pass per env step is
        a soft approximation of the game's collision solver — enough to stop
        stacking and bound melee surrounds.
        """
        pos = jnp.concatenate([ally_pos, enemy_pos], axis=0)          # (U,2)
        solid = jnp.concatenate([a_solid, e_solid], axis=0)           # (U,)
        rad = TYPE_RADIUS[jnp.concatenate([ally_type, enemy_type])]
        U = pos.shape[0]
        delta = pos[:, None, :] - pos[None, :, :]                     # (U,U,2)
        # perfectly coincident units would get IDENTICAL fallback push
        # directions (staying stacked forever); an antisymmetric index-based
        # nudge makes their separation directions opposite
        idx = jnp.arange(U, dtype=pos.dtype)
        delta = delta.at[..., 0].add(1e-4 * (idx[:, None] - idx[None, :]))
        dist = jnp.linalg.norm(delta, axis=-1)
        pair = solid[:, None] & solid[None, :] & ~jnp.eye(U, dtype=bool)
        overlap = jnp.maximum(rad[:, None] + rad[None, :] - dist, 0.0)
        overlap = jnp.where(pair, overlap, 0.0)
        # push direction; coincident units separate along a fixed axis
        safe = jnp.maximum(dist, 1e-6)[..., None]
        dirn = jnp.where(dist[..., None] > 1e-6, delta / safe,
                         jnp.array([1.0, 0.0]))
        push = 0.5 * jnp.sum(overlap[..., None] * dirn, axis=1)
        # clamp: a unit cannot be shoved further than one move step
        pn = jnp.maximum(jnp.linalg.norm(push, axis=-1, keepdims=True), 1e-9)
        push = push / pn * jnp.minimum(pn, MOVE_AMOUNT)
        new = jnp.clip(pos + jnp.where(solid[:, None], push, 0.0),
                       -ARENA, ARENA)
        A = ally_pos.shape[0]
        return new[:A], new[A:]

    def step(self, state: SMACLiteState, actions, key) -> Tuple[SMACLiteState, TimeStep]:
        """actions: (A, 1) int32."""
        del key
        a = jnp.asarray(actions)[..., 0].astype(jnp.int32)
        A, E = self.n_allies, self.n_enemies
        ally_alive = state.ally_health > 0
        enemy_alive = state.enemy_health > 0
        is_med_a = state.ally_type == MEDIVAC
        is_med_e = state.enemy_type == MEDIVAC

        # --- ally movement --------------------------------------------------
        is_move = (a >= 2) & (a < 6) & ally_alive
        direction = _DIRS[jnp.clip(a - 2, 0, 3)]
        ally_pos = jnp.clip(
            state.ally_pos + jnp.where(is_move[:, None], direction * MOVE_AMOUNT, 0.0),
            -ARENA, ARENA)

        # --- ally attacks (non-medivac) -------------------------------------
        tgt = jnp.clip(a - N_MOVE_ACTIONS, 0, E - 1)
        want_attack = (a >= N_MOVE_ACTIONS) & ~is_med_a
        dmg_to_enemy, bane_a, ally_pos, ally_cd, _ = self._attack_phase(
            ally_pos, state.ally_type, ally_alive, state.ally_cd,
            want_attack, tgt, state.enemy_pos, enemy_alive, E)

        # --- ally medivac heal ----------------------------------------------
        heal_tgt = jnp.clip(a - N_MOVE_ACTIONS, 0, A - 1)
        hdist = jnp.linalg.norm(ally_pos[heal_tgt] - ally_pos, axis=-1)
        damaged = state.ally_health < TYPE_HEALTH[state.ally_type]
        heals = ((a >= N_MOVE_ACTIONS) & is_med_a & ally_alive
                 & ally_alive[heal_tgt] & damaged[heal_tgt]
                 & (hdist <= TYPE_RANGE[MEDIVAC])
                 & (state.ally_cd >= HEAL_ENERGY_COST))
        heal_in = jnp.zeros((A,)).at[heal_tgt].add(
            jnp.where(heals, HEAL_PER_STEP, 0.0))
        # medivac chases its heal target when out of range
        med_chases = ((a >= N_MOVE_ACTIONS) & is_med_a & ally_alive
                      & ally_alive[heal_tgt] & (hdist > TYPE_RANGE[MEDIVAC]))
        to_h = ally_pos[heal_tgt] - ally_pos
        nrm_h = jnp.maximum(jnp.linalg.norm(to_h, axis=-1, keepdims=True), 1e-6)
        ally_pos = ally_pos + jnp.where(
            med_chases[:, None], to_h / nrm_h * MOVE_AMOUNT, 0.0)

        # --- enemy AI: per-unit acquisition with pursuit persistence --------
        # The SC2 built-in bot does NOT globally focus-fire the closest ally:
        # an attack-moving unit scans for the closest acquirable target,
        # locks it, and PURSUES it within the acquisition leash (~sight
        # range), firing only when inside weapon range. It drops the lock
        # only when the target dies or leaves the leash, then re-scans
        # (closest in sight, else advances toward the nearest ally without
        # firing). This pursuit persistence is exactly what rotation-tanking
        # and kiting micro exploit: a damaged ally pulling back drags its
        # pursuers out of the fight while the rest shoot them freely. The
        # previous global argmin re-targeted every step was a strictly
        # stronger opponent than the real bot and made 5m_vs_6m unwinnable
        # at reference budgets (StarCraft2_Env.py drives the game bot with
        # attack-move orders; acquisition/leash behavior is the engine's).
        dist_ea = jnp.linalg.norm(
            state.enemy_pos[:, None, :] - ally_pos[None, :, :], axis=-1)
        in_sight = dist_ea <= SIGHT_RANGE                       # (E, A)
        in_wr = dist_ea <= TYPE_RANGE[state.enemy_type][:, None]
        cur = jnp.clip(state.enemy_tgt, 0, A - 1)
        cur_in_wr = jnp.take_along_axis(in_wr, cur[:, None], 1)[:, 0]
        # retaliation: a unit being shot while its lock is outside weapon
        # range turns on whoever it can actually reach (drops the lock and
        # re-scans) — without this, a perpetually-moving bait could absorb
        # every pursuer's attention for free forever
        hit_now = dmg_to_enemy > 0.0
        cur_ok = ((state.enemy_tgt >= 0) & ally_alive[cur]
                  & jnp.take_along_axis(in_sight, cur[:, None], 1)[:, 0]
                  & (cur_in_wr | ~hit_now))
        # re-scan preference: closest ally in WEAPON range first (so a
        # retaliating unit turns on someone it can actually shoot instead of
        # re-locking the out-of-range bait), else closest in sight, else
        # advance toward the closest anywhere
        d_wr = jnp.where(ally_alive[None, :] & in_wr, dist_ea, 1e9)
        cand_wr = jnp.argmin(d_wr, axis=1)
        has_wr = jnp.min(d_wr, axis=1) < 1e9
        d_sight = jnp.where(ally_alive[None, :] & in_sight, dist_ea, 1e9)
        cand_sight = jnp.argmin(d_sight, axis=1)
        has_sight = jnp.min(d_sight, axis=1) < 1e9
        d_any = jnp.where(ally_alive[None, :], dist_ea, 1e9)
        cand_any = jnp.argmin(d_any, axis=1)
        e_tgt = jnp.where(
            cur_ok, cur,
            jnp.where(has_wr, cand_wr,
                      jnp.where(has_sight, cand_sight, cand_any)))
        any_ally = jnp.any(ally_alive)
        e_want = enemy_alive & ~is_med_e & any_ally
        dmg_to_ally, bane_e, enemy_pos, enemy_cd, _ = self._attack_phase(
            state.enemy_pos, state.enemy_type, enemy_alive, state.enemy_cd,
            e_want, e_tgt, ally_pos, ally_alive, A)
        # enemy medivac: heal the most-damaged living non-medivac enemy
        e_deficit = jnp.where(
            enemy_alive & ~is_med_e,
            TYPE_HEALTH[state.enemy_type] - state.enemy_health, -1.0)
        e_heal_tgt = jnp.argmax(e_deficit)
        ehdist = jnp.linalg.norm(enemy_pos[e_heal_tgt] - enemy_pos, axis=-1)
        e_heals = (is_med_e & enemy_alive & (e_deficit[e_heal_tgt] > 0)
                   & (ehdist <= TYPE_RANGE[MEDIVAC])
                   & (enemy_cd >= HEAL_ENERGY_COST))
        e_heal_in = jnp.zeros((E,)).at[e_heal_tgt].add(
            jnp.sum(jnp.where(e_heals, HEAL_PER_STEP, 0.0)))
        e_med_chase = (is_med_e & enemy_alive & (e_deficit[e_heal_tgt] > 0)
                       & (ehdist > TYPE_RANGE[MEDIVAC]))
        to_eh = enemy_pos[e_heal_tgt] - enemy_pos
        nrm_eh = jnp.maximum(jnp.linalg.norm(to_eh, axis=-1, keepdims=True), 1e-6)
        enemy_pos = enemy_pos + jnp.where(
            e_med_chase[:, None], to_eh / nrm_eh * MOVE_AMOUNT, 0.0)

        # --- apply damage: shields first, then health (Protoss mechanics) ---
        def absorb(shield, health, dmg, alive):
            dmg = jnp.where(alive, dmg, 0.0)
            sh_after = jnp.maximum(shield - dmg, 0.0)
            spill = jnp.maximum(dmg - shield, 0.0)
            return sh_after, jnp.maximum(health - spill, 0.0), dmg > 0

        e_shield, e_health, e_hit = absorb(
            state.enemy_shield, state.enemy_health, dmg_to_enemy, enemy_alive)
        a_shield, a_health, a_hit = absorb(
            state.ally_shield, state.ally_health, dmg_to_ally, ally_alive)
        # banelings die on exploding
        a_health = jnp.where(bane_a, 0.0, a_health)
        e_health = jnp.where(bane_e, 0.0, e_health)
        # heals (cannot exceed max health)
        a_health = jnp.where(
            ally_alive & (a_health > 0),
            jnp.minimum(a_health + heal_in, TYPE_HEALTH[state.ally_type]),
            a_health)
        e_health = jnp.where(
            enemy_alive & (e_health > 0),
            jnp.minimum(e_health + e_heal_in, TYPE_HEALTH[state.enemy_type]),
            e_health)

        # --- cooldown / energy / shield-regen bookkeeping -------------------
        ally_cd = jnp.where(
            is_med_a,
            jnp.clip(state.ally_cd + ENERGY_REGEN
                     - jnp.where(heals, HEAL_ENERGY_COST, 0.0),
                     0.0, TYPE_COOLDOWN[MEDIVAC]),
            jnp.maximum(ally_cd - STEP_LOOPS, 0.0))
        enemy_cd = jnp.where(
            is_med_e,
            jnp.clip(state.enemy_cd + ENERGY_REGEN
                     - jnp.where(e_heals, HEAL_ENERGY_COST, 0.0),
                     0.0, TYPE_COOLDOWN[MEDIVAC]),
            jnp.maximum(enemy_cd - STEP_LOOPS, 0.0))
        a_hit_t = jnp.where(a_hit, 0.0, state.ally_hit_t + 1.0)
        e_hit_t = jnp.where(e_hit, 0.0, state.enemy_hit_t + 1.0)
        a_shield = jnp.where(
            (a_hit_t >= SHIELD_REGEN_DELAY) & (a_health > 0),
            jnp.minimum(a_shield + SHIELD_REGEN, TYPE_SHIELD[state.ally_type]),
            a_shield)
        e_shield = jnp.where(
            (e_hit_t >= SHIELD_REGEN_DELAY) & (e_health > 0),
            jnp.minimum(e_shield + SHIELD_REGEN, TYPE_SHIELD[state.enemy_type]),
            e_shield)

        # --- reward (reward_battle, reward_only_positive=True) --------------
        prev_e_total = state.enemy_health + state.enemy_shield
        new_e_total = e_health + e_shield
        delta_enemy = jnp.sum(
            jnp.where(enemy_alive, jnp.maximum(prev_e_total - new_e_total, 0.0), 0.0))
        kills = jnp.sum(enemy_alive & (e_health <= 0))
        all_enemies_dead = jnp.all(e_health <= 0)
        all_allies_dead = jnp.all(a_health <= 0)
        won = all_enemies_dead
        reward = (delta_enemy + kills * REWARD_DEATH
                  + jnp.where(won, REWARD_WIN, 0.0))
        if self.reward_scale:
            reward = reward / self.max_reward * REWARD_SCALE_RATE

        new_t = state.t + 1
        time_up = new_t >= self.episode_limit
        terminated = all_enemies_dead | all_allies_dead
        done = terminated | time_up
        bad_transition = time_up & ~terminated

        # --- ground-unit collision: soft push-out of overlapping footprints
        # (SC2 units cannot stack; without this, chasing clumps collapse to a
        # point and melee surrounds are unbounded)
        ally_pos, enemy_pos = self._resolve_collisions(
            ally_pos, enemy_pos,
            (a_health > 0) & ~is_med_a, (e_health > 0) & ~is_med_e,
            state.ally_type, state.enemy_type)

        new_state = SMACLiteState(
            ally_pos=ally_pos, ally_health=a_health, ally_shield=a_shield,
            ally_cd=ally_cd, ally_hit_t=a_hit_t,
            enemy_pos=enemy_pos, enemy_health=e_health, enemy_shield=e_shield,
            enemy_cd=enemy_cd, enemy_hit_t=e_hit_t,
            ally_type=state.ally_type, enemy_type=state.enemy_type,
            last_action=a, enemy_tgt=e_tgt, t=new_t, battle_over=done,
        )
        return new_state, self._timestep(new_state, reward, done,
                                         bad_transition, won)

    # -------------------------------------------------------- feature blocks
    def _type_onehot(self, types, local_table):
        if self._bits == 0:
            return None
        return jax.nn.one_hot(local_table[types], self._bits)

    def _can_move(self, pos, alive):
        """(N, 4) can-move bits: bounds check per direction (can_move)."""
        nxt = pos[:, None, :] + _DIRS[None] * (MOVE_AMOUNT / 2)
        ok = jnp.all((nxt >= -ARENA) & (nxt <= ARENA), axis=-1)
        return ok & alive[:, None]

    def _obs(self, state: SMACLiteState) -> jnp.ndarray:
        """get_obs_agent layout: ally | enemy | move | own | agent_id."""
        A, E = self.n_allies, self.n_enemies
        loc_a, loc_e = self._locals
        ally_alive = state.ally_health > 0
        enemy_alive = state.enemy_health > 0
        pos = state.ally_pos
        avail = self._avail(state)                       # (A, n_actions)
        last_a = jax.nn.one_hot(state.last_action, self.n_actions)

        # enemy features (A, E, nf)
        delta_e = state.enemy_pos[None] - pos[:, None]
        dist_e = jnp.linalg.norm(delta_e, axis=-1)
        vis_e = (dist_e < SIGHT_RANGE) & enemy_alive[None, :] & ally_alive[:, None]
        ef = [
            avail[:, N_MOVE_ACTIONS:],                   # attackable
            dist_e / SIGHT_RANGE,
            delta_e[..., 0] / SIGHT_RANGE,
            delta_e[..., 1] / SIGHT_RANGE,
            jnp.broadcast_to(
                (state.enemy_health / TYPE_HEALTH[state.enemy_type])[None],
                dist_e.shape),
        ]
        if self.shield_bits_enemy:
            ef.append(jnp.broadcast_to(
                _shield_frac(state.enemy_shield, state.enemy_type)[None],
                dist_e.shape))
        ef = jnp.stack(ef, axis=-1)
        e_oh = self._type_onehot(state.enemy_type, loc_e)
        if e_oh is not None:
            ef = jnp.concatenate(
                [ef, jnp.broadcast_to(e_oh[None], (A, E, self._bits))], axis=-1)
        ef = jnp.where(vis_e[..., None], ef, 0.0).reshape(A, -1)

        # ally features (A, A, nf) then drop self row
        delta_a = pos[None] - pos[:, None]
        dist_a = jnp.linalg.norm(delta_a, axis=-1)
        vis_a = (dist_a < SIGHT_RANGE) & ally_alive[None, :] & ally_alive[:, None]
        af = [
            vis_a.astype(jnp.float32),
            dist_a / SIGHT_RANGE,
            delta_a[..., 0] / SIGHT_RANGE,
            delta_a[..., 1] / SIGHT_RANGE,
            jnp.broadcast_to(
                (state.ally_health / TYPE_HEALTH[state.ally_type])[None],
                dist_a.shape),
        ]
        if self.shield_bits_ally:
            af.append(jnp.broadcast_to(
                _shield_frac(state.ally_shield, state.ally_type)[None],
                dist_a.shape))
        af = jnp.stack(af, axis=-1)
        a_oh = self._type_onehot(state.ally_type, loc_a)
        extra = [jnp.broadcast_to(last_a[None], (A, A, self.n_actions))]
        if a_oh is not None:
            extra.insert(0, jnp.broadcast_to(a_oh[None], (A, A, self._bits)))
        af = jnp.concatenate([af] + extra, axis=-1)
        # whole row gated on "dist < sight_range and al_unit.health > 0" plus
        # viewer alive (get_obs_agent:1183)
        af = af * vis_a[..., None].astype(jnp.float32)
        af = _drop_diag(af)

        move = self._can_move(pos, ally_alive).astype(jnp.float32)

        own = [
            jnp.ones((A, 1)), jnp.zeros((A, 3)),
            (state.ally_health / TYPE_HEALTH[state.ally_type])[:, None],
        ]
        if self.shield_bits_ally:
            own.append(_shield_frac(state.ally_shield, state.ally_type)[:, None])
        if a_oh is not None:
            own.append(a_oh)
        own.append(last_a)
        own = jnp.concatenate(own, axis=-1) * ally_alive[:, None]

        ids = jnp.eye(A)
        return jnp.concatenate([af, ef, move * ally_alive[:, None], own, ids],
                               axis=-1)

    def _state(self, state: SMACLiteState) -> jnp.ndarray:
        """get_global_state (EP): ally | enemy | move | timestep."""
        A, E = self.n_allies, self.n_enemies
        loc_a, loc_e = self._locals
        ally_alive = state.ally_health > 0
        enemy_alive = state.enemy_health > 0
        last_a = jax.nn.one_hot(state.last_action, self.n_actions)
        a_oh = self._type_onehot(state.ally_type, loc_a)
        e_oh = self._type_onehot(state.enemy_type, loc_e)

        ally = [
            (state.ally_health / TYPE_HEALTH[state.ally_type])[:, None],
            (state.ally_cd / TYPE_COOLDOWN[state.ally_type])[:, None],
            state.ally_pos / (MAP_XY / 2),               # center-xy
        ]
        if self.shield_bits_ally:
            ally.append(_shield_frac(state.ally_shield, state.ally_type)[:, None])
        if a_oh is not None:
            ally.append(a_oh)
        ally.append(last_a)
        ally = jnp.concatenate(ally, axis=-1) * ally_alive[:, None]

        enemy = [
            (state.enemy_health / TYPE_HEALTH[state.enemy_type])[:, None],
            state.enemy_pos / (MAP_XY / 2),
        ]
        if self.shield_bits_enemy:
            enemy.append(_shield_frac(state.enemy_shield, state.enemy_type)[:, None])
        if e_oh is not None:
            enemy.append(e_oh)
        enemy = jnp.concatenate(enemy, axis=-1) * enemy_alive[:, None]

        # per-agent move state: full avail actions + flat-arena pathing (1s in
        # bounds) + height (zeros) — the EP.yaml state_pathing_grid /
        # state_terrain_height slots, constant on a flat map
        avail = self._avail(state)
        pathing = jnp.ones((A, N_PATHING))
        height = jnp.zeros((A, N_HEIGHT))
        move = jnp.concatenate([avail, pathing, height], axis=-1)

        ts_num = (state.t / self.episode_limit)[None].astype(jnp.float32)
        return jnp.concatenate(
            [ally.reshape(-1), enemy.reshape(-1), move.reshape(-1), ts_num])

    def _agent_state(self, state: SMACLiteState) -> jnp.ndarray:
        """get_state_agent (FP): per-agent ally | enemy | move | own | id."""
        A, E = self.n_allies, self.n_enemies
        loc_a, loc_e = self._locals
        ally_alive = state.ally_health > 0
        enemy_alive = state.enemy_health > 0
        pos = state.ally_pos
        avail = self._avail(state)
        last_a = jax.nn.one_hot(state.last_action, self.n_actions)
        a_oh = self._type_onehot(state.ally_type, loc_a)
        e_oh = self._type_onehot(state.enemy_type, loc_e)
        cxy_a = pos / (MAP_XY / 2)
        cxy_e = state.enemy_pos / (MAP_XY / 2)

        # ally rows (viewer i, ally j)
        delta_a = pos[None] - pos[:, None]
        dist_a = jnp.linalg.norm(delta_a, axis=-1)
        vis_a = (dist_a < SIGHT_RANGE).astype(jnp.float32)
        geo_gate = ally_alive[:, None, None].astype(jnp.float32)  # viewer alive
        af = [
            vis_a[..., None] * geo_gate[..., 0:1],
            (dist_a / SIGHT_RANGE)[..., None] * geo_gate,
            (delta_a / SIGHT_RANGE) * geo_gate,
            jnp.broadcast_to(
                (state.ally_cd / TYPE_COOLDOWN[state.ally_type])[None, :, None],
                (A, A, 1)),
            jnp.broadcast_to(
                (state.ally_health / TYPE_HEALTH[state.ally_type])[None, :, None],
                (A, A, 1)),
        ]
        if self.shield_bits_ally:
            af.append(jnp.broadcast_to(
                _shield_frac(state.ally_shield, state.ally_type)[None, :, None],
                (A, A, 1)))
        af.append(jnp.broadcast_to(cxy_a[None], (A, A, 2)))
        if a_oh is not None:
            af.append(jnp.broadcast_to(a_oh[None], (A, A, self._bits)))
        af.append(jnp.broadcast_to(last_a[None], (A, A, self.n_actions)))
        af = jnp.concatenate(af, axis=-1) * ally_alive[None, :, None]
        af = _drop_diag(af)

        # enemy rows (viewer i, enemy j)
        delta_e = state.enemy_pos[None] - pos[:, None]
        dist_e = jnp.linalg.norm(delta_e, axis=-1)
        vis_e = (dist_e < SIGHT_RANGE).astype(jnp.float32)
        geo = ally_alive[:, None, None].astype(jnp.float32)
        ef = [
            avail[:, N_MOVE_ACTIONS:, None] * geo,
            (dist_e / SIGHT_RANGE)[..., None] * geo,
            (delta_e / SIGHT_RANGE) * geo,
            vis_e[..., None] * geo,
            jnp.broadcast_to(
                (state.enemy_health / TYPE_HEALTH[state.enemy_type])[None, :, None],
                (A, E, 1)),
        ]
        if self.shield_bits_enemy:
            ef.append(jnp.broadcast_to(
                _shield_frac(state.enemy_shield, state.enemy_type)[None, :, None],
                (A, E, 1)))
        if e_oh is not None:
            ef.append(jnp.broadcast_to(e_oh[None], (A, E, self._bits)))
        ef.append(jnp.broadcast_to(cxy_e[None], (A, E, 2)))
        ef = jnp.concatenate(ef, axis=-1) * enemy_alive[None, :, None]
        ef = ef.reshape(A, -1)

        move = self._can_move(pos, ally_alive).astype(jnp.float32)

        own = [
            jnp.ones((A, 1)), jnp.zeros((A, 3)),
            (state.ally_health / TYPE_HEALTH[state.ally_type])[:, None],
        ]
        if self.shield_bits_ally:
            own.append(_shield_frac(state.ally_shield, state.ally_type)[:, None])
        own.append(cxy_a)
        if a_oh is not None:
            own.append(a_oh)
        own.append(last_a)
        own = jnp.concatenate(own, axis=-1)

        ids = jnp.eye(A)
        fp = jnp.concatenate([af, ef, move, own, ids], axis=-1)
        # use_mustalive: the whole row zeros when the viewing agent is dead
        # (but its one-hot id survives in the reference? no — all zeros, then
        # agent_id appended AFTER the mustalive gate → id stays)
        gate = ally_alive[:, None].astype(jnp.float32)
        fp = jnp.concatenate(
            [fp[:, : fp.shape[1] - A] * gate, ids], axis=-1)
        return fp

    def _avail(self, state: SMACLiteState) -> jnp.ndarray:
        A, E = self.n_allies, self.n_enemies
        alive = state.ally_health > 0
        enemy_alive = state.enemy_health > 0
        is_med = state.ally_type == MEDIVAC
        dist_ae = jnp.linalg.norm(
            state.ally_pos[:, None, :] - state.enemy_pos[None, :, :], axis=-1)
        attack_avail = (
            (dist_ae <= SHOOT_RANGE) & enemy_alive[None, :] & alive[:, None]
            & ~is_med[:, None]
        )
        # medivac heal targets: living non-medivac allies within shoot range
        dist_aa = jnp.linalg.norm(
            state.ally_pos[:, None, :] - state.ally_pos[None, :, :], axis=-1)
        heal_ok = (
            (dist_aa <= SHOOT_RANGE) & alive[None, :] & alive[:, None]
            & is_med[:, None] & ~(state.ally_type == MEDIVAC)[None, :]
            & ~jnp.eye(A, dtype=bool)
        )
        # heal targets occupy the first min(A, E) attack slots
        k = min(A, E)
        target_avail = attack_avail.astype(jnp.float32)
        target_avail = target_avail.at[:, :k].set(
            jnp.where(is_med[:, None], heal_ok[:, :k].astype(jnp.float32),
                      target_avail[:, :k]))
        noop = (~alive).astype(jnp.float32)[:, None]
        stop = alive.astype(jnp.float32)[:, None]
        moves = self._can_move(state.ally_pos, alive).astype(jnp.float32)
        return jnp.concatenate([noop, stop, moves, target_avail], axis=-1)

    def _timestep(self, state, reward, done, bad_transition, won) -> TimeStep:
        A = self.n_allies
        dead = state.ally_health <= 0
        dones = jnp.broadcast_to(done, (A,)) | dead  # StarCraft2_Env.py:571-577
        return TimeStep(
            obs=self._obs(state),
            share_obs=self._state(state),
            rewards=jnp.broadcast_to(reward, (A, 1)).astype(jnp.float32),
            dones=dones,
            bad_transition=bad_transition,
            available_actions=self._avail(state),
            agent_state=self._agent_state(state)
            if self.state_type == "FP"
            else None,
            metrics={
                "won": won.astype(jnp.float32),
                "dead_allies": jnp.mean((state.ally_health <= 0).astype(jnp.float32)),
                "dead_enemies": jnp.mean((state.enemy_health <= 0).astype(jnp.float32)),
            },
        )


def _shield_frac(shield, types):
    return shield / jnp.maximum(TYPE_SHIELD[types], 1.0)


def _drop_diag(af: jnp.ndarray) -> jnp.ndarray:
    """(A, A, F) → (A, (A−1)·F) removing each agent's self row."""
    A, _, F = af.shape
    rows = []
    for i in range(A):
        others = [j for j in range(A) if j != i]
        rows.append(af[i, jnp.array(others)].reshape(-1))
    return jnp.stack(rows)


def make_smaclite(map_name: str = "5m_vs_5m", **kwargs) -> SMACLite:
    """Build a map from the registry (smac_maps.py parity), a generic
    'Nm_vs_Mm' marine pattern, or a SMACv2 capability name
    ('protoss_5_vs_5', 'terran_10_vs_11', …)."""
    episode_limit = kwargs.pop("episode_limit", None)
    v2 = load_smacv2_map_config(map_name)
    if v2 is not None:
        return SMACLite(
            ally_types=(v2["pool"][0],) * v2["n_units"],
            enemy_types=(v2["pool"][0],) * v2["n_enemies"],
            episode_limit=episode_limit or 150,
            randomize_types=True,
            race_pool=v2["pool"], race_weights=v2["weights"],
            exception_types=v2["exception_types"],
            surround_p=v2["surround_p"],
            **kwargs,
        )
    for race, (pool, weights) in SMACV2_POOLS.items():
        if map_name.startswith(race):
            parts = map_name.split("_")
            n_allies = int(parts[1])
            n_enemies = int(parts[3]) if len(parts) > 3 else n_allies
            return SMACLite(
                ally_types=(pool[0],) * n_allies,
                enemy_types=(pool[0],) * n_enemies,
                episode_limit=episode_limit or 150,
                randomize_types=True,
                race_pool=pool, race_weights=weights,
                **kwargs,
            )
    if map_name in MAP_REGISTRY:
        ally, enemy, limit, bits = MAP_REGISTRY[map_name]
        return SMACLite(
            ally_types=ally, enemy_types=enemy,
            episode_limit=episode_limit or limit, unit_type_bits=bits,
            **kwargs,
        )
    # generic marine pattern fallback: '7m', '12m_vs_13m'
    name = map_name.replace("m", "").split("_vs_")
    if len(name) == 2:
        n_allies, n_enemies = int(name[0]), int(name[1])
    else:
        n_allies = n_enemies = int(name[0])
    return SMACLite(
        ally_types=(MARINE,) * n_allies, enemy_types=(MARINE,) * n_enemies,
        episode_limit=episode_limit or 100, **kwargs,
    )
