"""Pure-JAX coupled_half_cheetah: two cheetahs joined by a tendon.

Reference counterpart:
``harl/envs/mamujoco/multiagent_mujoco/coupled_half_cheetah.py`` +
``assets/coupled_half_cheetah.xml`` — two complete HalfCheetah robots at a
constant out-of-plane offset (torsos at y = ∓1), connected by a spatial
tendon between their torso sites (``range="1.5 3.5" stiffness="0.1"``), with
team reward = mean of the two run rewards + mean of the two control costs and
no unhealthy termination (``coupled_half_cheetah.py:20-43``). The default
MAMuJoCo factorization is ``1p1``: one agent per cheetah
(``obsk.py:662-676``).

TPU-native design: each cheetah is the planar HalfCheetah rigid-body tree
from ``planar.py`` (same analytic-kinematics substep), and the tendon is an
in-plane external root force recomputed every substep — a weak spring toward
the rest length (2.0, the model's qpos0 tendon length) plus stiff penalty
springs outside the [1.5, 3.5] limit range, the same penalty treatment the
engine uses for joint limits. Observations mirror the reference env exactly:
``concat(qpos[1:], qvel)`` over the STACKED 18-dof coordinate vector (the
second cheetah's absolute x stays in the state — a quirk of the reference
``_get_obs`` worth preserving for parity).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.core import TimeStep
from harl_tpu.envs.mamujoco_jax.planar import HALF_CHEETAH, PlanarDynamics
from harl_tpu.utils import spaces

TENDON_Y_SEP = 2.0          # constant |Δy| between the two torsos
TENDON_REST = 2.0           # tendon length at qpos0 (springlength default)
TENDON_STIFF = 0.1          # xml: stiffness="0.1"
TENDON_LIMITS = (1.5, 3.5)  # xml: range="1.5 3.5" (hard limit -> penalty)
LIMIT_STIFF = 2000.0


class CoupledState(NamedTuple):
    q: jnp.ndarray   # (2, 9) per-cheetah generalized coords
    qd: jnp.ndarray  # (2, 9)
    t: jnp.ndarray   # () int32


@dataclasses.dataclass(frozen=True)
class CoupledHalfCheetah:
    """2 agents, one full cheetah each (agent_conf "1p1")."""

    dyn: PlanarDynamics
    episode_limit: int = 1000
    n_agents: int = 2

    @property
    def spec(self):
        return self.dyn.spec

    @property
    def state_dim(self) -> int:
        # qpos[1:] (17) + qvel (18) over the stacked 18-dof vector
        return 2 * self.spec.dof * 2 - 1

    @property
    def obs_dim(self) -> int:
        return self.state_dim + self.n_agents

    @property
    def observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.obs_dim)] * 2

    @property
    def share_observation_space(self):
        return [spaces.Box.create(-jnp.inf, jnp.inf, self.state_dim)] * 2

    @property
    def action_space(self):
        return [spaces.Box.create(-1.0, 1.0, self.spec.n_joints)] * 2

    # ----------------------------------------------------------------- api
    def reset(self, key) -> Tuple[CoupledState, TimeStep]:
        spec = self.spec
        k1, k2 = jax.random.split(key)
        q = jax.random.uniform(k1, (2, spec.dof), minval=-0.1, maxval=0.1)
        qd = 0.1 * jax.random.normal(k2, (2, spec.dof))
        state = CoupledState(q=q, qd=qd, t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool))

    def _tendon_force(self, qA, qB):
        """In-plane force on cheetah A's root from the tendon (−f on B)."""
        d = jnp.stack([qA[0] - qB[0], qA[1] - qB[1]])       # in-plane Δ
        length = jnp.sqrt(jnp.sum(d * d) + TENDON_Y_SEP ** 2)
        # tension > 0 pulls the torsos together
        tension = TENDON_STIFF * (length - TENDON_REST)
        tension = tension + LIMIT_STIFF * jnp.maximum(length - TENDON_LIMITS[1], 0.0)
        # lower-limit branch kept for parity with the XML's range="1.5 3.5",
        # but unreachable here: with constant TENDON_Y_SEP=2.0 the 3D length
        # is always >= 2.0 > 1.5
        tension = tension - LIMIT_STIFF * jnp.maximum(TENDON_LIMITS[0] - length, 0.0)
        return -tension * d / length

    def step(self, state: CoupledState, actions, key):
        del key
        spec = self.spec
        tau = jnp.clip(jnp.asarray(actions).reshape(2, spec.n_joints), -1.0, 1.0)
        qA, qB = state.q[0], state.q[1]
        qdA, qdB = state.qd[0], state.qd[1]
        for _ in range(spec.frame_skip):
            f = self._tendon_force(qA, qB)
            qA_n, qdA_n = self.dyn._substep(qA, qdA, tau[0], root_force=f)
            qB, qdB = self.dyn._substep(qB, qdB, tau[1], root_force=-f)
            qA, qdA = qA_n, qdA_n
        dt_env = spec.dt * spec.frame_skip
        run = ((qA[0] - state.q[0, 0]) + (qB[0] - state.q[1, 0])) / dt_env / 2.0
        ctrl = 0.1 * (jnp.sum(tau[0] ** 2) + jnp.sum(tau[1] ** 2)) / 2.0
        reward = run - ctrl
        new_t = state.t + 1
        trunc = new_t >= self.episode_limit
        bad = trunc  # never terminates -> any done is a truncation
        new_state = CoupledState(
            q=jnp.stack([qA, qB]), qd=jnp.stack([qdA, qdB]), t=new_t)
        return new_state, self._timestep(new_state, reward, trunc, bad)

    # --------------------------------------------------------- observation
    def _state_vec(self, state: CoupledState) -> jnp.ndarray:
        qpos = state.q.reshape(-1)
        qvel = state.qd.reshape(-1)
        return jnp.concatenate([qpos[1:], qvel]).astype(jnp.float32)

    def _timestep(self, state, reward, done, bad) -> TimeStep:
        sv = self._state_vec(state)
        ids = jnp.eye(2)
        obs = jnp.concatenate(
            [jnp.broadcast_to(sv[None], (2, sv.shape[0])), ids], axis=-1)
        mean = jnp.mean(obs, axis=-1, keepdims=True)
        std = jnp.std(obs, axis=-1, keepdims=True) + 1e-8
        obs = (obs - mean) / std
        return TimeStep(
            obs=obs,
            share_obs=sv,
            rewards=jnp.broadcast_to(reward, (2, 1)).astype(jnp.float32),
            dones=jnp.broadcast_to(done, (2,)),
            bad_transition=bad,
            available_actions=None,
        )


def make_coupled(env_args: dict) -> CoupledHalfCheetah:
    conf = env_args.get("agent_conf", "1p1")
    if conf not in ("1p1", None):
        raise ValueError(
            f"coupled_half_cheetah supports agent_conf '1p1', got {conf!r}")
    return CoupledHalfCheetah(
        dyn=PlanarDynamics(HALF_CHEETAH),
        episode_limit=env_args.get("episode_limit", 1000),
    )
