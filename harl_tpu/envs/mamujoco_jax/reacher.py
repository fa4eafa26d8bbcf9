"""Pure-JAX Reacher-v2: the MAMuJoCo 2-agent reacher on device.

Reference counterpart: the MAMuJoCo ``Reacher-v2 2x1`` scenario
(``harl/envs/mamujoco/multiagent_mujoco/obsk.py:525-574`` — one agent per
joint of Gym's 2-link planar arm). Dynamics follow Gym's ``reacher.xml``:
two 0.1 m links (capsule r=0.01, default density 1000) rotating about z in
the horizontal plane (gravity ⊥ plane → no gravity torque), joint
``armature=1 damping=1`` (armature dominates the tiny link inertia, which is
what makes Gym's reacher feel like a damped double integrator), gear 200,
``dt=0.01`` × ``frame_skip=2``, joint1 limited to ±3 rad. Reward
(``gym/envs/mujoco/reacher.py``): −‖fingertip − target‖ − ‖a‖², no
termination, 50-step time limit. Reset: qpos ±0.1 noise, qvel ±0.005,
target uniformly re-sampled in the ‖g‖<0.2 disk (rejection via a polar
draw, which matches the support without a while-loop under jit).

Mass matrix is assembled by autodiff over link sample points exactly like
:mod:`.swimmer` — tiny 2×2 solves, vmapped over thousands of envs.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from harl_tpu.envs.core import TimeStep
from harl_tpu.utils import spaces

DT = 0.01
FRAME_SKIP = 2
GEAR = 200.0
ARMATURE = 1.0
JOINT_DAMPING = 1.0
LINK_LEN = 0.1
FINGER_LEN = 0.11          # joint1 → fingertip
LINK_MASS = 1000.0 * (math.pi * 0.01 ** 2 * LINK_LEN
                      + (4.0 / 3.0) * math.pi * 0.01 ** 3)
J1_RANGE = (-3.0, 3.0)
LIMIT_K = 300.0
LIMIT_C = 10.0
EPISODE_LIMIT = 50


class ReacherState(NamedTuple):
    q: jnp.ndarray       # (2,) joint angles
    qd: jnp.ndarray      # (2,)
    target: jnp.ndarray  # (2,)
    t: jnp.ndarray       # () int32


def _points(q):
    """Sample points along both links + fingertip, (P, 2)."""
    th0 = q[0]
    th1 = q[0] + q[1]
    e0 = jnp.array([jnp.cos(th0), jnp.sin(th0)])
    e1 = jnp.array([jnp.cos(th1), jnp.sin(th1)])
    elbow = LINK_LEN * e0
    tip = elbow + FINGER_LEN * e1
    return jnp.stack([
        0.5 * LINK_LEN * e0, elbow,                       # link0 mid + end
        elbow + 0.5 * LINK_LEN * e1, elbow + LINK_LEN * e1,  # link1
        tip,
    ])


_PT_MASS = jnp.asarray([
    2 * LINK_MASS / 3, LINK_MASS / 3,
    2 * LINK_MASS / 3, LINK_MASS / 3,
    0.01,  # fingertip sphere (r=0.01, density 1000) ≈ 4.2e-3 kg, rounded up
])


def fingertip(q):
    return _points(q)[-1]


@dataclasses.dataclass(frozen=True)
class ReacherMAMuJoCo:
    """MAMuJoCo Reacher-v2 2x1 (one agent per joint)."""

    n_agents: int = 2
    episode_limit: int = EPISODE_LIMIT

    @property
    def state_dim(self) -> int:
        # cos/sin of both joints + target + qvel + fingertip−target (2D)
        return 4 + 2 + 2 + 2

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
        return [spaces.Box.create(-1.0, 1.0, 1)] * self.n_agents

    # ------------------------------------------------------------------ api
    def reset(self, key) -> Tuple[ReacherState, TimeStep]:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        q = jax.random.uniform(k1, (2,), minval=-0.1, maxval=0.1)
        qd = jax.random.uniform(k2, (2,), minval=-0.005, maxval=0.005)
        # uniform over the ‖g‖<0.2 disk (gym rejection-samples the same set)
        r = 0.2 * jnp.sqrt(jax.random.uniform(k3, ()))
        phi = jax.random.uniform(k4, (), minval=0.0, maxval=2.0 * math.pi)
        target = r * jnp.array([jnp.cos(phi), jnp.sin(phi)])
        state = ReacherState(q=q, qd=qd, target=target,
                             t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, jnp.zeros(()), jnp.zeros((), bool),
                                     jnp.zeros((), bool))

    def _substep(self, q, qd, tau):
        J = jax.jacfwd(_points)(q)                      # (P, 2, 2)
        vel_of_q = lambda qq: jax.jvp(_points, (qq,), (qd,))[1]
        _, a_bias = jax.jvp(vel_of_q, (q,), (qd,))
        M = jnp.einsum("p,pci,pcj->ij", _PT_MASS, J, J) + ARMATURE * jnp.eye(2)
        corio = jnp.einsum("p,pci,pc->i", _PT_MASS, J, a_bias)
        Q = GEAR * tau
        over = (jnp.maximum(q[1] - J1_RANGE[1], 0.0)
                - jnp.maximum(J1_RANGE[0] - q[1], 0.0))
        Q = Q.at[1].add(-LIMIT_K * over)
        damp = jnp.array([JOINT_DAMPING,
                          JOINT_DAMPING + LIMIT_C * (over != 0.0)])
        rhs = M @ qd + DT * (Q - corio)
        qd_new = jnp.linalg.solve(M + DT * jnp.diag(damp), rhs)
        return q + DT * qd_new, qd_new

    def step(self, state: ReacherState, actions, key) -> Tuple[ReacherState, TimeStep]:
        del key
        a = jnp.clip(jnp.stack([jnp.asarray(actions[i]).reshape(())
                                for i in range(self.n_agents)]), -1.0, 1.0)
        # gym Reacher-v2 computes reward_dist from the fingertip BEFORE
        # do_simulation (reacher.py step()); match that ordering
        dist = jnp.linalg.norm(fingertip(state.q) - state.target)
        q, qd = state.q, state.qd
        for _ in range(FRAME_SKIP):
            q, qd = self._substep(q, qd, a)
        reward = -dist - jnp.sum(a ** 2)
        new_t = state.t + 1
        trunc = new_t >= self.episode_limit
        new_state = ReacherState(q=q, qd=qd, target=state.target, t=new_t)
        return new_state, self._timestep(new_state, reward, trunc, trunc)

    # ---------------------------------------------------------- observation
    def _state_vec(self, state: ReacherState) -> jnp.ndarray:
        tip = fingertip(state.q)
        return jnp.concatenate([
            jnp.cos(state.q), jnp.sin(state.q), state.target, state.qd,
            tip - state.target,
        ]).astype(jnp.float32)

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


def make_reacher(env_args: dict) -> ReacherMAMuJoCo:
    conf = env_args.get("agent_conf", "2x1")
    n_agents = int(conf.split("x")[0])
    if n_agents != 2:
        raise ValueError("Reacher-v2 supports agent_conf 2x1 only")
    return ReacherMAMuJoCo(
        episode_limit=env_args.get("episode_limit", EPISODE_LIMIT))
