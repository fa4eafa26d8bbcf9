"""Off-policy joint-action Q critics (jit-compiled).

Parity targets:
  * ``harl/algorithms/critics/continuous_q_critic.py`` — single Q(s, joint-a),
    n-step target r + γⁿ·Q′·(1−term/done);
  * ``twin_continuous_q_critic.py`` — twin Qs, min-target, one Adam over both;
  * ``soft_twin_continuous_q_critic.py`` — SAC target r + γⁿ(minQ′ −
    α·logπ′)(1−term/done), one-hot discrete joint actions, optional ValueNorm
    on q-targets, critic-side auto-alpha;
  * ``discrete_q_critic.py`` — one DuelingQNet over the joint action space
    ∏nᵢ with mixed-radix joint↔individual codecs and coordinate-descent
    ``train_values`` closures.

All critics operate on EP-state batches from ``buffers.off_policy.Sample``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from harl_tpu.algos.common import huber_loss, soft_update
from harl_tpu.models.values import ContinuousQNet, DuelingQNet
from harl_tpu.ops.value_norm import ValueNormState, denormalize, normalize, update_value_norm
from harl_tpu.utils import spaces


class QCriticState(NamedTuple):
    params: Tuple              # (q1,) or (q1, q2)
    target_params: Tuple
    opt_state: any
    log_alpha: Optional[jnp.ndarray]        # soft critic auto-alpha
    alpha_opt_state: Optional[any]
    value_norm: Optional[ValueNormState]


def encode_joint_actions(actions: Tuple[jnp.ndarray, ...], act_spaces) -> jnp.ndarray:
    """Concat per-agent actions for ContinuousQNet input; discrete spaces are
    one-hot encoded (soft_twin_continuous_q_critic.py:107-127)."""
    enc = []
    for a, sp in zip(actions, act_spaces):
        kind = spaces.space_kind(sp)
        if kind == "Box":
            enc.append(a)
        elif kind == "Discrete":
            enc.append(jax.nn.one_hot(a[..., 0].astype(jnp.int32), sp.n))
        else:
            enc.append(
                jnp.concatenate(
                    [
                        jax.nn.one_hot(a[..., i].astype(jnp.int32), int(n))
                        for i, n in enumerate(sp.nvec)
                    ],
                    axis=-1,
                )
            )
    return jnp.concatenate(enc, axis=-1)


class ContinuousQCritic:
    """Single Q(s, joint-a) (continuous_q_critic.py)."""

    n_q = 1
    soft = False

    def __init__(self, share_obs_dim, act_spaces, cfg: dict):
        self.share_obs_dim = share_obs_dim
        self.act_spaces = act_spaces
        self.critic_lr = cfg["critic_lr"]
        self.polyak = cfg["polyak"]
        self.use_proper_time_limits = cfg.get("use_proper_time_limits", True)
        self.use_huber_loss = cfg.get("use_huber_loss", False)
        self.huber_delta = cfg.get("huber_delta", 10.0)
        self.auto_alpha = cfg.get("auto_alpha", False)
        self.alpha = cfg.get("alpha", 0.2)
        self.alpha_lr = cfg.get("alpha_lr", 3e-4)
        self.use_valuenorm = cfg.get("use_valuenorm", False) and self.soft
        self.use_policy_active_masks = cfg.get("use_policy_active_masks", True)
        # FP state: env-level sample fields are (N·B, ·); joint actions tiled
        # (soft_twin_continuous_q_critic.py:128-147)
        self.fp_agents = cfg.get("_fp_agents", 1)
        self.net = ContinuousQNet(
            hidden_sizes=tuple(cfg["hidden_sizes"]),
            activation_func=cfg.get("activation_func", "relu"),
        )
        self.tx = optax.adam(self.critic_lr)
        self.alpha_tx = optax.adam(self.alpha_lr)

    def _joint_dim(self):
        return sum(
            sp.shape[0] if spaces.space_kind(sp) == "Box" else spaces.get_num_actions(sp)
            for sp in self.act_spaces
        )

    def init(self, key) -> QCriticState:
        keys = jax.random.split(key, self.n_q)
        so = jnp.zeros((1, self.share_obs_dim))
        ja = jnp.zeros((1, self._joint_dim()))
        params = tuple(self.net.init(k, so, ja) for k in keys)
        from harl_tpu.ops.value_norm import init_value_norm

        log_alpha = jnp.zeros(()) if (self.soft and self.auto_alpha) else None
        return QCriticState(
            params=params,
            target_params=params,
            opt_state=self.tx.init(params),
            log_alpha=log_alpha,
            alpha_opt_state=self.alpha_tx.init(log_alpha) if log_alpha is not None else None,
            value_norm=init_value_norm(1) if self.use_valuenorm else None,
        )

    # -- evaluation ---------------------------------------------------------
    def get_values(self, state: QCriticState, share_obs, joint_actions):
        qs = [self.net.apply(p, share_obs, joint_actions) for p in state.params]
        if self.n_q == 1:
            return qs[0]
        return jnp.minimum(qs[0], qs[1])

    def _target_q(self, state, next_share_obs, next_joint_actions):
        qs = [self.net.apply(p, next_share_obs, next_joint_actions) for p in state.target_params]
        return qs[0] if self.n_q == 1 else jnp.minimum(qs[0], qs[1])

    # -- training -----------------------------------------------------------
    def train(
        self,
        state: QCriticState,
        sample,
        next_joint_actions: jnp.ndarray,
        next_logp: Optional[jnp.ndarray] = None,
        alpha: Optional[jnp.ndarray] = None,
    ) -> QCriticState:
        joint_actions = encode_joint_actions(sample.actions, self.act_spaces)
        if self.fp_agents > 1:
            joint_actions = jnp.tile(joint_actions, (self.fp_agents, 1))
            next_joint_actions = jnp.tile(next_joint_actions, (self.fp_agents, 1))
            if next_logp is not None:
                next_logp = jnp.tile(next_logp, (self.fp_agents, 1))
        next_q = self._target_q(state, sample.next_share_obs, next_joint_actions)
        not_end = 1.0 - (sample.terms if self.use_proper_time_limits else sample.dones)
        vn = state.value_norm
        if self.soft:
            assert next_logp is not None
            if vn is not None:
                q_targets = sample.rewards + sample.gamma * (
                    denormalize(vn, next_q) - alpha * next_logp
                ) * not_end
                vn = update_value_norm(vn, q_targets)
                q_targets = normalize(vn, q_targets)
            else:
                q_targets = sample.rewards + sample.gamma * (next_q - alpha * next_logp) * not_end
        else:
            q_targets = sample.rewards + sample.gamma * next_q * not_end
        q_targets = jax.lax.stop_gradient(q_targets)

        if self.fp_agents > 1 and self.soft and self.use_policy_active_masks:
            valid = jnp.concatenate(sample.valid_transitions, axis=0)  # (N·B, 1)
        else:
            valid = None

        def loss_fn(params):
            loss = 0.0
            for p in params:
                q = self.net.apply(p, sample.share_obs, joint_actions)
                err = q - q_targets
                e = huber_loss(err, self.huber_delta) if self.use_huber_loss else err ** 2
                if valid is not None:  # FP valid-transition masking (:175-237)
                    loss = loss + jnp.sum(e * valid) / jnp.maximum(jnp.sum(valid), 1e-9)
                else:
                    loss = loss + jnp.mean(e)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state._replace(params=new_params, opt_state=new_opt, value_norm=vn), loss

    def update_alpha(self, state: QCriticState, logp_sum, target_entropy):
        """Critic-side auto-alpha (soft_twin_continuous_q_critic.py:44-57)."""

        def loss_fn(log_alpha):
            return -jnp.mean(log_alpha * jax.lax.stop_gradient(logp_sum + target_entropy))

        grads = jax.grad(loss_fn)(state.log_alpha)
        updates, new_opt = self.alpha_tx.update(grads, state.alpha_opt_state, state.log_alpha)
        return state._replace(
            # clamp: when the squashed-Gaussian std hits its -20 floor, logp
            # jumps to ~+100 and the alpha loop can overflow through the
            # critic target's alpha*logp term within a few hundred updates
            # (observed as a NaN cascade at ~700k steps on the stabilized
            # n20 MPE config); bounding log_alpha breaks the cascade without
            # affecting normal operation (alpha stays in [1e-7, 7.4])
            log_alpha=jnp.clip(
                optax.apply_updates(state.log_alpha, updates), -16.0, 2.0),
            alpha_opt_state=new_opt
        )

    def soft_update_targets(self, state: QCriticState) -> QCriticState:
        return state._replace(
            target_params=soft_update(state.target_params, state.params, self.polyak)
        )


class TwinContinuousQCritic(ContinuousQCritic):
    """Twin Qs with min-target (twin_continuous_q_critic.py). MSE loss."""

    n_q = 2
    soft = False


class SoftTwinContinuousQCritic(TwinContinuousQCritic):
    """SAC-style target with entropy term and optional ValueNorm
    (soft_twin_continuous_q_critic.py). Huber loss honored."""

    soft = True

    def __init__(self, share_obs_dim, act_spaces, cfg):
        super().__init__(share_obs_dim, act_spaces, cfg)
        self.use_huber_loss = cfg.get("use_huber_loss", True)


class DiscreteQCritic:
    """Joint-action dueling Q critic for HAD3QN (discrete_q_critic.py)."""

    def __init__(self, share_obs_dim, act_spaces, cfg: dict):
        for sp in act_spaces:
            assert spaces.space_kind(sp) == "Discrete"
        self.share_obs_dim = share_obs_dim
        self.act_spaces = act_spaces
        self.action_dims = [sp.n for sp in act_spaces]
        self.joint_action_dim = 1
        for n in self.action_dims:
            self.joint_action_dim *= n
        self.critic_lr = cfg["critic_lr"]
        self.polyak = cfg["polyak"]
        self.use_proper_time_limits = cfg.get("use_proper_time_limits", True)
        self.net = DuelingQNet(
            output_dim=self.joint_action_dim,
            base_hidden_sizes=tuple(cfg.get("base_hidden_sizes", cfg["hidden_sizes"])),
            base_activation_func=cfg.get("base_activation_func", "relu"),
            dueling_v_hidden_sizes=tuple(cfg.get("dueling_v_hidden_sizes", [128])),
            dueling_v_activation_func=cfg.get("dueling_v_activation_func", "hardswish"),
            dueling_a_hidden_sizes=tuple(cfg.get("dueling_a_hidden_sizes", [128])),
            dueling_a_activation_func=cfg.get("dueling_a_activation_func", "hardswish"),
        )
        self.tx = optax.adam(self.critic_lr)

    def init(self, key) -> QCriticState:
        so = jnp.zeros((1, self.share_obs_dim))
        params = (self.net.init(key, so),)
        return QCriticState(params, params, self.tx.init(params), None, None, None)

    # mixed-radix codecs (discrete_q_critic.py:149-217)
    def indiv_to_joint(self, actions: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
        joint = jnp.zeros_like(actions[0], dtype=jnp.int32)
        accum = 1
        for a, dim in zip(actions, self.action_dims):
            joint = joint + accum * a.astype(jnp.int32)
            accum *= dim
        return joint

    def joint_to_indiv(self, joint: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        out = []
        a = joint.astype(jnp.int32)
        for dim in self.action_dims:
            out.append(a % dim)
            a = a // dim
        return tuple(out)

    def get_joint_idx(self, actions, agent_id: int) -> jnp.ndarray:
        """(batch, n_agent_actions) joint indices with agent_id free
        (discrete_q_critic.py:196-217)."""
        batch = actions[0].shape[0]
        n_i = self.action_dims[agent_id]
        joint = jnp.zeros((batch, n_i), jnp.int32)
        accum = 1
        for i, dim in enumerate(self.action_dims):
            if i == agent_id:
                joint = joint + accum * jnp.arange(n_i, dtype=jnp.int32)[None, :]
            else:
                joint = joint + accum * actions[i].astype(jnp.int32)
            accum *= dim
        return joint

    def q_all(self, params, share_obs):
        return self.net.apply(params[0], share_obs)

    def get_values(self, state: QCriticState, share_obs, actions):
        joint = self.indiv_to_joint(actions)
        return jnp.take_along_axis(self.q_all(state.params, share_obs), joint, axis=-1)

    def train(self, state: QCriticState, sample, next_actions, next_logp=None, alpha=None):
        joint = self.indiv_to_joint(sample.actions)
        next_joint = self.indiv_to_joint(next_actions)
        next_q = jnp.take_along_axis(
            self.q_all(state.target_params, sample.next_share_obs), next_joint, axis=-1
        )
        not_end = 1.0 - (sample.terms if self.use_proper_time_limits else sample.dones)
        q_targets = jax.lax.stop_gradient(sample.rewards + sample.gamma * next_q * not_end)

        def loss_fn(params):
            q = jnp.take_along_axis(self.q_all(params, sample.share_obs), joint, axis=-1)
            return jnp.mean((q - q_targets) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        return state._replace(
            params=optax.apply_updates(state.params, updates), opt_state=new_opt
        ), loss

    def soft_update_targets(self, state: QCriticState) -> QCriticState:
        return state._replace(
            target_params=soft_update(state.target_params, state.params, self.polyak)
        )
