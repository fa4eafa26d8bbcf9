"""HAPPO actor update (pure-functional, jit-compiled).

Parity target: ``harl/algorithms/actors/happo.py`` + the on-policy base
(``on_policy_base.py``). One call to ``update`` performs the full
per-agent training step of the reference ``HAPPO.train``:
  * EP advantage re-normalization with the agent's active mask
    (happo.py:122-127),
  * ``ppo_epoch`` epochs × ``actor_num_mini_batch`` shuffled minibatches
    (feed_forward_generator_actor, on_policy_actor_buffer.py:114-178),
  * PPO-clip surrogate re-weighted by the HARL factor with active-mask
    normalization (happo.py:66-91), entropy bonus, global-norm grad clip.

All of it is expressed as a single ``lax.scan`` over (epoch × minibatch)
slices so the whole agent update is one fused XLA program.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from harl_tpu.algos.common import AgentTrainState, aggregate_ratio, global_grad_norm
from harl_tpu.models.act import act_evaluate
from harl_tpu.ops.returns import normalize_advantages_masked


class ActorBatch(NamedTuple):
    """One agent's rollout slice, time-major (T, B, ·) — the actor buffer rows
    actually consumed by training (obs[:-1], masks[:-1], … in the reference)."""

    obs: jnp.ndarray            # (T, B, obs_dim)
    rnn_states: jnp.ndarray     # (T, B, L, H) — rnn state at input of step t
    actions: jnp.ndarray        # (T, B, act_dim)
    logp: jnp.ndarray           # (T, B, lp) — behavior log-probs from rollout
    masks: jnp.ndarray          # (T, B, 1)
    active_masks: jnp.ndarray   # (T, B, 1)
    available_actions: Optional[jnp.ndarray]  # (T, B, n_act) or None


def _flat(x):
    return x.reshape((-1,) + x.shape[2:])


class HAPPOActor:
    """Factory binding the policy module, action space and config into jittable
    update functions. Stateless; all state lives in AgentTrainState."""

    use_clip = True          # HAA2C overrides (unclipped surrogate, haa2c.py:64-82)
    epoch_key = "ppo_epoch"  # HAA2C uses "a2c_epoch"

    def __init__(self, policy, action_space, tx: optax.GradientTransformation, cfg: dict):
        self.policy = policy
        self.action_space = action_space
        self.tx = tx
        self.clip_param = cfg.get("clip_param", 0.2)
        self.ppo_epoch = cfg[self.epoch_key]
        self.num_mini_batch = cfg["actor_num_mini_batch"]
        self.entropy_coef = cfg["entropy_coef"]
        self.use_policy_active_masks = cfg.get("use_policy_active_masks", True)
        self.action_aggregation = cfg.get("action_aggregation", "prod")
        self.std_x_coef = cfg.get("std_x_coef", 1.0)
        self.std_y_coef = cfg.get("std_y_coef", 0.5)
        self.use_recurrent_policy = cfg.get("use_recurrent_policy", False)
        self.use_naive_recurrent = cfg.get("use_naive_recurrent_policy", False)
        self.use_rnn = self.use_recurrent_policy or self.use_naive_recurrent
        self.data_chunk_length = cfg.get("data_chunk_length", 10)

    def init(self, key, example_obs) -> Any:
        return self.policy.init(key, example_obs)

    # -- forward helpers ----------------------------------------------------
    def evaluate_logp(self, params, batch: ActorBatch) -> jnp.ndarray:
        """Full-batch behavior log-probs (the factor evaluations at
        on_policy_ha_runner.py:66-83,96-113). Returns (T·B, lp).

        Recurrent policies run the whole episode in sequence mode from the
        stored initial hidden state (rnn_states[0:1] in the reference)."""
        if self.use_rnn:
            head, _ = self.policy.apply(
                params, batch.obs, batch.rnn_states[0], batch.masks, seq=True
            )
        else:
            head, _ = self.policy.apply(params, _flat(batch.obs))
            head = jax.tree.map(
                lambda x: x.reshape(batch.obs.shape[:2] + x.shape[1:]), head
            )
        ev = act_evaluate(
            head,
            self.action_space,
            batch.actions,
            batch.available_actions,
            batch.active_masks,
            self.std_x_coef,
            self.std_y_coef,
        )
        return _flat(ev.log_probs)

    # -- training -----------------------------------------------------------
    def update(
        self,
        state: AgentTrainState,
        batch: ActorBatch,
        advantages: jnp.ndarray,  # (T, B, 1) un-normalized EP advantages
        factor: jnp.ndarray,      # (T, B, 1)
        key,
        state_type: str = "EP",
    ):
        """Full HAPPO.train for one agent. Returns (new_state, stats).

        Feed-forward path: shuffled flat minibatches
        (feed_forward_generator_actor). Recurrent path: chunked BPTT — the
        episode is cut into ``data_chunk_length`` segments whose initial
        hidden states come from the rollout (recurrent_generator_actor,
        on_policy_actor_buffer.py:223-326), and each minibatch of chunks runs
        the GRU in sequence mode. Naive-recurrent path
        (naive_recurrent_generator_actor, :180-221): minibatches of WHOLE
        env threads — the degenerate chunking with L = T.
        """
        T, B = batch.obs.shape[:2]

        if state_type == "EP":
            advantages = normalize_advantages_masked(advantages, batch.active_masks)

        if self.use_rnn:
            L = T if not self.use_recurrent_policy else self.data_chunk_length
            assert T % L == 0, "episode_length must be a multiple of data_chunk_length"
            C = B * (T // L)
            M = C
            def prep(x):  # (T, B, ...) → (C, L, ...)
                x = jnp.swapaxes(x, 0, 1)
                return x.reshape((C, L) + x.shape[2:])

            rnn0 = jnp.swapaxes(batch.rnn_states, 0, 1)[:, ::L]  # (B, T/L, Lr, H)
            rnn0 = rnn0.reshape((C,) + batch.rnn_states.shape[2:])
        else:
            M = T * B
            prep = _flat
            rnn0 = None

        mb_size = M // self.num_mini_batch
        obs = prep(batch.obs)
        actions = prep(batch.actions)
        old_logp = prep(batch.logp)
        masks = prep(batch.masks)
        active = prep(batch.active_masks)
        avail = None if batch.available_actions is None else prep(batch.available_actions)
        adv = prep(advantages)
        fac = prep(factor)

        # Epoch-wise shuffles stacked into one index tensor. With a single
        # minibatch the full-batch gradient is permutation-invariant, so the
        # whole-batch random gather (the dominant HBM cost of the update at
        # bench sizes) is skipped entirely.
        single_mb = self.num_mini_batch == 1
        if single_mb:
            idx = jnp.zeros((self.ppo_epoch, 1), jnp.int32)  # scan ticker only
        else:
            perms = jax.vmap(lambda k: jax.random.permutation(k, M))(
                jax.random.split(key, self.ppo_epoch)
            )  # (E, M)
            idx = perms.reshape(self.ppo_epoch * self.num_mini_batch, mb_size)

        def loss_fn(params, mb_idx):
            if single_mb:
                take = lambda x: x
            else:
                take = lambda x: jnp.take(x, mb_idx, axis=0)
            o, a, olp, am, ad, fc = map(take, (obs, actions, old_logp, active, adv, fac))
            av = None if avail is None else take(avail)
            if self.use_rnn:
                # (mb, L, ...) → time-major (L, mb, ...) for the GRU scan
                tm = lambda x: jnp.swapaxes(x, 0, 1)
                head, _ = self.policy.apply(
                    params, tm(o), take(rnn0), tm(take(masks)), seq=True
                )
                a, olp, am, ad, fc = map(tm, (a, olp, am, ad, fc))
                av = None if av is None else tm(av)
            else:
                head, _ = self.policy.apply(params, o)
            ev = act_evaluate(head, self.action_space, a, av, am,
                              self.std_x_coef, self.std_y_coef)
            ratio = aggregate_ratio(ev.log_probs - olp, self.action_aggregation)
            surr1 = ratio * ad
            if self.use_clip:
                surr2 = jnp.clip(ratio, 1.0 - self.clip_param, 1.0 + self.clip_param) * ad
                surr = jnp.minimum(surr1, surr2)
            else:
                surr = surr1
            obj = jnp.sum(fc * surr, axis=-1, keepdims=True)
            if self.use_policy_active_masks:
                policy_loss = -jnp.sum(obj * am) / jnp.maximum(jnp.sum(am), 1e-9)
            else:
                policy_loss = -jnp.mean(obj)
            total = policy_loss - ev.entropy * self.entropy_coef
            return total, (policy_loss, ev.entropy, jnp.mean(ratio))

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def minibatch_step(st: AgentTrainState, mb_idx):
            (_, aux), grads = grad_fn(st.params, mb_idx)
            gnorm = global_grad_norm(grads)
            updates, new_opt = self.tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            policy_loss, entropy, ratio = aux
            return AgentTrainState(new_params, new_opt), jnp.stack(
                [policy_loss, entropy, gnorm, ratio]
            )

        state, stats = jax.lax.scan(minibatch_step, state, idx)
        stats = jnp.mean(stats, axis=0)  # [policy_loss, dist_entropy, grad_norm, ratio]
        return state, stats


class HAA2CActor(HAPPOActor):
    """HAA2C: unclipped factor-weighted surrogate (haa2c.py:64-82); epochs from
    ``a2c_epoch``."""

    use_clip = False
    epoch_key = "a2c_epoch"


class MAPPOActor(HAPPOActor):
    """MAPPO: identical PPO-clip loss but no factor semantics — the runner
    passes an all-ones factor and skips the factor chain (mappo.py:64-80,
    on_policy_ma_runner.py)."""
