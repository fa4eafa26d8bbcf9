"""On-policy centralized V-critic update (pure-functional, jit-compiled).

Parity target: ``harl/algorithms/critics/v_critic.py`` — clipped value loss
with optional Huber and ValueNorm target normalization (cal_value_loss
:75-114), ``critic_epoch`` × ``critic_num_mini_batch`` shuffled minibatches
(:159-200), grad clip + Adam, loss scaled by ``value_loss_coef`` (:146).

The ValueNorm running statistics are updated per-minibatch *before* each loss
evaluation, exactly like the reference side effect ordering (:93-96), and the
updated state is threaded through the scan.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from harl_tpu.algos.common import AgentTrainState, global_grad_norm, huber_loss, mse_loss
from harl_tpu.ops.value_norm import ValueNormState, normalize, update_value_norm


class CriticBatch(NamedTuple):
    """Critic rollout slice, time-major (T, B, ·) (EP state layout)."""

    share_obs: jnp.ndarray     # (T, B, ds)
    rnn_states: jnp.ndarray    # (T, B, L, H)
    value_preds: jnp.ndarray   # (T, B, 1)
    returns: jnp.ndarray       # (T, B, 1)
    masks: jnp.ndarray         # (T, B, 1)


class VCritic:
    def __init__(self, critic, tx: optax.GradientTransformation, cfg: dict):
        self.critic = critic
        self.tx = tx
        self.clip_param = cfg["clip_param"]
        self.critic_epoch = cfg["critic_epoch"]
        self.num_mini_batch = cfg["critic_num_mini_batch"]
        self.value_loss_coef = cfg.get("value_loss_coef", 1.0)
        self.use_clipped_value_loss = cfg.get("use_clipped_value_loss", True)
        self.use_huber_loss = cfg.get("use_huber_loss", True)
        self.huber_delta = cfg.get("huber_delta", 10.0)
        self.use_recurrent_policy = cfg.get("use_recurrent_policy", False)
        self.use_naive_recurrent = cfg.get("use_naive_recurrent_policy", False)
        self.use_rnn = self.use_recurrent_policy or self.use_naive_recurrent
        self.data_chunk_length = cfg.get("data_chunk_length", 10)

    def init(self, key, example_share_obs):
        return self.critic.init(key, example_share_obs)

    def get_values(self, params, share_obs, rnn_states=None, masks=None):
        v, new_rnn = self.critic.apply(params, share_obs, rnn_states, masks)
        if rnn_states is None:
            return v
        return v, new_rnn

    def value_loss(self, values, value_preds, returns, vn: Optional[ValueNormState]):
        """cal_value_loss (v_critic.py:75-114); vn already updated by caller."""
        clipped = value_preds + jnp.clip(
            values - value_preds, -self.clip_param, self.clip_param
        )
        target = normalize(vn, returns) if vn is not None else returns
        err_clipped = target - clipped
        err_orig = target - values
        if self.use_huber_loss:
            l_clipped = huber_loss(err_clipped, self.huber_delta)
            l_orig = huber_loss(err_orig, self.huber_delta)
        else:
            l_clipped = mse_loss(err_clipped)
            l_orig = mse_loss(err_orig)
        if self.use_clipped_value_loss:
            loss = jnp.maximum(l_orig, l_clipped)
        else:
            loss = l_orig
        return jnp.mean(loss)

    def update(
        self,
        state: AgentTrainState,
        vn: Optional[ValueNormState],
        batch: CriticBatch,
        key,
    ) -> Tuple[AgentTrainState, Optional[ValueNormState], jnp.ndarray]:
        """Full critic train loop; returns (state, vn, stats[value_loss, grad_norm]).

        Recurrent critics use the same chunked-BPTT layout as the actor
        (recurrent_generator_critic); naive-recurrent is the L = T case
        (naive_recurrent_generator_critic)."""
        T, B = batch.share_obs.shape[:2]
        if self.use_rnn:
            L = T if not self.use_recurrent_policy else self.data_chunk_length
            C = B * (T // L)
            M = C

            def prep(x):  # (T, B, ...) → (C, L, ...)
                x = jnp.swapaxes(x, 0, 1)
                return x.reshape((C, L) + x.shape[2:])

            rnn0 = jnp.swapaxes(batch.rnn_states, 0, 1)[:, ::L]
            rnn0 = rnn0.reshape((C,) + batch.rnn_states.shape[2:])
        else:
            M = T * B
            prep = lambda x: x.reshape((M,) + x.shape[2:])
            rnn0 = None
        mb_size = M // self.num_mini_batch
        share_obs = prep(batch.share_obs)
        value_preds = prep(batch.value_preds)
        returns = prep(batch.returns)
        masks = prep(batch.masks)

        # Single-minibatch epochs are permutation-invariant: skip the
        # whole-batch random gather (dominant HBM cost at bench sizes).
        single_mb = self.num_mini_batch == 1
        if single_mb:
            idx = jnp.zeros((self.critic_epoch, 1), jnp.int32)
        else:
            perms = jax.vmap(lambda k: jax.random.permutation(k, M))(
                jax.random.split(key, self.critic_epoch)
            )
            idx = perms.reshape(self.critic_epoch * self.num_mini_batch, mb_size)

        def loss_fn(params, mb_idx, vn):
            if single_mb:
                take = lambda x: x
            else:
                take = lambda x: jnp.take(x, mb_idx, axis=0)
            so, vp, ret = take(share_obs), take(value_preds), take(returns)
            if self.use_rnn:
                tm = lambda x: jnp.swapaxes(x, 0, 1)
                values, _ = self.critic.apply(
                    params, tm(so), take(rnn0), tm(take(masks)), seq=True
                )
                vp, ret = tm(vp), tm(ret)
            else:
                values = self.get_values(params, so)
            loss = self.value_loss(values, vp, ret, vn)
            return loss * self.value_loss_coef, loss

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def minibatch_step(carry, mb_idx):
            st, vn = carry
            if vn is not None:  # reference updates normalizer per minibatch (:93-96)
                ret = returns if single_mb else jnp.take(returns, mb_idx, axis=0)
                vn = update_value_norm(vn, ret)
            (_, loss), grads = grad_fn(st.params, mb_idx, vn)
            gnorm = global_grad_norm(grads)
            updates, new_opt = self.tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            return (AgentTrainState(new_params, new_opt), vn), jnp.stack([loss, gnorm])

        (state, vn), stats = jax.lax.scan(minibatch_step, (state, vn), idx)
        return state, vn, jnp.mean(stats, axis=0)
