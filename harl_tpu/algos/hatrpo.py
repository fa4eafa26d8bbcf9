"""HATRPO: trust-region actor update with the HARL factor (jit-compiled).

Parity target: ``harl/algorithms/actors/hatrpo.py`` + ``harl/utils/trpo_util.py``.
One full-batch update per iteration:

  * surrogate  L(θ) = Σ ratio·factor·adv / Σ active          (hatrpo.py:77-90)
  * g = ∇L flattened (ravel_pytree replaces flat_grad)
  * conjugate gradient (10 steps, residual tol 1e−10) solves (H+0.1 I)x = g
    where H is the Hessian of the surrogate-point KL(old‖new)
    (trpo_util.py:96-158). Fisher-vector products use forward-over-reverse
    ``jax.jvp`` of ``jax.grad`` — the natural JAX form of the reference's
    double-backward.
  * step = x/√(x·(H+0.1I)x / (2·kl_threshold))               (hatrpo.py:113-121)
  * backtracking line search (ls_step tries, backtrack_coeff shrink): accept
    when KL < kl_threshold, improvement > 0 and improvement/expected >
    accept_ratio (hatrpo.py:134-187); rollback on total failure (:189-192).

KL uses the reference's forms: per-logit ``kl_approx`` for discrete
(trpo_util.py:47-52) and diagonal-normal KL for Box (:55-62; computed in
float32 here instead of float64 — std is sigmoid-bounded so this is stable).
MultiDiscrete is unsupported, as in the reference (hatrpo.py:27-29).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from harl_tpu.algos.common import AgentTrainState, aggregate_ratio
from harl_tpu.algos.happo import ActorBatch, HAPPOActor, _flat
from harl_tpu.models.act import act_evaluate
from harl_tpu.ops import distributions as D
from harl_tpu.ops.returns import normalize_advantages_masked
from harl_tpu.utils import spaces

CG_STEPS = 10
CG_RESIDUAL_TOL = 1e-10
FVP_DAMPING = 0.1


class HATRPOActor(HAPPOActor):
    """Trust-region variant; ignores the Adam optimizer entirely."""

    epoch_key = "ppo_epoch"  # unused — single full-batch update

    def __init__(self, policy, action_space, tx, cfg):
        assert spaces.space_kind(action_space) != "MultiDiscrete", (
            "only continuous and discrete action spaces are supported by HATRPO"
        )
        cfg = dict(cfg)
        cfg.setdefault("ppo_epoch", 1)
        cfg.setdefault("actor_num_mini_batch", 1)
        cfg.setdefault("entropy_coef", 0.0)
        super().__init__(policy, action_space, tx, cfg)
        self.kl_threshold = cfg["kl_threshold"]
        self.ls_step = cfg["ls_step"]
        self.accept_ratio = cfg["accept_ratio"]
        self.backtrack_coeff = cfg["backtrack_coeff"]

    # ------------------------------------------------------------------ kl
    def _kl(self, new_head, old_head):
        """Reference KL forms, summed over action dims → (M, 1)."""
        if spaces.space_kind(self.action_space) == "Discrete":
            # kl_approx on logits (trpo_util.py:47-52)
            p, q = old_head[0], new_head[0]
            kl = jnp.exp(q - p) - 1.0 - q + p
            return jnp.sum(kl, axis=-1, keepdims=True)
        mean_p, log_std_p = old_head
        mean_q, log_std_q = new_head
        std_p = D.diag_gaussian_std(log_std_p, self.std_x_coef, self.std_y_coef)
        std_q = D.diag_gaussian_std(log_std_q, self.std_x_coef, self.std_y_coef)
        var_ratio = (std_p / std_q) ** 2
        t1 = ((mean_p - mean_q) / std_q) ** 2
        kl = 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))
        return jnp.sum(kl, axis=-1, keepdims=True)

    # -------------------------------------------------------------- update
    def update(self, state: AgentTrainState, batch: ActorBatch, advantages, factor,
               key, state_type: str = "EP"):
        del key
        T, B = batch.obs.shape[:2]
        if state_type == "EP":
            advantages = normalize_advantages_masked(advantages, batch.active_masks)

        obs = _flat(batch.obs)
        actions = _flat(batch.actions)
        old_logp = _flat(batch.logp)
        active = _flat(batch.active_masks)
        avail = None if batch.available_actions is None else _flat(batch.available_actions)
        adv = _flat(advantages)
        fac = _flat(factor)

        def forward(params):
            """Full-batch policy heads, flattened to (T·B, ·). Recurrent
            policies run the whole episode in sequence mode from the stored
            initial hidden states (the RNN-aware evaluate_actions of the
            reference hatrpo.py:222-242)."""
            if self.use_rnn:
                head, _ = self.policy.apply(
                    params, batch.obs, batch.rnn_states[0], batch.masks, seq=True
                )
                return jax.tree.map(_flat, head)
            head, _ = self.policy.apply(params, obs)
            return head

        def surrogate(params):
            head = forward(params)
            ev = act_evaluate(head, self.action_space, actions, avail, active,
                              self.std_x_coef, self.std_y_coef)
            ratio = aggregate_ratio(ev.log_probs - old_logp, self.action_aggregation)
            obj = jnp.sum(ratio * fac * adv, axis=-1, keepdims=True)
            if self.use_policy_active_masks:
                loss = jnp.sum(obj * active) / jnp.maximum(jnp.sum(active), 1e-9)
            else:
                loss = jnp.mean(obj)
            return loss, (ev.entropy, jnp.mean(ratio))

        (loss0, (entropy, ratio_mean)), grads = jax.value_and_grad(
            surrogate, has_aux=True
        )(state.params)
        g, _ = ravel_pytree(grads)
        params_flat, unravel_params = ravel_pytree(state.params)

        old_head = jax.tree.map(jax.lax.stop_gradient, forward(state.params))

        def kl_fn(params):
            return jnp.mean(self._kl(forward(params), old_head))

        kl_grad_fn = jax.grad(lambda p_flat: kl_fn(unravel_params(p_flat)))

        def fvp(v):
            """(H_kl + damping·I)·v via forward-over-reverse (trpo_util.py:132-158)."""
            _, hvp = jax.jvp(kl_grad_fn, (params_flat,), (v,))
            return hvp + FVP_DAMPING * v

        # conjugate gradient (trpo_util.py:96-129)
        def cg_body(carry):
            i, x, r, p, rdotr = carry
            avp = fvp(p)
            alpha = rdotr / jnp.dot(p, avp)
            x = x + alpha * p
            r = r - alpha * avp
            new_rdotr = jnp.dot(r, r)
            beta = new_rdotr / rdotr
            p = r + beta * p
            return i + 1, x, r, p, new_rdotr

        def cg_cond(carry):
            i, _, _, _, rdotr = carry
            return (i < CG_STEPS) & (rdotr > CG_RESIDUAL_TOL)

        x0 = jnp.zeros_like(g)
        _, step_dir, _, _, _ = jax.lax.while_loop(
            cg_cond, cg_body, (0, x0, g, g, jnp.dot(g, g))
        )

        shs = 0.5 * jnp.dot(step_dir, fvp(step_dir))
        step_size = 1.0 / jnp.sqrt(jnp.maximum(shs / self.kl_threshold, 1e-16))
        full_step = step_size * step_dir
        expected_improve0 = jnp.dot(g, full_step)

        def eval_at(p_flat):
            params = unravel_params(p_flat)
            new_loss, _ = surrogate(params)
            kl = jnp.mean(self._kl(forward(params), old_head))
            return new_loss, kl

        # backtracking line search (hatrpo.py:134-192)
        def ls_cond(carry):
            i, accepted, *_ = carry
            return (i < self.ls_step) & jnp.logical_not(accepted)

        def ls_body(carry):
            i, accepted, fraction, expected, out, kl_out, improve_out = carry
            cand = params_flat + fraction * full_step
            new_loss, kl = eval_at(cand)
            improve = new_loss - loss0
            ok = (kl < self.kl_threshold) & (improve / expected > self.accept_ratio) & (improve > 0)
            out = jnp.where(ok, cand, out)
            kl_out = jnp.where(ok, kl, kl_out)
            improve_out = jnp.where(ok, improve, improve_out)
            return (
                i + 1, accepted | ok,
                fraction * self.backtrack_coeff,
                expected * self.backtrack_coeff,
                out, kl_out, improve_out,
            )

        init = (
            0, jnp.asarray(False), jnp.asarray(1.0), expected_improve0,
            params_flat, jnp.asarray(0.0), jnp.asarray(0.0),
        )
        _, accepted, _, _, new_flat, kl_final, improve_final = jax.lax.while_loop(
            ls_cond, ls_body, init
        )
        # rollback on failure is implicit: out stays params_flat

        new_state = AgentTrainState(unravel_params(new_flat), state.opt_state)
        stats = jnp.stack([improve_final, entropy, kl_final, ratio_mean])
        return new_state, stats
