"""On-policy HARL runner: one jitted program per training iteration.

Replaces the host-side orchestration of the reference
(``harl/runners/on_policy_base_runner.py`` + ``on_policy_ha_runner.py``) with a
single XLA-compiled ``train_iteration``:

  rollout  — ``lax.scan`` over ``episode_length`` steps of the vmapped env
             batch (replacing the per-step Pipe round-trips and per-agent GPU
             forwards of on_policy_base_runner.py:203-243);
  returns  — GAE via reverse scan (ops.returns) on de-normalized values;
  update   — the HARL sequential-update scheme over agents with the factor as
             loop carry (on_policy_ha_runner.py:47-124). Random agent order is
             a ``lax.switch`` over per-agent update branches driven by
             ``jax.random.permutation``; fixed order unrolls directly;
  critic   — VCritic epochs (algos.critics) + ValueNorm state threading.

Mask bookkeeping parity (on_policy_base_runner.py:342-460):
  masks[t+1]        = 0 where env done at step t (all agents done)
  active_masks[t+1] = 0 where agent died at t, reset to 1 on env done
  bad_masks[t+1]    = 0 where the step was a truncation (bad_transition)
  rnn states zeroed on env done.
"""
from __future__ import annotations

import time
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from harl_tpu.algos.common import AgentTrainState, aggregate_ratio, make_optimizer
from harl_tpu.algos.critics import CriticBatch, VCritic
from harl_tpu.algos.happo import ActorBatch
from harl_tpu.envs.core import VecEnv, auto_reset_step
from harl_tpu.models.act import act_sample
from harl_tpu.models.policies import StochasticPolicy
from harl_tpu.models.values import VNet
from harl_tpu.ops.returns import compute_discounted_returns, compute_gae
from harl_tpu.ops.value_norm import (
    ValueNormState,
    denormalize,
    init_value_norm,
)
from harl_tpu.utils import spaces


class RolloutCarry(NamedTuple):
    env_state: Any
    obs: jnp.ndarray           # (B, N, max_obs_dim)
    share_obs: jnp.ndarray     # (B, ds)
    masks: jnp.ndarray         # (B, N, 1)
    active_masks: jnp.ndarray  # (B, N, 1)
    avail: Optional[jnp.ndarray]
    actor_rnn: Tuple[jnp.ndarray, ...]   # per-agent (B, L, H)
    critic_rnn: jnp.ndarray              # (B, L, H)
    ep_ret: jnp.ndarray        # (B,) running episodic return accumulator
    ep_len: jnp.ndarray        # (B,) running episode length


class TrainState(NamedTuple):
    actors: Tuple[AgentTrainState, ...]
    critic: AgentTrainState
    value_norm: Optional[ValueNormState]
    carry: RolloutCarry
    rng: jnp.ndarray


class OnPolicyRunner:
    """Generic runner for HAPPO (and, by factor semantics, HAA2C/MAPPO later).

    ``args``: {"algo", "env", "exp_name"}; ``algo_args``: nested dict with the
    reference YAML sections (train/model/algo/...); ``env_args``: env kwargs.
    """

    def __init__(self, args, algo_args, env_args, env=None):
        self.args = args
        self.algo_args = algo_args
        self.env_args = env_args

        tr = algo_args["train"]
        self.episode_length = tr["episode_length"]
        self.n_rollout_threads = tr["n_rollout_threads"]
        self.num_env_steps = tr["num_env_steps"]
        self.use_valuenorm = tr.get("use_valuenorm", True)
        self.use_linear_lr_decay = tr.get("use_linear_lr_decay", False)
        self.use_proper_time_limits = tr.get("use_proper_time_limits", True)

        al = algo_args["algo"]
        # Fused single-launch Pallas kernel for the GAE/return recursion on
        # TPU (ops/pallas_gae.py); scan fallback on CPU and under GSPMD
        # sharding (run(mesh=...) downgrades this to "scan").
        self.returns_impl = (
            "pallas"
            if tr.get("use_pallas_returns", jax.default_backend() == "tpu")
            else "scan"
        )
        self.use_gae = al.get("use_gae", True)
        self.gamma = al.get("gamma", 0.99)
        self.gae_lambda = al.get("gae_lambda", 0.95)
        self.fixed_order = al.get("fixed_order", False)
        self.action_aggregation = al.get("action_aggregation", "prod")
        self.share_param = al.get("share_param", False)

        md = algo_args["model"]
        self.hidden_sizes = tuple(md["hidden_sizes"])
        self.recurrent_n = md.get("recurrent_n", 1)
        self.use_recurrent_policy = md.get("use_recurrent_policy", False)
        self.use_naive_recurrent = md.get("use_naive_recurrent_policy", False)
        # "the policy has a GRU" — chunked vs naive minibatching is decided
        # inside the actor/critic update (on_policy_actor_buffer.py:180-326)
        self.use_rnn = self.use_recurrent_policy or self.use_naive_recurrent

        # ---- env ----------------------------------------------------------
        if env is None:
            from harl_tpu.envs import make_env

            env = make_env(args["env"], env_args)
        self.env = env
        self.host_mode = not getattr(env, "is_jax", True)
        if self.host_mode:
            from harl_tpu.envs import make_env
            from harl_tpu.envs.host import HostVecEnv

            if getattr(env, "is_vectorized", False):
                # pre-vectorized host env (native C++ stepping engine)
                env.ensure_envs(self.n_rollout_threads)
                self.vec = env
            else:
                fns = [env] + [
                    (lambda: make_env(args["env"], env_args))
                    for _ in range(self.n_rollout_threads - 1)
                ]
                self.vec = HostVecEnv([(lambda e=env: e)] + fns[1:])
        else:
            self.vec = VecEnv(env, self.n_rollout_threads)
        self.n_agents = env.n_agents
        self.obs_spaces = env.observation_space
        self.share_obs_space = env.share_observation_space[0]
        self.act_spaces = env.action_space
        self.image_obs = len(self.obs_spaces[0].shape) == 3  # (H, W, C) → CNN
        self.obs_dims = [sp.shape[0] for sp in self.obs_spaces]
        self.discrete = spaces.space_kind(self.act_spaces[0]) != "Box"
        self.state_type = getattr(env, "state_type", env_args.get("state_type", "EP"))
        if self.state_type == "FP":
            assert not self.host_mode, "FP state requires a pure-JAX env"

        # ---- models / algos ----------------------------------------------
        from harl_tpu.algos import ON_POLICY_REGISTRY

        actor_cls, self.factor_chain = ON_POLICY_REGISTRY[args.get("algo", "happo")]
        episodes = int(self.num_env_steps) // self.episode_length // self.n_rollout_threads
        self.episodes = max(episodes, 1)
        actor_updates = al.get(actor_cls.epoch_key, 1) * al.get("actor_num_mini_batch", 1)
        critic_updates = al["critic_epoch"] * al["critic_num_mini_batch"]

        model_kwargs = dict(
            hidden_sizes=self.hidden_sizes,
            activation_func=md.get("activation_func", "relu"),
            use_feature_normalization=md.get("use_feature_normalization", True),
            initialization_method=md.get("initialization_method", "orthogonal_"),
        )
        algo_cfg = {**al, **md}
        if self.share_param:
            # homogeneity check (on_policy_base_runner.py:107-113)
            assert all(d == self.obs_dims[0] for d in self.obs_dims) and all(
                sp == self.act_spaces[0] for sp in self.act_spaces
            ), "share_param requires homogeneous agents"
        self._sidx = (lambda i: 0) if self.share_param else (lambda i: i)
        self.actors = []
        for i in range(1 if self.share_param else self.n_agents):
            policy = StochasticPolicy(
                action_space=self.act_spaces[i],
                gain=md.get("gain", 0.01),
                image_input=self.image_obs,
                use_recurrent_policy=self.use_rnn,
                recurrent_n=self.recurrent_n,
                std_x_coef=md.get("std_x_coef", 1.0),
                std_y_coef=md.get("std_y_coef", 0.5),
                **model_kwargs,
            )
            tx = make_optimizer(
                md["lr"], md.get("opti_eps", 1e-5), md.get("weight_decay", 0.0),
                al.get("max_grad_norm", 10.0) if al.get("use_max_grad_norm", True) else None,
                self.use_linear_lr_decay, self.episodes, actor_updates,
            )
            self.actors.append(actor_cls(policy, self.act_spaces[i], tx, algo_cfg))
        if self.share_param:
            self.actors = self.actors * self.n_agents

        critic_net = VNet(
            use_recurrent_policy=self.use_rnn,
            recurrent_n=self.recurrent_n,
            **model_kwargs,
        )
        critic_tx = make_optimizer(
            md["critic_lr"], md.get("opti_eps", 1e-5), md.get("weight_decay", 0.0),
            al.get("max_grad_norm", 10.0) if al.get("use_max_grad_norm", True) else None,
            self.use_linear_lr_decay, self.episodes, critic_updates,
        )
        self.critic = VCritic(critic_net, critic_tx, algo_cfg)

        if self.host_mode:
            self._host_policy = jax.jit(self._host_policy_step)
            self._update_jit = jax.jit(self.update_phase)
        else:
            self._train_iteration = jax.jit(self.train_iteration)
            self._eval_fn = jax.jit(self.eval_rollout, static_argnums=(1,))

    def _obs_i(self, obs, i):
        """Agent i's obs slice. Vector obs are padded to max_obs_dim and
        sliced back; image obs (…, N, H, W, C) pass through whole."""
        if self.image_obs:
            return obs[..., i, :, :, :]
        return obs[..., i, : self.obs_dims[i]]

    # ------------------------------------------------------------------ init
    def init_state(self, seed: int) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        rng, k_env, *k_actors = jax.random.split(rng, self.n_agents + 2)
        rng, k_critic = jax.random.split(rng)
        if self.host_mode:
            obs_np, share_np, avail_np = self.vec.reset()

            class _HostTS:
                obs = jnp.asarray(obs_np)
                share_obs = jnp.asarray(share_np)
                available_actions = None if avail_np is None else jnp.asarray(avail_np)

            ts = _HostTS()
            env_state = jnp.zeros(())
        else:
            env_state, ts = self.vec.reset(k_env)
        B, N = self.n_rollout_threads, self.n_agents
        actor_states = []
        n_states = 1 if self.share_param else self.n_agents
        for i in range(n_states):
            actor = self.actors[i]
            obs_i = self._obs_i(ts.obs, i)
            params = actor.init(k_actors[i], obs_i)
            actor_states.append(AgentTrainState(params, actor.tx.init(params)))
        cparams = self.critic.init(
            k_critic,
            ts.agent_state.reshape(-1, ts.agent_state.shape[-1])
            if self.state_type == "FP"
            else ts.share_obs,
        )
        critic_state = AgentTrainState(cparams, self.critic.tx.init(cparams))
        H = self.hidden_sizes[-1]
        init_share = (
            ts.agent_state if self.state_type == "FP" else ts.share_obs
        )
        carry = RolloutCarry(
            env_state=env_state,
            obs=ts.obs,
            share_obs=init_share,
            masks=jnp.ones((B, N, 1)),
            active_masks=jnp.ones((B, N, 1)),
            avail=ts.available_actions,
            actor_rnn=tuple(jnp.zeros((B, self.recurrent_n, H)) for _ in range(N)),
            # FP critics run per-(env, agent): the GRU batch axis is B·N
            critic_rnn=jnp.zeros(
                (B * N if self.state_type == "FP" else B, self.recurrent_n, H)
            ),
            ep_ret=jnp.zeros((B,)),
            ep_len=jnp.zeros((B,)),
        )
        vn = init_value_norm(1) if self.use_valuenorm else None
        return TrainState(tuple(actor_states), critic_state, vn, carry, rng)

    # --------------------------------------------------------------- rollout
    def _policy_step(self, actor_states, carry, key):
        """All agents act once. Returns stacked actions + per-agent outputs."""
        acts, logps, new_rnn = [], [], []
        for i, actor in enumerate(self.actors):
            obs_i = self._obs_i(carry.obs, i)
            avail_i = None
            if carry.avail is not None:
                avail_i = carry.avail[:, i, : _space_n(self.act_spaces[i])]
            if self.use_rnn:
                head, h = actor.policy.apply(
                    actor_states[self._sidx(i)].params, obs_i, carry.actor_rnn[i], carry.masks[:, i]
                )
            else:
                head, h = actor.policy.apply(actor_states[self._sidx(i)].params, obs_i), None
                head = head[0]
            out = act_sample(
                jax.random.fold_in(key, i), head, self.act_spaces[i], avail_i,
                std_x_coef=actor.std_x_coef, std_y_coef=actor.std_y_coef,
            )
            acts.append(out.actions)
            logps.append(out.log_probs)
            new_rnn.append(h if h is not None else carry.actor_rnn[i])
        max_da = max(a.shape[-1] for a in acts)
        stacked = jnp.stack(
            [jnp.pad(a, ((0, 0), (0, max_da - a.shape[-1]))) for a in acts], axis=1
        )
        if self.discrete:
            stacked = stacked.astype(jnp.int32)
        return stacked, acts, logps, tuple(new_rnn)

    def rollout_step(self, actor_states, critic_params, carry: RolloutCarry, key):
        k_act, k_env = jax.random.split(key)
        actions_stacked, acts, logps, new_actor_rnn = self._policy_step(
            actor_states, carry, k_act
        )
        B_, N_ = self.n_rollout_threads, self.n_agents
        if self.state_type == "FP":
            so = carry.share_obs.reshape(B_ * N_, -1)
            if self.use_rnn:
                value, new_critic_rnn = self.critic.get_values(
                    critic_params, so, carry.critic_rnn,
                    carry.masks.reshape(B_ * N_, 1),
                )
            else:
                value = self.critic.get_values(critic_params, so)
                new_critic_rnn = carry.critic_rnn
            value = value.reshape(B_, N_, 1)
        elif self.use_rnn:
            value, new_critic_rnn = self.critic.get_values(
                critic_params, carry.share_obs, carry.critic_rnn, carry.masks[:, 0]
            )
        else:
            value = self.critic.get_values(critic_params, carry.share_obs)  # (B,1)
            new_critic_rnn = carry.critic_rnn
        tr = self.vec.step(carry.env_state, actions_stacked, k_env)
        ts = tr.ts
        B, N = self.n_rollout_threads, self.n_agents
        done_env = jnp.all(ts.dones, axis=1)                       # (B,)
        new_masks = jnp.where(done_env[:, None, None], 0.0, jnp.ones((B, N, 1)))
        new_active = jnp.where(ts.dones[..., None], 0.0, 1.0)
        new_active = jnp.where(done_env[:, None, None], 1.0, new_active)
        bad_mask = jnp.where(ts.bad_transition, 0.0, 1.0)[:, None]  # (B,1)
        # episodic return accounting: per-agent mean reward — the same
        # definition the host path and both eval paths use, so train and
        # eval returns are on one scale even when per-agent rewards differ
        # (e.g. MPE local_ratio)
        rew = ts.rewards[:, :, 0].mean(axis=1)
        ep_ret = carry.ep_ret + rew
        ep_len = carry.ep_len + 1
        emitted_ret = jnp.where(done_env, ep_ret, 0.0)
        emitted_cnt = done_env.astype(jnp.float32)
        # env-specific episode metrics (won / dead ratios / scores), summed at
        # episode boundaries — the env-logger families of the reference
        # (smac_logger.py:76-137, football_logger.py)
        emitted_metrics = {
            k: jnp.where(done_env, v, 0.0)
            for k, v in (tr.final.metrics or {}).items()
        }
        new_share = ts.agent_state if self.state_type == "FP" else ts.share_obs
        new_carry = RolloutCarry(
            env_state=tr.state,
            obs=ts.obs,
            share_obs=new_share,
            masks=new_masks,
            active_masks=new_active,
            avail=ts.available_actions,
            actor_rnn=tuple(
                jnp.where(done_env[:, None, None], 0.0, h) for h in new_actor_rnn
            ),
            critic_rnn=jnp.where(
                (jnp.repeat(done_env, N) if self.state_type == "FP"
                 else done_env)[:, None, None],
                0.0, new_critic_rnn),
            ep_ret=jnp.where(done_env, 0.0, ep_ret),
            ep_len=jnp.where(done_env, 0.0, ep_len),
        )
        step_data = dict(
            obs=carry.obs,
            share_obs=carry.share_obs,
            masks=carry.masks,
            active_masks=carry.active_masks,
            avail=carry.avail,
            actions=tuple(acts),
            logp=tuple(logps),
            value=value,
            # EP: agent-0 (team) reward/masks (B,1); FP: per-agent (B,N,1)
            reward=ts.rewards if self.state_type == "FP" else ts.rewards[:, 0],
            next_masks=new_masks if self.state_type == "FP" else new_masks[:, 0],
            next_bad_masks=jnp.broadcast_to(bad_mask[:, None], (B, N, 1))
            if self.state_type == "FP"
            else bad_mask,
            next_active=new_active,
            actor_rnn=carry.actor_rnn,     # hidden states at INPUT of step t
            critic_rnn=carry.critic_rnn,
            emitted_ret=emitted_ret,
            emitted_cnt=emitted_cnt,
            emitted_metrics=emitted_metrics,
        )
        return new_carry, step_data

    # ------------------------------------------------------------- iteration
    def train_iteration(self, ts: TrainState):
        rng, k_roll, k_order, k_update, k_critic = jax.random.split(ts.rng, 5)
        actor_states, critic_state, vn = ts.actors, ts.critic, ts.value_norm
        T, B, N = self.episode_length, self.n_rollout_threads, self.n_agents

        def scan_step(carry, k):
            return self.rollout_step(actor_states, critic_state.params, carry, k)

        carry, data = jax.lax.scan(
            scan_step, ts.carry, jax.random.split(k_roll, T)
        )

        actor_states, critic_state, vn, metrics = self.update_phase(
            actor_states, critic_state, vn, data,
            first_masks0=ts.carry.masks[:, 0],
            last_share_obs=carry.share_obs,
            last_masks=carry.masks,
            last_critic_rnn=carry.critic_rnn,
            k_order=k_order, k_update=k_update, k_critic=k_critic,
        )
        new_ts = TrainState(actor_states, critic_state, vn, carry, rng)
        return new_ts, metrics

    def update_phase(
        self, actor_states, critic_state, vn, data,
        first_masks0, last_share_obs, last_masks, last_critic_rnn,
        k_order, k_update, k_critic,
    ):
        """Returns + sequential update + critic train — shared by the pure-JAX
        rollout path and the host-env collection path."""
        T, B, N = (
            data["reward"].shape[0], data["reward"].shape[1], self.n_agents
        )
        # ---- returns ------------------------------------------------------
        if self.state_type == "FP":
            so = last_share_obs.reshape(B * N, -1)
            if self.use_rnn:
                next_value, _ = self.critic.get_values(
                    critic_state.params, so, last_critic_rnn,
                    last_masks.reshape(B * N, 1),
                )
            else:
                next_value = self.critic.get_values(critic_state.params, so)
            next_value = next_value.reshape(B, N, 1)
        elif self.use_rnn:
            next_value, _ = self.critic.get_values(
                critic_state.params, last_share_obs, last_critic_rnn, last_masks[:, 0]
            )
        else:
            next_value = self.critic.get_values(critic_state.params, last_share_obs)
        values = jnp.concatenate([data["value"], next_value[None]], axis=0)  # (T+1,B,1)
        if vn is not None:
            values_den = denormalize(vn, values)
        else:
            values_den = values
        if self.state_type == "FP":
            first_m = data["masks"][0]          # (B, N, 1)
            ones_row = jnp.ones((1, B, N, 1))
        else:
            first_m = first_masks0
            ones_row = jnp.ones((1, B, 1))
        masks_tb = jnp.concatenate([first_m[None], data["next_masks"]], axis=0)
        bad_tb = jnp.concatenate([ones_row, data["next_bad_masks"]], axis=0)
        if self.use_gae:
            returns = compute_gae(
                data["reward"], values_den, masks_tb,
                bad_tb if self.use_proper_time_limits else None,
                self.gamma, self.gae_lambda, impl=self.returns_impl,
            )
        else:
            returns = compute_discounted_returns(
                data["reward"], values_den, masks_tb,
                bad_tb if self.use_proper_time_limits else None,
                values_den[-1], self.gamma, impl=self.returns_impl,
            )
        advantages = returns - values_den[:-1]  # EP (T,B,1); FP (T,B,N,1)
        if self.state_type == "FP":
            # normalize once across agents with active masks
            # (on_policy_ha_runner.py:36-45)
            from harl_tpu.ops.returns import normalize_advantages_masked

            advantages = normalize_advantages_masked(
                advantages, data["active_masks"]
            )

        # ---- per-agent batches -------------------------------------------
        batches = []
        for i in range(N):
            avail_i = None
            if data["avail"] is not None:
                avail_i = data["avail"][:, :, i, : _space_n(self.act_spaces[i])]
            batches.append(
                ActorBatch(
                    obs=self._obs_i(data["obs"], i),
                    rnn_states=data["actor_rnn"][i],
                    actions=data["actions"][i],
                    logp=data["logp"][i],
                    masks=data["masks"][:, :, i],
                    active_masks=data["active_masks"][:, :, i],
                    available_actions=avail_i,
                )
            )

        # ---- MAPPO share_param: merged minibatches (mappo.py:189-227) ------
        if self.share_param and not self.factor_chain:
            merged = ActorBatch(
                obs=jnp.concatenate([b.obs for b in batches], axis=1),
                rnn_states=jnp.concatenate([b.rnn_states for b in batches], axis=1),
                actions=jnp.concatenate([b.actions for b in batches], axis=1),
                logp=jnp.concatenate([b.logp for b in batches], axis=1),
                masks=jnp.concatenate([b.masks for b in batches], axis=1),
                active_masks=jnp.concatenate([b.active_masks for b in batches], axis=1),
                available_actions=None
                if batches[0].available_actions is None
                else jnp.concatenate([b.available_actions for b in batches], axis=1),
            )
            if self.state_type == "FP":
                adv_m = jnp.concatenate(
                    [advantages[:, :, i] for i in range(N)], axis=1
                )
            else:
                adv_m = jnp.tile(advantages, (1, N, 1))
            st, stats = self.actors[0].update(
                actor_states[0], merged, adv_m, jnp.ones((T, B * N, 1)),
                k_update, self.state_type,
            )
            actor_states = (st,)
            actor_stats = jnp.tile(stats[None], (N, 1))
        else:
            actor_states, actor_stats = self._sequential_update(
                actor_states, batches, advantages, T, B, N, k_update, k_order
            )

        # ---- critic -------------------------------------------------------

        # ---- critic -------------------------------------------------------
        if self.state_type == "FP":
            T_ = data["reward"].shape[0]
            critic_batch = CriticBatch(
                share_obs=data["share_obs"].reshape(T_, B * N, -1),
                rnn_states=data["critic_rnn"],
                value_preds=data["value"].reshape(T_, B * N, 1),
                returns=returns.reshape(T_, B * N, 1),
                masks=data["masks"].reshape(T_, B * N, 1),
            )
        else:
            critic_batch = CriticBatch(
                share_obs=data["share_obs"],
                rnn_states=data["critic_rnn"],
                value_preds=data["value"],
                returns=returns,
                masks=data["masks"][:, :, 0],
            )
        critic_state, vn, critic_stats = self.critic.update(
            critic_state, vn, critic_batch, k_critic
        )

        metrics = dict(
            actor_stats=actor_stats,          # (N, [policy_loss, entropy, gnorm, ratio])
            value_loss=critic_stats[0],
            critic_grad_norm=critic_stats[1],
            mean_step_reward=jnp.mean(data["reward"]),
            # dead_ratio = 1 − mean(active_masks) (smac_logger.py:115-123)
            dead_ratio=1.0 - jnp.mean(data["active_masks"]),
            episode_return_sum=jnp.sum(data["emitted_ret"]),
            episode_count=jnp.sum(data["emitted_cnt"]),
            episode_metric_sums={
                k: jnp.sum(v) for k, v in data["emitted_metrics"].items()
            },
        )
        return actor_states, critic_state, vn, metrics

    def _sequential_update(self, actor_states, batches, advantages, T, B, N,
                           k_update, k_order):
        """The HARL sequential-update scheme with the factor as loop carry
        (on_policy_ha_runner.py:47-124)."""
        factor = jnp.ones((T, B, 1))
        stats0 = jnp.zeros((N, 4))

        def make_branch(i):
            def branch(carry):
                astates, factor, key, stats = carry
                key, k_up = jax.random.split(key)
                si = self._sidx(i)
                st = astates[si]
                if self.factor_chain:
                    if self.share_param:
                        # shared params already moved by earlier agents in the
                        # order — must re-evaluate (on_policy_ha_runner.py:66-83)
                        old_logp = self.actors[i].evaluate_logp(st.params, batches[i])
                    else:
                        # pre-update params are exactly the rollout params, so
                        # the stored behavior log-probs ARE the old log-probs:
                        # skip one full-batch forward per agent
                        old_logp = batches[i].logp.reshape(
                            (-1,) + batches[i].logp.shape[2:]
                        )
                adv_i = (
                    advantages[:, :, i]
                    if self.state_type == "FP"
                    else advantages
                )
                st, s = self.actors[i].update(
                    st, batches[i], adv_i, factor, k_up, self.state_type
                )
                if self.factor_chain:
                    new_logp = self.actors[i].evaluate_logp(st.params, batches[i])
                    ratio = aggregate_ratio(
                        new_logp - old_logp, self.action_aggregation
                    ).reshape(T, B, 1)
                    factor = factor * ratio
                astates = tuple(
                    st if j == si else astates[j] for j in range(len(astates))
                )
                stats = stats.at[i].set(s)
                return (astates, factor, key, stats)

            return branch

        branches = [make_branch(i) for i in range(N)]
        upd_carry = (actor_states, factor, k_update, stats0)
        if self.fixed_order or N == 1:
            for i in range(N):
                upd_carry = branches[i](upd_carry)
        else:
            perm = jax.random.permutation(k_order, N)

            def body(j, c):
                return jax.lax.switch(perm[j], branches, c)

            upd_carry = jax.lax.fori_loop(0, N, body, upd_carry)
        actor_states, _, _, actor_stats = upd_carry
        return actor_states, actor_stats

    # ----------------------------------------------------- host-env support
    def _host_policy_step(self, actor_states, critic_params, carry: RolloutCarry, key):
        """Jitted policy+value step for host-env collection."""
        actions_stacked, acts, logps, new_rnn = self._policy_step(actor_states, carry, key)
        if self.use_rnn:
            value, new_critic_rnn = self.critic.get_values(
                critic_params, carry.share_obs, carry.critic_rnn, carry.masks[:, 0]
            )
        else:
            value = self.critic.get_values(critic_params, carry.share_obs)
            new_critic_rnn = carry.critic_rnn
        return actions_stacked, tuple(acts), tuple(logps), value, new_rnn, new_critic_rnn

    def collect_host(self, state: TrainState):
        """Python-loop rollout over the host vec env (external simulators).

        Produces the same stacked ``data`` dict as the jitted rollout scan, so
        ``update_phase`` is shared verbatim."""
        T, B, N = self.episode_length, self.n_rollout_threads, self.n_agents
        carry = state.carry
        rng = state.rng
        rows = {k: [] for k in (
            "obs", "share_obs", "masks", "active_masks", "avail", "value", "reward",
            "next_masks", "next_bad_masks", "next_active", "critic_rnn",
            "emitted_ret", "emitted_cnt",
        )}
        acts_rows = [[] for _ in range(N)]
        logp_rows = [[] for _ in range(N)]
        arnn_rows = [[] for _ in range(N)]
        for _ in range(T):
            rng, k = jax.random.split(rng)
            stacked, acts, logps, value, new_arnn, new_crnn = self._host_policy(
                state.actors, state.critic.params, carry, k
            )
            res = self.vec.step(np.asarray(stacked))
            dones = res["dones"]                       # (B, N) bool
            done_env = dones.all(axis=1)               # (B,)
            bad = np.array(
                [
                    0.0
                    if any(a.get("bad_transition", False) for a in info)
                    else 1.0
                    for info in res["infos"]
                ],
                np.float32,
            )[:, None]
            new_masks = np.ones((B, N, 1), np.float32)
            new_masks[done_env] = 0.0
            new_active = np.where(dones[..., None], 0.0, 1.0).astype(np.float32)
            new_active[done_env] = 1.0
            rew = res["rewards"][:, 0]                 # (B, 1)
            ep_ret = np.asarray(carry.ep_ret) + res["rewards"][:, :, 0].mean(axis=1)
            emitted = np.where(done_env, ep_ret, 0.0)
            cnt = done_env.astype(np.float32)
            rows["obs"].append(np.asarray(carry.obs))
            rows["share_obs"].append(np.asarray(carry.share_obs))
            rows["masks"].append(np.asarray(carry.masks))
            rows["active_masks"].append(np.asarray(carry.active_masks))
            rows["avail"].append(None if carry.avail is None else np.asarray(carry.avail))
            rows["value"].append(np.asarray(value))
            rows["reward"].append(rew)
            rows["next_masks"].append(new_masks[:, 0])
            rows["next_bad_masks"].append(bad)
            rows["next_active"].append(new_active)
            rows["critic_rnn"].append(np.asarray(carry.critic_rnn))
            rows["emitted_ret"].append(emitted)
            rows["emitted_cnt"].append(cnt)
            for i in range(N):
                acts_rows[i].append(np.asarray(acts[i]))
                logp_rows[i].append(np.asarray(logps[i]))
                arnn_rows[i].append(np.asarray(carry.actor_rnn[i]))
            # advance carry
            reset_h = lambda h: np.where(done_env[:, None, None], 0.0, np.asarray(h))
            carry = RolloutCarry(
                env_state=carry.env_state,
                obs=jnp.asarray(res["obs"]),
                share_obs=jnp.asarray(res["share_obs"]),
                masks=jnp.asarray(new_masks),
                active_masks=jnp.asarray(new_active),
                avail=None if res["available_actions"] is None else jnp.asarray(res["available_actions"]),
                actor_rnn=tuple(jnp.asarray(reset_h(h)) for h in new_arnn),
                critic_rnn=jnp.asarray(reset_h(new_crnn)),
                ep_ret=jnp.asarray(np.where(done_env, 0.0, ep_ret)),
                ep_len=jnp.asarray(
                    np.where(done_env, 0.0, np.asarray(carry.ep_len) + 1.0)
                ),
            )
        data = {
            k: (None if (k == "avail" and rows[k][0] is None) else jnp.asarray(np.stack(rows[k])))
            for k in rows
        }
        data["emitted_metrics"] = {}
        data["actions"] = tuple(jnp.asarray(np.stack(a)) for a in acts_rows)
        data["logp"] = tuple(jnp.asarray(np.stack(l)) for l in logp_rows)
        data["actor_rnn"] = tuple(jnp.asarray(np.stack(h)) for h in arnn_rows)
        return carry, data, rng

    def host_train_iteration(self, state: TrainState):
        carry, data, rng = self.collect_host(state)
        rng, k_order, k_update, k_critic = jax.random.split(rng, 4)
        actors, critic, vn, metrics = self._update_jit(
            state.actors, state.critic, state.value_norm, data,
            first_masks0=state.carry.masks[:, 0],
            last_share_obs=carry.share_obs,
            last_masks=carry.masks,
            last_critic_rnn=carry.critic_rnn,
            k_order=k_order, k_update=k_update, k_critic=k_critic,
        )
        return TrainState(actors, critic, vn, carry, rng), metrics

    def host_eval(self, state: TrainState, n_episodes: int = 10):
        """Deterministic evaluation on freshly-constructed host envs."""
        from harl_tpu.envs import make_env
        from harl_tpu.envs.host import HostVecEnv

        n_envs = min(n_episodes, 10)
        probe = make_env(self.args["env"], self.env_args)
        if getattr(probe, "is_vectorized", False):
            probe.ensure_envs(n_envs, seed=50000)
            vec = probe
        else:
            vec = HostVecEnv(
                [(lambda e=probe: e)]
                + [(lambda: make_env(self.args["env"], self.env_args))
                   for _ in range(n_envs - 1)],
                seed=50000,
            )
        obs, share, avail = vec.reset()
        B = n_envs
        H = self.hidden_sizes[-1]
        carry = RolloutCarry(
            env_state=jnp.zeros(()),
            obs=jnp.asarray(obs), share_obs=jnp.asarray(share),
            masks=jnp.ones((B, self.n_agents, 1)),
            active_masks=jnp.ones((B, self.n_agents, 1)),
            avail=None if avail is None else jnp.asarray(avail),
            actor_rnn=tuple(jnp.zeros((B, self.recurrent_n, H)) for _ in range(self.n_agents)),
            critic_rnn=jnp.zeros((B, self.recurrent_n, H)),
            ep_ret=jnp.zeros((B,)), ep_len=jnp.zeros((B,)),
        )
        ep_ret = np.zeros(B)
        alive = np.ones(B, bool)
        returns = []
        rng = jax.random.fold_in(state.rng, 99)
        for _ in range(getattr(self.env, "episode_limit", 1000)):
            rng, k = jax.random.split(rng)
            stacked, *_ = self._host_policy(state.actors, state.critic.params, carry, k)
            res = vec.step(np.asarray(stacked))
            done_env = res["dones"].all(axis=1)
            ep_ret += res["rewards"][:, :, 0].mean(axis=1) * alive
            newly = done_env & alive
            returns.extend(ep_ret[newly].tolist())
            alive &= ~done_env
            if not alive.any():
                break
            carry = carry._replace(
                obs=jnp.asarray(res["obs"]), share_obs=jnp.asarray(res["share_obs"]),
                avail=None if res["available_actions"] is None else jnp.asarray(res["available_actions"]),
            )
        vec.close()
        returns.extend(ep_ret[alive].tolist())
        return float(np.mean(returns))

    # ------------------------------------------------------------------ eval
    def eval_rollout(self, ts: TrainState, n_eval_envs: int, round_idx: int = 0):
        """Deterministic policy over one full env horizon of auto-reset envs.

        Counts every COMPLETED episode like the reference eval loop
        (on_policy_base_runner.py:499-591): returns the sums
        ``(episode_return_sum, episode_count, metric_sums)`` so the host can
        keep calling rounds until ``eval_episodes`` episodes finished.
        """
        vec = VecEnv(self.env, n_eval_envs)
        rng = jax.random.fold_in(jax.random.fold_in(ts.rng, 7777), round_idx)
        env_state, ets = vec.reset(rng)

        H = self.hidden_sizes[-1]
        metric_keys = sorted((getattr(self.env, "metric_keys", None) or ()))

        def step(carry, k):
            env_state, obs, avail, ep_ret, masks, ret_sum, cnt, msums, rnn = carry
            acts, new_rnn = [], []
            for i, actor in enumerate(self.actors):
                obs_i = self._obs_i(obs, i)
                avail_i = None
                if avail is not None:
                    avail_i = avail[:, i, : _space_n(self.act_spaces[i])]
                if self.use_rnn:
                    head, h = actor.policy.apply(
                        ts.actors[self._sidx(i)].params, obs_i, rnn[i],
                        masks[:, None],
                    )
                else:
                    head, _ = actor.policy.apply(ts.actors[self._sidx(i)].params, obs_i)
                    h = rnn[i]
                out = act_sample(k, head, self.act_spaces[i], avail_i, deterministic=True,
                                 std_x_coef=actor.std_x_coef, std_y_coef=actor.std_y_coef)
                acts.append(out.actions)
                new_rnn.append(h)
            max_da = max(a.shape[-1] for a in acts)
            stacked = jnp.stack(
                [jnp.pad(a, ((0, 0), (0, max_da - a.shape[-1]))) for a in acts], axis=1
            )
            if self.discrete:
                stacked = stacked.astype(jnp.int32)
            tr = vec.step(env_state, stacked, k)
            done_env = jnp.all(tr.ts.dones, axis=1)
            done_f = done_env.astype(jnp.float32)
            ep_ret = ep_ret + tr.ts.rewards[:, :, 0].mean(axis=1)
            ret_sum = ret_sum + jnp.sum(ep_ret * done_f)
            cnt = cnt + jnp.sum(done_f)
            fm = tr.final.metrics or {}
            msums = {
                key: msums[key] + jnp.sum(fm[key] * done_f) for key in metric_keys
            }
            ep_ret = jnp.where(done_env, 0.0, ep_ret)
            new_masks = 1.0 - done_f
            return (
                tr.state, tr.ts.obs, tr.ts.available_actions, ep_ret, new_masks,
                ret_sum, cnt, msums,
                tuple(
                    jnp.where(done_env[:, None, None], 0.0, h) for h in new_rnn
                ),
            ), None

        init = (
            env_state, ets.obs, ets.available_actions,
            jnp.zeros((n_eval_envs,)), jnp.ones((n_eval_envs,)),
            jnp.zeros(()), jnp.zeros(()),
            {key: jnp.zeros(()) for key in metric_keys},
            tuple(
                jnp.zeros((n_eval_envs, self.recurrent_n, H))
                for _ in range(self.n_agents)
            ),
        )
        final_carry, _ = jax.lax.scan(
            step, init, jax.random.split(rng, self._eval_len())
        )
        return final_carry[5], final_carry[6], final_carry[7]

    def evaluate(self, state: TrainState, n_eval: int, eval_episodes: int):
        """Run jitted eval rounds until ``eval_episodes`` episodes completed
        (on_policy_base_runner.py:587-591). Returns (mean_return, metrics)."""
        ret_sum, cnt = 0.0, 0.0
        msums: dict = {}
        max_rounds = max((eval_episodes + n_eval - 1) // n_eval, 1) * 4
        for r in range(max_rounds):
            rs, c, ms = jax.device_get(self._eval_fn(state, n_eval, r))
            ret_sum += float(rs)
            cnt += float(c)
            for k, v in ms.items():
                msums[k] = msums.get(k, 0.0) + float(v)
            if cnt >= eval_episodes:
                break
        if cnt == 0:
            return float("nan"), {}
        return ret_sum / cnt, {k: v / cnt for k, v in msums.items()}

    def _eval_len(self):
        """The env's TRUE episode horizon — decoupled from the training
        ``episode_length`` (which may be a shorter rollout window)."""
        limit = (
            getattr(self.env, "episode_limit", None)
            or getattr(self.env, "max_cycles", None)
            or getattr(self.env, "episode_length", None)  # dexhands horizon
        )
        return int(limit) if limit else self.episode_length

    def render(self, state: TrainState, episodes: int = 10, save_path: str = None):
        """Deterministic render rollouts (on_policy_base_runner.py:593-710).

        Host envs call the simulator's own ``render()``; pure-JAX envs record
        trajectories and save them as .npz for offline visualization (the
        TPU-native analogue of SMAC's save-replay path, :706-710)."""
        import numpy as np_

        if self.host_mode:
            from harl_tpu.envs import make_env

            env = make_env(self.args["env"], self.env_args)
            returns = []
            for ep in range(episodes):
                obs, share, avail = env.reset()
                carry = RolloutCarry(
                    env_state=jnp.zeros(()), obs=jnp.asarray(obs)[None],
                    share_obs=jnp.asarray(share)[None],
                    masks=jnp.ones((1, self.n_agents, 1)),
                    active_masks=jnp.ones((1, self.n_agents, 1)),
                    avail=None if avail is None else jnp.asarray(avail)[None],
                    actor_rnn=tuple(
                        jnp.zeros((1, self.recurrent_n, self.hidden_sizes[-1]))
                        for _ in range(self.n_agents)
                    ),
                    critic_rnn=jnp.zeros((1, self.recurrent_n, self.hidden_sizes[-1])),
                    ep_ret=jnp.zeros((1,)), ep_len=jnp.zeros((1,)),
                )
                total = 0.0
                for t in range(getattr(self.env, "episode_limit", 1000)):
                    stacked, *_ = self._host_policy(
                        state.actors, state.critic.params, carry,
                        jax.random.fold_in(state.rng, ep * 10000 + t),
                    )
                    o, sh, r, d, info, av = env.step(np_.asarray(stacked)[0])
                    if hasattr(env, "render"):
                        try:
                            env.render()
                        except Exception:
                            pass
                    total += float(r[0, 0])
                    if d.all():
                        break
                    carry = carry._replace(
                        obs=jnp.asarray(o)[None], share_obs=jnp.asarray(sh)[None],
                        avail=None if av is None else jnp.asarray(av)[None],
                    )
                returns.append(total)
                print(f"render episode {ep}: return {total:.2f}")
            env.close()
            return returns
        # pure-JAX env: record one batch of episodes and dump trajectories
        vec = VecEnv(self.env, episodes)
        rng = jax.random.fold_in(state.rng, 4242)
        env_state, ets = vec.reset(rng)

        def step(carry, k):
            env_state, obs, avail = carry
            acts = []
            for i, actor in enumerate(self.actors):
                obs_i = self._obs_i(obs, i)
                avail_i = None
                if avail is not None:
                    avail_i = avail[:, i, : _space_n(self.act_spaces[i])]
                head, _ = actor.policy.apply(
                    state.actors[self._sidx(i)].params, obs_i
                )
                out = act_sample(k, head, self.act_spaces[i], avail_i,
                                 deterministic=True,
                                 std_x_coef=actor.std_x_coef,
                                 std_y_coef=actor.std_y_coef)
                acts.append(out.actions)
            max_da = max(a.shape[-1] for a in acts)
            stacked = jnp.stack(
                [jnp.pad(a, ((0, 0), (0, max_da - a.shape[-1]))) for a in acts],
                axis=1,
            )
            if self.discrete:
                stacked = stacked.astype(jnp.int32)
            tr = vec.step(env_state, stacked, k)
            return (tr.state, tr.ts.obs, tr.ts.available_actions), (
                tr.ts.obs, stacked, tr.ts.rewards[:, :, 0].mean(axis=1)
            )

        T = self._eval_len()
        _, (obs_traj, act_traj, rew_traj) = jax.lax.scan(
            step, (env_state, ets.obs, ets.available_actions),
            jax.random.split(rng, T),
        )
        if save_path:
            np_.savez(
                save_path,
                obs=np_.asarray(obs_traj), actions=np_.asarray(act_traj),
                rewards=np_.asarray(rew_traj),
            )
            print(f"saved render trajectories to {save_path}")
        return [float(r) for r in np_.asarray(rew_traj).sum(axis=0)]

    def restore(self, state, model_dir: str):
        """Load the latest checkpoint under model_dir (on_policy_base_runner
        restore, :742-763 — here the FULL train state resumes). When the
        checkpoint's non-param pytrees don't match the live run's (e.g. a
        different optimizer chain: lr-decay on vs off, or a different env's
        carry — the transfer-learning case), falls back to the reference's
        own semantic: params + value-norm only, fresh everything else."""
        from harl_tpu.utils.checkpoint import (
            latest_checkpoint,
            restore_params_into,
            restore_state,
        )

        path = latest_checkpoint(model_dir) or model_dir
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x,
            jax.device_get(state),
        )
        print(f"restoring train state from {path}")
        try:
            return restore_state(path, abstract)
        except ValueError as e:
            print(f"full-state resume structure mismatch ({type(e).__name__});"
                  " falling back to params-only restore (reference model_dir"
                  " semantics: network params + value-norm, fresh optimizer)")
            return restore_params_into(path, state)

    # ------------------------------------------------------------------- run
    def run(self, seed: int = 1, log_fn=None, logger=None, save_dir=None, mesh=None):
        """Host training loop: jitted iterations + logging/eval/checkpointing.

        Mirrors OnPolicyBaseRunner.run (on_policy_base_runner.py:171-267) with
        the entire per-episode body compiled into one device call. Pass a
        ``jax.sharding.Mesh`` to shard the env batch over devices (params
        replicated, gradients psum'd by GSPMD).
        """
        state = self.init_state(seed)
        model_dir = self.algo_args["train"].get("model_dir")
        if model_dir:
            state = self.restore(state, model_dir)
        if mesh is not None and not self.host_mode:
            from harl_tpu.parallel.mesh import shard_train_state

            state = shard_train_state(state, mesh, self.n_rollout_threads)
            # pallas_call does not partition under sharding propagation; the
            # associative-scan form is elementwise over batch and shards fine
            self.returns_impl = "assoc"
        steps_per_iter = self.episode_length * self.n_rollout_threads
        tr = self.algo_args["train"]
        ev = self.algo_args.get("eval", {})
        log_interval = tr.get("log_interval", 5)
        eval_interval = tr.get("eval_interval", 25)
        use_eval = ev.get("use_eval", False)
        n_eval = ev.get("n_eval_rollout_threads", 10)
        # optional device trace of iterations 2-4 (skips compile) —
        # utils/profiling.py; view in TensorBoard's profile tab
        profile_dir = tr.get("profile_trace_dir")
        history = []
        t_start = time.time()
        last_return = float("nan")
        for episode in range(1, self.episodes + 1):
            if profile_dir and episode == 2:
                from harl_tpu.utils.profiling import start_trace

                start_trace(profile_dir)
            if self.host_mode:
                state, metrics = self.host_train_iteration(state)
            else:
                state, metrics = self._train_iteration(state)
            if profile_dir and episode == 4:
                from harl_tpu.utils.profiling import stop_trace

                jax.block_until_ready(state.critic.params)
                stop_trace()
                profile_dir = None
            if episode % log_interval == 0 or episode == self.episodes:
                m = jax.device_get(metrics)
                if m["episode_count"] > 0:  # keep last value when no episode ended
                    last_return = float(m["episode_return_sum"] / m["episode_count"])
                fps = episode * steps_per_iter / (time.time() - t_start)
                astats = np.asarray(m["actor_stats"])
                rec = dict(
                    episode=episode,
                    steps=episode * steps_per_iter,
                    mean_episode_return=last_return,
                    value_loss=float(m["value_loss"]),
                    critic_grad_norm=float(m["critic_grad_norm"]),
                    dead_ratio=float(m["dead_ratio"]),
                    fps=fps,
                    agent_stats=[
                        dict(
                            policy_loss=float(astats[i, 0]),
                            dist_entropy=float(astats[i, 1]),
                            actor_grad_norm=float(astats[i, 2]),
                            ratio=float(astats[i, 3]),
                        )
                        for i in range(self.n_agents)
                    ],
                )
                # env-logger metric family (smac win rate, soccer score
                # rate, ...): per-episode averages over this iteration
                if m["episode_count"] > 0:
                    for k, v in m.get("episode_metric_sums", {}).items():
                        name = "win_rate" if k == "won" else k
                        rec[name] = float(v / m["episode_count"])
                history.append(rec)
                if logger is not None:
                    logger.log_episode(rec)
                if log_fn:
                    log_fn(rec)
            if episode % eval_interval == 0 or episode == self.episodes:
                if use_eval:
                    extra = {}
                    if self.host_mode:
                        eval_ret = self.host_eval(state, n_eval)
                    else:
                        eval_eps = ev.get("eval_episodes", n_eval)
                        eval_ret, extra = self.evaluate(state, n_eval, eval_eps)
                    if logger is not None:
                        logger.log_eval(episode * steps_per_iter, eval_ret, extra)
                    if history:
                        history[-1]["eval_return"] = eval_ret
                        for k, v in extra.items():
                            history[-1][
                                "eval_win_rate" if k == "won" else f"eval_{k}"
                            ] = v
                # save every eval_interval REGARDLESS of use_eval
                # (on_policy_base_runner.py:260-265 saves unconditionally)
                if save_dir is not None:
                    from harl_tpu.utils.checkpoint import save_state

                    save_state(save_dir, state, episode * steps_per_iter)
        return state, history


def _space_n(space) -> int:
    kind = spaces.space_kind(space)
    if kind == "Discrete":
        return space.n
    if kind == "Box":
        return space.shape[0]
    return int(sum(space.nvec))
