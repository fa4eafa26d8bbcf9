"""Diagnose the HASAC n_step=20 divergence on MPE (round-4 VERDICT item 2).

Runs the reference-exact tuned config on CPU, printing per-block:
critic loss, per-agent alpha, critic alpha, mean/max |Q| on a fresh
sample, mean target magnitude, mean next_logp — to localize the positive
feedback (alpha | Q drift | target assembly).
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from harl_tpu.utils.config_tools import load_config
from harl_tpu.runners.off_policy import OffPolicyRunner
from harl_tpu.buffers.off_policy import sample

main_args, algo_args, env_args = load_config(
    "tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/hasac/config.json")
algo_args["eval"]["use_eval"] = False
for kv in sys.argv[1:]:
    k, v = kv.split("=")
    sec, key = k.split(".")
    algo_args[sec][key] = eval(v)
    print("override", sec, key, "=", algo_args[sec][key], flush=True)

runner = OffPolicyRunner({"algo": "hasac", "env": "pettingzoo_mpe",
                          "exp_name": "diag"}, algo_args, env_args)
N = runner.n_agents


def diag(state, key):
    sp = sample(state.buffer, key, 1000,
                runner.n_step, runner.gamma, runner.n_rollout_threads)
    next_acts, next_logps = [], []
    for i, actor in enumerate(runner.actors):
        a, lp = actor.get_actions_with_logprobs(
            state.actors[i].params, sp.next_obs[i],
            jax.random.fold_in(key, 7 + i), None)
        next_acts.append(a)
        next_logps.append(lp)
    next_joint = jnp.concatenate(next_acts, axis=-1)
    next_logp = jnp.sum(jnp.concatenate(next_logps, -1), -1, keepdims=True)
    joint = jnp.concatenate([sp.actions[i] for i in range(N)], -1)
    q = runner.critic.net.apply(state.critic.params[0], sp.share_obs, joint)
    tq = runner.critic._target_q(state.critic, sp.next_share_obs, next_joint)
    alpha_c = (jnp.exp(state.critic.log_alpha)
               if state.critic.log_alpha is not None else jnp.asarray(-1.0))
    tgt = sp.rewards + sp.gamma * (tq - alpha_c * next_logp) * (1.0 - sp.terms)
    alphas = jnp.stack([jnp.exp(st.log_alpha) if st.log_alpha is not None
                        else jnp.asarray(-1.0) for st in state.actors])
    return dict(q_mean=jnp.mean(q), q_absmax=jnp.max(jnp.abs(q)),
                tq_mean=jnp.mean(tq), tgt_mean=jnp.mean(tgt),
                rew_n=jnp.mean(sp.rewards), nlogp=jnp.mean(next_logp),
                alpha_c=alpha_c, alphas=alphas)


diag_j = jax.jit(diag)

state = runner.init_state(1)
print("warmup...", flush=True)
state = runner._warmup(state)
print("warmup done", flush=True)
for block in range(400):
    state, cm = runner._collect(state)
    state, tm = runner._train(state)
    if block % 20 == 0:
        d = jax.device_get(diag_j(state, jax.random.PRNGKey(block)))
        cm = jax.device_get(cm)
        tm = jax.device_get(tm)
        ret = float(cm["episode_return_sum"]) / max(float(cm["episode_count"]), 1)
        print(f"blk {block:4d} steps {(block+1)*runner.train_interval*runner.n_rollout_threads:8d} "
              f"closs {float(tm['critic_loss']):10.2f} ret {ret:8.2f} "
              f"q {d['q_mean']:9.2f}/{d['q_absmax']:9.2f} "
              f"tq {d['tq_mean']:9.2f} tgt {d['tgt_mean']:9.2f} "
              f"rew_n {d['rew_n']:7.2f} nlogp {d['nlogp']:7.2f} "
              f"a_c {d['alpha_c']:8.4f} a {np.round(d['alphas'],4)}",
              flush=True)
