"""Find the first NaN field in the stabilized HASAC n20 run (CPU, exact
repro of the chip run): run collect/train blocks, after each check every
train-state leaf for non-finiteness; at the first hit, report which
component went bad (actor params / actor alpha / critic params / critic
alpha / valuenorm stats / replay buffer / env carry).
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

main_args, algo_args, env_args = load_config(
    "tuned_configs/pettingzoo_mpe/simple_spread_v2-continuous/hasac/config.json")
algo_args["eval"]["use_eval"] = False
algo_args["train"]["use_valuenorm"] = True
algo_args["algo"]["use_huber_loss"] = True

runner = OffPolicyRunner({"algo": "hasac", "env": "pettingzoo_mpe",
                          "exp_name": "nanhunt"}, algo_args, env_args)
state = runner.init_state(1)
state = runner._warmup(state)


def bad_leaves(tree, prefix):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                out.append(prefix + jax.tree_util.keystr(path))
    return out


def check(state, where):
    bad = []
    for i, st in enumerate(state.actors):
        bad += bad_leaves(st.params, f"actor{i}.params")
        if st.log_alpha is not None:
            bad += bad_leaves(st.log_alpha, f"actor{i}.log_alpha")
    bad += bad_leaves(state.critic.params, "critic.params")
    bad += bad_leaves(state.critic.target_params, "critic.target_params")
    if state.critic.log_alpha is not None:
        bad += bad_leaves(state.critic.log_alpha, "critic.log_alpha")
    if state.critic.value_norm is not None:
        bad += bad_leaves(state.critic.value_norm, "critic.value_norm")
    bad += bad_leaves(state.buffer.rewards, "buffer.rewards")
    bad += bad_leaves(state.buffer.share_obs, "buffer.share_obs")
    bad += bad_leaves(tuple(state.buffer.actions), "buffer.actions")
    bad += bad_leaves(state.carry.obs, "carry.obs")
    if bad:
        print(f"FIRST NON-FINITE at {where}:", flush=True)
        for b in bad[:20]:
            print("  ", b, flush=True)
        return True
    return False


for block in range(1200):
    state, _ = runner._collect(state)
    if check(state, f"block {block} after COLLECT"):
        break
    state, tm = runner._train(state)
    if check(state, f"block {block} after TRAIN"):
        # extra context: alpha values
        for i, st in enumerate(state.actors):
            if st.log_alpha is not None:
                print(f"  actor{i} log_alpha={float(st.log_alpha):.3f}")
        if state.critic.log_alpha is not None:
            print(f"  critic log_alpha={float(state.critic.log_alpha):.3f}")
        if state.critic.value_norm is not None:
            vn = state.critic.value_norm
            print(f"  vn mean={np.asarray(vn.running_mean)} "
                  f"meansq={np.asarray(vn.running_mean_sq)} "
                  f"debias={float(vn.debiasing_term):.6f}")
        break
    if block % 50 == 0:
        print(f"block {block} ({(block+1)*1000} steps) ok "
              f"closs={float(tm['critic_loss']):.4f}", flush=True)
else:
    print("no NaN within budget")
