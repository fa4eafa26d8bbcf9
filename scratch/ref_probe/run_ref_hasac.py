"""Ground-truth experiment: run the REFERENCE HARL implementation itself
(PyTorch, CPU) on the exact tuned MPE HASAC n_step=20 config, to establish
whether the n=20 divergence is a repo bug or inherent to the reference
semantics at this config. Taps critic-Q magnitude + train episode returns.

The installed pettingzoo wheel lacks the mpe module, so the env itself is
the REPO's pure-JAX MPE behind a ShareVecEnv-protocol adapter
(jax_mpe_adapter.py) — the same dynamics/reward the repo trains on. This
makes the comparison env-identical: reference algorithm + repo env vs
repo algorithm + repo env.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "stubs"))
sys.path.insert(0, "/root/reference")

import numpy as np
import torch

torch.set_num_threads(2)

cfg = json.load(open(
    "/root/reference/tuned_configs/pettingzoo_mpe/"
    "simple_spread_v2-continuous/hasac/config.json"))
algo_args, env_args = cfg["algo_args"], cfg["env_args"]
algo_args["train"]["num_env_steps"] = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
algo_args["eval"]["use_eval"] = False
algo_args["device"]["cuda"] = False
algo_args["logger"]["log_dir"] = os.path.join(os.path.dirname(__file__), "results")

for kv in sys.argv[2:]:
    k, v = kv.split("=")
    sec, key = k.split(".")
    algo_args[sec][key] = eval(v)
    print("override", sec, key, "=", v, flush=True)

# tap: print critic loss ingredients every N critic updates
from harl.algorithms.critics.soft_twin_continuous_q_critic import (
    SoftTwinContinuousQCritic,
)

_orig_train = SoftTwinContinuousQCritic.train
_cnt = [0]


def train_tap(self, share_obs, actions, reward, done, valid_transition, term,
              next_share_obs, next_actions, next_logp_actions, gamma,
              value_normalizer=None):
    _cnt[0] += 1
    if _cnt[0] % 500 == 1:
        with torch.no_grad():
            sobs = torch.tensor(np.asarray(share_obs), dtype=torch.float32)
            acts = torch.cat([torch.tensor(np.asarray(a), dtype=torch.float32)
                              for a in actions], dim=-1)
            q = self.critic(sobs, acts)
            nlp = torch.sum(torch.cat(
                [lp for lp in next_logp_actions], dim=-1), dim=-1)
            print(f"[tap] update {_cnt[0]:7d} q_mean {q.mean():9.2f} "
                  f"q_absmax {q.abs().max():9.2f} "
                  f"rew_n {np.mean(reward):7.2f} nlogp {nlp.mean():7.2f} "
                  f"alpha {float(self.alpha):7.4f}", flush=True)
    return _orig_train(self, share_obs, actions, reward, done,
                       valid_transition, term, next_share_obs, next_actions,
                       next_logp_actions, gamma, value_normalizer)


SoftTwinContinuousQCritic.train = train_tap

# swap the env layer: repo JAX MPE behind the reference vec protocol
from jax_mpe_adapter import JaxMPEShareVecEnv
import harl.utils.envs_tools as envs_tools


def make_train_env(env_name, seed, n_threads, env_args):
    assert env_name == "pettingzoo_mpe"
    return JaxMPEShareVecEnv(dict(env_args), n_threads, seed)


envs_tools.make_train_env = make_train_env
import harl.runners.off_policy_base_runner as opbr

opbr.make_train_env = make_train_env

from harl.runners import RUNNER_REGISTRY

runner = RUNNER_REGISTRY["hasac"](
    {"algo": "hasac", "env": "pettingzoo_mpe", "exp_name": "refprobe"},
    algo_args, env_args)
runner.run()
runner.close()
