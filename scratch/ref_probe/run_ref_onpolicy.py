"""Twin-experiment for ON-POLICY algorithms: run the REFERENCE HARL
implementation (PyTorch, CPU) with a tuned config against the repo's JAX MPE
env (jax_mpe_adapter) — isolates algorithm-side parity questions (HAA2C's
near-random MPE result, round-4 VERDICT item 3) from env differences.

Usage: python run_ref_onpolicy.py <algo> <num_env_steps> [sec.key=val ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "stubs"))
sys.path.insert(0, "/root/reference")

import numpy as np
import torch

torch.set_num_threads(2)

algo = sys.argv[1] if len(sys.argv) > 1 else "haa2c"
cfg = json.load(open(
    "/root/reference/tuned_configs/pettingzoo_mpe/"
    f"simple_spread_v2-continuous/{algo}/config.json"))
algo_args, env_args = cfg["algo_args"], cfg["env_args"]
algo_args["train"]["num_env_steps"] = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
algo_args["eval"]["use_eval"] = False
algo_args["device"]["cuda"] = False
algo_args["logger"]["log_dir"] = os.path.join(os.path.dirname(__file__), "results")

for kv in sys.argv[3:]:
    k, v = kv.split("=")
    sec, key = k.split(".")
    algo_args[sec][key] = eval(v)
    print("override", sec, key, "=", v, flush=True)

from jax_mpe_adapter import JaxMPEShareVecEnv
import harl.utils.envs_tools as envs_tools


def make_train_env(env_name, seed, n_threads, env_args):
    assert env_name == "pettingzoo_mpe"
    return JaxMPEShareVecEnv(dict(env_args), n_threads, seed)


envs_tools.make_train_env = make_train_env
import harl.runners.on_policy_base_runner as opbr

opbr.make_train_env = make_train_env

from harl.runners import RUNNER_REGISTRY

runner = RUNNER_REGISTRY[algo](
    {"algo": algo, "env": "pettingzoo_mpe", "exp_name": f"refprobe_{algo}"},
    algo_args, env_args)
runner.run()
runner.close()
