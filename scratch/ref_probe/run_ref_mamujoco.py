"""Twin-experiment: the REFERENCE HARL HAPPO (PyTorch, CPU) on the repo's
pure-JAX MAMuJoCo Humanoid WITH the reference's per-observation
standardization enabled (obs_standardize=True, the repo env default —
mujoco_multi.py:208-210 semantics).

Round-5 VERDICT item 4: decides whether the ~150-step survival cap under
standardized obs is an env-physics property (reference fails too) or an
algorithm-side gap (reference learns).

Usage: python run_ref_mamujoco.py <num_env_steps> [sec.key=val ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "stubs"))
sys.path.insert(0, "/root/reference")

import numpy as np
import torch

torch.set_num_threads(1)

cfg = json.load(open(
    "/root/reference/tuned_configs/mamujoco/Humanoid-v2-17x1/happo/config.json"))
algo_args, env_args = cfg["algo_args"], cfg["env_args"]
algo_args["train"]["num_env_steps"] = (
    int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
algo_args["eval"]["use_eval"] = False
algo_args["device"]["cuda"] = False
algo_args["logger"]["log_dir"] = os.path.join(
    os.path.dirname(__file__), "results")

for kv in sys.argv[2:]:
    k, v = kv.split("=")
    sec, key = k.split(".")
    algo_args[sec][key] = eval(v)
    print("override", sec, key, "=", v, flush=True)

from jax_mamujoco_adapter import JaxMamujocoShareVecEnv
import harl.utils.envs_tools as envs_tools


def make_train_env(env_name, seed, n_threads, env_args):
    assert env_name == "mamujoco"
    return JaxMamujocoShareVecEnv(dict(env_args), n_threads, seed)


envs_tools.make_train_env = make_train_env
import harl.runners.on_policy_base_runner as opbr

opbr.make_train_env = make_train_env

from harl.runners import RUNNER_REGISTRY

runner = RUNNER_REGISTRY["happo"](
    {"algo": "happo", "env": "mamujoco", "exp_name": "refprobe_humanoid_std"},
    algo_args, env_args)
runner.run()
runner.close()
