"""The tuned-config tree is the de-facto regression suite (SURVEY.md §4):
every config must be loadable by ``--load_config`` and a representative
sample must construct its runner."""
import json
from pathlib import Path

import pytest

from harl_tpu.utils.config_tools import load_config

ROOT = Path(__file__).resolve().parents[1]
CONFIGS = sorted((ROOT / "tuned_configs").glob("*/*/*/config.json"))


def test_tree_is_populated():
    # reference ships 152 configs; we port every supported one
    assert len(CONFIGS) >= 150


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: "/".join(p.parts[-4:-1]))
def test_config_loads(path):
    main_args, algo_args, env_args = load_config(str(path))
    assert main_args["algo"] and main_args["env"]
    for sec in ("seed", "train", "model", "algo"):
        assert sec in algo_args, f"{path} missing section {sec}"
    assert isinstance(env_args, dict) and env_args


def _sample_one_per_env_algo():
    seen, sample = set(), []
    for p in CONFIGS:
        env, _task, algo = p.parts[-4:-1]
        if (env, algo) in seen:
            continue
        seen.add((env, algo))
        sample.append(p)
    return sample


@pytest.mark.parametrize(
    "path", _sample_one_per_env_algo(), ids=lambda p: "/".join(p.parts[-4:-1])
)
def test_runner_constructs(path):
    main_args, algo_args, env_args = load_config(str(path))
    algo = main_args["algo"]
    # keep construction cheap: shrink the env batch, don't train
    algo_args["train"]["n_rollout_threads"] = 2
    if "episode_length" in algo_args["train"]:
        algo_args["train"]["episode_length"] = 8
    algo_args["eval"]["use_eval"] = False
    if algo in ("happo", "hatrpo", "haa2c", "mappo"):
        from harl_tpu.runners.on_policy import OnPolicyRunner as Runner
    else:
        from harl_tpu.runners.off_policy import OffPolicyRunner as Runner
    runner = Runner(
        {"algo": algo, "env": main_args["env"], "exp_name": "cfgtest"},
        algo_args,
        env_args,
    )
    assert runner.n_agents >= 1
