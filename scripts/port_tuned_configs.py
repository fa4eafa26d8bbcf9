"""Port the reference's tuned_configs tree into repo-schema configs.

The reference's 152 ``tuned_configs/**/config.json`` files are its de-facto
regression suite (SURVEY.md §4). This script translates each into this
repo's schema: our algo-defaults YAML provides the base, the reference's
hyperparameter VALUES overlay every key our schema shares, env names map to
the TPU-native env families, and env_args are reduced to the keys our
adapters consume. Existing (hand-validated) configs are never overwritten.

Run from the repo root:  python scripts/port_tuned_configs.py
"""
import json
import sys
from pathlib import Path

import yaml

REF = Path("/root/reference/tuned_configs")
OUT = Path("tuned_configs")
CFG = Path("harl_tpu/configs")

ENV_MAP = {
    "mamujoco": "mamujoco_jax",
    "pettingzoo_mpe": "pettingzoo_mpe",
    "smac": "smaclite",
    "smacv2": "smacv2",
    "football": "football_jax",
    "dexhands": "dexhands_jax",
}

# env_args keys our adapters consume, per target env
ENV_KEYS = {
    "mamujoco_jax": ("scenario", "agent_conf", "episode_limit"),
    "pettingzoo_mpe": ("scenario", "continuous_actions"),
    "smaclite": ("map_name", "state_type"),
    "smacv2": ("map_name", "state_type"),
    "football_jax": ("env_name", "rewards"),
    "dexhands_jax": ("task", "hands_episode_length"),
}


def overlay(ours: dict, theirs: dict) -> dict:
    """Recursively copy reference values onto our defaults for shared keys."""
    for sec, sub in theirs.items():
        if sec not in ours or not isinstance(sub, dict):
            continue
        for k, v in sub.items():
            if k in ours[sec]:
                ours[sec][k] = v
    return ours


def main() -> int:
    ported, skipped = 0, 0
    for ref_path in sorted(REF.glob("*/*/*/config.json")):
        suite, task, algo = ref_path.parts[-4:-1]
        env = ENV_MAP[suite]
        ref = json.loads(ref_path.read_text())

        algo_yaml = CFG / "algos_cfgs" / f"{algo}.yaml"
        if not algo_yaml.exists():
            print(f"skip {suite}/{task}/{algo}: no algo defaults", file=sys.stderr)
            skipped += 1
            continue
        algo_args = yaml.safe_load(algo_yaml.read_text())
        algo_args = overlay(algo_args, ref.get("algo_args", {}))

        env_defaults = yaml.safe_load((CFG / "envs_cfgs" / f"{env}.yaml").read_text()) or {}
        env_args = dict(env_defaults)
        for k in ENV_KEYS[env]:
            if k in ref.get("env_args", {}):
                env_args[k] = ref["env_args"][k]

        out = {
            "main_args": {"algo": algo, "env": env, "exp_name": "tuned"},
            "algo_args": algo_args,
            "env_args": env_args,
            "_source": str(ref_path),
        }
        out_path = OUT / env / task / algo / "config.json"
        if out_path.exists():
            skipped += 1
            continue
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(out, indent=2) + "\n")
        ported += 1
    print(f"ported {ported}, skipped {skipped} (existing or unsupported)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
