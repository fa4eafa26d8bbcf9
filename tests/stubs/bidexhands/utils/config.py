"""Stub of ``bidexhands.utils.config`` (vendored DexterousHands API surface:
``get_args(env_args)`` / ``load_env_cfg(args)`` / ``parse_sim_params`` —
reference call sequence harl/envs/dexhands/dexhands_env.py:49-55)."""
from types import SimpleNamespace


def get_args(env_args, benchmark=False, use_rlg_config=False):
    return SimpleNamespace(
        task=env_args.get("task", "ShadowHandOver"),
        num_envs=int(env_args["n_threads"]),
        episode_length=int(env_args.get("hands_episode_length", 75)),
        task_type="Python",
    )


def load_env_cfg(args, use_rlg_config=False):
    return {"env": {"numEnvs": args.num_envs,
                    "episodeLength": args.episode_length}}


def parse_sim_params(args, cfg):
    return SimpleNamespace(dt=1.0 / 60.0)
