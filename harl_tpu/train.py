"""CLI entry point.

Parity target: ``examples/train.py`` of the reference —
``python -m harl_tpu.train --algo happo --env pettingzoo_mpe --exp_name x
[--key value ...]`` with arbitrary ``--key value`` overrides applied
recursively to the YAML defaults (examples/train.py:9-76), or
``--load_config path/config.json`` to reproduce a saved run.
"""
from __future__ import annotations

import argparse
import ast
import sys


def _parse_unknown(unparsed):
    """--key value pairs → dict with literal-eval'd values (train.py:57-65,
    using ast.literal_eval instead of the reference's eval())."""
    out = {}
    key = None
    for tok in unparsed:
        if tok.startswith("--"):
            key = tok[2:]
            out[key] = True  # bare flag
        elif key is not None:
            try:
                out[key] = ast.literal_eval(tok)
            except (ValueError, SyntaxError):
                out[key] = tok
            key = None
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU-native HARL training")
    parser.add_argument(
        "--algo",
        default="happo",
        choices=[
            "happo", "hatrpo", "haa2c", "mappo",
            "haddpg", "hatd3", "hasac", "had3qn", "maddpg", "matd3",
        ],
    )
    parser.add_argument("--env", default="pettingzoo_mpe")
    parser.add_argument("--exp_name", default="installtest")
    parser.add_argument("--load_config", default="")
    args, unparsed = parser.parse_known_args(argv)
    args = vars(args)

    from harl_tpu.utils.config_tools import (
        get_defaults_yaml_args,
        init_dir,
        load_config,
        save_config,
        update_args,
    )

    if args["load_config"]:
        saved_main, algo_args, env_args = load_config(args["load_config"])
        args["algo"] = saved_main.get("algo", args["algo"])
        args["env"] = saved_main.get("env", args["env"])
    else:
        algo_args, env_args = get_defaults_yaml_args(args["algo"], args["env"])
    update_args(_parse_unknown(unparsed), algo_args, env_args)

    seed = algo_args["seed"]["seed"] if algo_args["seed"].get("seed_specify", True) else 1
    run_dir, log_dir, save_dir = init_dir(
        args["env"], env_args, args["algo"], args["exp_name"], seed,
        algo_args.get("logger", {}).get("log_dir", "./results"),
    )
    save_config(args, algo_args, env_args, run_dir)

    from harl_tpu.logging.logger import TrainLogger

    if args["algo"] in ("happo", "haa2c", "mappo", "hatrpo"):
        from harl_tpu.runners.on_policy import OnPolicyRunner as Runner
    else:
        from harl_tpu.runners.off_policy import OffPolicyRunner as Runner

    import os

    # persistent compile cache: repeated runs of the same program skip the
    # (remote) XLA compile entirely. sitecustomize may have imported jax
    # already, so set the live config, not just the env var
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    # ---- multi-host init over DCN (jax.distributed) -----------------------
    # CLI: --num_processes N --coordinator host:port --process_id K
    # (process_id defaults to $JAX_PROCESS_ID for launcher integration)
    dev = algo_args.get("device", {}) or {}
    num_processes = dev.get("num_processes")
    if num_processes and num_processes > 1:
        from harl_tpu.parallel.mesh import distributed_init

        process_id = dev.get("process_id")
        if process_id is None:
            process_id = int(os.environ.get("JAX_PROCESS_ID", 0))
        distributed_init(dev.get("coordinator"), num_processes, process_id)
        print(
            f"jax.distributed: process {jax.process_index()}/{jax.process_count()}"
            f" — {len(jax.devices())} global devices"
        )

    runner = Runner(args, algo_args, env_args)
    logger = TrainLogger(args, algo_args, env_args, runner.n_agents, log_dir)
    mesh = None
    n_devices = dev.get("n_devices")
    if (n_devices and n_devices > 1) or (n_devices is None and len(jax.devices()) > 1):
        from harl_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices)
        print(f"data-parallel mesh over {len(mesh.devices.flat)} devices")
    try:
        if (algo_args.get("render", {}) or {}).get("use_render", False):
            state = runner.init_state(seed)
            model_dir = algo_args["train"].get("model_dir")
            if model_dir and hasattr(runner, "restore"):
                state = runner.restore(state, model_dir)
            episodes = algo_args["render"].get("render_episodes", 10)
            returns = runner.render(state, episodes, save_path=f"{run_dir}/render.npz")
            print("render returns:", [round(r, 2) for r in returns])
        else:
            runner.run(seed=seed, logger=logger, save_dir=save_dir, mesh=mesh)
    finally:
        logger.close()
    print(f"results saved under {run_dir}")


if __name__ == "__main__":
    main()
