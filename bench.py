"""Benchmark: HAPPO training throughput on MAMuJoCo HalfCheetah-6x1 (pure-JAX).

The flagship BASELINE.md config: the full jitted HAPPO train iteration
(rollout scan over the planar-cheetah physics + GAE + sequential-update +
critic epochs) on the available accelerator, reporting steady-state
environment steps per second.

``vs_baseline`` is measured against an estimate of the PyTorch reference's
throughput on the same task (~8k env-steps/s: 20 subprocess MuJoCo workers
with per-step policy forwards and Pipe round-trips on a desktop GPU — the
reference never publishes numbers, BASELINE.md). The driver-set target is
1M env-steps/s on a v4-16 (8 chips), i.e. 125k/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")
# persistent compile cache — sitecustomize may have imported jax already, so
# the env var alone is ignored; set the live config too
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

REFERENCE_FPS = 8000.0  # PyTorch HARL MAMuJoCo rollout throughput estimate


def main():
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from harl_tpu.utils.config_tools import get_defaults_yaml_args

    n_threads = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2048
    episode_length = 32
    algo_args, env_args = get_defaults_yaml_args("happo", "mamujoco_jax")
    algo_args["train"].update(
        n_rollout_threads=n_threads,
        episode_length=episode_length,
        num_env_steps=10**9,
    )
    algo_args["model"].update(hidden_sizes=[64, 64])
    env_args.update(scenario="HalfCheetah-v2", agent_conf="6x1", episode_limit=1000)
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "mamujoco_jax", "exp_name": "bench"},
        algo_args,
        env_args,
    )
    state = runner.init_state(0)

    # warmup: first compile + layout-change recompile both happen in the first
    # two calls; a value FETCH (not block_until_ready, which does not reliably
    # block on the remote-TPU platform) forces completion
    for _ in range(3):
        state, metrics = runner._train_iteration(state)
    float(metrics["value_loss"])

    iters = 15
    t0 = time.time()
    for _ in range(iters):
        state, metrics = runner._train_iteration(state)
    float(metrics["value_loss"])  # hard sync on the last iteration's output
    dt = time.time() - t0

    steps = iters * episode_length * n_threads
    fps = steps / dt
    print(
        json.dumps(
            {
                "metric": "happo_halfcheetah6x1_env_steps_per_s",
                "value": round(fps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
