"""Weak-scaling benchmark: HAPPO training step over a growing dp mesh.

The BASELINE.md target is ≥80% multi-host scaling efficiency. This harness
measures it directly: the flagship HAPPO HalfCheetah-6x1 train iteration runs
with a FIXED per-device env batch over meshes of 1, 2, 4, … available
devices, and reports env-steps/s plus efficiency relative to the single-
device rate. On a real pod slice it measures true ICI scaling; on CPU with
``--xla_force_host_platform_device_count=N`` it validates the sharded
program end-to-end (numbers are then about correctness, not speed).

Usage:
    python scripts/scaling_bench.py [per_device_batch] [episode_length]
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py 64 16
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

# honor JAX_PLATFORMS even though the axon sitecustomize already imported jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def run(per_device_batch: int, episode_length: int):
    from harl_tpu.parallel.mesh import make_mesh, shard_train_state
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from harl_tpu.utils.config_tools import get_defaults_yaml_args

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    if sizes[-1] != n_dev:
        sizes.append(n_dev)
    results = []
    for d in sizes:
        algo_args, env_args = get_defaults_yaml_args("happo", "mamujoco_jax")
        algo_args["train"].update(
            n_rollout_threads=per_device_batch * d,
            episode_length=episode_length, num_env_steps=10**9)
        algo_args["model"].update(hidden_sizes=[64, 64])
        env_args.update(scenario="HalfCheetah-v2", agent_conf="6x1",
                        episode_limit=1000)
        runner = OnPolicyRunner(
            {"algo": "happo", "env": "mamujoco_jax", "exp_name": "scale"},
            algo_args, env_args)
        mesh = make_mesh(d)
        state = runner.init_state(0)
        state = shard_train_state(state, mesh, runner.n_rollout_threads)
        step = jax.jit(runner.train_iteration)
        with mesh:
            for _ in range(2):
                state, m = step(state)
            float(m["value_loss"])
            iters = 5
            t0 = time.time()
            for _ in range(iters):
                state, m = step(state)
            float(m["value_loss"])
            dt = time.time() - t0
        fps = iters * episode_length * per_device_batch * d / dt
        results.append({"devices": d, "env_steps_per_s": round(fps, 1)})
        base = results[0]["env_steps_per_s"]
        eff = fps / (base * d)
        results[-1]["efficiency"] = round(eff, 3)
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    run(b, t)
