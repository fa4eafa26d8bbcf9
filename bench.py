"""Benchmark: HAPPO training throughput (env-steps/s) on JAX-MPE simple_spread.

Runs the full jitted train iteration (rollout + GAE + sequential update +
critic) on the available accelerator and reports steady-state environment
steps per second. ``vs_baseline`` is measured against the PyTorch reference's
typical MPE collection throughput (~4k env-steps/s with 20 subprocess workers
on a desktop GPU; the reference never publishes numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax

REFERENCE_FPS = 4000.0  # PyTorch HARL MPE rollout throughput estimate (20 workers)


def main():
    from __graft_entry__ import _make_runner

    n_threads = int(float(sys.argv[1])) if len(sys.argv) > 1 else 8192
    episode_length = 25
    runner = _make_runner(n_rollout_threads=n_threads, episode_length=episode_length)
    state = runner.init_state(0)

    # warmup: first compile + layout-change recompile both happen in the first
    # two calls; a value FETCH (not block_until_ready, which does not reliably
    # block on the remote-TPU platform) forces completion
    for _ in range(3):
        state, metrics = runner._train_iteration(state)
    float(metrics["value_loss"])

    iters = 20
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
                "metric": "happo_mpe_env_steps_per_s",
                "value": round(fps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
