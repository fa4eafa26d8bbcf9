"""Decompose the flagship bench iteration: rollout scan vs update phase.

Times three jitted programs on the bench config (HAPPO HalfCheetah-6x1):
  1. full train iteration (rollout + returns + sequential update + critic)
  2. rollout scan only
  3. env physics scan only (no policy/value forwards)
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: None, jax.device_get(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.time() - t0) / iters


def main():
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from harl_tpu.utils.config_tools import get_defaults_yaml_args

    n_threads = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    T = 32
    algo_args, env_args = get_defaults_yaml_args("happo", "mamujoco_jax")
    algo_args["train"].update(
        n_rollout_threads=n_threads, episode_length=T, num_env_steps=10**9
    )
    algo_args["model"].update(hidden_sizes=[64, 64])
    env_args.update(scenario="HalfCheetah-v2", agent_conf="6x1", episode_limit=1000)
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "mamujoco_jax", "exp_name": "prof"}, algo_args, env_args
    )
    state = runner.init_state(0)
    print("backend:", jax.default_backend(), "returns_impl:", runner.returns_impl)

    # --- full iteration -----------------------------------------------------
    full = runner._train_iteration
    state2, _ = full(state)
    t_full = timeit(lambda s: full(s)[0].carry.obs, state)
    print(f"full iteration: {t_full*1e3:.1f} ms  ({T*n_threads/t_full/1e3:.0f}k steps/s)")

    # --- rollout only -------------------------------------------------------
    def rollout_only(ts):
        def scan_step(carry, k):
            return runner.rollout_step(ts.actors, ts.critic.params, carry, k)

        carry, data = jax.lax.scan(
            scan_step, ts.carry, jax.random.split(ts.rng, T)
        )
        return carry.obs

    ro = jax.jit(rollout_only)
    t_ro = timeit(ro, state)
    print(f"rollout scan:  {t_ro*1e3:.1f} ms  ({T*n_threads/t_ro/1e3:.0f}k steps/s)")

    # --- physics only -------------------------------------------------------
    def physics_only(ts):
        B = runner.n_rollout_threads
        N = runner.n_agents
        max_da = max(
            a.shape[-1] if hasattr(a, "shape") else 1 for a in [jnp.zeros((1, 1))]
        )
        act_dim = max(sp.shape[0] for sp in runner.act_spaces)
        actions = jnp.zeros((B, N, act_dim))

        def step(carry, k):
            tr = runner.vec.step(carry, actions, k)
            return tr.state, None

        final, _ = jax.lax.scan(step, ts.carry.env_state, jax.random.split(ts.rng, T))
        return jax.tree.leaves(final)[0]

    po = jax.jit(physics_only)
    t_po = timeit(po, state)
    print(f"physics scan:  {t_po*1e3:.1f} ms  ({T*n_threads/t_po/1e3:.0f}k steps/s)")
    print(f"update phase ≈ {1e3*(t_full - t_ro):.1f} ms; policy+value ≈ {1e3*(t_ro - t_po):.1f} ms")


if __name__ == "__main__":
    main()
