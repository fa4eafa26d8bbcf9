"""Behavioral probe of a trained ShadowHandOver policy (round-4): restore a
checkpoint, roll deterministic episodes, and report WHERE the failures are —
min-dist distribution, ball end positions, drop rate, receiver finger
activity — to tell scatter (ballistic imprecision) from never-caught.
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from harl_tpu.utils.config_tools import load_config
from harl_tpu.runners.on_policy import OnPolicyRunner
from harl_tpu.models.act import act_sample

run_dir = sys.argv[1]
main_args, algo_args, env_args = load_config(os.path.join(run_dir, "config.json"))
algo_args["eval"]["use_eval"] = False
runner = OnPolicyRunner(main_args, algo_args, env_args)
state = runner.init_state(1)
state = runner.restore(state, os.path.join(run_dir, "models"))

env = runner.env
B = 256
key = jax.random.PRNGKey(0)
keys = jax.random.split(key, B)
reset_v = jax.jit(jax.vmap(env.reset))
step_v = jax.jit(jax.vmap(env.step))

est, ts = reset_v(keys)


def policy_actions(obs):
    acts = []
    for i in range(runner.n_agents):
        head, _ = runner.actors[i].policy.apply(
            state.actors[i].params, obs[:, i, : runner.obs_dims[i]])
        out = act_sample(jax.random.PRNGKey(0), head, runner.act_spaces[i],
                        None, deterministic=True,
                        std_x_coef=runner.actors[i].std_x_coef,
                        std_y_coef=runner.actors[i].std_y_coef)
        acts.append(out.actions)
    return jnp.stack(acts, axis=1)


T = env.episode_length
min_dist = jnp.full((B,), 1e9)
dropped = jnp.zeros((B,), bool)
succ = jnp.zeros((B,), bool)
picked_up = jnp.zeros((B,), bool)    # ball left thrower region (y < -0.10)
reached_recv = jnp.zeros((B,), bool)  # ball entered receiver palm xy region
recv_act_mag = 0.0
traj_z = []
traj_y = []
end_pos = None
for t in range(T):
    a = policy_actions(ts.obs)
    est, ts = step_v(est, a, jax.random.split(jax.random.PRNGKey(t + 1), B))
    d = jnp.linalg.norm(est.obj_pos[:, 0] - est.goal_pos[:, 0], axis=-1)
    alive = ~dropped
    min_dist = jnp.where(alive, jnp.minimum(min_dist, d), min_dist)
    succ = succ | jnp.where(alive, est.succeeded[:, 0], False)
    y = est.obj_pos[:, 0, 1]
    z = est.obj_pos[:, 0, 2]
    picked_up = picked_up | (alive & (y < -0.10))
    reached_recv = reached_recv | (
        alive & (jnp.abs(est.obj_pos[:, 0, 0]) < 0.105)
        & (jnp.abs(y + 0.255) < 0.105))
    recv_act_mag += float(jnp.mean(jnp.abs(a[:, 1])))
    dropped = dropped | (z < -0.08)
    traj_z.append(np.asarray(z))
    traj_y.append(np.asarray(y))
    if t == T - 1:
        end_pos = np.asarray(est.obj_pos[:, 0])

md = np.asarray(min_dist)
print(f"episodes {B}  success {float(jnp.mean(succ)):.3f}  dropped {float(jnp.mean(dropped)):.3f}")
print(f"picked_up(y<-0.10) {float(jnp.mean(picked_up)):.3f}  reached_recv_region {float(jnp.mean(reached_recv)):.3f}")
print("min_dist percentiles:", {p: round(float(np.percentile(md, p)), 3) for p in (5, 25, 50, 75, 95)})
print("min_dist<0.05:", float(np.mean(md < 0.05)), " <0.04:", float(np.mean(md < 0.04)), " <0.03:", float(np.mean(md < 0.03)))
print(f"receiver mean |action| {recv_act_mag / T:.3f}")
fail = ~np.asarray(succ)
if fail.any():
    ep = np.asarray(end_pos)[fail]
    print("failed-episode end pos mean", ep.mean(0).round(3), "std", ep.std(0).round(3))
    # where do failures peak? nearest-approach stats for fails only
    print("fail min_dist percentiles:", {p: round(float(np.percentile(md[fail], p)), 3) for p in (25, 50, 75)})
zz = np.stack(traj_z); yy = np.stack(traj_y)
print("ball z max (median over eps):", round(float(np.median(zz.max(0))), 3),
      " y min (median):", round(float(np.median(yy.min(0))), 3))
