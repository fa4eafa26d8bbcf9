"""Pure-JAX ShadowHandOver (Bi-DexterousHands analogue) tests.

Covers the interface contract of the reference dexhands adapter
(harl/envs/dexhands/dexhands_env.py: 2 agents, per-hand obs views, shared
state, batched always-done envs) and the physics sanity of the penalty-contact
hand/object model.
"""
import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.envs.dexhands_jax.handover import make_handover


def test_spaces_and_shapes():
    env = make_handover({})
    assert env.n_agents == 2
    assert env.action_space[0].shape == (20,)
    assert env.observation_space[0].shape == (78,)
    assert env.share_observation_space[0].shape == (133,)
    state, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (2, 78)
    assert ts.share_obs.shape == (133,)
    assert ts.metrics is not None and "won" in ts.metrics


def test_object_rests_on_lower_palm():
    env = make_handover({})
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for _ in range(30):
        state, ts = step(state, jnp.zeros((2, 20)), key)
    # supported by palm contact: stays at ~OBJ_RADIUS above palm plane
    assert 0.02 < float(state.obj_pos[0, 2]) < 0.08
    assert not bool(ts.dones[0])


def test_timeout_is_truncation():
    env = make_handover({"hands_episode_length": 10})
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for _ in range(10):
        state, ts = step(state, jnp.zeros((2, 20)), key)
    assert bool(ts.dones[0]) and bool(ts.bad_transition)


def test_drop_is_real_termination():
    env = make_handover({})
    state, _ = env.reset(jax.random.PRNGKey(0))
    # teleport the object off the palm so it free-falls
    state = state._replace(obj_pos=jnp.array([[0.5, 0.5, 0.0]]))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    done = False
    for _ in range(40):
        state, ts = step(state, jnp.zeros((2, 20)), key)
        if bool(ts.dones[0]):
            done = True
            break
    assert done and not bool(ts.bad_transition)


def test_scoop_can_reach_goal_height():
    """The task must be physically solvable: a full-curl scoop by hand 0
    launches the object above the goal height."""
    env = make_handover({})
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    a_curl = jnp.zeros((2, 20)).at[0].set(jnp.tile(jnp.array([0., 1., 1., 1.]), 5))
    reached = False
    for seed in range(6):  # open-loop flick vs randomized spawn: any seed
        state, _ = env.reset(jax.random.PRNGKey(seed))
        max_z = 0.0
        for i in range(40):
            a = a_curl if i >= 3 else jnp.zeros((2, 20))
            state, ts = step(state, a, key)
            max_z = max(max_z, float(state.obj_pos[0, 2]))
        assert np.all(np.isfinite(np.asarray(state.obj_pos)))
        if max_z > float(state.goal_pos[0, 2]) - 0.03:
            reached = True
            break
    assert reached


def test_vmap_batched():
    env = make_handover({})
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states, ts = jax.jit(jax.vmap(env.reset))(keys)
    assert ts.obs.shape == (8, 2, 78)
    acts = jnp.zeros((8, 2, 20))
    _, ts2 = jax.jit(jax.vmap(env.step))(states, acts, keys)
    assert bool(jnp.all(jnp.isfinite(ts2.obs)))


def test_happo_trains_on_handover():
    """End-to-end jitted HAPPO iteration on the hand-over task."""
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from harl_tpu.utils.config_tools import get_defaults_yaml_args

    algo_args, env_args = get_defaults_yaml_args("happo", "dexhands_jax")
    algo_args["train"].update(
        n_rollout_threads=8, episode_length=16, num_env_steps=8 * 16 * 2)
    algo_args["model"].update(hidden_sizes=[32, 32])
    algo_args["algo"].update(ppo_epoch=2, critic_epoch=2)
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "dexhands_jax", "exp_name": "test"},
        algo_args, env_args)
    state = runner.init_state(0)
    state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))

import pytest

from harl_tpu.envs.dexhands_jax.handover import DEXHANDS_TASKS


@pytest.mark.parametrize("task", DEXHANDS_TASKS)
def test_task_family_spaces_and_finite_rollout(task):
    env = make_handover({"task": task})
    n_obj = env.n_objects
    # Shadow: 20 joints/5 fingers → 55 hand dims; Allegro: 16/4 → 44
    hand = 2 * env.n_joints + 3 * env.n_fingers
    assert env.obs_dim == hand + 23 * n_obj
    assert env.state_dim == 2 * hand + 23 * n_obj
    state, ts = env.reset(jax.random.PRNGKey(1))
    assert ts.obs.shape == (2, env.obs_dim)
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for i in range(20):
        a = 0.3 * jnp.sin(0.3 * i) * jnp.ones((2, env.n_joints))
        state, ts = step(state, a, key)
    assert bool(jnp.all(jnp.isfinite(ts.obs)))
    assert bool(jnp.all(jnp.isfinite(state.obj_pos)))


def test_two_catch_has_two_objects_with_crossed_goals():
    env = make_handover({"task": "ShadowHandTwoCatchUnderarm"})
    assert env.n_objects == 2
    state, _ = env.reset(jax.random.PRNGKey(0))
    # object 0 starts near hand 0 (y~0), its goal is near hand 1 (y~-0.45)
    assert float(state.obj_pos[0, 1]) > -0.2 > float(state.goal_pos[0, 1])
    assert float(state.obj_pos[1, 1]) < -0.2 < float(state.goal_pos[1, 1])


def test_catch_underarm_object_rests_on_start_palm():
    env = make_handover({"task": "ShadowHandCatchUnderarm"})
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for _ in range(30):
        state, ts = step(state, jnp.zeros((2, 20)), key)
    assert 0.02 < float(state.obj_pos[0, 2]) < 0.08
    assert not bool(ts.dones[0])


def test_over2underarm_object_falls_toward_catcher():
    env = make_handover({"task": "ShadowHandCatchOver2Underarm"})
    state, _ = env.reset(jax.random.PRNGKey(0))
    z0 = float(state.obj_pos[0, 2])
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for _ in range(10):
        state, ts = step(state, jnp.zeros((2, 20)), key)
    assert float(state.obj_pos[0, 2]) < z0  # gravity pulls it down


def test_handover_scripted_toss_delivers():
    """Solvability anchor: a hand-scripted curl toss delivers the ball into
    the receiving hand's region with a near-goal approach (<0.07) on at
    least one seed — the closing centimetres need closed-loop steering,
    which is the learning problem. (History: the round-2 vertical layout
    was physically unreachable — won 0.02 @30M; the z=0.16/0.13 vertical
    variants trapped PPO in a hold-still optimum — won 0 at 20M-40M.)"""
    env = make_handover({"task": "ShadowHandOver"})
    step = jax.jit(env.step)
    best = 1e9
    delivered = False
    for seed in range(8):
        state, ts = env.reset(jax.random.PRNGKey(seed))
        for t in range(75):
            # two-phase throw: slow pre-curl cradle, then full-flexion snap
            # (schedule re-tuned for the approach-only-damped contacts)
            if t < 4:
                r = t / 4.0
                a0 = np.tile(np.array([0.0, 0.4 * r, 0.3 * r, 0.1 * r]), 5)
            else:
                r = min(1.0, (t - 4) / 3.0)
                a0 = np.tile(np.array(
                    [0.0, 0.4 + 0.6 * r, 0.3 + 0.4 * r, 0.1 + 0.2 * r]), 5)
            a1 = np.tile(np.array([0.0, 0.5, 0.3, 0.1]), 5)
            state, ts = step(
                state, jnp.asarray(np.stack([a0, a1])), jax.random.PRNGKey(t))
            d = float(jnp.linalg.norm(state.obj_pos[0] - state.goal_pos[0]))
            best = min(best, d)
            if float(state.obj_pos[0, 1]) < -0.19 and d < 0.12:
                delivered = True
            if bool(ts.dones.all()):
                break
    assert delivered and best < 0.07


def test_receiver_cradle_catches_incoming_ball():
    """Catch solvability anchor for the inelastic-contact model: a ball
    arriving ballistically at the receiver must SETTLE in a held cradle
    (not bounce off and drop) in most trials. The r4 policy probe showed
    84% of tosses reached the receiver but 62% bounced off at the old
    restitution ~0.29; near-critical damping (PhysX contacts have zero
    restitution) makes the catch physically learnable."""
    env = make_handover({"task": "ShadowHandOver"})
    step = jax.jit(env.step)
    settled = 0
    trials = 8
    for seed in range(trials):
        state, ts = env.reset(jax.random.PRNGKey(seed))
        k = jax.random.PRNGKey(100 + seed)
        # launch the ball on a toss arc that lands mid-palm
        vel = jnp.asarray([[0.0, -0.9, 0.3]]) + 0.05 * jax.random.normal(k, (1, 3))
        state = state._replace(
            obj_pos=jnp.asarray([[0.0, -0.10, 0.08]]),
            obj_vel=vel,
        )
        cradle = np.tile(np.array([0.0, 0.5, 0.3, 0.1]), 5)
        acts = jnp.asarray(np.stack([np.zeros(20), cradle]))
        for t in range(40):
            state, ts = step(state, acts, jax.random.PRNGKey(t))
            if bool(ts.dones.all()):
                break
        # settled = still above the drop plane and inside the receiver region
        ok = (float(state.obj_pos[0, 2]) > -0.05
              and abs(float(state.obj_pos[0, 0])) < 0.15
              and -0.45 < float(state.obj_pos[0, 1]) < -0.12)
        settled += int(ok)
    assert settled >= trials // 2, f"only {settled}/{trials} catches settled"


def test_handover_reward_is_proximity_income():
    """Reference reward semantics (shadow_hand_over.py): a non-negative
    proximity income exp(-0.2*(50*dist+rot)) — near zero while the ball sits
    on the far palm, large when delivered at the goal — and dropping
    terminates with no extra penalty."""
    env = make_handover({"task": "ShadowHandOver"})
    state, ts = env.reset(jax.random.PRNGKey(1))
    hold = jnp.zeros((2, 20))
    state2, ts2 = env.step(state, hold, jax.random.PRNGKey(0))
    assert float(ts2.rewards[0, 0]) >= 0.0
    # teleport the ball to the goal: income approaches 1/step
    near = state2._replace(obj_pos=state2.goal_pos,
                           obj_quat=state2.goal_quat,
                           obj_vel=jnp.zeros_like(state2.obj_vel),
                           obj_omg=jnp.zeros_like(state2.obj_omg))
    _, ts3 = env.step(near, hold, jax.random.PRNGKey(0))
    assert float(ts3.rewards[0, 0]) > 0.5


def test_task_count_reaches_reference_breadth():
    """≥22 registered tasks (the reference's bidexhands/tasks/ family
    count), incl. ReOrientation, the Allegro variants, and the meta set."""
    from harl_tpu.envs.dexhands_jax.manip import DEXHANDS_MANIP_TASKS

    all_tasks = set(DEXHANDS_TASKS) | set(DEXHANDS_MANIP_TASKS)
    assert len(all_tasks) >= 22
    for name in ("ShadowHandReOrientation", "AllegroHandOver",
                 "AllegroHandCatchUnderarm", "ShadowHandMetaMT1",
                 "ShadowHandMetaML1", "ShadowHandMetaMT4"):
        assert name in all_tasks


def test_reorientation_success_is_rotational():
    """ReOrientation judges orientation (success_tolerance 0.1), not
    position — matching the object's goal quat marks success in place."""
    env = make_handover({"task": "ShadowHandReOrientation"})
    assert env.success_mode == "rot"
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = state._replace(obj_quat=state.goal_quat)
    s2, ts = env.step(state, jnp.zeros((2, 20)), jax.random.PRNGKey(0))
    assert float(ts.metrics["won"]) == 1.0


def test_allegro_hand_has_16_dof():
    env = make_handover({"task": "AllegroHandOver"})
    assert env.n_fingers == 4 and env.n_joints == 16
    assert env.action_space[0].shape[0] == 16


def test_catch_underarm_toss_range_reaches_goal():
    """Range solvability anchor: CatchUnderarm's 0.45 m gap must be within
    the thrower's ballistic reach (at JOINT_VMAX=12 the max scripted toss
    peaked at y −0.33 vs goal y −0.52 — the task was physically unsolvable;
    the IsaacGym originals throw with wrist/arm DOFs this hand lacks, so the
    finger speed cap carries the range)."""
    env = make_handover({"task": "ShadowHandCatchUnderarm"})
    step = jax.jit(env.step)
    y_min = 1.0
    for seed in range(4):
        state, ts = env.reset(jax.random.PRNGKey(seed))
        goal_y = float(state.goal_pos[0, 1])
        for t in range(75):
            if t < 4:
                r = t / 4.0
                a0 = np.tile(np.array([0.0, 0.4 * r, 0.3 * r, 0.1 * r]), 5)
            else:
                r = min(1.0, (t - 4) / 3.0)
                a0 = np.tile(np.array(
                    [0.0, 0.4 + 0.6 * r, 0.3 + 0.4 * r, 0.1 + 0.2 * r]), 5)
            a1 = np.tile(np.array([0.0, 0.5, 0.3, 0.1]), 5)
            state, ts = step(
                state, jnp.asarray(np.stack([a0, a1])), jax.random.PRNGKey(t))
            y_min = min(y_min, float(state.obj_pos[0, 1]))
            if bool(ts.dones.all()):
                break
    assert y_min < goal_y + 0.1, (
        f"toss reaches only y={y_min:.2f}; goal at y={goal_y:.2f}")


def test_vel_pen_width_controls_passby_cost():
    # r5 overshoot diagnosis: a fast ball PASSING 12 cm from the goal must
    # pay a real penalty under a wide gate (width 8) while the narrow
    # default (width 20) barely notices it; and at the 0.45 m release
    # distance the wide gate must stay negligible (throw discovery intact)
    import dataclasses

    narrow = make_handover({"task": "ShadowHandCatchUnderarm",
                            "vel_pen_coef": 0.1})
    wide = make_handover({"task": "ShadowHandCatchUnderarm",
                          "vel_pen_coef": 0.1, "vel_pen_width": 8.0})
    assert narrow.vel_pen_width == 20.0 and wide.vel_pen_width == 8.0

    state, _ = wide.reset(jax.random.PRNGKey(0))
    # place the ball 12 cm short of the goal, moving fast
    passby = state._replace(
        obj_pos=state.goal_pos + jnp.array([[0.0, 0.12, 0.0]]),
        obj_vel=jnp.full((1, 3), 3.0 / jnp.sqrt(3.0)))
    zero = jnp.zeros((2, 20))
    key = jax.random.PRNGKey(1)
    _, ts_wide = jax.jit(wide.step)(passby, zero, key)
    _, ts_narrow = jax.jit(narrow.step)(passby, zero, key)
    # same physics, same income — reward difference is purely the gate
    assert float(ts_narrow.rewards[0, 0]) - float(ts_wide.rewards[0, 0]) > 0.04

    # at the release distance (~0.45 m) the wide gate costs < 0.01
    release = state._replace(obj_vel=jnp.full((1, 3), 3.0 / jnp.sqrt(3.0)))
    _, ts_rel_wide = jax.jit(wide.step)(release, zero, key)
    nopen = make_handover({"task": "ShadowHandCatchUnderarm"})
    _, ts_rel_nopen = jax.jit(nopen.step)(release, zero, key)
    assert float(ts_rel_nopen.rewards[0, 0]) - float(ts_rel_wide.rewards[0, 0]) < 0.01
