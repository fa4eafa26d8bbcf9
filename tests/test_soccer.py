"""Pure-JAX academy soccer (GRF analogue) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from harl_tpu.envs.football_jax.soccer import (
    MOVE0, SHOT, AcademySoccer, make_soccer)


def test_spaces_and_scenarios():
    env = make_soccer({"env_name": "academy_3_vs_1_with_keeper"})
    assert env.n_agents == 3 and env.n_defenders == 2
    assert env.action_space[0].n == 19
    state, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (3, env.obs_dim)
    assert ts.share_obs.shape == (env.state_dim,)
    env2 = make_soccer({"env_name": "academy_corner"})
    assert env2.n_agents == 4 and env2.n_defenders == 3
    with pytest.raises(ValueError):
        make_soccer({"env_name": "not_a_scenario"})


def test_new_scenarios_step_finite():
    for sc, n, m in (("academy_run_to_score_with_keeper", 1, 1),
                     ("academy_counterattack_hard", 4, 3),
                     ("academy_single_goal_versus_lazy", 10, 11)):
        env = make_soccer({"env_name": sc})
        assert env.n_agents == n and env.n_defenders == m
        s, ts = env.reset(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        for _ in range(6):
            key, k, ka = jax.random.split(key, 3)
            acts = jax.random.randint(ka, (n,), 0, 19)
            s, ts = env.step(s, list(acts), k)
        assert np.isfinite(np.asarray(ts.obs)).all()
        assert np.isfinite(np.asarray(ts.rewards)).all()


def test_lazy_defenders_do_not_chase():
    env = make_soccer({"env_name": "academy_single_goal_versus_lazy"})
    s, _ = env.reset(jax.random.PRNGKey(0))
    d0 = np.asarray(s.right_pos[:-1])
    key = jax.random.PRNGKey(1)
    for _ in range(10):
        key, k = jax.random.split(key)
        s, _ = env.step(s, [jnp.asarray(5)] * 10, k)
    # outfield defenders are statues; the keeper may still shift in y
    assert np.allclose(np.asarray(s.right_pos[:-1]), d0, atol=1e-6)


def test_initial_possession_and_checkpoints():
    """The first carrier advancing toward goal collects checkpoint rewards."""
    env = make_soccer({"env_name": "academy_3_vs_1_with_keeper"})
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    total = 0.0
    for _ in range(10):
        state, ts = step(state, jnp.array([MOVE0 + 4] * 3), key)
        total += float(ts.rewards[0, 0])
        if bool(ts.dones[0]):
            break
    assert total > 0.0  # checkpoint shaping fired
    assert int(state.checkpoints.sum()) > 0


def test_shot_from_close_range_scores():
    env = make_soccer({"env_name": "academy_3_vs_1_with_keeper"})
    state, _ = env.reset(jax.random.PRNGKey(0))
    # put the carrier close to goal, off-center (away from the keeper),
    # defenders far away
    state = state._replace(
        left_pos=state.left_pos.at[0].set(jnp.array([0.9, -0.15])),
        right_pos=jnp.array([[-0.9, 0.3], [0.99, 0.2]]),
        ball_pos=jnp.array([0.91, -0.15]),
        owner=jnp.asarray(1, jnp.int32), carrier=jnp.asarray(0, jnp.int32))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    scored = False
    for _ in range(10):
        state, ts = step(state, jnp.array([SHOT, 0, 0]), key)
        if float(ts.metrics["won"]) > 0:
            scored = True
            break
    assert scored
    assert bool(ts.dones[0]) and not bool(ts.bad_transition)


def test_keeper_saves_central_shot():
    """A shot straight at the keeper is caught (segment intercept)."""
    env = make_soccer({"env_name": "academy_3_vs_1_with_keeper"})
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = state._replace(
        left_pos=state.left_pos.at[0].set(jnp.array([0.85, 0.0])),
        right_pos=jnp.array([[-0.9, 0.3], [0.99, 0.0]]),
        ball_pos=jnp.array([0.86, 0.0]),
        owner=jnp.asarray(1, jnp.int32), carrier=jnp.asarray(0, jnp.int32))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for _ in range(6):
        state, ts = step(state, jnp.array([SHOT, 0, 0]), key)
        if bool(ts.dones[0]):
            break
    assert float(ts.metrics["won"]) == 0.0
    assert bool(ts.dones[0])  # possession lost to the keeper ends the play


def test_defender_steal_ends_episode():
    env = make_soccer({"env_name": "academy_3_vs_1_with_keeper"})
    state, _ = env.reset(jax.random.PRNGKey(0))
    # park a defender on top of the carrier
    state = state._replace(
        right_pos=state.right_pos.at[0].set(state.left_pos[0]))
    step = jax.jit(env.step)
    state, ts = step(state, jnp.zeros(3, jnp.int32), jax.random.PRNGKey(0))
    assert int(state.owner) == 2
    assert bool(ts.dones[0]) and not bool(ts.bad_transition)


def test_truncation():
    env = AcademySoccer(n_agents=3, n_defenders=2, episode_limit=3)
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    # move away from defenders to survive 3 steps
    for _ in range(3):
        state, ts = step(state, jnp.array([MOVE0, MOVE0, MOVE0]), key)
    assert bool(ts.dones[0]) and bool(ts.bad_transition)


def test_vmap_batched():
    env = make_soccer({"env_name": "academy_3_vs_1_with_keeper"})
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states, ts = jax.jit(jax.vmap(env.reset))(keys)
    assert ts.obs.shape == (8, 3, env.obs_dim)
    acts = jnp.zeros((8, 3), jnp.int32)
    _, ts2 = jax.jit(jax.vmap(env.step))(states, acts, keys)
    assert bool(jnp.all(jnp.isfinite(ts2.obs)))


@pytest.mark.slow
def test_happo_trains_on_soccer():
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from harl_tpu.utils.config_tools import get_defaults_yaml_args

    algo_args, env_args = get_defaults_yaml_args("happo", "football_jax")
    algo_args["train"].update(
        n_rollout_threads=8, episode_length=16, num_env_steps=8 * 16 * 2)
    algo_args["model"].update(hidden_sizes=[32, 32])
    algo_args["algo"].update(ppo_epoch=2, critic_epoch=2)
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "football_jax", "exp_name": "test"},
        algo_args, env_args)
    state = runner.init_state(0)
    state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))


@pytest.mark.slow
def test_pixel_representation_trains_cnn():
    """representation: pixels → (24, 32, 4) SMM rasters through CNNBase
    (the football pixel path, football_env.py:132-154)."""
    import jax
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from tests.test_happo import _cfg

    runner = OnPolicyRunner(
        {"algo": "happo", "env": "football_jax", "exp_name": "t"},
        _cfg(),
        {"scenario": "academy_3_vs_1_with_keeper", "representation": "pixels",
         "episode_limit": 10},
    )
    assert runner.image_obs
    state = runner.init_state(1)
    assert state.carry.obs.shape[-3:] == (24, 32, 4)
    # the conv kernel exists and trains
    flat = jax.tree_util.tree_flatten_with_path(state.actors[0].params)[0]
    conv_before = [l for p, l in flat if any("conv" in str(k) for k in p)]
    assert conv_before
    new_state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
    flat2 = jax.tree_util.tree_flatten_with_path(new_state.actors[0].params)[0]
    conv_after = [l for p, l in flat2 if any("conv" in str(k) for k in p)]
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(conv_before, conv_after)
    )
