"""Integration tests: HAPPO end-to-end on pure-JAX MPE (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from harl_tpu.runners.on_policy import OnPolicyRunner


def _cfg(**over):
    algo_args = {
        "train": {
            "n_rollout_threads": 4,
            "num_env_steps": 4 * 10 * 3,
            "episode_length": 10,
            "log_interval": 1,
            "use_valuenorm": True,
            "use_linear_lr_decay": False,
            "use_proper_time_limits": True,
        },
        "model": {
            "hidden_sizes": [32, 32],
            "activation_func": "relu",
            "use_feature_normalization": True,
            "initialization_method": "orthogonal_",
            "gain": 0.01,
            "use_recurrent_policy": False,
            "recurrent_n": 1,
            "lr": 5e-4,
            "critic_lr": 5e-4,
            "opti_eps": 1e-5,
            "weight_decay": 0.0,
            "std_x_coef": 1.0,
            "std_y_coef": 0.5,
        },
        "algo": {
            "ppo_epoch": 2,
            "critic_epoch": 2,
            "use_clipped_value_loss": True,
            "clip_param": 0.2,
            "actor_num_mini_batch": 1,
            "critic_num_mini_batch": 1,
            "entropy_coef": 0.01,
            "value_loss_coef": 1.0,
            "use_max_grad_norm": True,
            "max_grad_norm": 10.0,
            "use_gae": True,
            "gamma": 0.99,
            "gae_lambda": 0.95,
            "use_huber_loss": True,
            "use_policy_active_masks": True,
            "huber_delta": 10.0,
            "action_aggregation": "prod",
            "share_param": False,
            "fixed_order": False,
        },
    }
    for k, v in over.items():
        sec, key = k.split(".")
        algo_args[sec][key] = v
    return algo_args


@pytest.mark.parametrize("continuous", [True, False])
def test_happo_smoke(continuous):
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "pettingzoo_mpe", "exp_name": "test"},
        _cfg(),
        {"scenario": "simple_spread_v2", "continuous_actions": continuous, "max_cycles": 10},
    )
    state, history = runner.run(seed=1)
    assert len(history) == runner.episodes
    for rec in history:
        assert np.isfinite(rec["mean_episode_return"])
        assert np.isfinite(rec["value_loss"])


def test_happo_fixed_order_smoke():
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "pettingzoo_mpe", "exp_name": "test"},
        _cfg(**{"algo.fixed_order": True}),
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    state, history = runner.run(seed=3)
    assert np.isfinite(history[-1]["mean_episode_return"])


def test_happo_heterogeneous_speaker_listener():
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "pettingzoo_mpe", "exp_name": "test"},
        _cfg(),
        {"scenario": "simple_speaker_listener_v3", "continuous_actions": False, "max_cycles": 10},
    )
    state, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["mean_episode_return"])


def test_happo_factor_changes_with_update():
    """The sequential-update factor must deviate from 1 after the first agent
    trains (on_policy_ha_runner.py:115-124)."""
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "pettingzoo_mpe", "exp_name": "test"},
        _cfg(),
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    state = runner.init_state(0)
    new_state, metrics = runner._train_iteration(state)
    # params actually changed
    p0 = jax.tree_util.tree_leaves(state.actors[0].params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.actors[0].params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # critic changed too
    c0 = jax.tree_util.tree_leaves(state.critic.params)[0]
    c1 = jax.tree_util.tree_leaves(new_state.critic.params)[0]
    assert not np.allclose(np.asarray(c0), np.asarray(c1))
    # value norm updated
    assert float(new_state.value_norm.debiasing_term) > 0


def test_eval_rollout_runs():
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "pettingzoo_mpe", "exp_name": "test"},
        _cfg(),
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    state = runner.init_state(0)
    ret, extra = runner.evaluate(state, 4, eval_episodes=4)
    assert np.isfinite(ret)
    assert extra == {}  # MPE emits no env metrics


def test_checkpoints_saved_without_eval(tmp_path):
    """Saving every eval_interval must not depend on use_eval
    (reference saves unconditionally, on_policy_base_runner.py:260-265)."""
    cfg = _cfg()
    cfg["eval"] = {"use_eval": False}
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "pettingzoo_mpe", "exp_name": "test"},
        cfg,
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    state, _ = runner.run(seed=0, save_dir=str(tmp_path))
    ckpts = [d for d in tmp_path.iterdir() if d.name.startswith("ckpt_")]
    assert ckpts, "run with use_eval=False left no checkpoints"
    restored = runner.restore(state, str(tmp_path))
    a = jax.tree_util.tree_leaves(restored.actors[0].params)[0]
    b = jax.tree_util.tree_leaves(state.actors[0].params)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_happo_recurrent_policy():
    """Recurrent actors+critic train end-to-end with chunked BPTT."""
    cfg = _cfg(**{"model.use_recurrent_policy": True, "model.data_chunk_length": 5})
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "pettingzoo_mpe", "exp_name": "test"},
        cfg,
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    state = runner.init_state(0)
    new_state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
    # GRU params updated
    flat = jax.tree_util.tree_flatten_with_path(state.actors[0].params)[0]
    rnn_leaves_before = [l for p, l in flat if any("rnn" in str(k) for k in p)]
    flat2 = jax.tree_util.tree_flatten_with_path(new_state.actors[0].params)[0]
    rnn_leaves_after = [l for p, l in flat2 if any("rnn" in str(k) for k in p)]
    assert rnn_leaves_before and any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(rnn_leaves_before, rnn_leaves_after)
    )
    ret, _ = runner.evaluate(new_state, 4, eval_episodes=4)
    assert np.isfinite(ret)


def test_happo_naive_recurrent_policy():
    """Naive-recurrent generator: whole-thread minibatches, L = T
    (on_policy_actor_buffer.py:180-221)."""
    cfg = _cfg(**{"model.use_naive_recurrent_policy": True})
    cfg["algo"]["actor_num_mini_batch"] = 2
    cfg["algo"]["critic_num_mini_batch"] = 2
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "pettingzoo_mpe", "exp_name": "test"},
        cfg,
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    assert runner.use_rnn and not runner.use_recurrent_policy
    state = runner.init_state(0)
    new_state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
    p0 = jax.tree_util.tree_leaves(state.actors[0].params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.actors[0].params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_train_and_eval_return_same_scale():
    """Train-rollout episode accounting and eval accounting must use the SAME
    per-agent-mean reward definition (round-2 verdict: the jitted rollout
    logged agent-0 team reward while eval averaged over agents, so train and
    eval returns diverged whenever per-agent rewards differ, e.g. MPE
    local_ratio). Patch the env step to emit constant per-agent rewards
    (1, 2, 3) and check both paths report the mean (2.0/step)."""
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "pettingzoo_mpe", "exp_name": "test"},
        _cfg(),
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    const_rew = jnp.array([[1.0], [2.0], [3.0]])

    def patch_vec(vec):
        orig = vec.step

        def step(state, actions, key):
            tr = orig(state, actions, key)
            rew = jnp.broadcast_to(const_rew[None], tr.ts.rewards.shape)
            return tr._replace(
                ts=tr.ts._replace(rewards=rew),
                final=tr.final._replace(rewards=rew),
            )

        vec.step = step

    patch_vec(runner.vec)
    state = runner.init_state(0)
    state, metrics = runner._train_iteration(state)
    m = jax.device_get(metrics)
    assert float(m["episode_count"]) > 0
    train_ret = float(m["episode_return_sum"]) / float(m["episode_count"])
    # 10-step episodes, per-agent mean reward 2.0 → 20.0; agent-0 would be 10.0
    assert abs(train_ret - 20.0) < 1e-4

    # eval constructs its own VecEnv inside eval_rollout; patch at the class
    # level so the fresh instance is covered too
    from harl_tpu.envs.core import VecEnv

    orig_step = VecEnv.step

    def cls_step(self, state, actions, key):
        tr = orig_step(self, state, actions, key)
        rew = jnp.broadcast_to(const_rew[None], tr.ts.rewards.shape)
        return tr._replace(
            ts=tr.ts._replace(rewards=rew),
            final=tr.final._replace(rewards=rew),
        )

    VecEnv.step = cls_step
    try:
        eval_ret, _ = runner.evaluate(state, 4, eval_episodes=4)
    finally:
        VecEnv.step = orig_step
    assert abs(eval_ret - 20.0) < 1e-4
