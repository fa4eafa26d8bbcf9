"""HATRPO trust-region update tests."""
import jax
import numpy as np
import pytest

from harl_tpu.runners.on_policy import OnPolicyRunner
from tests.test_happo import _cfg


def _trpo_cfg():
    cfg = _cfg()
    del cfg["algo"]["ppo_epoch"]
    cfg["algo"].update(kl_threshold=0.01, ls_step=10, accept_ratio=0.5, backtrack_coeff=0.8)
    return cfg


@pytest.mark.parametrize("continuous", [True, False])
def test_hatrpo_step_respects_kl_threshold(continuous):
    runner = OnPolicyRunner(
        {"algo": "hatrpo", "env": "pettingzoo_mpe", "exp_name": "t"},
        _trpo_cfg(),
        {"scenario": "simple_spread_v2", "continuous_actions": continuous, "max_cycles": 10},
    )
    state = runner.init_state(0)
    new_state, metrics = runner._train_iteration(state)
    stats = np.asarray(metrics["actor_stats"])  # [improve, entropy, kl, ratio]
    # accepted steps must satisfy the trust region; rolled-back steps report 0
    assert np.all(stats[:, 2] < 0.01 + 1e-6)
    p0 = jax.tree_util.tree_leaves(state.actors[0].params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.actors[0].params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_hatrpo_multidiscrete_rejected():
    from harl_tpu.algos.hatrpo import HATRPOActor
    from harl_tpu.models.policies import StochasticPolicy
    from harl_tpu.utils import spaces

    sp = spaces.MultiDiscrete((2, 3))
    with pytest.raises(AssertionError):
        HATRPOActor(StochasticPolicy(action_space=sp), sp, None,
                    {"kl_threshold": 0.01, "ls_step": 10, "accept_ratio": 0.5,
                     "backtrack_coeff": 0.8})


def test_hatrpo_smoke_run():
    runner = OnPolicyRunner(
        {"algo": "hatrpo", "env": "pettingzoo_mpe", "exp_name": "t"},
        _trpo_cfg(),
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    _, history = runner.run(seed=1)
    assert np.isfinite(history[-1]["mean_episode_return"])


def test_hatrpo_recurrent_policy():
    """RNN-aware HATRPO: surrogate/KL/line search over sequence-mode policy
    evaluations (reference hatrpo.py:222-242 takes rnn states)."""
    import jax
    import numpy as np
    from harl_tpu.runners.on_policy import OnPolicyRunner
    from tests.test_happo import _cfg

    cfg = _cfg(**{"model.use_recurrent_policy": True, "model.data_chunk_length": 5})
    cfg["algo"].update(kl_threshold=0.01, ls_step=10, accept_ratio=0.5,
                       backtrack_coeff=0.8)
    runner = OnPolicyRunner(
        {"algo": "hatrpo", "env": "pettingzoo_mpe", "exp_name": "test"},
        cfg,
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    state = runner.init_state(0)
    new_state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
    # GRU params participate in the trust-region step
    flat = jax.tree_util.tree_flatten_with_path(state.actors[0].params)[0]
    rnn_before = [l for p, l in flat if any("rnn" in str(k) for k in p)]
    flat2 = jax.tree_util.tree_flatten_with_path(new_state.actors[0].params)[0]
    rnn_after = [l for p, l in flat2 if any("rnn" in str(k) for k in p)]
    assert rnn_before
