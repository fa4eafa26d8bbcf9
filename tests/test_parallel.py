"""Multi-device sharding tests (8 virtual CPU devices via conftest)."""
import jax
import numpy as np
import pytest

from harl_tpu.parallel.mesh import make_mesh, shard_train_state
from harl_tpu.runners.on_policy import OnPolicyRunner
from harl_tpu.runners.off_policy import OffPolicyRunner
from tests.test_happo import _cfg
from tests.test_off_policy import _off_cfg


def test_mesh_creation():
    mesh = make_mesh()
    assert len(mesh.devices.flat) == 8
    mesh4 = make_mesh(4)
    assert len(mesh4.devices.flat) == 4


def test_on_policy_sharded_training():
    cfg = _cfg()
    cfg["train"].update(n_rollout_threads=8, num_env_steps=8 * 10 * 2)
    runner = OnPolicyRunner(
        {"algo": "happo", "env": "pettingzoo_mpe", "exp_name": "t"},
        cfg,
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    mesh = make_mesh(8)
    state = runner.init_state(0)
    state = shard_train_state(state, mesh, 8)
    # env batch sharded over 8 devices
    assert len(state.carry.obs.sharding.device_set) == 8
    # params replicated
    leaf = jax.tree_util.tree_leaves(state.actors[0].params)[0]
    assert len(leaf.sharding.device_set) == 8  # replicated across all
    new_state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
    # sharding preserved across iterations
    new_state2, _ = runner._train_iteration(new_state)
    assert np.isfinite(float(jax.device_get(new_state2.carry.ep_ret).sum()))


def test_off_policy_sharded_training():
    algo_args, _ = _off_cfg("hatd3")
    algo_args["train"]["n_rollout_threads"] = 8
    runner = OffPolicyRunner(
        {"algo": "hatd3", "env": "pettingzoo_mpe", "exp_name": "t"},
        algo_args,
        {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )
    mesh = make_mesh(8)
    state = runner.init_state(0)
    state = shard_train_state(state, mesh, 8)
    state = runner._warmup(state)
    state, _ = runner._collect(state)
    state, m = runner._train(state)
    assert np.isfinite(float(m["critic_loss"]))
