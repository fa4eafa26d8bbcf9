"""Tests: MAPPO/HAA2C variants, config tools, CLI plumbing, checkpointing."""
import json
import os

import jax
import numpy as np
import pytest

from harl_tpu.runners.on_policy import OnPolicyRunner
from harl_tpu.utils.config_tools import (
    get_defaults_yaml_args,
    get_task_name,
    init_dir,
    save_config,
    update_args,
)
from tests.test_happo import _cfg


def _mk(algo, extra_cfg=None, env_args=None):
    cfg = _cfg()
    if algo == "haa2c":
        del cfg["algo"]["ppo_epoch"]
        cfg["algo"]["a2c_epoch"] = 2
    if extra_cfg:
        cfg.update(extra_cfg)
    return OnPolicyRunner(
        {"algo": algo, "env": "pettingzoo_mpe", "exp_name": "t"},
        cfg,
        env_args or {"scenario": "simple_spread_v2", "continuous_actions": True, "max_cycles": 10},
    )


def test_mappo_no_factor_chain():
    runner = _mk("mappo")
    assert runner.factor_chain is False
    state = runner.init_state(0)
    new_state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
    p0 = jax.tree_util.tree_leaves(state.actors[0].params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.actors[0].params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_haa2c_runs():
    runner = _mk("haa2c")
    assert runner.factor_chain is True
    state = runner.init_state(0)
    _, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))


def test_default_yaml_configs_load():
    for algo in ("happo", "mappo", "haa2c", "hatrpo"):
        algo_args, env_args = get_defaults_yaml_args(algo, "pettingzoo_mpe")
        assert "train" in algo_args and "algo" in algo_args and "model" in algo_args
        assert env_args["scenario"] == "simple_spread_v2"
    assert "kl_threshold" in get_defaults_yaml_args("hatrpo", "pettingzoo_mpe")[0]["algo"]


def test_update_args_recursive_override():
    algo_args, env_args = get_defaults_yaml_args("happo", "pettingzoo_mpe")
    update_args({"lr": 0.001, "scenario": "simple_reference_v2", "ppo_epoch": 9}, algo_args, env_args)
    assert algo_args["model"]["lr"] == 0.001
    assert algo_args["algo"]["ppo_epoch"] == 9
    assert env_args["scenario"] == "simple_reference_v2"


def test_init_dir_and_save_config(tmp_path):
    run_dir, log_dir, save_dir = init_dir(
        "pettingzoo_mpe", {"scenario": "simple_spread_v2"}, "happo", "exp", 7, str(tmp_path)
    )
    assert os.path.isdir(log_dir) and os.path.isdir(save_dir)
    assert "seed-00007" in run_dir
    save_config({"algo": "happo"}, {"a": 1}, {"b": 2}, run_dir)
    cfg = json.load(open(os.path.join(run_dir, "config.json")))
    assert cfg["algo_args"] == {"a": 1}


def test_task_name():
    assert get_task_name("pettingzoo_mpe", {"scenario": "simple_spread_v2", "continuous_actions": False}) == "simple_spread_v2-discrete"


def test_checkpoint_roundtrip(tmp_path):
    from harl_tpu.utils.checkpoint import latest_checkpoint, restore_state, save_state

    runner = _mk("happo")
    state = runner.init_state(0)
    path = save_state(str(tmp_path), state, 42)
    assert latest_checkpoint(str(tmp_path)) == path
    abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x, jax.device_get(state))
    restored = restore_state(path, abstract)
    orig = jax.tree_util.tree_leaves(state.actors[0].params)[0]
    got = jax.tree_util.tree_leaves(restored.actors[0].params)[0]
    np.testing.assert_allclose(np.asarray(orig), np.asarray(got))


def test_restore_params_only_across_optimizer_chains(tmp_path):
    # transfer-learning path: donor saved with lr decay ON (extra schedule
    # state in the optax chain), target runs with decay OFF — full-state
    # resume raises a structure mismatch, restore() must fall back to
    # grafting params + value-norm onto the fresh state
    from harl_tpu.utils.checkpoint import save_state

    cfg = _cfg()
    cfg["train"]["use_linear_lr_decay"] = True
    donor = _mk("happo", extra_cfg=cfg)
    donor_state = donor.init_state(7)
    save_state(str(tmp_path / "models"), donor_state, 99)

    target = _mk("happo")
    fresh = target.init_state(0)
    restored = target.restore(fresh, str(tmp_path))

    d = np.asarray(jax.tree_util.tree_leaves(donor_state.actors[0].params)[0])
    got = np.asarray(jax.tree_util.tree_leaves(restored.actors[0].params)[0])
    np.testing.assert_allclose(d, got)
    # optimizer state stays the target's own (fresh), not the donor's
    assert jax.tree_util.tree_structure(
        restored.actors[0].opt_state
    ) == jax.tree_util.tree_structure(fresh.actors[0].opt_state)
    if restored.value_norm is not None:
        np.testing.assert_allclose(
            np.asarray(restored.value_norm.debiasing_term),
            np.asarray(donor_state.value_norm.debiasing_term))


def test_latest_checkpoint_accepts_run_dir(tmp_path):
    # users pass the printed run dir as --model_dir; its checkpoints live in
    # <run_dir>/models/ (run() saves there) — both spellings must resolve
    from harl_tpu.utils.checkpoint import latest_checkpoint

    models = tmp_path / "models"
    for step in (10, 200, 30):
        (models / f"ckpt_{step}").mkdir(parents=True)
    assert latest_checkpoint(str(models)).endswith("ckpt_200")
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_200")
    assert latest_checkpoint(str(tmp_path / "nope")) is None
    (tmp_path / "empty").mkdir()
    assert latest_checkpoint(str(tmp_path / "empty")) is None


def test_cli_parse_unknown():
    from harl_tpu.train import _parse_unknown

    out = _parse_unknown(["--lr", "0.001", "--scenario", "simple_spread_v2", "--use_eval", "False"])
    assert out == {"lr": 0.001, "scenario": "simple_spread_v2", "use_eval": False}


def test_share_param_happo():
    cfg = _cfg()
    cfg["algo"]["share_param"] = True
    runner = _mk("happo", extra_cfg=cfg)
    assert len(set(id(a) for a in runner.actors)) == 1  # one shared actor
    state = runner.init_state(0)
    assert len(state.actors) == 1
    new_state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
    p0 = jax.tree_util.tree_leaves(state.actors[0].params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.actors[0].params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_share_param_rejects_heterogeneous():
    cfg = _cfg()
    cfg["algo"]["share_param"] = True
    with pytest.raises(AssertionError):
        _mk("happo", extra_cfg=cfg,
            env_args={"scenario": "simple_speaker_listener_v3", "continuous_actions": False, "max_cycles": 10})


def test_mappo_share_param_merged_batch():
    cfg = _cfg()
    cfg["algo"]["share_param"] = True
    runner = _mk("mappo", extra_cfg=cfg)
    state = runner.init_state(0)
    assert len(state.actors) == 1
    new_state, metrics = runner._train_iteration(state)
    assert np.isfinite(float(metrics["value_loss"]))
    p0 = jax.tree_util.tree_leaves(state.actors[0].params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.actors[0].params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
