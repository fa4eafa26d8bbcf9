"""Checkpoint / restore of the full train state (orbax-backed).

The reference saves model weights only (``torch.save`` per agent,
on_policy_base_runner.py:724-763); we checkpoint the complete train state —
params, optimizer state, value-norm statistics, env carry and PRNG key — so
resume continues the exact training trajectory (a strict improvement noted in
SURVEY.md §5). Falls back gracefully when a state component is absent.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_state(save_dir: str, state: Any, step: int = 0) -> str:
    path = os.path.abspath(os.path.join(save_dir, f"ckpt_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def restore_state(path: str, abstract_state: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_state)


def restore_params_into(path: str, state: Any) -> Any:
    """Params-only restore: the reference's actual ``model_dir`` semantic
    (on_policy_base_runner.py:742-763 loads actor/critic state_dicts only).

    Grafts the checkpoint's network params — plus the value-norm statistics,
    which must stay consistent with the restored critic head — onto the
    freshly-initialized ``state``, keeping optimizer state, env carry and rng
    fresh. This is the transfer-learning path: it works across runs whose
    optimizer pytrees differ (e.g. lr-decay on vs off), where the full-state
    resume raises a structure mismatch."""
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(os.path.abspath(path))

    def graft(cur, new):
        # tree_map validates the (params-sub)tree structures match
        return jax.tree.map(
            lambda c, n: jax.numpy.asarray(n, c.dtype), cur, new)

    actors = tuple(
        a._replace(params=graft(a.params, raw["actors"][i]["params"]))
        for i, a in enumerate(state.actors))
    critic = state.critic._replace(
        params=graft(state.critic.params, raw["critic"]["params"]))
    value_norm = state.value_norm
    if value_norm is not None and raw.get("value_norm") is not None:
        # NamedTuple on the live side, plain dict in the raw checkpoint
        value_norm = value_norm._replace(**{
            k: jax.numpy.asarray(v, getattr(value_norm, k).dtype)
            for k, v in raw["value_norm"].items()})
    return state._replace(actors=actors, critic=critic,
                          value_norm=value_norm)


def latest_checkpoint(save_dir: str):
    """Newest ``ckpt_<step>`` under ``save_dir``.

    Accepts either the checkpoint directory itself or a RUN directory (the
    ``results saved under <run_dir>`` path train.py prints, whose checkpoints
    live in ``<run_dir>/models/`` — the layout users naturally pass as
    ``--model_dir``, mirroring the reference's restore path convention,
    on_policy_base_runner.py:742-763)."""
    if not os.path.isdir(save_dir):
        return None
    ckpts = [d for d in os.listdir(save_dir) if d.startswith("ckpt_")]
    if not ckpts:
        models = os.path.join(save_dir, "models")
        if os.path.isdir(models):
            return latest_checkpoint(models)
        return None
    latest = max(ckpts, key=lambda d: int(d.split("_")[1]))
    return os.path.join(save_dir, latest)


def prune_checkpoints(save_dir: str, keep: int = 2) -> None:
    """Delete all but the newest ``keep`` checkpoints.

    Off-policy train states embed the replay buffer (GBs); keeping every
    eval-interval checkpoint multiplies disk by the run length and each
    save pays a full device fetch, so periodic saves keep only a tail."""
    import shutil

    if not os.path.isdir(save_dir):
        return
    # keep <= 0 would make ckpts[:-keep] the EMPTY slice (delete nothing) —
    # the opposite of the natural reading; clamp to "keep the newest one"
    keep = max(keep, 1)
    ckpts = sorted(
        (d for d in os.listdir(save_dir) if d.startswith("ckpt_")),
        key=lambda d: int(d.split("_")[1]),
    )
    for d in ckpts[:-keep]:
        shutil.rmtree(os.path.join(save_dir, d), ignore_errors=True)
