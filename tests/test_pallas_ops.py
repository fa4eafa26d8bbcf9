"""Pallas TPU kernels, validated in interpreter mode against the portable
lax.scan implementations (ops/returns.py). The kernels themselves target the
reference recursion semantics of on_policy_critic_buffer_ep.py:97-200."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from harl_tpu.ops.pallas_gae import discounted_returns_pallas, gae_pallas
from harl_tpu.ops.returns import compute_discounted_returns, compute_gae


def _rand_problem(key, T, trailing):
    ks = jax.random.split(key, 4)
    rewards = jax.random.normal(ks[0], (T,) + trailing)
    values = jax.random.normal(ks[1], (T + 1,) + trailing)
    masks = (jax.random.uniform(ks[2], (T + 1,) + trailing) > 0.15).astype(jnp.float32)
    bad_masks = (jax.random.uniform(ks[3], (T + 1,) + trailing) > 0.1).astype(jnp.float32)
    return rewards, values, masks, bad_masks


@pytest.mark.parametrize("trailing", [(7, 1), (4, 3, 1), (130, 1)])
@pytest.mark.parametrize("with_bad", [True, False])
def test_gae_pallas_matches_scan(trailing, with_bad):
    T = 9
    rewards, values, masks, bad_masks = _rand_problem(jax.random.PRNGKey(0), T, trailing)
    bm = bad_masks if with_bad else None
    ref = compute_gae(rewards, values, masks, bm, 0.99, 0.95)
    out = gae_pallas(rewards, values, masks, bm, 0.99, 0.95, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("trailing", [(7, 1), (4, 3, 1)])
@pytest.mark.parametrize("with_bad", [True, False])
def test_discounted_returns_pallas_matches_scan(trailing, with_bad):
    T = 9
    rewards, values, masks, bad_masks = _rand_problem(jax.random.PRNGKey(1), T, trailing)
    next_value = values[-1]
    bm = bad_masks if with_bad else None
    ref = compute_discounted_returns(rewards, values, masks, bm, next_value, 0.99)
    out = discounted_returns_pallas(
        rewards, values, masks, bm, next_value, 0.99, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_compute_gae_impl_dispatch_cpu_fallback():
    # impl="scan" is the portable path used on CPU / under GSPMD sharding
    T, trailing = 5, (6, 1)
    rewards, values, masks, bad_masks = _rand_problem(jax.random.PRNGKey(2), T, trailing)
    a = compute_gae(rewards, values, masks, bad_masks, 0.99, 0.95, impl="scan")
    assert a.shape == (T,) + trailing
