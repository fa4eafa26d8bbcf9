"""Tests for flax model modules: shapes, init parity, RNN mask resets."""
import jax
import jax.numpy as jnp
import numpy as np

from harl_tpu.models.act import ACTLayer, act_evaluate, act_sample
from harl_tpu.models.mlp import MLPBase, PlainMLP
from harl_tpu.models.policies import (
    DeterministicPolicy,
    SquashedGaussianPolicy,
    StochasticPolicy,
)
from harl_tpu.models.rnn import GRUStack
from harl_tpu.models.values import ContinuousQNet, DuelingQNet, VNet
from harl_tpu.utils import spaces


def test_mlp_base_orthogonal_init_and_layernorm():
    m = MLPBase(hidden_sizes=(64, 64))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 10)))
    w = params["params"]["fc0"]["kernel"]
    # orthogonal with relu gain sqrt(2): W W^T = 2 I (rows orthogonal, 10<64)
    prod = np.asarray(w @ w.T)
    np.testing.assert_allclose(prod, 2.0 * np.eye(10), atol=1e-4)
    out = m.apply(params, jnp.ones((3, 10)))
    assert out.shape == (3, 64)
    # LayerNorm output: per-row mean ≈ 0
    np.testing.assert_allclose(np.asarray(out).mean(-1), 0.0, atol=1e-5)


def test_stochastic_policy_discrete_sample_and_evaluate():
    sp = spaces.Discrete(7)
    pol = StochasticPolicy(action_space=sp, hidden_sizes=(32, 32))
    obs = jnp.ones((5, 12))
    params = pol.init(jax.random.PRNGKey(0), obs)
    head, _ = pol.apply(params, obs)
    out = act_sample(jax.random.PRNGKey(1), head, sp)
    assert out.actions.shape == (5, 1)
    assert out.log_probs.shape == (5, 1)
    ev = act_evaluate(head, sp, out.actions)
    np.testing.assert_allclose(np.asarray(ev.log_probs), np.asarray(out.log_probs), rtol=1e-5)


def test_stochastic_policy_box_per_dim_logprob():
    sp = spaces.Box.create(-1.0, 1.0, 4)
    pol = StochasticPolicy(action_space=sp, hidden_sizes=(32,))
    obs = jnp.ones((6, 8))
    params = pol.init(jax.random.PRNGKey(0), obs)
    head, _ = pol.apply(params, obs)
    out = act_sample(jax.random.PRNGKey(1), head, sp)
    assert out.actions.shape == (6, 4)
    assert out.log_probs.shape == (6, 4)  # per-dim (FixedNormal.log_probs)


def test_multidiscrete_logprob_summed():
    sp = spaces.MultiDiscrete((3, 4, 5))
    pol = StochasticPolicy(action_space=sp, hidden_sizes=(16,))
    obs = jnp.ones((2, 6))
    params = pol.init(jax.random.PRNGKey(0), obs)
    head, _ = pol.apply(params, obs)
    assert len(head) == 3
    out = act_sample(jax.random.PRNGKey(1), head, sp)
    assert out.actions.shape == (2, 3)
    assert out.log_probs.shape == (2, 1)


def test_available_actions_masking():
    sp = spaces.Discrete(4)
    pol = StochasticPolicy(action_space=sp, hidden_sizes=(16,))
    obs = jnp.ones((64, 6))
    params = pol.init(jax.random.PRNGKey(0), obs)
    head, _ = pol.apply(params, obs)
    avail = jnp.tile(jnp.array([[0.0, 1.0, 0.0, 1.0]]), (64, 1))
    out = act_sample(jax.random.PRNGKey(7), head, sp, available_actions=avail)
    assert set(np.unique(np.asarray(out.actions))) <= {1, 3}


def test_gru_mask_reset_equals_fresh_state():
    gru = GRUStack(hidden_size=16, recurrent_n=1)
    x = jnp.ones((4, 16))
    h = jnp.ones((4, 1, 16)) * 0.7
    params = gru.init(jax.random.PRNGKey(0), x, h, jnp.ones((4, 1)))
    out_masked, h_masked = gru.apply(params, x, h, jnp.zeros((4, 1)))
    out_fresh, h_fresh = gru.apply(params, x, jnp.zeros_like(h), jnp.ones((4, 1)))
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_fresh), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_masked), np.asarray(h_fresh), rtol=1e-5)


def test_gru_seq_matches_stepwise():
    gru = GRUStack(hidden_size=8, recurrent_n=2)
    T, N = 5, 3
    x_seq = jax.random.normal(jax.random.PRNGKey(1), (T, N, 8))
    masks = jnp.ones((T, N, 1)).at[2, 1].set(0.0)
    h0 = jnp.zeros((N, 2, 8))
    params = gru.init(jax.random.PRNGKey(0), x_seq[0], h0, masks[0])
    outs_seq, h_seq = gru.apply(params, x_seq, h0, masks, seq=True)
    h = h0
    outs = []
    for t in range(T):
        o, h = gru.apply(params, x_seq[t], h, masks[t])
        outs.append(o)
    np.testing.assert_allclose(np.asarray(outs_seq), np.asarray(jnp.stack(outs)), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(h), rtol=1e-4, atol=1e-5)


def test_recurrent_policy_forward():
    sp = spaces.Discrete(5)
    pol = StochasticPolicy(action_space=sp, hidden_sizes=(32, 32), use_recurrent_policy=True, recurrent_n=1)
    obs = jnp.ones((4, 10))
    h = jnp.zeros((4, 1, 32))
    masks = jnp.ones((4, 1))
    params = pol.init(jax.random.PRNGKey(0), obs, h, masks)
    head, h2 = pol.apply(params, obs, h, masks)
    assert h2.shape == (4, 1, 32)
    assert head[0].shape == (4, 5)


def test_vnet_and_qnets():
    v = VNet(hidden_sizes=(32, 32))
    params = v.init(jax.random.PRNGKey(0), jnp.ones((3, 20)))
    val, _ = v.apply(params, jnp.ones((3, 20)))
    assert val.shape == (3, 1)

    q = ContinuousQNet(hidden_sizes=(32, 32))
    qp = q.init(jax.random.PRNGKey(0), jnp.ones((3, 20)), jnp.ones((3, 6)))
    qv = q.apply(qp, jnp.ones((3, 20)), jnp.ones((3, 6)))
    assert qv.shape == (3, 1)

    dq = DuelingQNet(output_dim=12)
    dqp = dq.init(jax.random.PRNGKey(0), jnp.ones((3, 20)))
    dqv = dq.apply(dqp, jnp.ones((3, 20)))
    assert dqv.shape == (3, 12)


def test_deterministic_policy_bounds():
    pol = DeterministicPolicy(low=(-2.0, -2.0), high=(2.0, 2.0), hidden_sizes=(32,))
    params = pol.init(jax.random.PRNGKey(0), jnp.ones((5, 8)))
    a = pol.apply(params, jnp.ones((5, 8)) * 100)
    assert np.all(np.abs(np.asarray(a)) <= 2.0 + 1e-6)


def test_squashed_gaussian_policy_heads():
    pol = SquashedGaussianPolicy(act_dim=3, hidden_sizes=(32,))
    params = pol.init(jax.random.PRNGKey(0), jnp.ones((4, 8)))
    mu, log_std = pol.apply(params, jnp.ones((4, 8)))
    assert mu.shape == (4, 3) and log_std.shape == (4, 3)


def test_cnn_base_policy_and_vnet():
    """Pixel-observation path: CNNBase/PlainCNN (cnn.py, plain_cnn.py parity)."""
    from harl_tpu.models.cnn import CNNBase, PlainCNN

    sp = spaces.Discrete(4)
    pol = StochasticPolicy(action_space=sp, hidden_sizes=(32, 32), image_input=True)
    obs = jnp.ones((2, 8, 8, 3)) * 128.0
    params = pol.init(jax.random.PRNGKey(0), obs)
    head, _ = pol.apply(params, obs)
    assert head[0].shape == (2, 4)

    v = VNet(hidden_sizes=(32,), image_input=True)
    vp = v.init(jax.random.PRNGKey(0), obs)
    val, _ = v.apply(vp, obs)
    assert val.shape == (2, 1)

    pc = PlainCNN(out_dim=16)
    pp = pc.init(jax.random.PRNGKey(0), obs)
    assert pc.apply(pp, obs).shape == (2, 16)
