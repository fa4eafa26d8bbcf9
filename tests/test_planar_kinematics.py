"""Analytic planar-chain kinematics vs the autodiff reference formulation.

The hot-path `_kin_analytic` (closed-form jacobians + Coriolis terms) must be
numerically identical to jacfwd/jvp of the recursive frame kinematics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from harl_tpu.envs.mamujoco_jax.planar import SPECS, PlanarDynamics


@pytest.mark.parametrize("name", ["HalfCheetah", "Walker2d", "Hopper"])
def test_analytic_kinematics_match_autodiff(name):
    dyn = PlanarDynamics(SPECS[name])
    dof = dyn.spec.dof
    key = jax.random.PRNGKey(0)
    for i in range(3):
        kq, kv, key = jax.random.split(jax.random.fold_in(key, i), 3)
        q = jax.random.uniform(kq, (dof,), minval=-0.7, maxval=0.7)
        qd = jax.random.uniform(kv, (dof,), minval=-2.0, maxval=2.0)

        Jc, Cc, cpos, Jp = dyn._kin_analytic(q, qd)

        Jc_ad = jax.jacfwd(dyn._coms)(q)
        Jp_ad = jax.jacfwd(dyn._contact_pos)(q)
        cpos_ref = dyn._contact_pos(q)
        Cc_ad = jax.jvp(
            lambda qq: jax.jvp(dyn._coms, (qq,), (qd,))[1], (q,), (qd,)
        )[1]

        np.testing.assert_allclose(np.asarray(Jc), np.asarray(Jc_ad), atol=1e-5)
        np.testing.assert_allclose(np.asarray(Jp), np.asarray(Jp_ad), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cpos), np.asarray(cpos_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(Cc), np.asarray(Cc_ad), atol=1e-4)


# HalfCheetah stays in the fast tier to keep the vmap-parity oracle armed;
# the Walker2d/Hopper variants exercise the same custom-vmap rule and move
# to the slow tier (35-40s each on a 2-core host)
@pytest.mark.parametrize(
    "name",
    ["HalfCheetah",
     pytest.param("Walker2d", marks=pytest.mark.slow),
     pytest.param("Hopper", marks=pytest.mark.slow)])
def test_batched_physics_matches_per_env(name):
    """The batch-minor custom-vmap rule must reproduce per-env stepping."""
    dyn = PlanarDynamics(SPECS[name])
    dof, nj = dyn.spec.dof, dyn.spec.n_joints
    B = 5
    kq, kv, ka = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.uniform(kq, (B, dof), minval=-0.4, maxval=0.4)
    qd = jax.random.uniform(kv, (B, dof), minval=-1.5, maxval=1.5)
    tau = jax.random.uniform(ka, (B, nj), minval=-1.0, maxval=1.0)

    # single substep: the two layouts are the same math modulo reduction order
    qs, qds = dyn._substep_b(q.T, qd.T, tau.T)
    for i in range(B):
        qi, qdi = dyn._substep(q[i], qd[i], tau[i])
        np.testing.assert_allclose(np.asarray(qs[:, i]), np.asarray(qi), atol=1e-4)
        # stiff-contact solve amplifies f32 reduction-order noise (κ ~ 1e3)
        np.testing.assert_allclose(
            np.asarray(qds[:, i]), np.asarray(qdi), atol=1e-2, rtol=1e-2
        )

    # full frame_skip step: float noise compounds through stiff contacts
    qv, qdv = jax.vmap(dyn.physics_step)(q, qd, tau)
    for i in range(B):
        qi, qdi = dyn._physics_step_impl(q[i], qd[i], tau[i])
        np.testing.assert_allclose(np.asarray(qv[i]), np.asarray(qi), atol=1e-2)
        np.testing.assert_allclose(np.asarray(qdv[i]), np.asarray(qdi), atol=5e-2, rtol=1e-2)
