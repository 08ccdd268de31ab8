import jax
import jax.numpy as jnp
import numpy as np

from sdmm_tpu.core.frame import normalize
from sdmm_tpu.guiding import tangent as tg


def rand_dirs(key, n):
    return normalize(jax.random.normal(key, (n, 3)))


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    mu = rand_dirs(key, 256)
    rot = tg.make_rotation(mu)
    t = jax.random.normal(jax.random.fold_in(key, 1), (256, 2)) * 0.6
    d, sj, ok = tg.exp_map(rot, t)
    m = np.asarray(ok)
    assert m.mean() > 0.98  # |t| < pi for almost all draws at this scale
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(d, axis=-1))[m], 1.0, atol=1e-5
    )
    t2, aj, ok2 = tg.log_map(rot, d)
    m = m & np.asarray(ok2)
    np.testing.assert_allclose(np.asarray(t2)[m], np.asarray(t)[m], atol=1e-4)
    # Jacobians are reciprocal: sinc(|t|) * (angle/sin) = 1.
    np.testing.assert_allclose(np.asarray(sj * aj)[m], 1.0, atol=1e-4)


def test_exp_at_zero_is_mean():
    mu = rand_dirs(jax.random.PRNGKey(2), 16)
    rot = tg.make_rotation(mu)
    d, sj, ok = tg.exp_map(rot, jnp.zeros((16, 2)))
    np.testing.assert_allclose(np.asarray(d), np.asarray(mu), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sj), 1.0, atol=1e-6)


def test_exp_jacobian_finite_difference():
    key = jax.random.PRNGKey(3)
    mu = rand_dirs(key, 8)
    rot = tg.make_rotation(mu)
    t0 = jax.random.normal(jax.random.fold_in(key, 1), (8, 2)) * 0.5
    jac = tg.exp_jacobian(t0)  # north-pole frame
    eps = 1e-4
    for dim in range(2):
        dt = jnp.zeros((8, 2)).at[:, dim].set(eps)
        dp, _, _ = tg.exp_map(rot, t0 + dt)
        dm, _, _ = tg.exp_map(rot, t0 - dt)
        fd_world = (dp - dm) / (2 * eps)
        # Convert to north-pole frame: R^T * fd.
        fd_np = jnp.einsum("nji,nj->ni", rot, fd_world)
        np.testing.assert_allclose(
            np.asarray(jac[:, :, dim]), np.asarray(fd_np), atol=2e-3
        )


def test_log_jacobian_inverse_of_exp_jacobian():
    """At matching points, J_log · R · J_exp ≈ I (2x2)."""
    key = jax.random.PRNGKey(4)
    mu = rand_dirs(key, 8)
    rot = tg.make_rotation(mu)
    t0 = jax.random.normal(jax.random.fold_in(key, 1), (8, 2)) * 0.6
    d, _, _ = tg.exp_map(rot, t0)
    jexp = tg.exp_jacobian(t0)  # [8,3,2] np-frame of SAME tangent space
    jlog = tg.log_jacobian(rot, d)  # [8,2,3] world → tangent of same space
    prod = jnp.einsum("nij,njk,nkl->nil", jlog, rot, jexp)
    np.testing.assert_allclose(
        np.asarray(prod), np.broadcast_to(np.eye(2), (8, 2, 2)), atol=2e-3
    )
