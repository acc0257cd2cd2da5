"""Unit tests for the se(3)/SE(3) core: closed-form identities, round
trips, and finite-difference gradient checks (the rebuild's analog of
Caffe's ``test_gradient_check_util.hpp`` numeric gradient checker,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthvo_tpu.geometry import se3

jax.config.update("jax_enable_x64", False)


def random_twists(rng, n=8, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 6)) * scale, jnp.float32)


class TestClosedForm:
    def test_exp_zero_is_identity(self):
        T = se3.exp(jnp.zeros(6))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-6)

    def test_pure_translation(self):
        xi = jnp.array([1.0, -2.0, 3.0, 0.0, 0.0, 0.0])
        T = se3.exp(xi)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(T[:3, 3], [1.0, -2.0, 3.0], atol=1e-6)

    def test_pure_rotation_90deg_z(self):
        xi = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2])
        T = se3.exp(xi)
        expected_R = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(T[:3, :3], expected_R, atol=1e-6)
        np.testing.assert_allclose(T[:3, 3], 0.0, atol=1e-6)

    def test_rotation_is_orthonormal(self, rng):
        T = se3.exp(random_twists(rng))
        R = np.asarray(T[:, :3, :3], np.float64)
        RtR = np.einsum("bij,bik->bjk", R, R)
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_bottom_row(self, rng):
        T = se3.exp(random_twists(rng))
        np.testing.assert_allclose(
            T[:, 3, :], np.broadcast_to([0, 0, 0, 1.0], (T.shape[0], 4)), atol=0
        )


class TestGroupOps:
    def test_exp_log_roundtrip(self, rng):
        xi = random_twists(rng, scale=0.8)
        xi_back = se3.log(se3.exp(xi))
        np.testing.assert_allclose(xi_back, xi, atol=1e-4)

    def test_inverse(self, rng):
        T = se3.exp(random_twists(rng))
        eye = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-5
        )

    def test_exp_of_negative_is_inverse(self, rng):
        xi = random_twists(rng, scale=0.5)
        np.testing.assert_allclose(
            se3.exp(-xi), se3.inverse(se3.exp(xi)), atol=1e-5
        )

    def test_compose_matches_exp_sum_for_parallel_twists(self):
        # exp((a+b) xi) == exp(a xi) exp(b xi) when the twists commute.
        xi = jnp.array([0.1, 0.2, -0.3, 0.3, -0.2, 0.1])
        np.testing.assert_allclose(
            se3.exp(0.7 * xi),
            se3.compose(se3.exp(0.3 * xi), se3.exp(0.4 * xi)),
            atol=1e-5,
        )

    def test_hat_vee_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        np.testing.assert_allclose(se3.vee(se3.hat(w)), w, atol=0)


class TestNumericsNearZero:
    """The Taylor-guard region: values and gradients must be finite and
    smooth across the branch switch (SURVEY.md §7 hard parts)."""

    @pytest.mark.parametrize("scale", [0.0, 1e-8, 1e-6, 1e-5, 1e-4, 1e-3])
    def test_small_angle_values_finite(self, scale):
        xi = jnp.array([0.3, -0.2, 0.5, 1.0, -1.0, 0.5]) * jnp.array(
            [1, 1, 1, scale, scale, scale]
        )
        T = se3.exp(xi)
        assert bool(jnp.all(jnp.isfinite(T)))
        # Translation ~ v when rotation ~ 0.
        if scale <= 1e-6:
            np.testing.assert_allclose(T[:3, 3], [0.3, -0.2, 0.5], atol=1e-5)

    @pytest.mark.parametrize("scale", [0.0, 1e-6, 1e-4, 1e-2])
    def test_small_angle_grads_finite(self, scale):
        xi = jnp.array([0.1, 0.2, 0.3, scale, -scale, scale], jnp.float32)
        g = jax.jacobian(lambda x: se3.exp(x).reshape(-1))(xi)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_grad_continuity_across_guard(self):
        # Jacobian just below vs just above the Taylor switch must agree.
        def f(s):
            xi = jnp.array([0.1, 0.2, 0.3, 1.0, 0.5, -0.5], jnp.float32) * s
            return se3.exp(xi).reshape(-1)

        j_lo = jax.jacobian(f)(jnp.float32(0.9e-4))
        j_hi = jax.jacobian(f)(jnp.float32(1.1e-4))
        np.testing.assert_allclose(j_lo, j_hi, atol=1e-3)


class TestFiniteDifferenceGrads:
    def test_exp_jacobian_matches_fd(self, rng):
        xi0 = jnp.asarray(rng.normal(size=(6,)) * 0.5, jnp.float32)

        def f(xi):
            return se3.exp(xi).reshape(-1)

        analytic = jax.jacobian(f)(xi0)
        eps = 1e-3
        fd = np.zeros_like(np.asarray(analytic))
        for i in range(6):
            d = np.zeros(6, np.float32)
            d[i] = eps
            fd[:, i] = (np.asarray(f(xi0 + d)) - np.asarray(f(xi0 - d))) / (2 * eps)
        np.testing.assert_allclose(analytic, fd, atol=2e-3)

    def test_log_grad_finite(self, rng):
        xi = jnp.asarray(rng.normal(size=(6,)) * 0.5, jnp.float32)
        g = jax.jacobian(lambda x: se3.log(se3.exp(x)))(xi)
        assert bool(jnp.all(jnp.isfinite(g)))
        # d log(exp(xi)) / d xi == I at any xi along the identity chart.
        np.testing.assert_allclose(g, np.eye(6), atol=1e-2)


class TestJit:
    def test_exp_under_jit_matches_eager(self, rng):
        xi = random_twists(rng)
        np.testing.assert_allclose(jax.jit(se3.exp)(xi), se3.exp(xi), atol=1e-6)
