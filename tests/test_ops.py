import jax
import jax.numpy as jnp
import numpy as np

from stf_tpu.ops import NonNegativeParametrizer, lower_bound, ste_round


class TestLowerBound:
    def test_forward(self):
        x = jnp.array([-1.0, 0.0, 0.5, 2.0])
        np.testing.assert_allclose(lower_bound(x, 0.5), [0.5, 0.5, 0.5, 2.0])

    def test_gradient_above_bound_passes(self):
        g = jax.grad(lambda x: lower_bound(x, 0.5).sum())(jnp.array([1.0, 2.0]))
        np.testing.assert_allclose(g, [1.0, 1.0])

    def test_gradient_below_bound_blocked_when_pushing_down(self):
        # Loss +x => grad_output +1 => pushes x down; below bound it must be 0.
        g = jax.grad(lambda x: lower_bound(x, 0.5).sum())(jnp.array([0.1]))
        np.testing.assert_allclose(g, [0.0])

    def test_gradient_below_bound_passes_when_pushing_up(self):
        # Loss -x => grad_output -1 => pushes x up; must pass even below bound.
        g = jax.grad(lambda x: -lower_bound(x, 0.5).sum())(jnp.array([0.1]))
        np.testing.assert_allclose(g, [-1.0])

    def test_jit(self):
        f = jax.jit(lambda x: lower_bound(x, 0.11))
        np.testing.assert_allclose(f(jnp.array([0.05])), [0.11])


class TestSteRound:
    def test_forward_is_round(self):
        x = jnp.array([-1.6, -0.4, 0.4, 1.5, 2.49])
        np.testing.assert_allclose(ste_round(x), np.round(np.asarray(x)))

    def test_gradient_is_identity(self):
        g = jax.grad(lambda x: (3.0 * ste_round(x)).sum())(jnp.array([0.3, 1.7]))
        np.testing.assert_allclose(g, [3.0, 3.0])


class TestNonNegativeParametrizer:
    def test_roundtrip(self):
        p = NonNegativeParametrizer()
        v = jnp.array([0.0, 0.1, 1.0, 10.0])
        np.testing.assert_allclose(p(p.init(v)), v, atol=1e-6)

    def test_minimum_enforced(self):
        p = NonNegativeParametrizer(minimum=1e-6)
        out = p(jnp.array([-5.0, 0.0, 1e-12]))
        assert np.all(np.asarray(out) >= 1e-6 - 1e-12)

    def test_matches_reference_constants(self):
        # pedestal = 2^-36, bound = sqrt(minimum + 2^-36)
        p = NonNegativeParametrizer(minimum=1e-6)
        assert p.pedestal == 2 ** -36
        np.testing.assert_allclose(p.bound, (1e-6 + 2 ** -36) ** 0.5)
