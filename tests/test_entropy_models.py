import jax
import jax.numpy as jnp
import numpy as np

from stf_tpu.entropy import (
    EntropyBottleneck,
    EntropyBottleneckCoder,
    GaussianConditionalCoder,
    build_eb_tables,
    build_gc_tables,
    gaussian_build_indexes,
    gaussian_forward,
    gaussian_likelihood,
    get_scale_table,
)


def init_eb(channels=8, seed=0):
    eb = EntropyBottleneck(channels)
    variables = eb.init(
        {"params": jax.random.key(seed), "noise": jax.random.key(1)},
        jnp.zeros((1, 4, 4, channels)),
        training=True,
    )
    return eb, variables


class TestEntropyBottleneck:
    def test_forward_shapes_and_noise(self):
        eb, variables = init_eb()
        x = jax.random.normal(jax.random.key(2), (2, 4, 4, 8))
        out, lik = eb.apply(
            variables, x, training=True, rngs={"noise": jax.random.key(3)}
        )
        assert out.shape == x.shape and lik.shape == x.shape
        assert np.all(np.abs(np.asarray(out - x)) <= 0.5 + 1e-6)
        assert np.all(np.asarray(lik) > 0) and np.all(np.asarray(lik) <= 1 + 1e-6)

    def test_eval_rounds_around_medians(self):
        eb, variables = init_eb()
        x = jax.random.normal(jax.random.key(2), (1, 4, 4, 8)) * 3
        out, _ = eb.apply(variables, x, training=False)
        med = np.asarray(variables["params"]["quantiles"])[:, 0, 1]
        expected = np.round(np.asarray(x) - med) + med
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_likelihood_sums_to_one(self):
        # Sum of P(round == k) over the integer grid should be ~1 per channel.
        eb, variables = init_eb(channels=4)
        grid = jnp.tile(
            jnp.arange(-120, 121, dtype=jnp.float32)[None, :, None, None],
            (1, 1, 1, 4),
        )
        _, lik = eb.apply(variables, grid, training=False)
        totals = np.asarray(lik).sum(axis=1).reshape(-1)
        np.testing.assert_allclose(totals, 1.0, atol=1e-2)

    def test_aux_loss_finite_and_grad_only_quantiles(self):
        eb, variables = init_eb()

        def loss_fn(params):
            return eb.apply({"params": params}, method=EntropyBottleneck.aux_loss)

        val, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(val)
        assert np.any(np.asarray(grads["quantiles"]) != 0)
        # stop_gradient: matrices/biases/factors get zero grad from aux loss
        for k, g in grads.items():
            if k != "quantiles":
                np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_compress_decompress_roundtrip(self):
        eb, variables = init_eb(channels=8)
        tables = build_eb_tables(variables["params"])
        med = np.asarray(variables["params"]["quantiles"])[:, 0, 1]
        coder = EntropyBottleneckCoder(tables, med)

        rng = np.random.default_rng(0)
        z = rng.normal(0, 2, size=(2, 6, 5, 8)).astype(np.float32)
        strings = coder.compress(z)
        assert len(strings) == 2 and all(isinstance(s, bytes) for s in strings)
        z_hat = coder.decompress(strings, (6, 5))
        expected = np.round(z - med) + med
        np.testing.assert_allclose(z_hat, expected, atol=1e-5)

    def test_bpp_close_to_theoretical(self):
        # Real stream length should be close to -sum(log2 likelihood).
        eb, variables = init_eb(channels=8)
        x = jax.random.normal(jax.random.key(5), (1, 16, 16, 8)) * 2
        _, lik = eb.apply(variables, x, training=False)
        theo_bits = -np.log2(np.asarray(lik)).sum()

        tables = build_eb_tables(variables["params"])
        med = np.asarray(variables["params"]["quantiles"])[:, 0, 1]
        coder = EntropyBottleneckCoder(tables, med)
        strings = coder.compress(np.asarray(x))
        real_bits = len(strings[0]) * 8
        assert real_bits < theo_bits * 1.10 + 256


class TestGaussianConditional:
    def test_likelihood_matches_gaussian_mass(self):
        v = jnp.array([0.0, 1.0, -2.0])
        s = jnp.array([1.0, 1.0, 2.0])
        lik = gaussian_likelihood(v, s)
        from statistics import NormalDist

        for i in range(3):
            nd = NormalDist(0, float(s[i]))
            expected = nd.cdf(abs(float(v[i])) + 0.5) - nd.cdf(
                abs(float(v[i])) - 0.5
            )
            np.testing.assert_allclose(float(lik[i]), expected, rtol=1e-5)

    def test_scale_lower_bound(self):
        lik_small = gaussian_likelihood(jnp.array([0.0]), jnp.array([1e-6]))
        lik_bound = gaussian_likelihood(jnp.array([0.0]), jnp.array([0.11]))
        np.testing.assert_allclose(np.asarray(lik_small), np.asarray(lik_bound))

    def test_forward_training_adds_noise(self):
        x = jnp.zeros((4, 4))
        out, lik = gaussian_forward(
            jax.random.key(0), x, jnp.ones((4, 4)), training=True
        )
        assert np.all(np.abs(np.asarray(out)) <= 0.5)
        assert lik.shape == x.shape

    def test_build_indexes_picks_smallest_geq(self):
        table = get_scale_table()
        scales = jnp.array([0.05, 0.11, 0.5, 200.0, 300.0])
        idx = np.asarray(gaussian_build_indexes(scales, table))
        for s, i in zip(np.maximum(np.asarray(scales), 0.11), idx):
            if s <= table[-1]:
                assert table[i] >= s - 1e-6
            if i > 0:
                assert table[i - 1] < s + 1e-6
        # above the table max, the index saturates to the last entry
        assert idx[-1] == len(table) - 1

    def test_coder_roundtrip(self):
        table = get_scale_table()
        tables = build_gc_tables(table)
        coder = GaussianConditionalCoder(tables, table)

        rng = np.random.default_rng(1)
        scales = rng.uniform(0.05, 8.0, size=(1, 8, 8, 16)).astype(np.float32)
        means = rng.normal(0, 1, size=scales.shape).astype(np.float32)
        y = means + rng.normal(0, 1, size=scales.shape).astype(
            np.float32
        ) * scales

        indexes = coder.build_indexes(scales)
        string = coder.compress(y, indexes, means)
        y_hat = coder.decompress(string, indexes, means)
        np.testing.assert_allclose(
            y_hat, np.rint(y - means) + means, atol=1e-5
        )

    def test_gc_table_invariants(self):
        tables = build_gc_tables(get_scale_table())
        cdf, lengths, offsets = tables.astuple()
        assert cdf.shape[0] == 64
        for r in range(cdf.shape[0]):
            row = cdf[r, : lengths[r]]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) > 0)
        np.testing.assert_array_equal(lengths, -2 * offsets + 3)
