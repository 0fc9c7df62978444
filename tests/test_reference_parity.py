"""Numerical parity against the reference implementation (used as an
oracle, see reference_oracle.py). Skipped when /root/reference is absent.

These tests validate the checkpoint importer AND the model math end to end:
a randomly initialized reference model's state_dict is imported into our
flax models, and eval-mode forwards / CDF tables / real codec round trips
are compared.
"""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_oracle import (  # noqa: E402
    load_reference,
    reference_available,
    to_nchw,
    to_nhwc,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref():
    compressai = load_reference()
    assert compressai is not None
    return compressai


def _import_params(model_name, my_model, torch_model):
    import jax
    import jax.numpy as jnp

    from stf_tpu.zoo.torch_import import import_state_dict

    variables = my_model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        training=False,
    )
    return import_state_dict(
        model_name, variables["params"], torch_model.state_dict()
    )


class TestEntropyBottleneckParity:
    def test_tables_match_reference_update(self, ref):
        import torch

        from stf_tpu.entropy import build_eb_tables

        # seeded: with unseeded quantiles a rare draw lands a pmf right on
        # a CDF-repair boundary where tiny torch-vs-numpy float drift
        # cascades past the ±1 quantizer tolerance (observed 21/65536 once
        # in ~20 runs) — the parity property itself is unchanged
        torch.manual_seed(0)
        eb = ref.entropy_models.EntropyBottleneck(8)
        with torch.no_grad():
            # make quantiles non-trivial
            eb.quantiles += torch.randn_like(eb.quantiles) * 0.5
        eb.update(force=True)

        params = {"quantiles": eb.quantiles.detach().numpy()}
        for i in range(5):
            params[f"matrix_{i}"] = getattr(eb, f"_matrix{i}").detach().numpy()
            params[f"bias_{i}"] = getattr(eb, f"_bias{i}").detach().numpy()
            if i < 4:
                params[f"factor_{i}"] = (
                    getattr(eb, f"_factor{i}").detach().numpy()
                )
        tables = build_eb_tables(params)

        np.testing.assert_array_equal(
            tables.cdf_length, eb._cdf_length.numpy()
        )
        np.testing.assert_array_equal(tables.offset, eb._offset.numpy())
        ref_cdf = eb._quantized_cdf.numpy()
        assert tables.quantized_cdf.shape == ref_cdf.shape
        # same C++ quantizer; float drift may shift a CDF entry by ±1
        assert np.abs(tables.quantized_cdf - ref_cdf).max() <= 1

    def test_likelihood_matches(self, ref):
        import torch

        import jax.numpy as jnp

        from stf_tpu.entropy.entropy_models import eb_likelihood

        eb = ref.entropy_models.EntropyBottleneck(4).eval()
        x = torch.randn(4, 1, 50) * 3
        with torch.no_grad():
            ref_lik = eb._likelihood(x).numpy()

        params = {}
        for i in range(5):
            params[f"matrix_{i}"] = jnp.asarray(
                getattr(eb, f"_matrix{i}").detach().numpy()
            )
            params[f"bias_{i}"] = jnp.asarray(
                getattr(eb, f"_bias{i}").detach().numpy()
            )
            if i < 4:
                params[f"factor_{i}"] = jnp.asarray(
                    getattr(eb, f"_factor{i}").detach().numpy()
                )
        mine = np.asarray(eb_likelihood(params, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(mine, ref_lik, rtol=1e-4, atol=1e-7)


class TestGaussianConditionalParity:
    def test_tables_match(self, ref):
        from stf_tpu.entropy import build_gc_tables, get_scale_table

        gc = ref.entropy_models.GaussianConditional(None)
        gc.update_scale_table(
            [float(s) for s in get_scale_table()], force=True
        )
        tables = build_gc_tables(get_scale_table())
        np.testing.assert_array_equal(
            tables.cdf_length, gc._cdf_length.numpy()
        )
        np.testing.assert_array_equal(tables.offset, gc._offset.numpy())
        # our builder evaluates the Gaussian CDF in float64 (scipy erfc);
        # torch uses float32 — at 2^16 quantization boundaries a frequency
        # can shift by a unit or two on isolated rows
        assert (
            np.abs(tables.quantized_cdf - gc._quantized_cdf.numpy()).max() <= 2
        )

    def test_build_indexes_match(self, ref):
        import torch

        from stf_tpu.entropy import gaussian_build_indexes, get_scale_table

        gc = ref.entropy_models.GaussianConditional(None)
        gc.update_scale_table([float(s) for s in get_scale_table()], force=True)
        scales = torch.rand(2, 3, 7, 7) * 30 + 0.01
        ref_idx = gc.build_indexes(scales).numpy()
        mine = np.asarray(
            gaussian_build_indexes(scales.numpy(), get_scale_table())
        )
        np.testing.assert_array_equal(mine, ref_idx)


class TestWACNNParity:
    @pytest.fixture(scope="class")
    def pair(self, ref):
        import torch

        torch.manual_seed(0)
        import compressai.zoo

        tmodel = compressai.zoo.models["cnn"](192, 320).eval()

        from stf_tpu.models import WACNN

        my_model = WACNN()
        params = _import_params("cnn", my_model, tmodel)
        return tmodel, my_model, params

    def test_eval_forward_matches(self, pair):
        import torch

        import jax.numpy as jnp

        tmodel, my_model, params = pair
        rng = np.random.default_rng(0)
        x = rng.random((1, 64, 64, 3)).astype(np.float32)

        with torch.no_grad():
            ref_out = tmodel(torch.from_numpy(to_nchw(x)))
        out = my_model.apply({"params": params}, jnp.asarray(x), training=False)

        np.testing.assert_allclose(
            np.asarray(out["x_hat"]),
            to_nhwc(ref_out["x_hat"].numpy()),
            atol=5e-3,
        )
        for key in ("y", "z"):
            ref_bits = -np.log2(ref_out["likelihoods"][key].numpy()).sum()
            my_bits = -np.log2(np.asarray(out["likelihoods"][key])).sum()
            np.testing.assert_allclose(my_bits, ref_bits, rtol=2e-3)

    def test_codec_roundtrip_matches_reference(self, pair):
        import torch

        tmodel, my_model, params = pair
        from stf_tpu.models import Codec

        rng = np.random.default_rng(1)
        x = rng.random((1, 64, 64, 3)).astype(np.float32)

        tmodel.update(force=True)
        with torch.no_grad():
            ref_enc = tmodel.compress(torch.from_numpy(to_nchw(x)))
            ref_dec = tmodel.decompress(ref_enc["strings"], ref_enc["shape"])

        codec = Codec(my_model, params)
        my_enc = codec.compress(x)
        my_dec = codec.decompress(my_enc["strings"], my_enc["shape"])

        # stream sizes should agree closely (same CDFs, same symbols; byte
        # layout may differ slightly due to symbol order)
        ref_bytes = sum(len(s[0]) for s in ref_enc["strings"])
        my_bytes = sum(len(g[0]) for g in my_enc["strings"])
        assert abs(ref_bytes - my_bytes) <= max(64, 0.02 * ref_bytes)

        np.testing.assert_allclose(
            np.asarray(my_dec["x_hat"]),
            to_nhwc(ref_dec["x_hat"].numpy()),
            atol=5e-3,
        )


class TestSTFParity:
    @pytest.fixture(scope="class")
    def pair(self, ref):
        import torch

        torch.manual_seed(0)
        import compressai.zoo

        tmodel = compressai.zoo.models["stf"]().eval()

        from stf_tpu.models import SymmetricalTransFormer

        my_model = SymmetricalTransFormer()
        params = _import_params("stf", my_model, tmodel)
        return tmodel, my_model, params

    def test_eval_forward_matches(self, pair):
        import torch

        import jax.numpy as jnp

        tmodel, my_model, params = pair
        rng = np.random.default_rng(2)
        x = rng.random((1, 64, 64, 3)).astype(np.float32)

        with torch.no_grad():
            ref_out = tmodel(torch.from_numpy(to_nchw(x)))
        out = my_model.apply({"params": params}, jnp.asarray(x), training=False)

        np.testing.assert_allclose(
            np.asarray(out["x_hat"]),
            to_nhwc(ref_out["x_hat"].numpy()),
            atol=5e-3,
        )
        for key in ("y", "z"):
            ref_bits = -np.log2(ref_out["likelihoods"][key].numpy()).sum()
            my_bits = -np.log2(np.asarray(out["likelihoods"][key])).sum()
            np.testing.assert_allclose(my_bits, ref_bits, rtol=2e-3)


class TestCCParity:
    @pytest.fixture(scope="class")
    def pair(self, ref):
        import torch

        torch.manual_seed(0)
        import compressai.zoo

        tmodel = compressai.zoo.models["cc"](192, 320).eval()

        from stf_tpu.models import CC

        my_model = CC()
        params = _import_params("cc", my_model, tmodel)
        return tmodel, my_model, params

    def test_eval_forward_matches(self, pair):
        import torch

        import jax.numpy as jnp

        tmodel, my_model, params = pair
        rng = np.random.default_rng(3)
        x = rng.random((1, 64, 64, 3)).astype(np.float32)

        with torch.no_grad():
            ref_out = tmodel(torch.from_numpy(to_nchw(x)))
        out = my_model.apply({"params": params}, jnp.asarray(x), training=False)

        np.testing.assert_allclose(
            np.asarray(out["x_hat"]),
            to_nhwc(ref_out["x_hat"].numpy()),
            atol=5e-3,
        )
        for key in ("y", "z"):
            ref_bits = -np.log2(ref_out["likelihoods"][key].numpy()).sum()
            my_bits = -np.log2(np.asarray(out["likelihoods"][key])).sum()
            np.testing.assert_allclose(my_bits, ref_bits, rtol=2e-3)


class TestCCGDParity:
    """Direct import of a *gated* reference CC_GD state dict (the KEY_TABLE
    layout, `CC_gd.py:357-556`) — the sixth and last family importer.
    Gates and masks are randomized first so the gate/mask import path is
    genuinely exercised (all-ones gates would make CC_GD ≡ CC)."""

    @pytest.fixture(scope="class")
    def pair(self, ref):
        import torch

        torch.manual_seed(0)
        import compressai.zoo

        tmodel = compressai.zoo.models["cc_gd"](192, 320).eval()
        with torch.no_grad():
            g = torch.Generator().manual_seed(7)
            for m in tmodel.gds:
                m.gate.copy_(
                    0.5 + torch.rand(m.gate.shape, generator=g)
                )
                # binary masks with a few pruned channels
                m.mask.copy_(
                    (torch.rand(m.mask.shape, generator=g) > 0.1).float()
                )

        from stf_tpu.models.cc_gd import CC_GD

        my_model = CC_GD()
        params = _import_params("cc_gd", my_model, tmodel)
        return tmodel, my_model, params

    def test_eval_forward_matches(self, pair):
        import torch

        import jax.numpy as jnp

        tmodel, my_model, params = pair
        rng = np.random.default_rng(6)
        x = rng.random((1, 64, 64, 3)).astype(np.float32)

        with torch.no_grad():
            ref_out = tmodel(torch.from_numpy(to_nchw(x)))
        out = my_model.apply({"params": params}, jnp.asarray(x), training=False)

        np.testing.assert_allclose(
            np.asarray(out["x_hat"]),
            to_nhwc(ref_out["x_hat"].numpy()),
            atol=5e-3,
        )
        for key in ("y", "z"):
            ref_bits = -np.log2(ref_out["likelihoods"][key].numpy()).sum()
            my_bits = -np.log2(np.asarray(out["likelihoods"][key])).sum()
            np.testing.assert_allclose(my_bits, ref_bits, rtol=2e-3)


class TestDYSTFParity:
    """The most intricate model: dynamic token pruning with eval-time top-k
    routing. Eval forward is deterministic, so imported random reference
    weights must reproduce x_hat and rates."""

    @pytest.fixture(scope="class")
    def pair(self, ref):
        import torch

        torch.manual_seed(0)
        import compressai.zoo

        tmodel = compressai.zoo.models["dystf"]().eval()

        from stf_tpu.models import DYSTF

        my_model = DYSTF()
        params = _import_params("dystf", my_model, tmodel)
        return tmodel, my_model, params

    def test_eval_forward_matches(self, pair):
        import torch

        import jax.numpy as jnp

        tmodel, my_model, params = pair
        rng = np.random.default_rng(4)
        x = rng.random((1, 64, 64, 3)).astype(np.float32)

        with torch.no_grad():
            ref_out = tmodel(torch.from_numpy(to_nchw(x)))
        out = my_model.apply({"params": params}, jnp.asarray(x), training=False)

        # same token keep/drop sets at every pruning point
        for (my_keep, _), ref_dec in zip(
            out["decisions"], ref_out["decisions"]
        ):
            ref_keep = ref_dec[0].numpy()
            np.testing.assert_array_equal(
                np.sort(np.asarray(my_keep), axis=1),
                np.sort(ref_keep, axis=1),
            )

        np.testing.assert_allclose(
            np.asarray(out["x_hat"]),
            to_nhwc(ref_out["x_hat"].numpy()),
            atol=5e-3,
        )
        for key in ("y", "z"):
            ref_bits = -np.log2(ref_out["likelihoods"][key].numpy()).sum()
            my_bits = -np.log2(np.asarray(out["likelihoods"][key])).sum()
            np.testing.assert_allclose(my_bits, ref_bits, rtol=2e-3)


class TestTBCParity:
    @pytest.fixture(scope="class")
    def pair(self, ref):
        import torch

        torch.manual_seed(0)
        import compressai.zoo

        tmodel = compressai.zoo.models["tbc"]().eval()

        from stf_tpu.models import TransformerBasedCoding

        my_model = TransformerBasedCoding()
        params = _import_params("tbc", my_model, tmodel)
        return tmodel, my_model, params

    def test_eval_forward_matches(self, pair):
        import torch

        import jax.numpy as jnp

        tmodel, my_model, params = pair
        rng = np.random.default_rng(5)
        x = rng.random((1, 64, 64, 3)).astype(np.float32)

        with torch.no_grad():
            ref_out = tmodel(torch.from_numpy(to_nchw(x)))
        out = my_model.apply({"params": params}, jnp.asarray(x), training=False)

        np.testing.assert_allclose(
            np.asarray(out["x_hat"]),
            to_nhwc(ref_out["x_hat"].numpy()),
            atol=5e-3,
        )
        for key in ("y", "z"):
            ref_bits = -np.log2(ref_out["likelihoods"][key].numpy()).sum()
            my_bits = -np.log2(np.asarray(out["likelihoods"][key])).sum()
            np.testing.assert_allclose(my_bits, ref_bits, rtol=2e-3)
