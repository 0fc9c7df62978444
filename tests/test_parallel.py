"""Data-parallel training on the virtual 8-device CPU mesh (SURVEY.md §4:
multi-host-simulation tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from stf_tpu.models import WACNN
from stf_tpu.parallel import (
    create_mesh,
    make_parallel_train_step,
    shard_batch,
)
from stf_tpu.training import create_train_state, make_train_step

SMALL = dict(N=16, M=24, num_slices=2, max_support_slices=1)


def test_mesh_uses_all_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8


def test_data_parallel_step_matches_single_device():
    model = WACNN(**SMALL)
    state = create_train_state(model, jax.random.key(0), input_shape=(1, 64, 64, 3))
    step = make_train_step(model, lmbda=0.01)

    batch = np.asarray(
        jax.random.uniform(jax.random.key(1), (8, 64, 64, 3)), np.float32
    )
    rng = jax.random.key(2)

    # single-device reference
    s1, m1 = jax.jit(step)(state, jnp.asarray(batch), rng)

    # 8-way data parallel
    mesh = create_mesh()
    pstep = make_parallel_train_step(step, mesh)
    sharded = shard_batch(batch, mesh)
    state2 = create_train_state(model, jax.random.key(0), input_shape=(1, 64, 64, 3))
    s8, m8 = pstep(state2, sharded, rng)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-4
    )
    # updated parameters must match between single-device and sharded runs
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    # f32 reduction order differs between the sharded psum and the
    # single-device sum; updated params agree to ~1e-4 after one Adam step
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4,
        )


def test_multiple_parallel_steps_stay_finite():
    model = WACNN(**SMALL)
    state = create_train_state(model, jax.random.key(0), input_shape=(1, 64, 64, 3))
    mesh = create_mesh()
    pstep = make_parallel_train_step(make_train_step(model, lmbda=0.01), mesh)
    rng = jax.random.key(3)
    for i in range(3):
        batch = shard_batch(
            np.asarray(
                jax.random.uniform(jax.random.key(10 + i), (8, 64, 64, 3)),
                np.float32,
            ),
            mesh,
        )
        state, metrics = pstep(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))


def test_data_parallel_codec_eval():
    """Serving-style SPMD eval: a batch sharded across the 8-device mesh
    runs through the real codec (compress + decompress) and must produce
    the exact streams and reconstruction of the single-device codec — the
    walk's jitted programs propagate the batch sharding, and the host
    coder consumes the gathered symbols unchanged."""
    from stf_tpu.models import Codec

    model = WACNN(**SMALL)
    state = create_train_state(
        model, jax.random.key(5), input_shape=(1, 64, 64, 3)
    )
    codec = Codec(model, state.params)
    batch = np.asarray(
        jax.random.uniform(jax.random.key(6), (8, 64, 64, 3)), np.float32
    )

    enc_ref = codec.compress(jnp.asarray(batch))
    dec_ref = codec.decompress(enc_ref["strings"], enc_ref["shape"])

    mesh = create_mesh()
    sharded = shard_batch(batch, mesh)
    enc_dp = codec.compress(sharded)
    assert enc_dp["strings"][0] == enc_ref["strings"][0]
    assert enc_dp["strings"][1] == enc_ref["strings"][1]
    dec_dp = codec.decompress(enc_dp["strings"], enc_dp["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec_ref["x_hat"]), np.asarray(dec_dp["x_hat"])
    )
