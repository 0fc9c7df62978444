"""Train state: dual main/aux optimizer and the jitted/shardable train step.

The reference trains with two Adam optimizers — main (lr 1e-4, clip-norm 1.0)
over everything except the bottleneck `quantiles`, and aux (lr 1e-3) over the
quantiles only (`train.py:88-119,131-150`). Here both run as one optax
`multi_transform` over a combined scalar loss; the entropy model's internal
stop_gradients guarantee the same gradient split (verified by test):
  * RD loss grads reach everything except quantiles (medians are detached)
  * aux loss grads reach only quantiles
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util
from flax.training import train_state

from .losses import rate_distortion_loss


def _label_params(params):
    def label(path):
        if "quantiles" in path:
            return "aux"
        if path[-1] == "mask":
            # GateDecorator masks: never touched by the optimizer; the
            # tick/tock pruning loop rewrites them host-side.
            return "frozen"
        return "main"

    flat = traverse_util.flatten_dict(params)
    labels = {k: label(k) for k in flat}
    return traverse_util.unflatten_dict(labels)


def configure_optimizers(
    learning_rate=1e-4,
    aux_learning_rate: float = 1e-3,
    clip_max_norm: float = 1.0,
) -> optax.GradientTransformation:
    """`learning_rate` may be a float or an optax schedule (MultiStepLR is
    expressed as a piecewise-constant schedule by the caller)."""
    main = optax.chain(
        optax.clip_by_global_norm(clip_max_norm)
        if clip_max_norm and clip_max_norm > 0
        else optax.identity(),
        optax.adam(learning_rate),
    )
    aux = optax.adam(aux_learning_rate)
    return optax.multi_transform(
        {"main": main, "aux": aux, "frozen": optax.set_to_zero()},
        _label_params,
    )


class TrainState(train_state.TrainState):
    pass


def create_train_state(
    model,
    rng,
    input_shape=(1, 256, 256, 3),
    learning_rate=1e-4,
    aux_learning_rate: float = 1e-3,
    clip_max_norm: float = 1.0,
) -> TrainState:
    params_rng, noise_rng, dp_rng, gumbel_rng = jax.random.split(rng, 4)
    variables = model.init(
        {
            "params": params_rng,
            "noise": noise_rng,
            "droppath": dp_rng,
            "gumbel": gumbel_rng,
        },
        jnp.zeros(input_shape, jnp.float32),
        training=True,
    )
    tx = configure_optimizers(learning_rate, aux_learning_rate, clip_max_norm)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )


def make_train_step(
    model,
    lmbda: float,
    metric: str = "mse",
    pmean_axis: Optional[str] = None,
) -> Callable:
    """Build the (jittable) train step.

    When `pmean_axis` is given, gradients and metrics are averaged across
    that named mesh axis (data parallelism under shard_map); with plain jit
    over a sharded batch, XLA inserts the collectives automatically and
    `pmean_axis` should be None.
    """

    def loss_fn(params, batch, rng):
        # all stochastic streams any model family uses: quantization noise,
        # stochastic depth (stf/tbc/dystf), Gumbel token masks (dystf)
        r1, r2, r3 = jax.random.split(rng, 3)
        out = model.apply(
            {"params": params},
            batch,
            training=True,
            rngs={"noise": r1, "droppath": r2, "gumbel": r3},
        )
        rd = rate_distortion_loss(out, batch, lmbda, metric)
        aux = model.apply({"params": params}, method="aux_loss")
        return rd.loss + aux, (rd, aux)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, (rd, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            rd = jax.lax.pmean(rd, pmean_axis)
            aux = jax.lax.pmean(aux, pmean_axis)
        state = state.apply_gradients(grads=grads)
        metrics = {
            "loss": rd.loss,
            "bpp_loss": rd.bpp_loss,
            "distortion": rd.distortion,
            "aux_loss": aux,
        }
        return state, metrics

    return train_step


def make_eval_step(model, lmbda: float, metric: str = "mse") -> Callable:
    def eval_step(params, batch):
        out = model.apply({"params": params}, batch, training=False)
        rd = rate_distortion_loss(out, batch, lmbda, metric)
        aux = model.apply({"params": params}, method="aux_loss")
        return {
            "loss": rd.loss,
            "bpp_loss": rd.bpp_loss,
            "distortion": rd.distortion,
            "aux_loss": aux,
        }

    return eval_step
