"""Gate-Decorator ("tick-tock") channel-pruning training for CC_GD.

Rebuild of the reference `train_gd.py`:
  * normal ("tock") epochs: RD loss + `sparse_lambda * Σ|gate|` L1 penalty
    over all gates (`train_gd.py:134-137`)
  * every `tick_freq` epochs, a "tick" phase freezes everything but the
    gates, accumulates Taylor scores `|dL/dgate * gate|` over a subset of
    the data, and zeroes the globally lowest-scoring channel masks, with a
    per-gate keep floor of `int(0.04 * C)` channels
    (`train_gd.py:161-237`)
  * training stops when the pruned parameter scale drops below
    `flops_target` (the reference's `param_scale()` is a TODO stub
    returning 1.0, `CC_gd.py:341-343`; here it is implemented for real as
    the kept-channel fraction weighted by each gate's attached parameters)
  * `prune_export` folds gate values into the producing convolutions and
    physically slices interior stack channels, emitting pruned params +
    `deps` (kept-channel counts per gate) (`train_gd.py:507-565`).

Functional-JAX design note: the reference stores Taylor scores in module
buffers fed by `.grad` hooks; here the tick step just reads the gradient
pytree — `score += |grads[gate] * params[gate]|` — no mutable state in the
model.
"""

import argparse
import os
import sys
import time

import numpy as np


def iter_gate_paths(params, prefix=()):
    """Yield (path, gate, mask) for every GateDecorator in the tree."""
    if isinstance(params, dict):
        if "gate" in params and "mask" in params:
            yield prefix, params["gate"], params["mask"]
        for k, v in params.items():
            if isinstance(v, dict):
                yield from iter_gate_paths(v, prefix + (k,))


def gate_l1_penalty(params):
    import jax.numpy as jnp

    total = 0.0
    for _, gate, _ in iter_gate_paths(params):
        total = total + jnp.abs(gate).sum()
    return total


def accumulate_scores(scores, params, grads):
    """score += |dL/dgate * gate| per gate (Taylor importance)."""
    out = {}
    gp = {p: (g, m) for p, g, m in iter_gate_paths(params)}
    for path, ggrad, _ in iter_gate_paths(grads):
        gate, _ = gp[path]
        prev = scores.get(path, 0.0)
        out[path] = prev + np.abs(np.asarray(ggrad) * np.asarray(gate))
    return out


def prune_masks(params, scores, num: int = 5, minimal_frac: float = 0.04):
    """Zero the globally lowest-scoring unmasked channels (with per-gate
    keep floors). Returns an updated params tree (mask surgery only)."""
    import jax

    # global soft threshold over currently-unmasked channels: prune the
    # `num` lowest-scoring alive channels (strict > keeps everything above
    # the num-th lowest; ties at the threshold are pruned together, matching
    # the reference's threshold-based tick semantics)
    alive_scores = []
    for path, _, mask in iter_gate_paths(params):
        s = scores.get(path)
        if s is None:
            continue
        alive_scores.append(s[np.asarray(mask) > 0])
    if not alive_scores or num <= 0:
        return params
    flat = np.sort(np.concatenate(alive_scores))
    threshold = flat[min(num, len(flat)) - 1]

    params = jax.tree_util.tree_map(np.asarray, params)

    def apply(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "gate" in v and "mask" in v:
                    path = prefix + (k,)
                    s = scores.get(path)
                    if s is None:
                        continue
                    C = v["mask"].shape[0]
                    minimal = max(int(minimal_frac * C), 1)
                    hard = s >= np.sort(s)[-minimal]
                    soft = s > threshold
                    v["mask"] = ((hard | soft).astype(np.float32)) * v["mask"]
                else:
                    apply(v, prefix + (k,))

    apply(params)
    return params


def make_gate_tx(learning_rate: float):
    """Tick-phase optimizer: Adam on gate leaves, everything else frozen.

    Built with multi_transform + set_to_zero, NOT optax.masked: masked
    passes the unmasked leaves' raw gradients through unchanged, which
    apply_updates would ADD to the frozen params — silent gradient ascent
    on every non-gate parameter during tick batches.
    """
    import jax
    import optax

    return optax.multi_transform(
        {"gate": optax.adam(learning_rate), "rest": optax.set_to_zero()},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "gate"
            if any(getattr(k, "key", None) == "gate" for k in path)
            else "rest",
            params,
        ),
    )


def param_scale(params) -> float:
    """Kept fraction of gated channels, weighted by gate width (proxy for
    the pruned model's parameter scale)."""
    kept, total = 0.0, 0.0
    for _, _, mask in iter_gate_paths(params):
        m = np.asarray(mask)
        kept += float((m > 0).sum())
        total += m.size
    return kept / total if total else 1.0


def _fold_gate(stack, gate_name, conv_name):
    """Fold gate*mask into the producer conv and return the kept indices."""
    gate = stack[gate_name]["gate"]
    mask = stack[gate_name]["mask"]
    keep = np.where(np.asarray(mask) > 0)[0]
    producer = stack[conv_name]
    inner = next(iter(producer))  # Conv_0 / ConvTranspose_0
    # HWIO (flax Conv and ConvTranspose both): out channels on the last axis
    producer[inner]["kernel"] = (producer[inner]["kernel"] * gate)[..., keep]
    producer[inner]["bias"] = (producer[inner]["bias"] * gate)[keep]
    del stack[gate_name]
    return keep


def _slice_in(module, keep, total=None):
    """Slice a conv/deconv consumer's input channels (HWIO axis 2). When
    `total` is given, only the first `total` input rows belong to this
    producer (concat inputs: latent channels first, support slices after)."""
    inner = next(iter(module))
    kern = module[inner]["kernel"]
    if total is None:
        module[inner]["kernel"] = kern[:, :, keep, :]
    else:
        module[inner]["kernel"] = np.concatenate(
            [kern[:, :, keep, :], kern[:, :, total:, :]], axis=2
        )


def prune_export(params, save_path: str, model_kwargs: dict = None):
    """Physically prune a gated CC_GD param tree: fold every gate (gate *
    mask) into its producer convolution, drop the pruned output channels,
    and slice the corresponding input channels out of every consumer —
    including the cross-module consumers the reference's `PruneHelper`
    descriptors describe (`CC_gd.py:556-660`, `train_gd.py:507-565`; the
    reference's own prune_model is dead code — it dereferences attributes
    PruneHelper never sets and indexes state_dict with list-valued keys —
    so these semantics are validated by our tests instead):

      * interior stack gates -> next conv in the stack
      * h_a/gate_2 (bottleneck) -> entropy-bottleneck per-channel params
        (axis 0) + h_mean_s/h_scale_s first deconv inputs. NOTE: this fold
        is approximate — quantization reinserts per-channel medians between
        producer and consumer, so a masked (constant-zero) z channel is not
        bitwise equal to a removed one. Exact for all other gates.
      * h_mean_s/gate_2 -> first-M input rows of every cc_mean and lrp
        transform (their inputs are concat(latent_means, support slices))
      * h_scale_s/gate_2 -> first-M input rows of every cc_scale transform

    The exported tree is fully ungated (the reference analogously renames
    keys back to the ungated layout and pops gates). Reload with
    `load_pruned_checkpoint` / `CC_GD(deps=...)`. Emits
    `pruned_model.msgpack` + `.deps.json` {"deps": {gate path: kept}}.
    """
    import json

    import jax
    from flax import serialization

    params = jax.tree_util.tree_map(np.asarray, params)
    deps = {}
    M = params["h_mean_s"]["conv_2"][
        next(iter(params["h_mean_s"]["conv_2"]))
    ]["bias"].shape[0]

    # interior gates first (consumer = next conv in the same stack)
    for name, stack in params.items():
        if not isinstance(stack, dict) or not any(
            k.startswith("gate_") for k in stack
        ):
            continue
        convs = sorted(
            [k for k in stack if k.startswith(("conv_", "deconv_"))],
            key=lambda s: int(s.split("_")[-1]),
        )
        n = len(convs)
        for gi in sorted(
            int(k.split("_")[-1]) for k in stack if k.startswith("gate_")
        ):
            if gi == n - 1:
                continue  # stack-final: cross-module, handled below
            keep = _fold_gate(stack, f"gate_{gi}", convs[gi])
            _slice_in(stack[convs[gi + 1]], keep)
            deps[f"{name}/gate_{gi}"] = int(keep.size)

    # h_a final gate: bottleneck channels
    if "gate_2" in params["h_a"]:
        keep = _fold_gate(params["h_a"], "gate_2", "conv_2")
        deps["h_a/gate_2"] = int(keep.size)
        eb = params["entropy_bottleneck"]
        for k in eb:
            eb[k] = eb[k][keep]
        _slice_in(params["h_mean_s"]["deconv_0"], keep)
        _slice_in(params["h_scale_s"]["deconv_0"], keep)

    # hyper-synthesis final gates: first-M rows of the slice transforms
    for hyper, prefixes in (
        ("h_mean_s", ("cc_mean_", "lrp_")),
        ("h_scale_s", ("cc_scale_",)),
    ):
        if "gate_2" not in params[hyper]:
            continue
        keep = _fold_gate(params[hyper], "gate_2", "conv_2")
        deps[f"{hyper}/gate_2"] = int(keep.size)
        for name, stack in params.items():
            if isinstance(stack, dict) and name.startswith(prefixes):
                _slice_in(stack["conv_0"], keep, total=M)

    os.makedirs(save_path, exist_ok=True)
    out = os.path.join(save_path, "pruned_model.msgpack")
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(out + ".deps.json", "w") as f:
        json.dump({"deps": deps, "model_kwargs": model_kwargs or {}}, f)
    return params, deps


def load_pruned_checkpoint(path: str):
    """Load a `prune_export` checkpoint: returns (CC_GD(deps=...), params).

    `path` is the msgpack (its `.deps.json` sidecar must sit next to it).
    The returned model is ungated at the pruned widths; its forward is the
    pruned network (the reference never shipped this reload half).
    """
    import json

    from flax import serialization

    from ..models.cc_gd import CC_GD

    with open(path + ".deps.json") as f:
        meta = json.load(f)
    deps = tuple(sorted(meta["deps"].items()))
    model = CC_GD(deps=deps, **meta.get("model_kwargs", {}))

    import jax
    import jax.numpy as jnp

    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        training=False,
    )
    with open(path, "rb") as f:
        params = serialization.from_bytes(variables["params"], f.read())
    return model, params


def parse_args(argv):
    p = argparse.ArgumentParser(description="Gate-decorator pruning training")
    p.add_argument("-m", "--model", default="cc_gd")
    p.add_argument("-d", "--dataset", required=True)
    p.add_argument("-e", "--epochs", type=int, default=400)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("-n", "--num-workers", type=int, default=8)
    p.add_argument("--lambda", dest="lmbda", type=float, default=1e-2)
    p.add_argument("--sparse-lambda", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--tick-freq", type=int, default=10)
    p.add_argument("--tick-round", type=int, default=10)
    p.add_argument("--tick-num", type=int, default=5)
    p.add_argument("--subset-scale", type=float, default=0.1)
    p.add_argument("--flops-target", type=float, default=0.5)
    p.add_argument("--save-dir", type=str, default="./ckpt_gd")
    p.add_argument("--checkpoint", type=str)
    p.add_argument("--pretrained", type=str)
    p.add_argument("--log-every", type=int, default=10)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import optax

    from ..datasets import ImageFolder
    from ..training import create_train_state
    from ..training.losses import rate_distortion_loss
    from ..zoo import models
    from .train import restore_training_checkpoint, save_training_checkpoint

    model = models[args.model]()
    patch = tuple(args.patch_size)
    train_ds = ImageFolder(args.dataset, "train", patch, seed=args.seed)
    test_ds = ImageFolder(args.dataset, "test", patch, seed=args.seed)

    state = create_train_state(
        model, jax.random.key(args.seed), (1,) + patch + (3,),
        learning_rate=args.learning_rate,
        aux_learning_rate=args.aux_learning_rate,
        clip_max_norm=args.clip_max_norm,
    )
    last_epoch = 0
    if args.pretrained and os.path.exists(args.pretrained):
        state, _ = restore_training_checkpoint(args.pretrained, state)
    elif args.checkpoint and os.path.exists(args.checkpoint):
        state, meta = restore_training_checkpoint(args.checkpoint, state)
        last_epoch = meta.get("epoch", 0) + 1

    @jax.jit
    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = model.apply(
                {"params": params}, batch, training=True, rngs={"noise": rng}
            )
            rd = rate_distortion_loss(out, batch, args.lmbda)
            aux = model.apply({"params": params}, method="aux_loss")
            loss = rd.loss + args.sparse_lambda * gate_l1_penalty(params) + aux
            return loss, (rd, aux)

        (_, (rd, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, {"loss": rd.loss, "bpp_loss": rd.bpp_loss, "aux": aux}

    # tick step: gradients w.r.t. everything (for scores) but only gates are
    # updated, mirroring the reference's frozen-parameter tick optimizer
    gate_tx = make_gate_tx(args.learning_rate)

    @jax.jit
    def tick_grads(params, batch, rng):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, batch, training=True, rngs={"noise": rng}
            )
            return rate_distortion_loss(out, batch, args.lmbda).loss

        return jax.grad(loss_fn)(params)

    @jax.jit
    def gate_update(params, opt_state, grads):
        updates, opt_state = gate_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    rng = jax.random.key(args.seed + 1)

    @jax.jit
    def eval_loss(params, batch):
        out = model.apply({"params": params}, batch, training=False)
        return rate_distortion_loss(out, batch, args.lmbda).loss

    best_loss = float("inf")
    stopped = False

    for epoch in range(last_epoch, args.epochs):
        t0 = time.time()
        for i, batch in enumerate(
            train_ds.batches(args.batch_size, epoch, args.num_workers)
        ):
            state, metrics = train_step(state, batch, rng)
            if i % args.log_every == 0:
                print(
                    f"gd epoch {epoch} [{i}]: loss "
                    f"{float(metrics['loss']):.4f} bpp "
                    f"{float(metrics['bpp_loss']):.3f} "
                    f"scale {param_scale(state.params):.3f}"
                )

        if (epoch + 1) % args.tick_freq == 0:
            print(f"tick at epoch {epoch}")
            params = state.params
            opt_state = gate_tx.init(params)
            n_subset = max(
                int(args.subset_scale * (len(train_ds) // args.batch_size)), 1
            )
            for _ in range(args.tick_round):
                scores = {}
                for i, batch in enumerate(
                    train_ds.batches(args.batch_size, epoch, args.num_workers)
                ):
                    if i >= n_subset:
                        break
                    grads = tick_grads(params, batch, jax.random.fold_in(rng, i))
                    scores = accumulate_scores(scores, params, grads)
                    params, opt_state = gate_update(params, opt_state, grads)
                params = prune_masks(params, scores, num=args.tick_num)
            state = state.replace(params=params)
            scale = param_scale(state.params)
            print(f"post-tick param scale: {scale:.4f}")
            if scale < args.flops_target:
                stopped = True

        # eval + checkpoint
        totals, count = {}, 0
        for batch in test_ds.batches(args.batch_size, 0, args.num_workers):
            totals["loss"] = totals.get("loss", 0.0) + float(
                eval_loss(state.params, batch)
            )
            count += 1
        test_loss = totals.get("loss", float("inf")) / max(count, 1)
        print(f"gd test epoch {epoch}: loss {test_loss:.4f} "
              f"[{time.time() - t0:.1f}s]")
        is_best = test_loss < best_loss
        best_loss = min(test_loss, best_loss)
        save_training_checkpoint(
            args.save_dir, state, epoch, test_loss, args, is_best,
            best_loss=best_loss,
        )
        if stopped:
            break

    # record the model's real widths so load_pruned_checkpoint rebuilds
    # the deps-model at the right ungated sizes (a registry model need not
    # be the full-size default)
    prune_export(
        state.params, args.save_dir,
        model_kwargs={
            "N": model.N, "M": model.M, "num_slices": model.num_slices,
            "max_support_slices": model.max_support_slices,
        },
    )
    return state


if __name__ == "__main__":
    main(sys.argv[1:])
