"""Rate-distortion training loop (the reference `train.py` rebuilt for TPU
meshes).

Recipe parity (reference `train.py:207-418`, BASELINE.md):
  * Adam 1e-4 main / 1e-3 aux (quantiles), clip-norm 1.0
  * lambda * 255² * MSE + bpp loss (or ms-ssim variant)
  * 256x256 random crops, batch 16, MultiStepLR [320,345] gamma 0.1
  * per-epoch eval, checkpoint with `_best` copy, resume support

TPU-native runtime: one jitted SPMD step over a `data` mesh replaces
DDP/NCCL; host-0 gating replaces rank gating; the dataset shards per
process (DistributedSampler equivalent).
"""

import argparse
import json
import math
import os
import sys
import time
from typing import Optional

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser(description="RD training (TPU)")
    p.add_argument("-m", "--model", default="cnn", help="model architecture")
    p.add_argument("-d", "--dataset", required=True, help="training dataset")
    p.add_argument("-e", "--epochs", type=int, default=350)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("-n", "--num-workers", type=int, default=8)
    p.add_argument("--lambda", dest="lmbda", type=float, default=1e-2)
    p.add_argument("--metric", choices=["mse", "ms-ssim"], default="mse")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--test-batch-size", type=int, default=16)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--milestones", type=int, nargs="*", default=[320, 345])
    p.add_argument("--lr-gamma", type=float, default=0.1)
    p.add_argument("--save", action="store_true", default=True)
    p.add_argument("--save-dir", type=str, default="./ckpt")
    p.add_argument(
        "--ckpt-format", choices=["msgpack", "orbax"], default="msgpack",
        help="msgpack: host-0 single file (reference-shaped); orbax: "
        "collective multi-host sharded save, async, with retention "
        "(resume with --checkpoint <save_dir>)",
    )
    p.add_argument("--checkpoint", type=str, help="resume from checkpoint")
    p.add_argument(
        "--coordinator", type=str, default=None,
        help="multi-host coordinator address (host:port); single-host if unset",
    )
    p.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel ways: shards params + optimizer moments "
        "over a `model` mesh axis (GSPMD; the data axis shrinks to "
        "devices/tp). 1 = pure data parallelism (reference DDP shape)",
    )
    p.add_argument("--log-every", type=int, default=10)
    return p.parse_args(argv)


def save_training_checkpoint(
    save_dir, state, epoch, loss, args, is_best, best_loss=None
):
    if best_loss is None:
        best_loss = loss
    import jax
    from flax import serialization

    from ..zoo.checkpoint import save_checkpoint as save_params_ckpt

    os.makedirs(save_dir, exist_ok=True)
    blob = serialization.to_bytes(
        {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    )
    path = os.path.join(save_dir, "checkpoint.msgpack")
    with open(path, "wb") as f:
        f.write(blob)
    meta = {"epoch": epoch, "loss": float(loss), "best_loss": float(best_loss),
            "model": args.model, "lmbda": args.lmbda,
            # dytrain/train_gd argv have no --metric (matching the
            # reference CLIs); their distortion is fixed-recipe mse
            "metric": getattr(args, "metric", "mse")}
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    # CLI-compatible params-only checkpoint
    save_params_ckpt(
        os.path.join(save_dir, "params.msgpack"), args.model, state.params
    )
    if is_best:
        import shutil

        shutil.copyfile(path, os.path.join(save_dir, "checkpoint_best.msgpack"))
        shutil.copyfile(
            path + ".json", os.path.join(save_dir, "checkpoint_best.msgpack.json")
        )
        save_params_ckpt(
            os.path.join(save_dir, "params_best.msgpack"), args.model, state.params
        )


def restore_training_checkpoint(path, state):
    from flax import serialization

    with open(path, "rb") as f:
        blob = f.read()
    restored = serialization.from_bytes(
        {"params": state.params, "opt_state": state.opt_state, "step": state.step},
        blob,
    )
    state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..datasets import ImageFolder, prefetch_to_device
    from ..parallel import (
        create_mesh,
        data_parallel_shardings,
        is_main_process,
        make_parallel_train_step,
        process_count,
        sync_global_devices,
        tensor_parallel_shardings,
    )
    from ..parallel.mesh import initialize_distributed
    from ..training import create_train_state, make_train_step
    from ..training.state import make_eval_step
    from ..zoo import models

    if args.coordinator:
        initialize_distributed(args.coordinator)

    mesh = create_mesh(batch_size=args.batch_size, model=args.tp)
    n_proc = process_count()
    if args.tp > 1 and n_proc > 1 and args.ckpt_format != "orbax":
        # msgpack saves gather the whole state through flax serialization,
        # which cannot materialize model-axis shards spanning processes —
        # it would crash at the FIRST epoch save, after a full epoch of
        # compute. Fail at startup instead.
        raise SystemExit(
            "--tp > 1 on a multi-host mesh requires --ckpt-format orbax "
            "(collective sharded saves); the default msgpack format "
            "cannot serialize cross-process shards"
        )
    main_proc = is_main_process()
    if main_proc:
        print(f"devices: {mesh.devices.size} ({jax.devices()[0].platform}), "
              f"processes: {n_proc}")

    model = models[args.model]()
    patch = tuple(args.patch_size)
    train_ds = ImageFolder(args.dataset, "train", patch, seed=args.seed)
    test_ds = ImageFolder(args.dataset, "test", patch, seed=args.seed)

    local_batch = args.batch_size // n_proc
    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    boundaries = {}
    for m in args.milestones:
        boundaries[m * steps_per_epoch] = args.lr_gamma
    schedule = optax.piecewise_constant_schedule(args.learning_rate, boundaries)

    state = create_train_state(
        model,
        jax.random.key(args.seed),
        input_shape=(1,) + patch + (3,),
        learning_rate=schedule,
        aux_learning_rate=args.aux_learning_rate,
        clip_max_norm=args.clip_max_norm,
    )

    from .checkpoint import OrbaxCheckpointer, is_orbax_checkpoint

    ckpt_backend = (
        OrbaxCheckpointer(args.save_dir)
        if args.save and args.ckpt_format == "orbax"
        else None
    )

    repl_sh, data_sh = data_parallel_shardings(mesh)
    # --tp > 1: params + optimizer moments shard over the `model` axis.
    # Computed BEFORE any restore: an orbax resume must restore each
    # array directly onto its mesh placement (a fresh single-device
    # state is uncommitted and jit reshards it silently, but RESTORED
    # arrays are committed — a tp jit rejects them, and cross-process
    # shards could not be assembled through one host anyway).
    param_sh = (
        tensor_parallel_shardings(state.params, mesh)
        if args.tp > 1
        else repl_sh
    )
    state_tree_sh = (
        tensor_parallel_shardings(
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step},
            mesh,
        )
        if args.tp > 1
        else None
    )

    last_epoch = 0
    best_loss = float("inf")
    if args.checkpoint and os.path.exists(args.checkpoint):
        if is_orbax_checkpoint(args.checkpoint):
            same_dir = ckpt_backend is not None and os.path.samefile(
                args.checkpoint, args.save_dir
            )
            # a foreign run dir is only READ here — open it read_only so
            # restore can't mkdir/retain/touch manager metadata in it
            rb = (
                ckpt_backend if same_dir
                else OrbaxCheckpointer(args.checkpoint, read_only=True)
            )
            state, meta = rb.restore(state, shardings=state_tree_sh)
            if rb is not ckpt_backend:
                rb.close()
        else:
            state, meta = restore_training_checkpoint(args.checkpoint, state)
        last_epoch = meta.get("epoch", 0) + 1
        # historical best (not the last epoch's loss) guards checkpoint_best
        best_loss = meta.get("best_loss", meta.get("loss", best_loss))
        if main_proc:
            print(f"resumed from {args.checkpoint} at epoch {last_epoch}")
    p_train_step = make_parallel_train_step(
        make_train_step(model, args.lmbda, args.metric), mesh,
        state=state if args.tp > 1 else None,
    )
    p_eval_step = jax.jit(
        make_eval_step(model, args.lmbda, args.metric),
        in_shardings=(param_sh, data_sh),
        out_shardings=repl_sh,
    )
    rng = jax.random.key(args.seed + 1)

    def put_global(batch):
        if n_proc == 1:
            return jax.device_put(batch, data_sh)
        return jax.make_array_from_process_local_data(data_sh, batch)

    try:
        for epoch in range(last_epoch, args.epochs):
            t0 = time.time()
            lr_now = schedule(int(state.step))
            if main_proc:
                print(f"Learning rate: {float(lr_now):.2e}")
            it = train_ds.batches(
                local_batch,
                epoch=epoch,
                num_workers=args.num_workers,
                shard=(jax.process_index(), n_proc),
            )
            # double-buffered H2D: upload batch i+1 while the device runs
            # step i
            for i, batch in enumerate(
                prefetch_to_device(it, size=2, put=put_global)
            ):
                state, metrics = p_train_step(state, batch, rng)
                if main_proc and i % args.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    print(
                        f"Train epoch {epoch}: [{i * args.batch_size}/"
                        f"{len(train_ds)}] "
                        f"Loss: {m['loss']:.4f} | "
                        f"Distortion: {m['distortion']:.5f} | "
                        f"Bpp: {m['bpp_loss']:.3f} | Aux: {m['aux_loss']:.1f}"
                    )

            # per-epoch eval (all hosts compute; host 0 logs/saves).
            # --test-batch-size (reference test_dataloader,
            # train.py:311-318) — was parsed but unused until r4, so the
            # test loop silently ran at the train batch size. Batches
            # stay equal-sized across processes (SPMD assembly needs it);
            # a partial final batch is dropped, so keep the test-set size
            # divisible by test-batch-size for full-set eval.
            local_test_batch = max(args.test_batch_size // n_proc, 1)
            totals, count = {}, 0
            for batch in test_ds.batches(
                local_test_batch, epoch=0, num_workers=args.num_workers,
                shard=(jax.process_index(), n_proc),
            ):
                m = p_eval_step(state.params, put_global(batch))
                for k, v in m.items():
                    totals[k] = totals.get(k, 0.0) + float(v)
                count += 1
            # test_loss already agrees across processes: each eval batch is
            # GLOBAL (put_global assembles every process's shard rows into
            # one sharded array) and p_eval_step's outputs are replicated —
            # so the is_best decision the collective orbax save depends on
            # is identical everywhere, and the loss covers the full test
            # set.
            if count == 0 and main_proc:
                print(
                    "WARNING: test set yielded no full batches "
                    f"(test images per process < {local_test_batch}); "
                    "test loss is inf and no best checkpoint will be kept",
                    file=sys.stderr,
                )
            test_loss = totals.get("loss", float("inf")) / max(count, 1)
            if main_proc:
                print(
                    f"Test epoch {epoch}: loss {test_loss:.4f} "
                    f"(bpp {totals.get('bpp_loss', 0) / max(count, 1):.3f}) "
                    f"[{time.time() - t0:.1f}s]"
                )

            if args.save:
                is_best = test_loss < best_loss
                best_loss = min(test_loss, best_loss)
                if ckpt_backend is not None:
                    # collective: every process participates, each writing
                    # only the shards it owns
                    ckpt_backend.save(
                        state, epoch, test_loss,
                        {"model": args.model, "lmbda": args.lmbda,
                         "metric": args.metric},
                        is_best, best_loss,
                    )
                elif main_proc:
                    save_training_checkpoint(
                        args.save_dir, state, epoch, test_loss, args, is_best,
                        best_loss=best_loss,
                    )
            sync_global_devices("epoch")
    finally:
        # always drain pending async orbax saves — an exception (or ^C)
        # mid-epoch must not abandon an in-flight step directory
        if ckpt_backend is not None:
            ckpt_backend.close()
    return state


if __name__ == "__main__":
    main(sys.argv[1:])
