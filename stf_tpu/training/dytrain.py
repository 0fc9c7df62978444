"""Distillation + dynamic token-pruning training for DYSTF (the reference
`dytrain.py` rebuilt for TPU meshes).

Loss parity (`dytrain.py:33-119`, ConvNextDistillDiffPruningLoss):
  loss = clf_weight * RD(student)
       + ratio_weight * mean_i((keep_ratio_actual_i - target_i)²)
       + distill_weight * KL(log_softmax(x_hat_s) || log_softmax(x_hat_t))
       + distill_weight * MSE(y_s, y_t)

The teacher is the corresponding non-dynamic model (name minus the `dy`
prefix) built with `is_teacher=True` and frozen (`dytrain.py:403-408`).
Schedule: MultiStepLR milestones [500, 700, 900] (`dytrain.py:414`).
"""

import argparse
import os
import sys
import time
from typing import Sequence

import numpy as np


def distill_pruning_loss(
    student_out,
    teacher_out,
    batch,
    lmbda: float,
    keep_ratio: Sequence[float],
    ratio_weight: float = 10.0,
    distill_weight: float = 0.5,
    clf_weight: float = 0.0,
    metric: str = "mse",
):
    import jax.numpy as jnp

    from .losses import rate_distortion_loss

    rd = rate_distortion_loss(student_out, batch, lmbda, metric)

    # keep-ratio regularizer over the Gumbel masks (B, N, 1)
    pred_loss = 0.0
    decisions = student_out["decisions"]
    for i, mask in enumerate(decisions):
        pos_ratio = jnp.mean(mask, axis=1)
        pred_loss = pred_loss + jnp.mean((pos_ratio - keep_ratio[i]) ** 2)

    # KL between log-softmaxes of the reconstructions over the image width
    # axis — the reference's `dim=-1` on NCHW tensors is W
    # (`dytrain.py:88-94`), which is axis=2 in our NHWC layout
    import jax

    log_s = jax.nn.log_softmax(student_out["x_hat"], axis=2)
    log_t = jax.nn.log_softmax(teacher_out["x_hat"], axis=2)
    B = batch.shape[0]
    cls_kl = jnp.sum(jnp.exp(log_t) * (log_t - log_s)) / B

    token_kl = jnp.mean((student_out["y"] - teacher_out["y"]) ** 2)

    n_dec = max(len(decisions), 1)
    loss = (
        clf_weight * rd.loss
        + ratio_weight * pred_loss / n_dec
        + distill_weight * cls_kl
        + distill_weight * token_kl
    )
    return loss, {
        "loss": loss,
        "rd_loss": rd.loss,
        "bpp_loss": rd.bpp_loss,
        "pred_loss": pred_loss,
        "cls_kl": cls_kl,
        "token_kl": token_kl,
    }


def make_dytrain_step(student, teacher, teacher_params, lmbda, keep_ratio,
                      ratio_weight=10.0, distill_weight=0.5, clf_weight=0.0):
    import jax

    def loss_fn(params, batch, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        s_out = student.apply(
            {"params": params}, batch, training=True,
            rngs={"noise": r1, "gumbel": r2, "droppath": r3},
        )
        t_out = jax.lax.stop_gradient(
            teacher.apply({"params": teacher_params}, batch, training=False)
        )
        loss, parts = distill_pruning_loss(
            s_out, t_out, batch, lmbda, keep_ratio,
            ratio_weight, distill_weight, clf_weight,
        )
        aux = student.apply({"params": params}, method="aux_loss")
        parts["aux_loss"] = aux
        return loss + aux, parts

    def step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        state = state.apply_gradients(grads=grads)
        return state, parts

    return step


def parse_args(argv):
    p = argparse.ArgumentParser(description="DYSTF distillation training (TPU)")
    p.add_argument("-m", "--model", default="dystf")
    p.add_argument("-d", "--dataset", required=True)
    p.add_argument("-e", "--epochs", type=int, default=1000)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("-n", "--num-workers", type=int, default=8)
    p.add_argument("--lambda", dest="lmbda", type=float, default=1e-2)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--test-batch-size", type=int, default=16)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--ratio", type=str, default="0.9,0.7,0.5")
    p.add_argument("--ratio-weight", type=float, default=10.0)
    p.add_argument("--distill-weight", type=float, default=0.5)
    p.add_argument("--clf-weight", type=float, default=0.0)
    p.add_argument("--milestones", type=int, nargs="*", default=[500, 700, 900])
    p.add_argument("--save-dir", type=str, default="./ckpt_dy")
    p.add_argument("--checkpoint", type=str)
    p.add_argument("--teacher-checkpoint", type=str)
    p.add_argument("--log-every", type=int, default=10)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import optax

    from ..datasets import ImageFolder
    from ..parallel import create_mesh, data_parallel_shardings
    from ..training import create_train_state
    from ..zoo import models
    from .train import restore_training_checkpoint, save_training_checkpoint

    mesh = create_mesh(batch_size=args.batch_size)
    repl_sh, data_sh = data_parallel_shardings(mesh)

    student = models[args.model]()
    # teacher: the non-dynamic twin (name minus the `dy` prefix)
    teacher = models[args.model[2:]](is_teacher=True)

    keep_ratio = [float(r) for r in args.ratio.split(",")]

    patch = tuple(args.patch_size)
    train_ds = ImageFolder(args.dataset, "train", patch, seed=args.seed)
    test_ds = ImageFolder(args.dataset, "test", patch, seed=args.seed)
    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    boundaries = {m * steps_per_epoch: 0.1 for m in args.milestones}
    schedule = optax.piecewise_constant_schedule(args.learning_rate, boundaries)

    state = create_train_state(
        student, jax.random.key(args.seed), (1,) + patch + (3,),
        learning_rate=schedule,
        aux_learning_rate=args.aux_learning_rate,
        clip_max_norm=args.clip_max_norm,
    )

    # teacher params: from checkpoint if given, else random init (useful only
    # for smoke runs)
    if args.teacher_checkpoint:
        from ..zoo import load_checkpoint

        if args.teacher_checkpoint.endswith((".pth", ".pth.tar", ".pt")):
            from ..zoo.torch_import import load_torch_checkpoint

            teacher, teacher_params = load_torch_checkpoint(
                args.model[2:], args.teacher_checkpoint, is_teacher=True
            )
        else:
            teacher, teacher_params = load_checkpoint(
                args.teacher_checkpoint, args.model[2:]
            )
    else:
        tvars = teacher.init(
            {"params": jax.random.key(1), "noise": jax.random.key(2)},
            jax.numpy.zeros((1,) + patch + (3,)),
            training=False,
        )
        teacher_params = tvars["params"]

    last_epoch = 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        state, meta = restore_training_checkpoint(args.checkpoint, state)
        last_epoch = meta.get("epoch", 0) + 1

    step = jax.jit(
        make_dytrain_step(
            student, teacher, teacher_params, args.lmbda, keep_ratio,
            args.ratio_weight, args.distill_weight, args.clf_weight,
        ),
        in_shardings=(repl_sh, data_sh, repl_sh),
        out_shardings=(repl_sh, repl_sh),
        donate_argnums=(0,),
    )
    rng = jax.random.key(args.seed + 1)

    # eval with the same distill criterion (reference test_epoch), no
    # parameter update; defined once so the jit cache is reused every epoch
    @jax.jit
    def eval_parts(params, batch, rng_):
        r1, r2, r3 = jax.random.split(rng_, 3)
        s_out = student.apply(
            {"params": params}, batch, training=True,
            rngs={"noise": r1, "gumbel": r2, "droppath": r3},
        )
        t_out = teacher.apply(
            {"params": teacher_params}, batch, training=False
        )
        _, parts = distill_pruning_loss(
            s_out, t_out, batch, args.lmbda, keep_ratio,
            args.ratio_weight, args.distill_weight, args.clf_weight,
        )
        return parts

    best_loss = float("inf")
    for epoch in range(last_epoch, args.epochs):
        t0 = time.time()
        for i, batch in enumerate(
            train_ds.batches(args.batch_size, epoch, args.num_workers)
        ):
            state, parts = step(state, jax.device_put(batch, data_sh), rng)
            if i % args.log_every == 0:
                m = {k: float(v) for k, v in parts.items()}
                print(
                    f"dytrain epoch {epoch} [{i}]: loss {m['loss']:.4f} "
                    f"rd {m['rd_loss']:.4f} pred {m['pred_loss']:.5f} "
                    f"kl {m['cls_kl']:.5f} token {m['token_kl']:.5f}"
                )

        totals, count = {}, 0
        for batch in test_ds.batches(args.batch_size, 0, args.num_workers):
            parts = eval_parts(state.params, jax.device_put(batch, data_sh), rng)
            for k, v in parts.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
        test_loss = totals.get("loss", float("inf")) / max(count, 1)
        print(f"dytrain test epoch {epoch}: loss {test_loss:.4f} "
              f"[{time.time() - t0:.1f}s]")

        is_best = test_loss < best_loss
        best_loss = min(test_loss, best_loss)
        save_training_checkpoint(
            args.save_dir, state, epoch, test_loss, args, is_best,
            best_loss=best_loss,
        )

    return state


if __name__ == "__main__":
    main(sys.argv[1:])
