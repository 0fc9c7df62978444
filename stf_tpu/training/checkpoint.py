"""Training checkpoint backends.

Two formats, selected by `train.py --ckpt-format`:

* **msgpack** (default) — host-0 single-file flax serialization of the
  full train state, with the reference-shaped `_best` copy and a
  params-only sidecar for the eval CLI. Correct for data-parallel meshes
  (params replicated); the whole state must fit on one host. This is the
  direct analog of the reference's `torch.save` checkpoints
  (`train.py:199-204,371-380`).
* **orbax** — the TPU-idiomatic production format (SURVEY.md §5's rebuild
  note): a *collective* multi-host save where every process writes only
  the array shards it owns (so model-parallel state checkpoints without
  ever being gathered to one host), asynchronous (training overlaps the
  flush), with atomic step directories and retention. Layout under
  `<save_dir>/`:

      orbax/<epoch>/        rolling latest (keeps 2)
      orbax_best/<epoch>/   best-by-test-loss (keeps 1)
      params.msgpack        eval-CLI params sidecar, latest epoch
      params_best.msgpack   eval-CLI params sidecar, best test loss

  Resume by passing the save dir itself: `--checkpoint <save_dir>`.

Both backends carry the same metadata (epoch, loss, best_loss, model,
lambda, metric) so resume restores the LR-schedule position and the
best-checkpoint guard identically.
"""

import os
from typing import Any, Dict, Tuple


def _host_params(params):
    """Fetch every params leaf to host NumPy on EVERY process.

    Replicated or fully-addressable leaves convert directly; a
    model-parallel leaf whose shards span processes is collectively
    all-gathered (so this must be called by all processes together —
    it is, from `OrbaxCheckpointer.save`). Keeps the params-only
    msgpack sidecar writable even when the train state itself is
    sharded across hosts."""
    import jax
    import numpy as np

    gathered = None  # lazy: the collective import only when needed

    def fetch(x):
        nonlocal gathered
        if isinstance(x, jax.Array) and not (
            x.is_fully_addressable or x.is_fully_replicated
        ):
            if gathered is None:
                from jax.experimental import multihost_utils

                gathered = multihost_utils.process_allgather
            # tiled=True: reassemble the global value (a cross-process
            # shard gather REQUIRES it — untiled mode raises on global
            # non-fully-addressable arrays; caught by the 2-process TP
            # test, never reachable single-process)
            return np.asarray(gathered(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, params)


def _state_tree(state):
    """The persisted subset of the train state (mirrors the msgpack
    layout in `train.py:save_training_checkpoint`)."""
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }


class OrbaxCheckpointer:
    """Collective async train-state checkpointing via orbax.

    Every process must call `save`/`restore` with the same epoch (the
    caller guarantees agreement by all-reducing the test loss before the
    `is_best` decision). `close()` blocks until pending async saves land.
    """

    LATEST = "orbax"
    BEST = "orbax_best"

    def __init__(self, save_dir: str, read_only: bool = False):
        """`read_only=True` opens an EXISTING checkpoint dir purely for
        restore — no makedirs, no retention sweeps, no manager metadata
        writes (used when resuming from a foreign/shared run dir that
        this process must not modify)."""
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.read_only = bool(read_only)
        self.root = os.path.abspath(save_dir)
        if not self.read_only:
            os.makedirs(self.root, exist_ok=True)
        # The two managers run CONCURRENT async saves of the SAME step
        # (epoch N lands in both `orbax/` and `orbax_best/` whenever
        # is_best fires). Orbax derives its multihost barrier keys from
        # the step number alone, so without distinct barrier namespaces
        # the two commits collide on >=2 processes: one rank crashes with
        # "Barrier _async_write_complete.<step> is already ongoing" and
        # the survivor deadlocks at the next sync (reproduced by
        # tests/test_multiprocess.py::test_two_process_tensor_parallel_orbax).
        # barrier_sync_key_prefix scopes each manager's barriers.
        self._latest = ocp.CheckpointManager(
            os.path.join(self.root, self.LATEST),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=2, read_only=self.read_only,
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    barrier_sync_key_prefix="stf_latest",
                ),
            ),
        )
        self._best = None
        if not self.read_only:
            self._best = ocp.CheckpointManager(
                os.path.join(self.root, self.BEST),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1,
                    multiprocessing_options=ocp.options.MultiprocessingOptions(
                        barrier_sync_key_prefix="stf_best",
                    ),
                ),
            )

    def _composite_save(self, state, meta: Dict):
        ocp = self._ocp
        return ocp.args.Composite(
            state=ocp.args.StandardSave(_state_tree(state)),
            meta=ocp.args.JsonSave(meta),
        )

    def save(self, state, epoch: int, loss: float, meta: Dict,
             is_best: bool, best_loss: float) -> None:
        import jax

        if self.read_only:
            raise RuntimeError(
                f"OrbaxCheckpointer({self.root!r}) was opened read_only"
            )
        meta = dict(
            meta, epoch=int(epoch), loss=float(loss),
            best_loss=float(best_loss),
        )
        self._latest.save(int(epoch), args=self._composite_save(state, meta))
        if is_best:
            self._best.save(int(epoch), args=self._composite_save(state, meta))
        if meta.get("model"):
            # params-only sidecars so the eval CLI / Codec can load this
            # run without orbax: params.msgpack tracks the latest epoch,
            # params_best.msgpack the best test loss (matching the msgpack
            # backend's layout). The host fetch is collective — sharded
            # leaves all-gather across processes — so EVERY process
            # executes it; only host 0 writes the files.
            host_params = _host_params(state.params)
            if jax.process_index() == 0:
                from ..zoo.checkpoint import save_checkpoint as save_params_ckpt

                save_params_ckpt(
                    os.path.join(self.root, "params.msgpack"),
                    meta["model"], host_params,
                )
                if is_best:
                    save_params_ckpt(
                        os.path.join(self.root, "params_best.msgpack"),
                        meta["model"], host_params,
                    )

    def restore(self, state, shardings=None) -> Tuple[Any, Dict]:
        """Restore the newest step from `orbax/` into `state`'s structure.

        `shardings` (optional): a pytree of NamedShardings matching
        `_state_tree(state)`. When given, each array restores DIRECTLY
        onto its mesh placement (each process reads only the shards it
        owns — the collective mirror of the collective save). Without
        it, leaves restore with the template arrays' own (typically
        single-device, committed) shardings — which a tensor-parallel
        jit then REJECTS as a sharding mismatch, so model-parallel
        resumes must pass it (caught by the 2-process TP test)."""
        step = self._latest.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no orbax checkpoint under {self.root}/{self.LATEST}"
            )
        ocp = self._ocp
        import jax

        template = _state_tree(state)
        if shardings is not None:
            template = jax.tree_util.tree_map(
                lambda a, s: (
                    jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s)
                    if hasattr(a, "shape") and hasattr(a, "dtype")
                    else a
                ),
                template,
                shardings,
            )
        restored = self._latest.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        tree = restored["state"]
        meta = dict(restored["meta"] or {})
        state = state.replace(
            params=tree["params"],
            opt_state=tree["opt_state"],
            step=int(tree["step"]),
        )
        return state, meta

    def close(self) -> None:
        self._latest.wait_until_finished()
        self._latest.close()
        if self._best is not None:
            self._best.wait_until_finished()
            self._best.close()


def is_orbax_checkpoint(path: str) -> bool:
    """True if `path` is a train.py save dir with an orbax checkpoint
    (used by the `--checkpoint` resume dispatch)."""
    return os.path.isdir(os.path.join(path, OrbaxCheckpointer.LATEST))
