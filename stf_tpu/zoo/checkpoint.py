"""Native checkpoint save/load (msgpack params + JSON config sidecar).

Training checkpoints with full optimizer state are flax-serialized msgpack
(`stf_tpu/training/train.py:save_training_checkpoint`); this module is the
lightweight format for published/eval checkpoints — the analog of the
reference's `state_dict`-only .pth.tar files.
"""

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from .registry import models


def save_checkpoint(
    path: str, model_name: str, params, model_kwargs: Optional[dict] = None
) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    meta = {"model": model_name, "kwargs": model_kwargs or {}}
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_any_checkpoint(
    path: str, model_name: Optional[str] = None, **model_kwargs
) -> Tuple[Any, Dict]:
    """Format dispatch: native msgpack checkpoints or reference torch
    `.pth`/`.pth.tar` state dicts (imported via `zoo/torch_import.py`)."""
    if path.endswith((".pth", ".pth.tar", ".pt")):
        if model_name is None:
            raise ValueError("model_name required for torch checkpoints")
        from .torch_import import load_torch_checkpoint

        return load_torch_checkpoint(model_name, path, **model_kwargs)
    return load_checkpoint(path, model_name)


def load_checkpoint(path: str, model_name: Optional[str] = None) -> Tuple[Any, Dict]:
    """Returns (model, params). Model name/kwargs come from the sidecar
    unless overridden. A `prune_export` checkpoint (identified by its
    `.deps.json` sidecar) reconstructs the pruned-width CC_GD — the
    reference's production path for pruned models is evaluating
    `pruned_model.pth` through the same eval CLI (`train_gd.py:507-565`)."""
    if os.path.exists(path + ".deps.json"):
        from ..training.train_gd import load_pruned_checkpoint

        return load_pruned_checkpoint(path)
    meta_path = path + ".json"
    kwargs: Dict = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        model_name = model_name or meta["model"]
        kwargs = meta.get("kwargs", {})
    if model_name is None:
        raise ValueError("model_name required (no sidecar found)")
    model = models[model_name](**kwargs)

    # Build a template param tree, then restore into it.
    import jax.numpy as jnp

    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 256, 256, 3), jnp.float32),
        training=False,
    )
    with open(path, "rb") as f:
        params = serialization.from_bytes(variables["params"], f.read())
    return model, params
