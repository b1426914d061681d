"""Checkpointing: atomic save/load, save-on-best, checkpoint averaging.

Parity surface:
- file naming `mod{epoch:03d}-transformer` (model) and
  `lr{epoch:03d}-transformer` (optimizer + schedule step), as produced by
  train.py:122-128 and consumed by util/model_utils.py:15-48.
- `avg_models(dir, start, end)` averages every existing epoch checkpoint in
  [start, end] leaf-wise (util/model_utils.py:28-46).

TPU-native differences: checkpoints are msgpack-serialized JAX pytrees
(flax.serialization) written atomically (tmp + rename) — the reference's
torch.save can leave partial files; resume state includes the optimizer
pytree and the step counter in one artifact.
"""

from __future__ import annotations

import os
import re
import tempfile
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(tree: Any, path: str) -> None:
    """Atomic msgpack write."""
    data = serialization.to_bytes(_to_host(tree))
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_pytree(template: Any, path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _to_device(tree: Any) -> Any:
    """flax.serialization returns HOST numpy leaves; anything that later
    passes them as jit ARGUMENTS re-uploads the full model every call
    (measured: 62 MB/dispatch for the reference-dims model — ~1 s per
    pooled streaming round over the axon relay). Commit leaves to the
    default device once at load."""
    return jax.tree_util.tree_map(jnp.asarray, tree)


def model_ckpt_path(directory: str, epoch: int) -> str:
    return os.path.join(directory, f"mod{epoch:03d}-transformer")


def opt_ckpt_path(directory: str, epoch: int) -> str:
    return os.path.join(directory, f"lr{epoch:03d}-transformer")


def save_epoch(directory: str, epoch: int, params, model_state,
               opt_state=None, step=None) -> None:
    save_pytree({"params": params, "model_state": model_state},
                model_ckpt_path(directory, epoch))
    if opt_state is not None:
        save_pytree({"opt_state": opt_state, "step": step},
                    opt_ckpt_path(directory, epoch))


def load_epoch(directory: str, epoch: int, params_template,
               model_state_template):
    tree = _to_device(load_pytree({"params": params_template,
                                   "model_state": model_state_template},
                                  model_ckpt_path(directory, epoch)))
    return tree["params"], tree["model_state"]


def load_model_file(path: str, params_template, model_state_template):
    tree = _to_device(load_pytree({"params": params_template,
                                   "model_state": model_state_template},
                                  path))
    return tree["params"], tree["model_state"]


def avg_models(directory: str, start: int, end: int, params_template,
               model_state_template):
    """Leaf-wise average of epoch checkpoints in [start, end]; missing
    epochs are skipped (util/model_utils.py:28-41 behavior)."""
    if start > end:
        raise ValueError("avg_model_start must be <= avg_model_end")
    acc = None
    dtypes = None
    count = 0

    def _up(a):
        # accumulate wide: summing a window of bf16 checkpoints in bf16
        # loses mantissa (the reference sums fp32 torch tensors). NOTE
        # jnp.issubdtype, not np: ml_dtypes floats (bfloat16) are not
        # np.floating, and missing them here would SUM instead of
        # average (the pre-fix behavior for bf16 leaves).
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(np.float64)
        if jnp.issubdtype(a.dtype, jnp.integer):
            return a.astype(np.int64)
        return a

    for epoch in range(start, end + 1):
        path = model_ckpt_path(directory, epoch)
        if epoch != start and not os.path.exists(path):
            continue
        tree = load_pytree({"params": params_template,
                            "model_state": model_state_template}, path)
        tree = _to_host(tree)
        if acc is None:
            dtypes = jax.tree_util.tree_map(lambda a: a.dtype, tree)
            acc = jax.tree_util.tree_map(_up, tree)
        else:
            acc = jax.tree_util.tree_map(lambda a, b: a + _up(b), acc,
                                         tree)
        count += 1
    if acc is None:
        raise FileNotFoundError(f"no checkpoints in [{start},{end}] under "
                                f"{directory}")
    avg = jax.tree_util.tree_map(
        lambda a, dt: (a / count).astype(dt)
        if jnp.issubdtype(dt, jnp.floating)
        else (a // count).astype(dt) if jnp.issubdtype(dt, jnp.integer)
        else a, acc, dtypes)
    avg = _to_device(avg)
    return avg["params"], avg["model_state"]


_CKPT_RE = re.compile(r"mod(\d+)-transformer$")


def saved_epochs(directory: str) -> list:
    """Sorted epoch numbers with a model checkpoint on disk. Parsed by
    regex, not a fixed 3-digit slice: `mod%03d` widens to 4 digits at
    epoch 1000, and a slice parse would mis-sort (and mis-prune) it."""
    if not os.path.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        m = _CKPT_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def prune_old(directory: str, keep_last: int, protect=()) -> list:
    """Delete model+optimizer checkpoints older than the newest
    `keep_last` SAVED epochs (train.py saves only improving epochs, so
    retention counts saved files, not epoch indices). keep_last <= 0
    keeps everything (the reference keeps every epoch —
    train.py:122-128 — which at reference scale is ~1 GB/epoch and
    fills a disk on long runs). Epochs in `protect` are never deleted.
    Returns the pruned epoch numbers."""
    if keep_last <= 0:
        return []
    epochs = saved_epochs(directory)
    victims = [e for e in epochs[:-keep_last] if e not in set(protect)]
    for e in victims:
        for path in (model_ckpt_path(directory, e),
                     opt_ckpt_path(directory, e)):
            if os.path.exists(path):
                os.unlink(path)
    return victims


def latest_epoch(directory: str) -> Optional[int]:
    """Scan for the newest saved epoch (auto-resume; replaces the
    vestigial resume at train.py:97-111)."""
    if not os.path.isdir(directory):
        return None
    epochs = saved_epochs(directory)
    return epochs[-1] if epochs else None
