"""Device mesh + sharding rules (GSPMD via jax.sharding).

The reference has no distributed layer at all (SURVEY.md §2.3: single
`cuda:0`, no torch.distributed). Here parallelism is first-class:

- axis "data": batch-sharded data parallelism — gradient all-reduce rides
  ICI automatically once inputs are sharded and params are replicated or
  tensor-sharded.
- axis "model": Megatron-style tensor parallelism over the wide matmuls —
  the Conformer FFN (d_model × d_ff with d_ff=2048 dominates FLOPs) is
  column-sharded on w1 / row-sharded on w2, and the per-exit vocab heads
  are column-sharded. XLA inserts the (reduce-)scatter/all-gather
  collectives.

Everything is expressed as NamedSharding over a Mesh; no hand-written
collectives on this path (Pallas ring collectives live in ops/pallas for
kernels that need them).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
# data parallelism ACROSS slices (DCN): only batch/gradient traffic rides
# this axis — params are replicated over it, tensor sharding stays on the
# intra-slice ICI axes
REPLICA_AXIS = "replica"


def make_mesh(devices: Optional[Sequence] = None, *, dp: Optional[int] = None,
              tp: int = 1, dcn: int = 1) -> Mesh:
    """Mesh over the given (default: all) devices.

    dcn=1 (single slice): shape (dp, tp) with axes (data, model).
    dcn>1 (multi-slice): shape (dcn, dp, tp) with axes (replica, data,
    model) — the outermost axis maps across slices so the only
    collectives crossing DCN are the gradient all-reduces of pure data
    parallelism; tensor-parallel collectives stay on ICI.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (tp * dcn)
    assert dcn * dp * tp == n, \
        f"dcn({dcn}) * dp({dp}) * tp({tp}) != n_devices({n})"
    if dcn > 1:
        arr = np.asarray(devices).reshape(dcn, dp, tp)
        return Mesh(arr, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_hybrid_mesh(*, tp: int = 1) -> Mesh:
    """Multi-slice mesh for a real multi-process TPU environment: one
    `replica` entry per slice (DCN), (data, model) within each slice
    (ICI), using mesh_utils' DCN-aware device assignment. Falls back to
    `make_mesh` on a single slice/host."""
    n_slices = getattr(jax.devices()[0], "num_slices", 1) or 1
    if n_slices <= 1:
        return make_mesh(tp=tp)
    from jax.experimental import mesh_utils
    per_slice = len(jax.devices()) // n_slices
    arr = mesh_utils.create_hybrid_device_mesh(
        (1, per_slice // tp, tp), (n_slices, 1, 1))
    return Mesh(arr, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_axes(mesh: Mesh) -> tuple:
    """Mesh axes the batch dimension is sharded over."""
    return tuple(a for a in (REPLICA_AXIS, DATA_AXIS)
                 if a in mesh.axis_names)


# --------------------------------------------------------------------------
# Parameter sharding rules (path-name based)
# --------------------------------------------------------------------------

def _path_names(path) -> list[str]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return names


def param_pspec(path, leaf) -> P:
    """PartitionSpec for a parameter leaf, by its pytree path.

    Rules (leading stacked-layer axes are never sharded):
      ffn w1 (…, d, ff)    -> shard ff on MODEL_AXIS (column parallel)
      ffn w2 (…, ff, d)    -> shard ff on MODEL_AXIS (row parallel)
      ffn b of w1 (…, ff)  -> shard on MODEL_AXIS
      head w (…, d, V)     -> shard V on MODEL_AXIS
      head b (…, V)        -> shard V on MODEL_AXIS
      everything else      -> replicated
    """
    names = _path_names(path)
    ndim = getattr(leaf, "ndim", 0)

    def spec_last(axis_name):
        return P(*([None] * (ndim - 1) + [axis_name]))

    def spec_second_last(axis_name):
        return P(*([None] * (ndim - 2) + [axis_name, None]))

    in_ffn = any(n in ("ffn1", "ffn2") for n in names)
    in_heads = any(n in ("heads", "head", "out_linear", "ctc_heads",
                         "out_heads") for n in names)
    leaf_name = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""

    if in_ffn and parent == "w1" and leaf_name == "w" and ndim >= 2:
        return spec_last(MODEL_AXIS)
    if in_ffn and parent == "w1" and leaf_name == "b":
        return spec_last(MODEL_AXIS)
    if in_ffn and parent == "w2" and leaf_name == "w" and ndim >= 2:
        return spec_second_last(MODEL_AXIS)
    if in_heads and leaf_name == "w" and ndim >= 2:
        return spec_last(MODEL_AXIS)
    if in_heads and leaf_name == "b":
        return spec_last(MODEL_AXIS)
    return P()


def shard_params(params, mesh: Mesh):
    """device_put every param leaf with its rule-derived NamedSharding."""
    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, param_pspec(path, leaf)))
    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard every batch leaf along its leading (batch) axis — over
    (replica, data) on a multi-slice mesh, data alone on a single slice."""
    axes = batch_axes(mesh)
    def place(leaf):
        spec = P(axes, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree)
