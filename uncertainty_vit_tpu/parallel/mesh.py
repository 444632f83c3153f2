"""Device mesh construction and sharding rules.

Replaces the reference's NCCL/DDP/DeepSpeed wiring (SURVEY.md §2.9) with
single-controller SPMD: one Mesh with ('data', 'model') axes; the gradient
all-reduce over 'data' is emitted by XLA from the batch sharding; tensor
parallelism over 'model' is a set of parameter PartitionSpecs, so TP is a
config change rather than a rewrite (the reference has DP only,
run_cyclical.py:515-519).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def create_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    seq_parallel: int = 1,
) -> Mesh:
    """data × (optional) seq × (optional) model axes over the devices.

    The 'seq' axis is the context-parallel extension for 384/512 inputs
    (SURVEY §5.7): shard token activations P(data, seq, None) and XLA
    inserts the attention all-gathers over ICI. With seq_parallel=1 the
    axis is size 1 and every spec degenerates to the 2-D layout."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % (model_parallel * seq_parallel) == 0, (n, model_parallel, seq_parallel)
    arr = np.asarray(devices).reshape(
        n // (model_parallel * seq_parallel), seq_parallel, model_parallel
    )
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    return P(DATA_AXIS)


def token_spec() -> P:
    """[B, N, C] activations: batch over data, tokens over seq."""
    return P(DATA_AXIS, SEQ_AXIS, None)


def param_spec(path: tuple, leaf: Any) -> P:
    """Tensor-parallel PartitionSpecs for the ViT param tree.

    Megatron-style column/row split along 'model': qkv and MLP fc1 kernels
    shard the output dim, attention proj and fc2 kernels shard the input dim;
    everything else (norms, biases, embeddings) is replicated. With
    model_parallel=1 these all reduce to replication.
    """
    names = [str(getattr(p, "key", p)) for p in path]
    leafname = names[-1] if names else ""
    if leafname == "qkv_kernel":
        return P(None, MODEL_AXIS)
    if len(names) >= 2 and leafname == "kernel":
        owner = names[-2]
        if owner in ("fc1",):
            return P(None, MODEL_AXIS)
        if owner in ("fc2", "proj") and "patch_embed" not in names:
            return P(MODEL_AXIS, None)
    return P()


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = False) -> Any:
    """Device-put the param tree with its shardings (replicated unless
    tensor_parallel)."""

    def put(path, leaf):
        spec = param_spec(path, leaf) if tensor_parallel else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = False) -> Any:
    def shard(path, leaf):
        spec = param_spec(path, leaf) if tensor_parallel else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(shard, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, include_seq: bool = False) -> Any:
    """Shard the leading (batch) dim over the data axis — or over the
    (data × seq) product when include_seq (pure data parallelism using all
    devices of a 3-axis mesh whose seq axis is otherwise idle)."""
    spec = P((DATA_AXIS, SEQ_AXIS)) if include_seq else P(DATA_AXIS)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec)), batch
    )
