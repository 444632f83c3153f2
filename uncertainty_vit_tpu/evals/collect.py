"""Pipelined device→host logits collection for the eval loops.

Every eval path used to call np.asarray(logits) immediately after each
forward — a host sync per batch that serializes dispatch with compute
(the same step↔readback serialization the round-4 loop fusion removed
from training; note jax.block_until_ready is a silent no-op under the
axon TPU platform, so the np.asarray readback IS the sync point). A
2-deep window keeps the device ~2 batches ahead: the forward of batch
i+2 overlaps the readback of batch i.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Tuple

import numpy as np


def per_call_rng(rng0):
    """Stateful fresh-key stream: each call returns fold_in(rng0, i) for
    i = 0, 1, 2, … — the shared wrapper for eval dispatches that must draw
    fresh randomness per batch (MC-dropout masks, het-head noise, Laplace
    MC link) without correlating draws across the dataset."""
    import jax

    counter = iter(range(1 << 30))
    return lambda: jax.random.fold_in(rng0, next(counter))


def pipelined_pairs(
    pairs: Iterable[Tuple[object, object]], depth: int = 2
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """(device_logits, labels) stream → (host_logits f32, host_labels),
    reading back `depth` batches behind the dispatch front."""
    pending: "collections.deque" = collections.deque()
    for dev, lbl in pairs:
        pending.append((dev, lbl))
        if len(pending) > depth:
            d, l = pending.popleft()
            yield np.asarray(d, np.float32), np.asarray(l)
    while pending:
        d, l = pending.popleft()
        yield np.asarray(d, np.float32), np.asarray(l)


def collect_logits(
    forward, batches, allow_empty: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Run `forward` over (images, ..., labels) batches with the pipelined
    window; returns concatenated (logits, labels). allow_empty=True returns
    zero-length arrays instead of raising — for multi-host fit paths where
    one host's (unpadded) shard may legitimately be empty and raising would
    strand the other hosts inside a collective."""
    pairs = ((forward(batch[0]), batch[-1]) for batch in batches)
    outs = list(pipelined_pairs(pairs))
    if not outs:
        if allow_empty:
            return np.zeros((0, 0), np.float32), np.zeros((0,), np.int64)
        raise ValueError("collect_logits got an empty batch stream")
    return (
        np.concatenate([o[0] for o in outs]),
        np.concatenate([o[1] for o in outs]),
    )
