"""Pipelined eval readback (evals/collect.py): ordering, drain, windowing."""

import numpy as np
import pytest

from uncertainty_vit_tpu.evals.collect import collect_logits, pipelined_pairs


def test_order_and_drain():
    pairs = [(np.full((2, 3), i, np.float32), np.array([i, i])) for i in range(7)]
    outs = list(pipelined_pairs(iter(pairs), depth=2))
    assert len(outs) == 7
    for i, (lg, lb) in enumerate(outs):
        assert (lg == i).all() and (lb == i).all()


def test_dispatch_runs_ahead_of_readback():
    """With depth=2 the 3rd dispatch happens before the 1st readback —
    verified by interleaving a dispatch log with a readback log."""
    log = []

    class Tracked:
        def __init__(self, i):
            self.i = i

        def __array__(self, dtype=None):
            log.append(("read", self.i))
            return np.zeros((1, 2), dtype or np.float32)

    def stream():
        for i in range(5):
            log.append(("dispatch", i))
            yield Tracked(i), np.array([i])

    list(pipelined_pairs(stream(), depth=2))
    # first readback must come after the 3rd dispatch
    assert log.index(("read", 0)) > log.index(("dispatch", 2))
    # and every batch is read exactly once, in order
    reads = [e[1] for e in log if e[0] == "read"]
    assert reads == list(range(5))


def test_collect_logits_shapes_and_empty():
    batches = [
        (np.ones((4, 3), np.float32) * i, np.arange(4) + i) for i in range(3)
    ]
    logits, labels = collect_logits(lambda x: x * 2.0, batches)
    assert logits.shape == (12, 3) and labels.shape == (12,)
    np.testing.assert_allclose(logits[4:8], 2.0)
    with pytest.raises(ValueError, match="empty"):
        collect_logits(lambda x: x, [])
