"""Embedding extraction and visualization.

Provides the `visualize_embeddings` capability the reference imports but
does not ship (run_class_finetuning.py:44 imports a module missing from the
repo — SURVEY.md §0): extract pooled backbone features over a dataset and
write TensorBoard-projector TSVs plus an optional 2-D PCA scatter.
"""

from __future__ import annotations

import os
from typing import Any, Iterable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def extract_embeddings(
    model, variables: Any, batches: Iterable, max_items: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Pooled pre-head features ([N, D]) + labels via head_type='none'-style
    forward. Works for any model whose cfg can drop the head; for the
    classification model we rebuild with head_type='none' sharing params."""
    from uncertainty_vit_tpu.models.vit import VisionTransformer

    cfg = model.cfg.replace(head_type="none")
    feat_model = VisionTransformer(cfg=cfg, dtype=getattr(model, "dtype", jnp.float32))
    fwd = jax.jit(lambda v, x: feat_model.apply(v, x, deterministic=True))

    from uncertainty_vit_tpu.evals.collect import pipelined_pairs

    pairs = ((fwd(variables, b[0]), b[-1]) for b in batches)
    feats, labels = [], []
    count = 0
    for f, lbls in pipelined_pairs(pairs):
        feats.append(f)
        labels.append(lbls)
        count += len(lbls)
        if max_items is not None and count >= max_items:
            break  # stops pulling the dispatch generator too
    return np.concatenate(feats)[:max_items], np.concatenate(labels)[:max_items]


def pca_2d(feats: np.ndarray) -> np.ndarray:
    x = feats - feats.mean(0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T


def visualize_embedding(
    model,
    variables: Any,
    batches: Iterable,
    output_dir: str,
    tag: str = "embeddings",
    max_items: int = 2000,
) -> str:
    """Write <output_dir>/<tag>.tsv + <tag>_labels.tsv (TensorBoard projector
    format) and <tag>_pca.png when matplotlib is available. Returns the
    directory written."""
    os.makedirs(output_dir, exist_ok=True)
    feats, labels = extract_embeddings(model, variables, batches, max_items)

    np.savetxt(os.path.join(output_dir, f"{tag}.tsv"), feats, delimiter="\t", fmt="%.6f")
    np.savetxt(os.path.join(output_dir, f"{tag}_labels.tsv"), labels, fmt="%d")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        xy = pca_2d(feats)
        plt.figure(figsize=(8, 8))
        plt.scatter(xy[:, 0], xy[:, 1], c=labels, s=4, cmap="tab20", alpha=0.7)
        plt.title(f"{tag} (PCA)")
        plt.savefig(os.path.join(output_dir, f"{tag}_pca.png"), dpi=120)
        plt.close()
    except Exception:
        pass
    return output_dir
