"""Minimal timm/torchvision stand-ins so the REAL reference model files
execute on CPU (VERDICT r3 next-step #3: direct-import parity, killing the
transcription-error doubt class that inline re-derivations cannot).

The reference imports timm only for five small utilities
(modeling_finetune.py:20-21): drop_path, to_2tuple, trunc_normal_,
register_model, create_model. Those are re-implemented here with timm's
semantics (timm/models/layers/drop.py + weight_init.py, public Apache-2.0
API surface — behavior, not copied code). Everything else the transitive
imports touch (timm.data.Mixup, timm.utils, torchvision, the reference's own
heavyweight utils.py/tin.py) is stubbed: it is only needed so that
`uncertainty_evaluations` (whose wasserstein_distance_matmul the dist models
genuinely use) can be imported, never executed.
"""

from __future__ import annotations

import math
import sys
import types

import torch

REFERENCE_DIR = "/root/reference"


def _to_2tuple(x):
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x, x)


def _trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    """timm trunc_normal_ (inverse-CDF method)."""

    def norm_cdf(x):
        return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

    with torch.no_grad():
        lo = norm_cdf((a - mean) / std)
        hi = norm_cdf((b - mean) / std)
        tensor.uniform_(2 * lo - 1, 2 * hi - 1)
        tensor.erfinv_()
        tensor.mul_(std * math.sqrt(2.0))
        tensor.add_(mean)
        tensor.clamp_(min=a, max=b)
        return tensor


def _drop_path(x, drop_prob=0.0, training=False):
    """timm drop_path: per-sample stochastic depth."""
    if drop_prob == 0.0 or not training:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    random_tensor = keep_prob + torch.rand(shape, dtype=x.dtype, device=x.device)
    random_tensor.floor_()
    return x.div(keep_prob) * random_tensor


_registry = {}


def _register_model(fn):
    _registry[fn.__name__] = fn
    return fn


def _create_model(name, pretrained=False, **kwargs):
    # newer timm always passes pretrained_cfg/-_overlay; the reference's
    # registry fns pop them unconditionally (modeling_finetune.py:1222-1223)
    kwargs.setdefault("pretrained_cfg", None)
    kwargs.setdefault("pretrained_cfg_overlay", None)
    return _registry[name](pretrained=pretrained, **kwargs)


def _permissive_module(name):
    mod = types.ModuleType(name)
    mod.__getattr__ = lambda attr: type(attr, (), {})  # lazy dummy class
    return mod


def _install_stubs():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    data = types.ModuleType("timm.data")
    constants = types.ModuleType("timm.data.constants")
    utils_mod = types.ModuleType("timm.utils")

    layers.drop_path = _drop_path
    layers.to_2tuple = _to_2tuple
    layers.trunc_normal_ = _trunc_normal_
    registry.register_model = _register_model
    models.create_model = _create_model
    models.layers = layers
    models.registry = registry
    data.Mixup = type("Mixup", (), {})
    constants.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    constants.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    constants.IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
    constants.IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)
    data.constants = constants
    utils_mod.accuracy = lambda *a, **k: None
    utils_mod.ModelEma = type("ModelEma", (), {})
    utils_mod.get_state_dict = lambda m, *a: m.state_dict()
    timm.models = models
    timm.data = data
    timm.utils = utils_mod

    sys.modules.update({
        "timm": timm,
        "timm.models": models,
        "timm.models.layers": layers,
        "timm.models.registry": registry,
        "timm.data": data,
        "timm.data.constants": constants,
        "timm.utils": utils_mod,
    })

    for tv_name in ("torchvision", "torchvision.datasets",
                    "torchvision.transforms", "torchmetrics"):
        sys.modules.setdefault(tv_name, _permissive_module(tv_name))

    # the reference's own heavyweight side modules: import-time stubs only
    # (uncertainty_evaluations.py:23,32 — load_model_for_ensembles and
    # TinyImageNetC are never called by the model code under test)
    ref_utils = types.ModuleType("utils")
    ref_utils.load_model_for_ensembles = lambda *a, **k: None
    sys.modules.setdefault("utils", ref_utils)
    tin = types.ModuleType("tin")
    tin.TinyImageNetC = type("TinyImageNetC", (), {})
    sys.modules.setdefault("tin", tin)


_cache = None


def load_reference():
    """Import and return (modeling_finetune, modeling_cyclical) — the REAL
    files from /root/reference, executing under the shims above."""
    global _cache
    if _cache is not None:
        return _cache
    _install_stubs()
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import modeling_finetune  # noqa: F401 (the real reference file)
        import modeling_cyclical  # noqa: F401
    finally:
        sys.path.remove(REFERENCE_DIR)
    _cache = (modeling_finetune, modeling_cyclical)
    return _cache


def load_reference_module(name):
    """Import one more REAL reference module under the same shims
    (modeling_finetune_dist / modeling_pretrain / modeling_cyclical_joint —
    VERDICT r4 item 5). modeling_finetune must load first: it installs the
    shared registry entries and the modeling_finetune_try import chain."""
    load_reference()
    import importlib

    sys.path.insert(0, REFERENCE_DIR)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(REFERENCE_DIR)
