"""Bisect the int8 composed-forward regression by quantized matmul site.

bench_quant_step measured int8-fwd-only at 145.3 ms/step vs 107.9 bf16 even
though every kernel beats bf16 in isolation (profile_quant.py). This times
the TRAIN-MODE FORWARD ONLY (no grad) with the int8 path enabled per site:
qkv (768->2304), proj (768->768), fc1 (768->3072), fc2 (3072->768), all,
none. Whichever site carries the slowdown is the composition bug.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_quant_fwd.py
"""

import time

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_vit_tpu.core.config import get_preset
from uncertainty_vit_tpu.models.vit import VisionTransformer
from uncertainty_vit_tpu.ops import quant as Q

BATCH = 128

_real_supported = Q.supported

SITES = {
    "flat-only": lambda m, k, n: False,  # 2-D trunk layout, zero int8 sites
    "qkv": lambda m, k, n: k == 768 and n == 2304,
    "proj": lambda m, k, n: k == 768 and n == 768,
    "fc1": lambda m, k, n: k == 768 and n == 3072,
    "fc2": lambda m, k, n: k == 3072,
    "all": lambda m, k, n: True,
}


def timeit(fn, args, label, iters=30, warmup=3):
    t0 = time.perf_counter()
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    tw = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    t = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:10s} {t:8.2f} ms/fwd   (warm {tw:.0f}s)", flush=True)
    return t


def main(impl="pallas"):
    Q.FWD = impl
    images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 224, 224, 3))
    rngs = {"dropout": jax.random.PRNGKey(4), "droppath": jax.random.PRNGKey(5),
            "quant": jax.random.PRNGKey(6)}

    def build(quant):
        cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                         drop_path_rate=0.1, init_values=0.1, quant=quant)
        model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images)["params"]

        @jax.jit
        def fwd(params, images):
            return model.apply({"params": params}, images, None,
                               deterministic=False, rngs=rngs)
        return fwd, params

    fwd, params = build("none")
    timeit(fwd, (params, images), "none")

    for site, pred in SITES.items():
        Q.supported = lambda m, k, n, _p=pred: _real_supported(m, k, n) and _p(m, k, n)
        fwd, params = build("int8")
        timeit(fwd, (params, images), site)
    Q.supported = _real_supported


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "pallas")
