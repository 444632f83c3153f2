"""Dump optimized HLO for the train-mode forward, quant=none vs int8,
and summarize data-movement ops (copy/transpose/convert/fusion) with big
shapes — to find what XLA does differently around the Pallas int8 calls.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/dump_quant_hlo.py [site]
"""

import re
import sys

from uncertainty_vit_tpu.cli.common import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.core.config import get_preset
from uncertainty_vit_tpu.models.vit import VisionTransformer
from uncertainty_vit_tpu.ops import quant as Q

BATCH = 128
_real_supported = Q.supported


def hlo(quant, depth=2):
    cfg = get_preset("beit_base_patch16_224", use_shared_rel_pos_bias=True,
                     drop_path_rate=0.1, init_values=0.1, quant=quant,
                     depth=depth)
    model = VisionTransformer(cfg=cfg, dtype=jnp.bfloat16)
    images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 224, 224, 3))
    params = jax.eval_shape(
        lambda r: model.init(r, images), jax.random.PRNGKey(0)
    )["params"]
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )
    rngs = {"dropout": jax.random.PRNGKey(4), "droppath": jax.random.PRNGKey(5),
            "quant": jax.random.PRNGKey(6)}

    def fwd(params, images):
        return model.apply({"params": params}, images, None,
                           deterministic=False, rngs=rngs)

    return jax.jit(fwd).lower(params, images).compile().as_text()


def summarize(txt, label):
    print(f"==== {label} ====", flush=True)
    interesting = []
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"%?\S+ = (\S+?)\[([\d,]*)\]\S* (\w+)", line)
        if not m:
            continue
        dtype, shape, op = m.groups()
        if op in ("fusion", "copy", "transpose", "convert", "custom-call",
                  "bitcast", "reshape", "dot"):
            dims = [int(d) for d in shape.split(",") if d]
            size = 1
            for d in dims:
                size *= d
            bytes_ = size * (4 if dtype.startswith(("f32", "s32", "u32")) else
                             2 if dtype.startswith(("bf16", "f16")) else 1)
            if bytes_ >= 4_000_000:
                interesting.append((bytes_, op, dtype, shape,
                                    line.split(" calls=")[0][:160]))
    interesting.sort(reverse=True)
    from collections import Counter
    c = Counter((op, dtype, shape) for _, op, dtype, shape, _ in interesting)
    for (op, dtype, shape), cnt in sorted(c.items(), key=lambda kv: -kv[1]):
        print(f"  {cnt:3d}x {op:12s} {dtype}[{shape}]", flush=True)
    total = sum(b for b, *_ in interesting)
    print(f"  total big-op bytes: {total/1e9:.2f} GB across "
          f"{len(interesting)} ops", flush=True)


def main():
    site = sys.argv[1] if len(sys.argv) > 1 else "fc2"
    summarize(hlo("none"), "none")
    if site != "none":
        preds = {
            "qkv": lambda m, k, n: k == 768 and n == 2304,
            "proj": lambda m, k, n: k == 768 and n == 768,
            "fc1": lambda m, k, n: k == 768 and n == 3072,
            "fc2": lambda m, k, n: k == 3072,
            "all": lambda m, k, n: True,
        }
        pred = preds[site]
        Q.supported = lambda m, k, n: _real_supported(m, k, n) and pred(m, k, n)
        summarize(hlo("int8"), f"int8-{site}")
        Q.supported = _real_supported


if __name__ == "__main__":
    main()
