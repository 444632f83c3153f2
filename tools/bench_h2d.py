"""Raw host→device transfer bandwidth of the active backend.

Round-5 context: `bench_loop.py` measured the sustained finetune loop at
174 img/s (fused) while the bare step runs at 1205 img/s on-device. Each
loop step ships a fresh uint8 [256, 256, 256, 3] batch (50.3 MB); at
174 img/s that implies ~34 MB/s into the chip. This tool measures that
bandwidth directly — device_put of the loop's exact batch shape plus a
size ladder — so a collapsed loop number can be attributed to the tunnel
(infra) vs the pipeline (code). Under the axon remote-tunnel backend,
host↔device traffic rides the tunnel; jax.block_until_ready is a silent
no-op there, so each timing closes with a scalar readback of a device-side
reduction (the readback result is 8 bytes — D2H cost is noise at these
sizes).

Prints one JSON line per size: sustained MB/s over --iters transfers.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--smoke", action="store_true", help="CPU self-test")
    args = ap.parse_args()

    if args.smoke:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    sizes = [
        ("1MB_u8", (1 << 20,), np.uint8),
        ("8MB_u8", (8 << 20,), np.uint8),
        ("loop_batch_u8", (256, 256, 256, 3), np.uint8),  # bench_loop's shape
        ("50MB_f32", (50 << 18,), np.float32),
    ]
    if args.smoke:
        sizes = [("1MB_u8", (1 << 20,), np.uint8)]
        args.iters = 2

    # tiny jitted reduction: forces the transferred buffer to be consumed
    # on-device; its scalar output is the sync point
    consume = jax.jit(lambda x: jnp.sum(x[..., :1].astype(jnp.int32)))

    rs = np.random.RandomState(0)
    for name, shape, dt in sizes:
        host = [
            (rs.randint(0, 256, shape).astype(dt)
             if dt == np.uint8 else rs.rand(*shape).astype(dt))
            for _ in range(2)
        ]
        mb = host[0].nbytes / 1e6
        float(consume(jax.device_put(host[0])))  # warm: compile + first put
        t0 = time.perf_counter()
        for i in range(args.iters):
            float(consume(jax.device_put(host[i % 2])))
        dt_s = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"h2d_bandwidth_{name}",
            "mb_per_transfer": round(mb, 1),
            "value": round(args.iters * mb / dt_s, 1),
            "unit": "MB/s",
            "iters": args.iters,
        }), flush=True)


if __name__ == "__main__":
    main()
