"""2-process JAX worker driven by tests/test_multiprocess.py.

Runs under a REAL jax.distributed cluster (loopback coordinator, 4 virtual
CPU devices per process — VERDICT r4 item 6): the jax.process_count()>1
branches that the single-process 8-device suite can never reach execute
here, and their results are compared against single-process expectations
the parent computed and wrote to a JSON file:

  - parallel/distributed.py OMPI env probing → jax.distributed.initialize
  - calibration._gather_weighted's process_allgather curve reduction,
    both with a split fit set (host-count invariance) and with one EMPTY
    local shard (the zero-curve guard)
  - evals/collect.collect_logits(allow_empty=True) feeding a joint
    temperature fit where one host has no fit batches
  - evals/laplace.fit_last_layer_laplace's cross-host factor-sum reduce,
    split and empty-shard variants
  - cli/builders.build_loaders' forced pad_shards lockstep override under
    a process-spanning mesh (--seq_parallel 2)

usage: multiproc_worker.py <rank> <nprocs> <port> <expect.json> <cifar_root>
"""

import json
import os
import sys


def _make_data(seed=0, n=512, c=10, miscal=3.0):
    """Identical on every host (same derivation as tests/test_calibration)."""
    import jax

    rng = jax.random.PRNGKey(seed)
    rz, rl = jax.random.split(rng)
    z = jax.random.normal(rz, (n, c)) * 2.0
    labels = jax.random.categorical(rl, z, axis=-1)
    return miscal * z, labels


def _laplace_inputs(seed=1, n=384, d=8, c=4):
    import numpy as np

    rs = np.random.RandomState(seed)
    feats = rs.randn(n, d).astype(np.float32)
    kernel = rs.randn(d, c).astype(np.float32) * 0.3
    bias = rs.randn(c).astype(np.float32) * 0.1
    logits = feats @ kernel + bias
    labels = rs.randint(0, c, n)
    return feats, labels, kernel, bias, logits


def laplace_digest(la):
    import numpy as np

    return {
        "n": int(la.n),
        "loglik": float(la.loglik),
        "a_eig_sum": float(np.sum(np.asarray(la.a))),
        "g_eig_sum": float(np.sum(np.asarray(la.g))),
    }


def main():
    rank, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    expect = json.load(open(sys.argv[4]))
    cifar_root = sys.argv[5]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    # bootstrap through OUR env probing (the reference's OMPI rendezvous
    # path, utils.py:263-297 → parallel/distributed.py)
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["OMPI_COMM_WORLD_SIZE"] = str(nprocs)
    os.environ["OMPI_COMM_WORLD_RANK"] = str(rank)
    from uncertainty_vit_tpu.parallel.distributed import init_distributed_mode

    got_rank = init_distributed_mode(suppress_output=False)
    assert got_rank == rank, (got_rank, rank)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == 4
    assert len(jax.devices()) == 4 * nprocs

    import numpy as np

    import jax.numpy as jnp

    from uncertainty_vit_tpu.evals import calibration as CAL

    logits, labels = _make_data()
    t_full = float(expect["t_full"])

    # (1) split fit set: each host holds idx[rank::2]; the weighted-curve
    # allgather must reproduce the single-process full-set fit exactly
    t_split = CAL.fit_temperature(logits[rank::nprocs], labels[rank::nprocs])
    assert abs(t_split - t_full) / t_full < 2e-3, (t_split, t_full)

    # (2) one EMPTY local shard: host 0 holds everything, host 1 nothing
    if rank == 0:
        t_empty = CAL.fit_temperature(logits, labels)
    else:
        t_empty = CAL.fit_temperature(logits[:0], labels[:0])
    assert abs(t_empty - t_full) / t_full < 2e-3, (t_empty, t_full)

    # (3) evaluate_temperature_scaled with NO fit batches on host 1:
    # collect_logits(allow_empty=True) + the joint fit across hosts
    def batches_of(lg, lb, bs=128):
        lg, lb = np.asarray(lg), np.asarray(lb)
        return [
            (lg[i : i + bs], lb[i : i + bs]) for i in range(0, lg.shape[0], bs)
        ]

    eval_b = batches_of(logits[rank::nprocs], labels[rank::nprocs])
    fit_b = batches_of(logits, labels) if rank == 0 else []
    out = CAL.evaluate_temperature_scaled(
        lambda x: jnp.asarray(x), eval_b, fit_batches=fit_b
    )
    assert abs(out["temperature"] - t_full) / t_full < 2e-3, out["temperature"]
    assert np.isfinite(out["nll"]) and np.isfinite(out["ece"])

    # (4) laplace KFAC factor reduction across hosts: split + empty variants
    from uncertainty_vit_tpu.evals import laplace as L

    feats, lab, kernel, bias, _ = _laplace_inputs()
    head = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}
    ff = lambda x: (jnp.asarray(x) @ head["kernel"] + head["bias"], jnp.asarray(x))

    la_split = L.fit_last_layer_laplace(
        ff, head, batches_of(feats[rank::nprocs], lab[rank::nprocs], bs=64)
    )
    for k, v in laplace_digest(la_split).items():
        ref = expect["laplace"][k]
        assert abs(v - ref) <= 1e-3 * max(1.0, abs(ref)), (k, v, ref)

    la_empty = L.fit_last_layer_laplace(
        ff, head, batches_of(feats, lab, bs=64) if rank == 0 else []
    )
    for k, v in laplace_digest(la_empty).items():
        ref = expect["laplace"][k]
        assert abs(v - ref) <= 1e-3 * max(1.0, abs(ref)), (k, v, ref)

    # (5) pad_shards lockstep forcing under a process-spanning mesh
    from uncertainty_vit_tpu.cli import builders as B
    from uncertainty_vit_tpu.cli import finetune as FT

    args = FT.get_args_parser().parse_args(
        ["--model", "beit_test_patch16_32", "--input_size", "32",
         "--data_set", "CIFAR100", "--data_path", cifar_root,
         "--batch_size", "16", "--num_workers", "0", "--seq_parallel", "2"])
    loader, _ = B.build_loaders(args, is_train=False, pad_shards=False,
                                shuffle=False, drop_last=False)
    assert loader.pad_shards is True  # forced: SPMD lockstep
    assert loader.num_hosts == nprocs and loader.host_id == rank
    # equal shard sizes → every host dispatches the same number of batches
    lens = np.asarray(
        jax.experimental.multihost_utils.process_allgather(
            jnp.asarray(len(loader), jnp.int32)
        )
    )
    assert (lens == lens[0]).all(), lens
    # unpadded eval shards (no seq_parallel): union covers the set exactly once
    args2 = FT.get_args_parser().parse_args(
        ["--model", "beit_test_patch16_32", "--input_size", "32",
         "--data_set", "CIFAR100", "--data_path", cifar_root,
         "--batch_size", "16", "--num_workers", "0"])
    loader2, _ = B.build_loaders(args2, is_train=False, shuffle=False,
                                 drop_last=False)
    assert loader2.pad_shards is False
    n_local = sum(int(b[-1].shape[0]) for b in loader2)
    n_total = int(np.asarray(
        jax.experimental.multihost_utils.process_allgather(
            jnp.asarray(n_local, jnp.int32))).sum())
    assert n_total == expect["eval_set_size"], (n_total, expect["eval_set_size"])

    print(f"WORKER_OK rank={rank} t_split={t_split:.5f} t_empty={t_empty:.5f} "
          f"t_joint={out['temperature']:.5f}", flush=True)


if __name__ == "__main__":
    main()
