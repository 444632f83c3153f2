"""True multi-process coverage (VERDICT r4 item 6): launch 2 local JAX
processes over a loopback coordinator (4 virtual CPU devices each) and run
tests/multiproc_worker.py in both — the jax.process_count()>1 branches in
evals/calibration.py, evals/laplace.py, evals/collect.py,
cli/builders.build_loaders, and parallel/distributed.py execute for real,
with results compared against single-process expectations computed here.
"""

import json
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cifar")
    base = root / "cifar-100-python"
    base.mkdir()
    rs = np.random.RandomState(0)
    for name, n in (("train", 64), ("test", 56)):
        data = rs.randint(0, 255, (n, 3072), dtype=np.uint8)
        labels = (np.arange(n) % 10).tolist()
        with open(base / name, "wb") as f:
            pickle.dump({b"data": data, b"fine_labels": labels}, f)
    return str(root)


@pytest.fixture(scope="module")
def expectations(tmp_path_factory):
    """Single-process reference values for the workers to match."""
    from tests.multiproc_worker import _laplace_inputs, _make_data, laplace_digest
    from uncertainty_vit_tpu.evals import calibration as CAL
    from uncertainty_vit_tpu.evals import laplace as L

    logits, labels = _make_data()
    t_full = CAL.fit_temperature(logits, labels)

    feats, lab, kernel, bias, _ = _laplace_inputs()
    head = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}
    ff = lambda x: (jnp.asarray(x) @ head["kernel"] + head["bias"], jnp.asarray(x))
    batches = [
        (feats[i : i + 64], lab[i : i + 64]) for i in range(0, feats.shape[0], 64)
    ]
    la = L.fit_last_layer_laplace(ff, head, batches)

    path = tmp_path_factory.mktemp("exp") / "expect.json"
    path.write_text(json.dumps({
        "t_full": float(t_full),
        "laplace": laplace_digest(la),
        "eval_set_size": 56,
    }))
    return str(path)


def test_two_process_cluster(expectations, cifar_root):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), "2", str(port),
             expectations, cifar_root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"WORKER_OK rank={rank}" in out, out[-2000:]

    # the joint fit must agree ACROSS hosts (same gathered curve)
    def t_of(out, key):
        line = [l for l in out.splitlines() if l.startswith("WORKER_OK")][0]
        return float(dict(f.split("=") for f in line.split()[1:])[key])

    assert t_of(outs[0], "t_joint") == pytest.approx(t_of(outs[1], "t_joint"))
    assert t_of(outs[0], "t_split") == pytest.approx(t_of(outs[1], "t_split"))
