"""Loss-library parity vs torch reference math (SURVEY.md §2.4)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from uncertainty_vit_tpu.ops import losses as L


def test_smooth_l1_matches_torch():
    rs = np.random.RandomState(0)
    a = rs.randn(50, 8).astype(np.float32)
    b = rs.randn(50, 8).astype(np.float32)
    for beta in (0.12, 2.0):
        ours = np.asarray(L.smooth_l1(jnp.asarray(a), jnp.asarray(b), beta)).mean()
        theirs = F.smooth_l1_loss(torch.tensor(a), torch.tensor(b), beta=beta).item()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_masked_regression_equals_gathered_mean():
    rs = np.random.RandomState(1)
    pred = rs.randn(4, 10, 8).astype(np.float32)
    tgt = rs.randn(4, 10, 8).astype(np.float32)
    mask = (rs.rand(4, 10) < 0.4).astype(np.float32)

    ours = float(L.masked_regression_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask), beta=2.0))
    sel = mask.reshape(-1).astype(bool)
    theirs = F.smooth_l1_loss(
        torch.tensor(pred.reshape(-1, 8)[sel]), torch.tensor(tgt.reshape(-1, 8)[sel]), beta=2.0
    ).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_variance_hinge_matches_torch_unbiased():
    rs = np.random.RandomState(2)
    pred = rs.randn(4, 10, 8).astype(np.float32)
    mask = (rs.rand(4, 10) < 0.5).astype(np.float32)
    margin = 0.5

    ours = float(L.masked_variance_hinge(jnp.asarray(pred), jnp.asarray(mask), margin))
    sel = mask.reshape(-1).astype(bool)
    z0 = torch.sqrt(torch.tensor(pred.reshape(-1, 8)[sel]).var(dim=0) + 1e-6)
    theirs = (torch.sum(F.relu(margin - z0)) / z0.size(0)).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_soft_target_ce_and_label_smoothing():
    rs = np.random.RandomState(3)
    logits = rs.randn(6, 10).astype(np.float32)
    labels = rs.randint(0, 10, 6)
    soft = rs.rand(6, 10).astype(np.float32)
    soft = soft / soft.sum(-1, keepdims=True)

    ours = float(L.soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(soft)))
    theirs = torch.sum(
        -torch.tensor(soft) * F.log_softmax(torch.tensor(logits), dim=-1), dim=-1
    ).mean().item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    ours_ls = float(L.label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.1))
    logp = F.log_softmax(torch.tensor(logits), dim=-1)
    nll = F.nll_loss(logp, torch.tensor(labels))
    theirs_ls = (0.9 * nll + 0.1 * (-logp.mean(dim=-1)).mean()).item()
    np.testing.assert_allclose(ours_ls, theirs_ls, rtol=1e-5)


def test_wasserstein_losses_match_torch():
    rs = np.random.RandomState(4)
    m, c = rs.randn(12, 8).astype(np.float32), rs.randn(12, 8).astype(np.float32)
    pm, pc = rs.randn(12, 8).astype(np.float32), rs.randn(12, 8).astype(np.float32)
    nm, nc = rs.randn(12, 8).astype(np.float32), rs.randn(12, 8).astype(np.float32)

    def wd(a, b, c_, d):
        ret = torch.sum((a - b) ** 2, -1)  # placeholder, replaced below
        return ret

    def torch_wdist(m1, c1, m2, c2):
        ret = torch.sum((m1 - m2) * (m1 - m2), -1)
        c1s = torch.sqrt(torch.clamp(c1, min=1e-24))
        c2s = torch.sqrt(torch.clamp(c2, min=1e-24))
        return ret + torch.sum((c1s - c2s) * (c1s - c2s), -1)

    # pretrain loss (distloss.py:7-30)
    tm, tc = torch.sigmoid(torch.tensor(m)), torch.sigmoid(torch.tensor(c))
    tpm, tpc = torch.sigmoid(torch.tensor(pm)), torch.sigmoid(torch.tensor(pc))
    pos = torch_wdist(tm, tc, tpm, tpc)
    pos = pos / torch.max(torch.abs(pos))
    lss = -torch.log(torch.sigmoid(-pos + 1e-24))
    lss = lss / torch.max(torch.abs(lss))
    expected = (torch.sum(lss) * 1e-5).item()
    ours = float(L.wasserstein_pretrain_loss(*map(jnp.asarray, (m, c, pm, pc))))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)

    # finetune loss (distloss.py:33-70)
    tnm, tnc = torch.sigmoid(torch.tensor(nm)), torch.sigmoid(torch.tensor(nc))
    posd = torch_wdist(tm, tc, tpm, tpc)
    negd = torch_wdist(tm, tc, tnm, tnc)
    pvnd = torch_wdist(tpm, tpc, tnm, tnc)
    posd = posd / torch.max(torch.abs(posd))
    negd = negd / torch.max(torch.abs(negd))
    pvnd = pvnd / torch.max(torch.abs(pvnd))
    rank = -torch.log(torch.sigmoid(negd - posd + 1e-24))
    rank = rank / torch.max(torch.abs(rank)) * 1e-4
    pvn = torch.clamp(posd - pvnd, 0)
    pvn = pvn / torch.max(torch.abs(pvn)) * 1e-4
    expected_ft = (torch.sum(rank) + torch.sum(pvn)).item()
    ours_ft = float(L.wasserstein_finetune_loss(*map(jnp.asarray, (m, c, pm, pc, nm, nc))))
    np.testing.assert_allclose(ours_ft, expected_ft, rtol=1e-4)


def test_wasserstein_distance_matmul_diag_consistency():
    """All-pairs kernel diagonal == elementwise distance on sigmoid inputs."""
    rs = np.random.RandomState(5)
    m = rs.randn(2, 6, 8).astype(np.float32)
    c = rs.randn(2, 6, 8).astype(np.float32)
    allpairs = np.asarray(L.wasserstein_distance_matmul(*map(jnp.asarray, (m, c, m, c))))
    diag = np.stack([np.diag(allpairs[i]) for i in range(2)])
    np.testing.assert_allclose(diag, 0.0, atol=1e-5)


def test_mim_cross_entropy():
    rs = np.random.RandomState(6)
    logits = rs.randn(2, 10, 16).astype(np.float32)
    ids = rs.randint(0, 16, (2, 10))
    mask = (rs.rand(2, 10) < 0.5).astype(np.float32)
    loss, acc = L.masked_mim_cross_entropy(jnp.asarray(logits), jnp.asarray(ids), jnp.asarray(mask))
    sel = mask.reshape(-1).astype(bool)
    theirs = F.cross_entropy(
        torch.tensor(logits.reshape(-1, 16)[sel]), torch.tensor(ids.reshape(-1)[sel])
    ).item()
    np.testing.assert_allclose(float(loss), theirs, rtol=1e-5)
    assert 0.0 <= float(acc) <= 1.0
