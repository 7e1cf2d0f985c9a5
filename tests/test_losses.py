"""Loss parity vs torch oracles (the reference math re-expressed in torch)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tpuseg.losses import (
    cross_entropy,
    image_weighted_cross_entropy,
    relaxed_soft_nll,
)

B, H, W, C = 2, 8, 10, 5


@pytest.fixture
def logits_labels(rng):
    logits = rng.randn(B, H, W, C).astype(np.float32)
    labels = rng.randint(0, C, (B, H, W)).astype(np.int32)
    labels[labels == 0] = 255  # ignore pixels
    return logits, labels


def test_cross_entropy_matches_torch(logits_labels):
    logits, labels = logits_labels
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = F.nll_loss(
        F.log_softmax(torch.from_numpy(logits).permute(0, 3, 1, 2), dim=1),
        torch.from_numpy(labels).long(), ignore_index=255).item()
    assert abs(got - want) < 1e-5


def test_image_weighted_ce_matches_torch(logits_labels):
    """Oracle = reference ImageBasedCrossEntropyLoss2d semantics
    (loss/utils.py:70-118): per-image histc weights, summed per-image
    weighted-mean NLLs."""
    logits, labels = logits_labels
    got = float(image_weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), upper_bound=1.0))

    tl = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tt = torch.from_numpy(labels).long()
    want = 0.0
    for i in range(B):
        bins = torch.histc(tt[i].float(), bins=C, min=0.0, max=C)
        hist_norm = bins.float() / bins.sum()
        w = ((bins != 0).float() * 1.0 * (1.0 - hist_norm)) + 1.0
        want += F.nll_loss(F.log_softmax(tl[i:i + 1], dim=1), tt[i:i + 1],
                           weight=w, ignore_index=255).item()
    assert abs(got - want) < 1e-4


def test_relaxed_soft_nll_single_hot_positive(rng):
    """With single-hot targets the relaxed loss reduces to weighted CE-like
    values; sanity: positive, finite, ignore plumbed through."""
    logits = rng.randn(1, H, W, C).astype(np.float32)
    labels = rng.randint(0, C, (1, H, W))
    onehot = np.eye(C + 1, dtype=np.float32)[labels]  # (1,H,W,C+1)
    loss = float(relaxed_soft_nll(jnp.asarray(logits), jnp.asarray(onehot)))
    assert np.isfinite(loss) and loss > 0


def test_relaxed_soft_nll_matches_reference_math(rng):
    """Oracle = reference ImgWtLossSoftNLL at bs=1 (loss/utils.py:179-231),
    where its batch-broadcast bug is inert."""
    logits = rng.randn(1, H, W, C).astype(np.float32)
    # multi-hot borders: base labels + extra acceptable class on a stripe
    labels = rng.randint(0, C, (1, H, W))
    target = np.eye(C + 1, dtype=np.float32)[labels]
    target[0, :4, :, 1] = 1.0          # border region accepts class 1 too
    target[0, 5, :, :] = 0.0
    target[0, 5, :, C] = 1.0           # an ignore row

    got = float(relaxed_soft_nll(jnp.asarray(logits), jnp.asarray(target)))

    inp = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tgt = torch.from_numpy(target).permute(0, 3, 1, 2)
    border_weights = tgt[:, :-1].sum(1)
    ignore_mask = border_weights == 0
    bw = border_weights.clone()
    bw[ignore_mask] = 1
    hist = tgt[0, :-1].sum(dim=(1, 2)) / tgt[0].sum()
    # note: reference hist uses all C+1 channels then drops the last;
    # denominator includes ignore mass
    hist_full = tgt[0].sum(dim=(1, 2)) / tgt[0].sum()
    cw = ((hist_full != 0).float() * 1.0 * (1.0 - hist_full)) + 1.0
    cw = cw[:-1]
    soft = F.softmax(inp, dim=1)
    smax = torch.log(torch.max(
        soft, tgt[:, :-1] * (soft * tgt[:, :-1]).sum(1, keepdim=True)))
    wts = cw.unsqueeze(0).unsqueeze(2).unsqueeze(3)
    loss_matrix = (-1 / bw * (tgt[:, :-1] * wts * smax).sum(1)) * \
        (1.0 - ignore_mask.float())
    want = loss_matrix.sum() / (1 * H * W - ignore_mask.sum() + 1)
    assert abs(got - float(want)) < 1e-4


def test_ce_gradient_flow(logits_labels):
    import jax
    logits, labels = logits_labels
    g = jax.grad(lambda lg: cross_entropy(lg, jnp.asarray(labels)))(
        jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    # ignored pixels contribute zero gradient
    mask = labels == 255
    np.testing.assert_array_equal(np.asarray(g)[mask], 0.0)


def test_loss_factory_dispatch_all_types(rng):
    """Every shipped loss_type builds through get_loss and produces a
    finite scalar — a factory kwarg/config-field mismatch must fail here,
    not at the first real training launch."""
    import jax.numpy as _jnp

    from tpuseg.config import make_config
    from tpuseg.losses import get_loss

    logits = _jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    labels = _jnp.asarray(rng.randint(0, C, (B, H, W)).astype(np.int32))
    relaxed = _jnp.asarray(
        np.eye(C + 1, dtype=np.uint8)[np.asarray(labels)])

    for loss_type in ("ce", "img_wt", "rmi", "relaxed"):
        cfg = make_config({"loss.loss_type": loss_type,
                           "dataset.num_classes": C})
        crit, val_crit = get_loss(cfg)
        target = relaxed if loss_type == "relaxed" else labels
        v = float(crit(logits, target))
        assert np.isfinite(v), (loss_type, v)
        assert np.isfinite(float(val_crit(logits, labels))), loss_type
        if loss_type == "rmi":  # the do_rmi=False aux path too
            assert np.isfinite(float(crit(logits, labels, do_rmi=False)))
