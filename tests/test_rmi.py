"""RMI loss: f32-on-TPU numerics vs a float64 torch oracle
(SURVEY §7 hard part #2)."""
import numpy as np
import pytest

pytestmark = pytest.mark.oracle  # torch-reference tier (slow)
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpuseg.losses.rmi import rmi_loss

B, H, W, C = 2, 32, 32, 5
RADIUS, POOL = 3, 4


def torch_rmi_f64(logits_np, labels_np, num_classes=C, radius=RADIUS,
                  pool=POOL, pos_alpha=5e-4):
    """Reference RMI math in float64 torch (loss/rmi.py:82-215)."""
    logits = torch.from_numpy(logits_np).permute(0, 3, 1, 2).double()
    labels = torch.from_numpy(labels_np).long()
    mask = (labels < num_classes).double()
    onehot = F.one_hot(labels.clamp(max=num_classes - 1) *
                       (labels < num_classes).long(), num_classes)
    onehot = onehot.double() * mask.unsqueeze(-1)

    # BCE part
    lflat = logits.permute(0, 2, 3, 1).reshape(-1, num_classes)
    tflat = onehot.reshape(-1, num_classes)
    wflat = mask.reshape(-1, 1)
    bce = F.binary_cross_entropy_with_logits(
        lflat, tflat, weight=wflat, reduction="sum") / (mask.sum() + 1.0)

    probs = torch.sigmoid(logits) * mask.unsqueeze(1) + 1e-6
    oh = onehot.permute(0, 3, 1, 2)
    pad = pool // 2
    oh = F.avg_pool2d(oh, pool, pool, pad)
    probs = F.avg_pool2d(probs, pool, pool, pad)

    h, w = oh.shape[2:]
    nh, nw = h - radius + 1, w - radius + 1
    la = torch.stack([oh[:, :, y:y + nh, x:x + nw]
                      for y in range(radius) for x in range(radius)], dim=2)
    pr = torch.stack([probs[:, :, y:y + nh, x:x + nw]
                      for y in range(radius) for x in range(radius)], dim=2)
    d = radius * radius
    la = la.reshape(B, num_classes, d, -1)
    pr = pr.reshape(B, num_classes, d, -1)
    la = la - la.mean(dim=3, keepdim=True)
    pr = pr - pr.mean(dim=3, keepdim=True)
    la_cov = la @ la.transpose(2, 3)
    pr_cov = pr @ pr.transpose(2, 3)
    eye = torch.eye(d).double()
    pr_cov_inv = torch.inverse(pr_cov + eye * pos_alpha)
    la_pr_cov = la @ pr.transpose(2, 3)
    appro_var = la_cov - la_pr_cov @ pr_cov_inv @ la_pr_cov.transpose(2, 3)
    chol = torch.linalg.cholesky(appro_var + eye * pos_alpha)
    logdet = 2.0 * torch.log(torch.diagonal(chol, dim1=-2, dim2=-1) + 1e-8).sum(-1)
    rmi_per_class = (0.5 * logdet).mean(dim=0) / float(d)
    return 0.5 * float(bce) + 0.5 * float(rmi_per_class.sum())


@pytest.fixture
def inputs(rng):
    logits = (2.0 * rng.randn(B, H, W, C)).astype(np.float32)
    labels = rng.randint(0, C, (B, H, W)).astype(np.int32)
    labels[:, :3, :] = 255
    return logits, labels


def test_rmi_f32_matches_f64_oracle(inputs):
    logits, labels = inputs
    got = float(rmi_loss(jnp.asarray(logits), jnp.asarray(labels),
                         num_classes=C))
    want = torch_rmi_f64(logits, labels)
    # f32 vs f64 through a Cholesky chain: expect ~1e-3 agreement
    assert abs(got - want) < 5e-3 * max(1.0, abs(want)), (got, want)


def test_rmi_bce_only_matches(inputs):
    logits, labels = inputs
    got = float(rmi_loss(jnp.asarray(logits), jnp.asarray(labels),
                         num_classes=C, do_rmi=False))
    lflat = torch.from_numpy(logits).reshape(-1, C)
    mask = (torch.from_numpy(labels) < C)
    onehot = F.one_hot(torch.from_numpy(labels).long().clamp(max=C - 1) *
                       mask.long(), C).float() * mask.reshape(B, H, W, 1)
    want = F.binary_cross_entropy_with_logits(
        lflat, onehot.reshape(-1, C),
        weight=mask.reshape(-1, 1).float(), reduction="sum") / \
        (mask.sum() + 1.0)
    assert abs(got - float(want)) < 1e-4


def test_rmi_gradients_finite_and_stable(inputs):
    """Gradient flows in f32 without NaN through the Cholesky chain — the
    failure mode the reference dodged with f64 (loss/rmi.py:171-172)."""
    logits, labels = inputs
    g = jax.grad(lambda lg: rmi_loss(lg, jnp.asarray(labels),
                                     num_classes=C))(jnp.asarray(logits))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() < 1e3


def test_rmi_near_singular_stability(rng):
    """Uniform single-class labels make covariances near-singular; the
    jitter must keep f32 finite."""
    logits = np.zeros((1, H, W, C), dtype=np.float32)
    labels = np.zeros((1, H, W), dtype=np.int32)
    val = float(rmi_loss(jnp.asarray(logits), jnp.asarray(labels),
                         num_classes=C))
    assert np.isfinite(val)
    g = jax.grad(lambda lg: rmi_loss(lg, jnp.asarray(labels),
                                     num_classes=C))(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()


def test_rmi_matches_real_reference_module(inputs):
    """Oracle = the ACTUAL importable reference RMILoss (loss/rmi.py),
    not a transcription: a shared misreading of the reference math by
    implementation and test author cannot pass this one. CPU-only shims:
    apex/runx stubs (tools/torch_reference.install_stubs) and
    torch.cuda.DoubleTensor -> torch.DoubleTensor (rmi.py:171-172 is the
    reference's only CUDA-typed line)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    sys.path.insert(0, "/root/reference")
    from torch_reference import install_stubs
    install_stubs()
    import torch
    torch.cuda.DoubleTensor = torch.DoubleTensor  # CPU shim
    from loss.rmi import RMILoss

    logits_np, labels_np = inputs
    crit = RMILoss(num_classes=C, rmi_radius=RADIUS, rmi_pool_way=1,
                   rmi_pool_size=POOL, rmi_pool_stride=POOL,
                   ignore_index=255)
    want = float(crit(
        torch.from_numpy(logits_np).permute(0, 3, 1, 2).float(),
        torch.from_numpy(labels_np).long()))
    got = float(rmi_loss(jnp.asarray(logits_np), jnp.asarray(labels_np),
                         num_classes=C, radius=RADIUS, pool_size=POOL))
    assert abs(got - want) < 5e-3 * max(1.0, abs(want)), (got, want)

    # aux path (do_rmi=False -> BCE-only) against the real module too
    want_bce = float(crit(
        torch.from_numpy(logits_np).permute(0, 3, 1, 2).float(),
        torch.from_numpy(labels_np).long(), do_rmi=False))
    got_bce = float(rmi_loss(jnp.asarray(logits_np),
                             jnp.asarray(labels_np), num_classes=C,
                             radius=RADIUS, pool_size=POOL, do_rmi=False))
    assert abs(got_bce - want_bce) < 1e-3 * max(1.0, abs(want_bce))
