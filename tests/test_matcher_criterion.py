"""Matcher and criterion parity tests.

The matcher is compared against a direct numpy transcription of the reference
cost formulas (`src/models/matcher.py:175-212` image, `:46-121` clip) +
scipy LSA. The focal label loss is compared against a torch transcription of
the reference loss (`src/models/criterion.py:106-135`).
"""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from devis_tpu.models.matcher import hungarian_match_image, hungarian_match_clip
from devis_tpu.models.criterion import (image_losses, image_criterion,
                                        clip_losses, clip_criterion,
                                        sigmoid_focal_loss)


def _np_giou(b1, b2):
    # b1 (N,4) xyxy, b2 (M,4) -> (N, M)
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None] - inter
    iou = inter / union
    ltc = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rbc = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    whc = np.clip(rbc - ltc, 0, None)
    areac = whc[..., 0] * whc[..., 1]
    return iou - (areac - union) / areac


def _cxcywh_to_xyxy(b):
    out = b.copy()
    out[..., 0] = b[..., 0] - b[..., 2] / 2
    out[..., 1] = b[..., 1] - b[..., 3] / 2
    out[..., 2] = b[..., 0] + b[..., 2] / 2
    out[..., 3] = b[..., 1] + b[..., 3] / 2
    return out


class TestImageMatcher:
    def test_vs_reference_numpy(self, rng):
        B, Q, K, N = 2, 12, 7, 4
        logits = rng.randn(B, Q, K).astype(np.float32)
        boxes = rng.rand(B, Q, 4).astype(np.float32) * 0.5 + 0.25
        tgt_labels = rng.randint(0, K, size=(B, N)).astype(np.int32)
        tgt_boxes = (rng.rand(B, N, 4).astype(np.float32) * 0.5 + 0.25)
        n_valid = [3, 4]
        valid = np.zeros((B, N), bool)
        for b, n in enumerate(n_valid):
            valid[b, :n] = True

        src_idx = np.asarray(hungarian_match_image(
            jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(tgt_labels),
            jnp.asarray(tgt_boxes), jnp.asarray(valid),
            cost_class=2.0, cost_bbox=5.0, cost_giou=2.0, focal_loss=True))

        # reference formulas in numpy
        alpha, gamma = 0.25, 2.0
        for b in range(B):
            prob = 1 / (1 + np.exp(-logits[b]))
            neg = (1 - alpha) * prob ** gamma * (-np.log(1 - prob + 1e-8))
            pos = alpha * (1 - prob) ** gamma * (-np.log(prob + 1e-8))
            nb = n_valid[b]
            cls = pos[:, tgt_labels[b, :nb]] - neg[:, tgt_labels[b, :nb]]
            l1 = np.abs(boxes[b][:, None] - tgt_boxes[b, :nb][None]).sum(-1)
            giou = -_np_giou(_cxcywh_to_xyxy(boxes[b]),
                             _cxcywh_to_xyxy(tgt_boxes[b, :nb]))
            cost = 5.0 * l1 + 2.0 * cls + 2.0 * giou
            row, col = linear_sum_assignment(cost)
            expected = dict(zip(col, row))
            for n in range(nb):
                assert src_idx[b, n] == expected[n], (b, n)


class TestClipMatcher:
    def test_vs_reference_numpy(self, rng):
        T, Nq, K, N = 3, 6, 5, 2
        logits = rng.randn(1, T * Nq, K).astype(np.float32)
        boxes = (rng.rand(1, T * Nq, 4).astype(np.float32) * 0.5 + 0.25)
        labels = rng.randint(0, K, size=(N,)).astype(np.int32)
        tboxes = (rng.rand(N, T, 4).astype(np.float32) * 0.5 + 0.25)
        valid = np.ones((N, T), bool)

        traj_idx = np.asarray(hungarian_match_clip(
            jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(tboxes), jnp.asarray(valid), T,
            cost_class=2.0, cost_bbox=5.0, cost_giou=2.0))

        alpha, gamma = 0.25, 2.0
        prob = 1 / (1 + np.exp(-logits[0].reshape(T, Nq, K)))
        neg = (1 - alpha) * prob ** gamma * (-np.log(1 - prob + 1e-8))
        pos = alpha * (1 - prob) ** gamma * (-np.log(prob + 1e-8))
        cls_full = pos - neg                      # (T, Nq, K)
        pboxes = boxes[0].reshape(T, Nq, 4)
        cost = np.zeros((Nq, N))
        for n in range(N):
            cls = cls_full[:, :, labels[n]].mean(0)
            l1 = np.abs(pboxes - tboxes[n][:, None]).mean((0, -1))
            gious = np.zeros(Nq)
            for q in range(Nq):
                g = [np.diag(_np_giou(_cxcywh_to_xyxy(pboxes[t, q:q + 1]),
                                      _cxcywh_to_xyxy(tboxes[n, t:t + 1])))[0]
                     for t in range(T)]
                gious[q] = -np.mean(g)
            cost[:, n] = 2.0 * cls + 5.0 * l1 + 2.0 * gious
        row, col = linear_sum_assignment(cost)
        expected = dict(zip(col, row))
        for n in range(N):
            assert traj_idx[n] == expected[n]


class TestCriterion:
    def _torch_focal_label_loss(self, logits, target_classes, num_boxes,
                                num_classes, alpha=0.25):
        import torch
        import torch.nn.functional as F
        src = torch.from_numpy(logits).double()
        tc = torch.from_numpy(target_classes).long()
        onehot = torch.zeros([src.shape[0], src.shape[1], src.shape[2] + 1],
                             dtype=src.dtype)
        onehot.scatter_(2, tc.unsqueeze(-1), 1)
        onehot = onehot[:, :, :-1]
        prob = src.sigmoid()
        ce = F.binary_cross_entropy_with_logits(src, onehot, reduction="none")
        p_t = prob * onehot + (1 - prob) * (1 - onehot)
        loss = ce * ((1 - p_t) ** 2)
        alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
        loss = alpha_t * loss
        return (loss.mean(1).sum() / num_boxes * src.shape[1]).item()

    def test_label_loss_parity(self, rng):
        B, Q, K = 2, 10, 6       # K = num_classes + 1 logits
        num_classes = K - 1
        logits = rng.randn(B, Q, K)
        labels = np.array([[1, 3], [2, 0]], dtype=np.int32)
        valid = np.ones((B, 2), bool)
        src_idx = np.array([[4, 7], [0, 9]], dtype=np.int32)
        num_boxes = 4.0

        outputs = {"pred_logits": jnp.asarray(logits),
                   "pred_boxes": jnp.zeros((B, Q, 4))}
        targets = {"labels": jnp.asarray(labels),
                   "boxes": jnp.zeros((B, 2, 4)),
                   "valid": jnp.asarray(valid)}
        losses = image_losses(outputs, targets, jnp.asarray(src_idx),
                              num_boxes, num_classes)

        # Reference fills background with its logit count → scatter lands in
        # the dropped one-hot column (all-zero background target).
        tc = np.full((B, Q), K, dtype=np.int64)
        for b in range(B):
            for n in range(2):
                tc[b, src_idx[b, n]] = labels[b, n]
        expected = self._torch_focal_label_loss(logits, tc, num_boxes, num_classes)
        np.testing.assert_allclose(float(losses["loss_ce"]), expected, rtol=1e-5)

    def test_empty_targets_finite(self):
        B, Q, K, N = 1, 8, 5, 3
        outputs = {"pred_logits": jnp.zeros((B, Q, K)),
                   "pred_boxes": jnp.full((B, Q, 4), 0.5)}
        targets = {"labels": jnp.zeros((B, N), jnp.int32),
                   "boxes": jnp.full((B, N, 4), 0.5),
                   "valid": jnp.zeros((B, N), bool)}
        losses = image_criterion(outputs, targets, K - 1,
                                 dict(cost_class=2.0, cost_bbox=5.0,
                                      cost_giou=2.0))
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        assert float(losses["loss_bbox"]) == 0.0
        assert float(losses["loss_giou"]) == 0.0

    def test_clip_criterion_runs_and_boxes_cover_invalid_frames(self, rng):
        T, Nq, K, N = 3, 4, 5, 2
        outputs = {"pred_logits": jnp.asarray(rng.randn(1, T * Nq, K)),
                   "pred_boxes": jax.nn.sigmoid(jnp.asarray(rng.randn(1, T * Nq, 4)))}
        labels = jnp.asarray([1, 2], jnp.int32)
        boxes = jax.nn.sigmoid(jnp.asarray(rng.randn(N, T, 4)))
        valid = jnp.asarray([[True, False, True], [True, True, True]])
        targets = {"labels": labels, "boxes": boxes, "valid": valid,
                   "exists": jnp.asarray([True, True])}
        losses = clip_criterion(outputs, targets, K - 1, T,
                                dict(cost_class=2.0, cost_bbox=5.0,
                                     cost_giou=2.0))
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        # Invalid frames still contribute to the box loss (reference quirk):
        # altering the box target at the invalid (0, 1) frame changes loss_bbox.
        targets2 = dict(targets)
        targets2["boxes"] = boxes.at[0, 1].set(boxes[0, 1] * 0.5)
        losses2 = clip_criterion(outputs, targets2, K - 1, T,
                                 dict(cost_class=2.0, cost_bbox=5.0,
                                      cost_giou=2.0))
        assert float(losses2["loss_bbox"]) != float(losses["loss_bbox"])

    def test_focal_loss_matches_manual(self, rng):
        x = rng.randn(3, 7)
        t = (rng.rand(3, 7) > 0.5).astype(np.float64)
        ours = float(sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t), 2.0))
        import torch
        import torch.nn.functional as F
        tx, tt = torch.from_numpy(x), torch.from_numpy(t)
        prob = tx.sigmoid()
        ce = F.binary_cross_entropy_with_logits(tx, tt, reduction="none")
        p_t = prob * tt + (1 - prob) * (1 - tt)
        loss = ce * (1 - p_t) ** 2
        alpha_t = 0.25 * tt + 0.75 * (1 - tt)
        expected = (alpha_t * loss).mean(1).sum().item() / 2.0
        np.testing.assert_allclose(ours, expected, rtol=1e-5)
