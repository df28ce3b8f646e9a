"""YOLO target assignment: vectorized build_targets vs a straightforward
per-box loop implementing the reference semantics (yolo_loss.py:136-194)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ecamp_tpu.ops.yolo import build_targets, yolo_loss


def _loop_reference(targets, anchors, grid, num_classes, ignore_thresh=0.5):
    """Reference get_target semantics in plain numpy (sequential loop)."""
    bs, T, _ = targets.shape
    A = len(anchors)
    g = grid
    mask = np.zeros((bs, A, g, g))
    noobj = np.ones((bs, A, g, g))
    tx = np.zeros((bs, A, g, g))
    ty = np.zeros((bs, A, g, g))
    tw = np.zeros((bs, A, g, g))
    th = np.zeros((bs, A, g, g))
    tconf = np.zeros((bs, A, g, g))
    tcls = np.zeros((bs, A, g, g, num_classes))
    for b in range(bs):
        for t in range(T):
            if targets[b, t].sum() == 0:
                continue
            gx = targets[b, t, 1] * g
            gy = targets[b, t, 2] * g
            gw = targets[b, t, 3] * g
            gh = targets[b, t, 4] * g
            gi, gj = int(gx), int(gy)
            # +1-convention anchor IoU on centered boxes
            ious = np.zeros(A)
            for a, (aw, ah) in enumerate(anchors):
                inter = (min(gw, aw) + 1) * (min(gh, ah) + 1)
                union = (gw + 1) * (gh + 1) + (aw + 1) * (ah + 1) - inter
                ious[a] = inter / (union + 1e-16)
            noobj[b, ious > ignore_thresh, gj, gi] = 0
            best = int(np.argmax(ious))
            mask[b, best, gj, gi] = 1
            tx[b, best, gj, gi] = gx - gi
            ty[b, best, gj, gi] = gy - gj
            tw[b, best, gj, gi] = np.log(gw / anchors[best][0] + 1e-16)
            th[b, best, gj, gi] = np.log(gh / anchors[best][1] + 1e-16)
            tconf[b, best, gj, gi] = 1
            tcls[b, best, gj, gi, int(targets[b, t, 0])] = 1
    # vectorized impl also zeroes noobj at assigned cells (documented)
    noobj = np.minimum(noobj, 1 - mask)
    return dict(mask=mask, noobj_mask=noobj, tx=tx, ty=ty, tw=tw, th=th,
                tconf=tconf, tcls=tcls)


def _random_targets(rng, bs, T, grid, distinct_cells=True):
    """Random boxes; optionally force distinct cells to avoid the
    (documented, benign) collision-ordering difference."""
    t = np.zeros((bs, T, 5), np.float32)
    for b in range(bs):
        cells = rng.choice(grid * grid, size=T, replace=False)
        n = rng.integers(1, T + 1)
        for i in range(n):
            cy_i, cx_i = divmod(int(cells[i]), grid)
            t[b, i, 1] = (cx_i + rng.uniform(0.2, 0.8)) / grid
            t[b, i, 2] = (cy_i + rng.uniform(0.2, 0.8)) / grid
            t[b, i, 3] = rng.uniform(0.05, 0.6)
            t[b, i, 4] = rng.uniform(0.05, 0.6)
    return t


@pytest.mark.parametrize("grid", [7, 14])
def test_build_targets_matches_loop(grid):
    rng = np.random.default_rng(0)
    anchors = np.asarray([[3.0, 2.5], [6.0, 5.0], [10.0, 9.0]], np.float32)
    targets = _random_targets(rng, bs=3, T=5, grid=grid)
    out = build_targets(jnp.asarray(targets), jnp.asarray(anchors), grid,
                        num_classes=1)
    ref = _loop_reference(targets, anchors, grid, num_classes=1)
    for k in ("mask", "noobj_mask", "tconf"):
        np.testing.assert_array_equal(np.asarray(out[k]), ref[k], err_msg=k)
    for k in ("tx", "ty", "tw", "th"):
        np.testing.assert_allclose(np.asarray(out[k]), ref[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(out["tcls"]), ref["tcls"],
                               atol=1e-6)


@pytest.mark.slow
def test_yolo_loss_finite_and_grad():
    import jax

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 18, 7, 7)), jnp.float32)
    targets = jnp.asarray(_random_targets(rng, 2, 4, 7))
    anchors = [(62.0, 45.0), (59.0, 119.0), (116.0, 90.0)]

    def lf(lg):
        total, _ = yolo_loss(lg, targets, anchors, img_size=224)
        return total

    val = float(lf(logits))
    g = jax.grad(lf)(logits)
    assert np.isfinite(val)
    assert np.all(np.isfinite(np.asarray(g)))
