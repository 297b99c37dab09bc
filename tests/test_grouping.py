"""Golden tests: panoptic grouping vs torch/numpy oracles re-deriving the
Panoptic-DeepLab post-processing semantics."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from quber_tpu.ops import grouping as G
from quber_tpu.ops import encoding as E


def torch_find_centers(heat, threshold, nms_kernel, top_k):
    """Oracle: threshold -> maxpool NMS -> strict top-k cut, row-major order."""
    x = torch.as_tensor(heat)[None]
    x = F.threshold(x, threshold, -1.0)
    pad = (nms_kernel - 1) // 2
    pooled = F.max_pool2d(x[None], kernel_size=nms_kernel, stride=1, padding=pad)[0]
    x[x != pooled] = -1
    x = x.squeeze(0)
    flat = torch.flatten(x)
    k = min(top_k, flat.numel())
    top_vals, _ = torch.topk(flat, k)
    bound = top_vals[-1].clamp(min=0)
    return torch.nonzero(x > bound).numpy()


def torch_group_pixels(centers, offsets):
    h, w = offsets.shape[1:]
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    loc = np.stack([yy + offsets[0], xx + offsets[1]], axis=-1).reshape(-1, 2)
    d = np.linalg.norm(centers[:, None, :].astype(np.float32) - loc[None], axis=-1)
    return np.argmin(d, axis=0).reshape(h, w) + 1


def make_scene(rng, blobs, h=120, w=160, n=4):
    masks = blobs(rng, n, h, w)
    # resolve overlaps: later instance wins (mirrors a label image)
    label = np.zeros((h, w), np.int32)
    for i, m in enumerate(masks):
        label[m > 0] = i + 1
    masks = np.stack([(label == i + 1).astype(np.uint8) for i in range(n)])
    keep = masks.reshape(n, -1).sum(1) > 0
    masks = masks[keep]
    enc = np.asarray(E.encode_initial_masks(jnp.asarray(masks), sigma=10, normalize=False))
    fg = (masks.sum(0) > 0).astype(np.float32)
    return masks, fg, enc[0], enc[1:]


def test_find_centers_matches_torch(rng, blobs):
    _, _, heat, _ = make_scene(rng, blobs)
    want = torch_find_centers(heat.copy(), 0.3, 7, 200)
    centers, valid = G.find_instance_centers(jnp.asarray(heat), 0.3, 7, 200)
    got = np.asarray(centers)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want)


def test_find_centers_none_above_threshold():
    heat = np.full((32, 32), 0.05, np.float32)
    centers, valid = G.find_instance_centers(jnp.asarray(heat), 0.3, 7, 200)
    assert not np.asarray(valid).any()


def test_group_pixels_matches_torch(rng, blobs):
    _, _, heat, offsets = make_scene(rng, blobs)
    centers = torch_find_centers(heat.copy(), 0.3, 7, 200)
    want = torch_group_pixels(centers, offsets)

    k = 200
    centers_pad = np.zeros((k, 2), np.int32)
    centers_pad[: len(centers)] = centers
    valid = np.zeros((k,), bool)
    valid[: len(centers)] = True
    got = np.asarray(
        G.group_pixels(jnp.asarray(centers_pad), jnp.asarray(valid), jnp.asarray(offsets))
    )
    np.testing.assert_array_equal(got, want)


def test_full_panoptic_recovers_instances(rng, blobs):
    masks, fg, heat, offsets = make_scene(rng, blobs, n=5)
    out = G.get_panoptic_segmentation(
        jnp.asarray(fg), jnp.asarray(heat), jnp.asarray(offsets),
        threshold=0.3, nms_kernel=7, top_k=200,
    )
    pan = np.asarray(out["panoptic"])
    n_out = int(out["num_instances"])
    big = [m for m in masks if m.sum() >= 512]
    assert n_out == len(big)
    # each sufficiently large input mask must be recovered as one instance
    for m in big:
        ids, counts = np.unique(pan[m > 0], return_counts=True)
        main = ids[np.argmax(counts)]
        assert main > 0
        inter = np.logical_and(pan == main, m > 0).sum()
        union = np.logical_or(pan == main, m > 0).sum()
        assert inter / union > 0.95, f"IoU too low: {inter/union}"
    # background stays 0
    assert np.all(pan[fg == 0] == 0)


def test_small_instance_culled(rng):
    h, w = 120, 160
    m = np.zeros((h, w), np.uint8)
    m[10:25, 10:25] = 1  # 225 px < 512 -> culled to void
    enc = np.asarray(E.encode_initial_masks(jnp.asarray(m[None]), normalize=False))
    out = G.get_panoptic_segmentation(
        jnp.asarray(m.astype(np.float32)), jnp.asarray(enc[0]), jnp.asarray(enc[1:]),
        threshold=0.3, nms_kernel=7,
    )
    assert int(out["num_instances"]) == 0
    assert np.all(np.asarray(out["panoptic"]) == 0)


def test_stuff_blob_when_no_centers():
    # foreground with a dead heatmap: whole fg >= 2048 px becomes one instance
    h, w = 120, 160
    fg = np.zeros((h, w), np.float32)
    fg[20:90, 30:120] = 1  # 6300 px
    heat = np.zeros((h, w), np.float32)
    offsets = np.zeros((2, h, w), np.float32)
    out = G.get_panoptic_segmentation(jnp.asarray(fg), jnp.asarray(heat), jnp.asarray(offsets))
    assert int(out["num_instances"]) == 1
    pan = np.asarray(out["panoptic"])
    np.testing.assert_array_equal(pan > 0, fg > 0)


def test_no_centers_small_fg_is_void():
    h, w = 64, 64
    fg = np.zeros((h, w), np.float32)
    fg[10:20, 10:20] = 1  # 100 px < stuff_area
    heat = np.zeros((h, w), np.float32)
    out = G.get_panoptic_segmentation(jnp.asarray(fg), jnp.asarray(heat), jnp.zeros((2, h, w)))
    assert int(out["num_instances"]) == 0


def test_scores_monotone_sane(rng, blobs):
    masks, fg, heat, offsets = make_scene(rng, blobs, n=3)
    out = G.get_panoptic_segmentation(
        jnp.asarray(fg), jnp.asarray(heat), jnp.asarray(offsets), threshold=0.3, nms_kernel=7
    )
    n = int(out["num_instances"])
    scores = np.asarray(out["scores"])[1 : n + 1]
    # fg prob is binary 1 on the mask and the heatmap peaks at ~1 at the
    # centroid, so every confidence must be close to 1
    assert np.all(scores > 0.9)


def test_fg_overlap_filter(rng, blobs):
    masks, fg, heat, offsets = make_scene(rng, blobs, n=4)
    out = G.get_panoptic_segmentation(
        jnp.asarray(fg), jnp.asarray(heat), jnp.asarray(offsets), threshold=0.3, nms_kernel=7
    )
    n = int(out["num_instances"])
    # full fg mask keeps everything
    pan2, n2 = G.fg_overlap_filter(out["panoptic"], out["num_instances"], jnp.asarray(fg))
    assert int(n2) == n
    # empty fg mask drops everything
    pan3, n3 = G.fg_overlap_filter(out["panoptic"], out["num_instances"], jnp.zeros_like(jnp.asarray(fg)))
    assert int(n3) == 0
    assert np.all(np.asarray(pan3) == 0)


def test_topk_2stage_matches_lax_topk():
    # segment-preselected exact top-k: same value multiset as lax.top_k and
    # the same survivor SET under find_instance_centers' "> bound" rule,
    # including boundary ties and duplicate values across segments
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from quber_tpu.ops.grouping import _topk_2stage

    rng = np.random.RandomState(3)
    n, k = 512 * 40, 24
    cases = []
    x = np.full(n, -1.0, np.float32)
    pk = rng.choice(n, 60, replace=False)
    x[pk] = rng.rand(60).astype(np.float32)
    cases.append(x)  # sparse peaks, typical NMS output
    y = x.copy()
    y[pk[:30]] = 0.5  # heavy ties, some on the k-th boundary
    cases.append(y)
    z = np.full(n, -1.0, np.float32)
    z[:200] = rng.rand(200).astype(np.float32)  # all peaks in few segments
    cases.append(z)
    cases.append(np.full(n, -1.0, np.float32))  # no peaks at all
    for x in cases:
        vr, ir = lax.top_k(jnp.asarray(x), k)
        v2, i2 = _topk_2stage(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(vr), np.asarray(v2))
        bound = max(float(vr[k - 1]), 0.0)
        keep_ref = sorted(int(i) for v, i in zip(vr, ir) if float(v) > bound)
        keep_2st = sorted(int(i) for v, i in zip(v2, i2) if float(v) > bound)
        assert keep_ref == keep_2st


def _synthetic_pre(n_peaks, h=96, w=128, top_k=200):
    """A pre-stage dict with n_peaks well-separated centers: every ~16px
    grid cell gets a gaussian bump; offsets point each pixel at its cell's
    center, fg covers disks around the centers."""
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    heat = np.zeros((h, w), np.float32)
    offs = np.zeros((2, h, w), np.float32)
    fg = np.zeros((h, w), np.float32)
    cells = [(cy, cx) for cy in range(8, h, 16) for cx in range(8, w, 16)]
    centers = cells[:n_peaks]
    assert len(centers) == n_peaks
    # nearest-center offsets
    cy = np.array([c[0] for c in centers], np.float32)
    cx = np.array([c[1] for c in centers], np.float32)
    d2 = (ys[None] - cy[:, None, None]) ** 2 + (xs[None] - cx[:, None, None]) ** 2
    near = np.argmin(d2, axis=0)
    offs[0] = cy[near] - ys
    offs[1] = cx[near] - xs
    for i, (py, px) in enumerate(centers):
        heat[py, px] = 0.9
        fg[(ys - py) ** 2 + (xs - px) ** 2 < 36] = 1.0
    from quber_tpu.ops.grouping import find_instance_centers

    c, v = find_instance_centers(jnp.asarray(heat), 0.3, 7, top_k)
    return {
        "sem_seg": jnp.asarray(fg * 8 - 4),
        "fg_prob": jnp.asarray(fg),
        "fg_bin": jnp.asarray(fg).astype(jnp.int32),
        "center": jnp.asarray(heat),
        "offset": jnp.asarray(offs),
        "centers": c,
        "centers_valid": v,
    }, n_peaks


def test_adaptive_grouping_matches_full():
    """The fast_top_k lax.cond dispatch is exact in both regimes: few peaks
    (fast branch: sliced center table) and crowded (slow branch spill)."""
    from quber_tpu.models.mask_refiner import MaskRefinerConfig
    from quber_tpu.predictor import MaskRefinerPredictor

    h, w = 96, 128
    cfg_a = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False,
                              min_instance_area=8, fast_top_k=8)
    cfg_f = MaskRefinerConfig(height=h, width=w, use_pallas_grouping=False,
                              min_instance_area=8, fast_top_k=0)
    pa = MaskRefinerPredictor(cfg_a, max_instances=8)
    pf = MaskRefinerPredictor(cfg_f, max_instances=8)
    assert pa._adaptive_fast_k() == 8 and pf._adaptive_fast_k() is None

    for n_peaks in (5, 13):  # 5 <= fast_top_k < 13
        pre, _ = _synthetic_pre(n_peaks, h, w)
        out_a = pa._group_and_post(pre)
        out_f = pf._group_and_post(pre)
        np.testing.assert_array_equal(np.asarray(out_a["panoptic_seg"]),
                                      np.asarray(out_f["panoptic_seg"]))
        assert int(out_a["num_instances"]) == int(out_f["num_instances"]) == n_peaks
        assert out_a["instance_scores"].shape == out_f["instance_scores"].shape
        np.testing.assert_allclose(np.asarray(out_a["instance_scores"]),
                                   np.asarray(out_f["instance_scores"]), rtol=1e-6)

    # batched twin: mixed batch below the bound takes the fast branch;
    # a single crowded frame spills the whole batch — both must equal the
    # non-adaptive result frame by frame
    import jax

    for counts in ((3, 6), (6, 13)):
        pres = [_synthetic_pre(n, h, w)[0] for n in counts]
        batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
        out_a = pa._group_and_post_batch(batch)
        out_f = pf._group_and_post_batch(batch)
        np.testing.assert_array_equal(np.asarray(out_a["panoptic_seg"]),
                                      np.asarray(out_f["panoptic_seg"]))
        np.testing.assert_allclose(np.asarray(out_a["instance_scores"]),
                                   np.asarray(out_f["instance_scores"]), rtol=1e-6)
