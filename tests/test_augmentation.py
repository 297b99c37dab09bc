import numpy as np

from quber_tpu.data import augmentation as A


def test_chromatic_and_blur_and_noise(rng):
    rgb = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    for fn in [A.chromatic_shift, A.gaussian_blur, A.add_gaussian_noise]:
        out = fn(rgb, rng)
        assert out.shape == rgb.shape and out.dtype == np.uint8
        assert not np.array_equal(out, rgb)


def test_random_rotation_aligned(rng):
    rgb = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    label = np.zeros((64, 64), np.uint8)
    label[20:40, 20:40] = 1
    out_rgb, out_label = A.random_rotation([rgb, label], rng, nearest=[False, True])
    assert out_rgb.shape == rgb.shape and out_label.shape == label.shape
    # nearest keeps the label binary
    assert set(np.unique(out_label)) <= {0, 1}
    # area approximately preserved under rotation
    assert abs(int(out_label.sum()) - 400) < 120


def test_copy_paste(rng, blobs):
    h, w = 96, 128
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    depth = rng.rand(h, w).astype(np.float32)
    masks = blobs(rng, 2, h, w, min_r=10, max_r=20)
    # make the originals disjoint (later blob wins), as real labels are
    label = np.zeros((h, w), np.uint8)
    for i, m in enumerate(masks):
        label[m > 0] = i + 1
    masks = np.stack([(label == i + 1).astype(np.uint8) for i in range(2)])
    donor_rgb = np.full((h, w, 3), 200, np.uint8)
    donor_depth = np.full((h, w), 0.5, np.float32)
    donor_masks = blobs(rng, 2, h, w, min_r=10, max_r=20)
    out_rgb, out_depth, out_masks = A.copy_paste(
        rgb, depth, masks, donor_rgb, donor_depth, donor_masks, rng, max_paste=2
    )
    pasted = out_masks[-1].astype(bool)
    # pasted region takes the donor appearance
    assert (out_rgb[pasted] == 200).all()
    # masks stay pairwise disjoint (pastes occlude what they cover)
    assert (out_masks.astype(np.int32).sum(0) <= 1).all()


def test_copy_paste_paired(rng, blobs):
    """Paired (perturbed) masks follow the paste: occluded where pasted,
    and the donor's paired pixels inside the pasted instance arrive as a
    new paired mask at the same offset."""
    h, w = 96, 128
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    depth = rng.rand(h, w).astype(np.float32)
    masks = blobs(rng, 2, h, w, min_r=10, max_r=20)
    pert = masks.copy()  # initial masks = gt here
    donor_rgb = np.full((h, w, 3), 200, np.uint8)
    donor_depth = np.full((h, w), 0.5, np.float32)
    donor_masks = blobs(rng, 1, h, w, min_r=12, max_r=20)
    donor_pert = donor_masks.copy()
    out_rgb, out_depth, out_masks, out_pert = A.copy_paste(
        rgb, depth, masks, donor_rgb, donor_depth, donor_masks, rng,
        max_paste=1, paired_masks=pert, donor_paired=donor_pert,
    )
    assert len(out_masks) == len(out_pert)
    pasted = out_masks[-1].astype(bool)
    # the new paired mask equals the pasted gt (donor paired == donor gt)
    np.testing.assert_array_equal(out_pert[-1].astype(bool), pasted)
    # surviving original paired masks are cleared under the paste
    for p in out_pert[:-1]:
        assert not (p.astype(bool) & pasted).any()


def test_felzenszwalb_reference_perturbation(rng):
    """Reference-flow perturbation: Felzenszwalb proposals seed FPs and
    over-/under-segmentations; surviving masks keep IoU in/near the target
    window vs their source (VERDICT: IoU-target histogram check)."""
    import numpy as np

    from quber_tpu.data.perturb import mask_iou, perturb_masks_reference

    h, w = 120, 160
    ys, xs = np.mgrid[:h, :w]
    rgb = np.full((h, w, 3), 60, np.uint8)
    rgb += rng.randint(0, 8, (h, w, 3)).astype(np.uint8)
    gt = []
    for cy, cx, r, color in ((35, 40, 18, (200, 40, 40)),
                             (80, 110, 22, (40, 200, 40)),
                             (40, 120, 15, (40, 40, 200))):
        m = ((ys - cy) ** 2 + (xs - cx) ** 2 <= r * r)
        gt.append(m.astype(np.uint8))
        rgb[m] = color
    gt = np.asarray(gt)

    ious = []
    for seed in range(8):
        out = perturb_masks_reference(gt, rgb, np.random.RandomState(seed),
                                      iou_target=(0.8, 1.0))
        assert out.ndim == 3 and out.shape[1:] == (h, w)
        assert len(out) >= 1
        for m in out:
            best = max(mask_iou(m, g) for g in gt)
            if best > 0.3:  # a corrupted-GT mask (not an FP/split product)
                ious.append(best)
    ious = np.asarray(ious)
    # boundary jitter targets IoU in [0.8, 1.0]; allow pipeline slack
    assert len(ious) >= 10
    assert np.median(ious) > 0.6, ious
    assert (ious > 0.45).mean() > 0.8, ious
