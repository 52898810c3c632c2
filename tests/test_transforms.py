"""Clip-transform library parity (videotransforms/ surface).

Each test pins a transform against an independent recomputation of the
reference semantics (videotransforms/{video,volume,tensor,stack}_transforms
.py), including the released quirks documented in data/transforms.py.
Pure host-side PIL/numpy — no jax involved.
"""
import random

import numpy as np
import pytest
from PIL import Image

from litemkd_tpu.data import transforms as T


def _clip(n=3, h=40, w=56, seed=0, pil=True):
    rng = np.random.default_rng(seed)
    arrs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]
    if pil:
        return [Image.fromarray(a) for a in arrs]
    return arrs


def test_compose_applies_in_order():
    calls = []
    t = T.Compose([lambda c: (calls.append("a"), c)[1],
                   lambda c: (calls.append("b"), c)[1]])
    clip = _clip()
    assert t(clip) is clip
    assert calls == ["a", "b"]


@pytest.mark.parametrize("pil", [True, False])
def test_random_horizontal_flip_matches_fliplr(pil):
    clip = _clip(pil=pil)
    flipped = T.RandomHorizontalFlip(rng=random.Random(1))(clip)  # .random()<0.5
    assert random.Random(1).random() < 0.5
    for src, out in zip(clip, flipped):
        np.testing.assert_array_equal(np.asarray(out),
                                      np.fliplr(np.asarray(src)))
    kept = T.RandomHorizontalFlip(rng=random.Random(0))(clip)  # first draw >=0.5
    assert random.Random(0).random() >= 0.5
    assert kept is clip


def test_resize_shorter_side_math_and_skip():
    clip = _clip(h=40, w=56)
    out = T.Resize(32)(clip)
    # shorter side is h=40 -> (oh, ow) = (32, int(32*56/40))
    assert out[0].size == (int(32 * 56 / 40), 32)
    # shorter side already matches -> clip returned untouched
    assert T.Resize(40)(clip) is clip


def test_resize_interpolation_mapping_is_swapped():
    clip = _clip(n=1, h=40, w=56)
    # released mapping: 'bilinear' -> NEAREST, everything else -> BILINEAR
    near = np.asarray(T.Resize((20, 28), "bilinear")(clip)[0])
    bili = np.asarray(T.Resize((20, 28), "nearest")(clip)[0])
    np.testing.assert_array_equal(
        near, np.asarray(clip[0].resize((28, 20), Image.NEAREST)))
    np.testing.assert_array_equal(
        bili, np.asarray(clip[0].resize((28, 20), Image.BILINEAR)))
    # corrected mode un-swaps
    fixed = np.asarray(T.Resize((20, 28), "bilinear", corrected=True)(clip)[0])
    np.testing.assert_array_equal(
        fixed, np.asarray(clip[0].resize((28, 20), Image.BILINEAR)))


def test_resize_numpy_clip_round_trips_pil():
    clip = _clip(n=2, pil=False)
    out = T.Resize((20, 28))(clip)
    assert isinstance(out[0], np.ndarray) and out[0].shape == (20, 28, 3)
    ref = np.asarray(Image.fromarray(clip[0]).resize((28, 20), Image.BILINEAR))
    np.testing.assert_array_equal(out[0], ref)


def test_random_resize_scale_truncation():
    clip = _clip(h=40, w=56)
    rng = random.Random(7)
    out = T.RandomResize(rng=rng)(clip)
    scale = random.Random(7).uniform(3.0 / 4.0, 4.0 / 3.0)
    # reference passes (new_w, new_h) as resize_clip's (h, w) slot — the
    # faithful output dims are therefore transposed for non-square inputs
    assert out[0].size == (int(40 * scale), int(56 * scale))  # (w, h)


def test_random_crop_draw_order_and_box():
    clip = _clip(h=40, w=56)
    out = T.RandomCrop((24, 30), rng=random.Random(3))(clip)
    r = random.Random(3)
    x1, y1 = r.randint(0, 56 - 30), r.randint(0, 40 - 24)  # x first, then y
    for src, got in zip(clip, out):
        ref = np.asarray(src)[y1:y1 + 24, x1:x1 + 30]
        np.testing.assert_array_equal(np.asarray(got), ref)
    with pytest.raises(ValueError):
        T.RandomCrop((64, 64), rng=random.Random(0))(clip)


def test_center_crop_box():
    clip = _clip(h=40, w=56, pil=False)
    out = T.CenterCrop((24, 30))(clip)
    y1, x1 = int(round((40 - 24) / 2.0)), int(round((56 - 30) / 2.0))
    np.testing.assert_array_equal(out[0], clip[0][y1:y1 + 24, x1:x1 + 30])


def test_ten_crop_layout():
    clip = _clip(n=2, h=40, w=56, pil=False)
    crops = T.TenCrop((24, 30))(clip)
    assert len(crops) == 10 and all(len(c) == 2 for c in crops)
    cy, cx = int(round((40 - 24) / 2.0)), int(round((56 - 30) / 2.0))
    np.testing.assert_array_equal(crops[0][0],
                                  clip[0][cy:cy + 24, cx:cx + 30])  # center 1st
    np.testing.assert_array_equal(crops[1][0], clip[0][0:24, 0:30])  # then tl
    flipped = np.fliplr(clip[0])
    np.testing.assert_array_equal(crops[5][0],
                                  flipped[cy:cy + 24, cx:cx + 30])  # flip center
    np.testing.assert_array_equal(crops[9][0],
                                  flipped[40 - 24:, 56 - 30:])  # flip br


def test_random_rotation_matches_pil_and_validates():
    clip = _clip(n=2)
    out = T.RandomRotation(10, rng=random.Random(5))(clip)
    angle = random.Random(5).uniform(-10, 10)
    for src, got in zip(clip, out):
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(src.rotate(angle)))
    np_out = T.RandomRotation((-10, 10), rng=random.Random(5))(
        [np.asarray(im) for im in clip])
    np.testing.assert_array_equal(np_out[0], np.asarray(out[0]))
    with pytest.raises(ValueError):
        T.RandomRotation(-3)
    with pytest.raises(ValueError):
        T.RandomRotation((1, 2, 3))


def _expected_jitter_ops(seed, b, c, s, h):
    """Reproduce the released draw order (b, c, s, h) + op-list order
    (b, s, h, c) + shuffle (video_transforms.py:341-391)."""
    r = random.Random(seed)
    bf = r.uniform(max(0, 1 - b), 1 + b) if b > 0 else None
    cf = r.uniform(max(0, 1 - c), 1 + c) if c > 0 else None
    sf = r.uniform(max(0, 1 - s), 1 + s) if s > 0 else None
    hf = r.uniform(-h, h) if h > 0 else None
    ops = []
    if bf is not None:
        ops.append(("b", bf))
    if sf is not None:
        ops.append(("s", sf))
    if hf is not None:
        ops.append(("h", hf))
    if cf is not None:
        ops.append(("c", cf))
    r.shuffle(ops)
    return ops


_JITTER_FNS = {"b": T.adjust_brightness, "s": T.adjust_saturation,
               "h": T.adjust_hue, "c": T.adjust_contrast}


def test_color_jitter_faithful_applies_only_last_op():
    clip = _clip(n=2)
    out = T.ColorJitter(0.4, 0.4, 0.4, 0.2, rng=random.Random(11))(clip)
    ops = _expected_jitter_ops(11, 0.4, 0.4, 0.4, 0.2)
    kind, factor = ops[-1]
    for src, got in zip(clip, out):
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(_JITTER_FNS[kind](src, factor)))


def test_color_jitter_corrected_chains_all_ops():
    clip = _clip(n=1)
    out = T.ColorJitter(0.4, 0.4, 0.4, 0.2, rng=random.Random(11),
                        corrected=True)(clip)
    img = clip[0]
    for kind, factor in _expected_jitter_ops(11, 0.4, 0.4, 0.4, 0.2):
        img = _JITTER_FNS[kind](img, factor)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(img))


def test_color_jitter_rejects_numpy_and_noop_when_disabled():
    with pytest.raises(TypeError):
        T.ColorJitter(0.4)(_clip(pil=False))
    clip = _clip()
    out = T.ColorJitter()(clip)
    assert out == list(clip)


def test_adjust_hue_identity_and_range():
    img = _clip(n=1)[0]
    # factor 0 reduces to a pure HSV round-trip (lossy like torchvision's
    # PIL path, but with an untouched H channel)
    roundtrip = Image.merge("HSV", img.convert("HSV").split()).convert("RGB")
    np.testing.assert_array_equal(np.asarray(T.adjust_hue(img, 0.0)),
                                  np.asarray(roundtrip))
    # half-turn on a saturated primary: red (H=0) -> H=127 (uint8 shift)
    red = Image.new("RGB", (4, 4), (255, 0, 0))
    h_shifted = np.array(T.adjust_hue(red, 0.5).convert("HSV"))[..., 0]
    np.testing.assert_array_equal(h_shifted, 127)
    with pytest.raises(ValueError):
        T.adjust_hue(img, 0.6)


def test_clip_to_tensor_layouts():
    clip = _clip(n=4, h=8, w=6, pil=False)
    arr = T.ClipToTensor(numpy=True)(clip)
    assert arr.shape == (3, 4, 8, 6)
    ref = np.stack(clip, axis=0).transpose(3, 0, 1, 2) / 255.0
    np.testing.assert_allclose(arr, ref)
    t = T.ClipToTensor()( [Image.fromarray(a) for a in clip])
    assert tuple(t.shape) == (3, 4, 8, 6) and str(t.dtype) == "torch.float32"
    np.testing.assert_allclose(t.numpy(), ref, rtol=1e-6)
    raw = T.ClipToTensor(numpy=True, div_255=False)(clip)
    np.testing.assert_allclose(raw, ref * 255.0)


def test_to_stacked_tensor_layout():
    clip = _clip(n=2, h=8, w=6, pil=False)
    t = T.ToStackedTensor()(clip)
    assert tuple(t.shape) == (6, 8, 6)
    ref = np.stack(clip, 0).transpose(0, 3, 1, 2).reshape(6, 8, 6) / 255.0
    np.testing.assert_allclose(t.numpy(), ref, rtol=1e-6)


def test_normalize_inplace_torch_and_numpy():
    import torch
    t = torch.ones(3, 2, 2) * 4.0
    out = T.Normalize(2.0, 2.0)(t)
    assert out is t and torch.allclose(t, torch.ones_like(t))
    a = np.full((3, 2, 2), 4.0)
    out = T.Normalize(2.0, 2.0)(a)
    assert out is a
    np.testing.assert_allclose(a, 1.0)
    b = np.full((2, 2), 4, dtype=np.uint8)  # int input -> new float array
    np.testing.assert_allclose(T.Normalize(2.0, 2.0)(b), 1.0)


def test_spatial_random_crop_uses_width_extent():
    vol = np.arange(1 * 2 * 10 * 12).reshape(1, 2, 10, 12)
    out = T.SpatialRandomCrop((4, 6), rng=random.Random(2))(vol)
    r = random.Random(2)
    x1, y1 = r.randint(0, 12 - 6), r.randint(0, 10 - 4)
    assert out.shape == (1, 2, 4, 6)  # released bug would make this (.., 4, 4)
    np.testing.assert_array_equal(out, vol[:, :, y1:y1 + 4, x1:x1 + 6])
    with pytest.raises(ValueError):
        T.SpatialRandomCrop((40, 6))(vol)
