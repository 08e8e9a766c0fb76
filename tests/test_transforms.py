"""Parity tests for the video transform zoo vs the reference
``scripts/dataset/transform.py`` oracles (loaded standalone with
breakpoints disabled — ref_loader.load_ref_transforms)."""

import random

import numpy as np
import pytest

from moviigen_tpu.data import transforms as T

import ref_loader

pytestmark = pytest.mark.skipif(
    not ref_loader.ref_available(), reason="reference tree absent")


@pytest.fixture(scope="module")
def ref():
    return ref_loader.load_ref_transforms()


@pytest.fixture()
def clip_u8():
    return np.random.default_rng(0).integers(
        0, 256, (4, 3, 37, 53), dtype=np.uint8)


def _t(x):
    import torch

    return torch.from_numpy(np.ascontiguousarray(x))


def _exact(ours, theirs):
    np.testing.assert_array_equal(np.asarray(ours),
                                  theirs.numpy())


def test_crop_center_crops_exact(ref, clip_u8):
    _exact(T.crop(clip_u8, 3, 5, 20, 30), ref.crop(_t(clip_u8), 3, 5, 20, 30))
    _exact(T.center_crop(clip_u8, (20, 30)),
           ref.center_crop(_t(clip_u8), (20, 30)))
    _exact(T.center_crop_using_short_edge(clip_u8),
           ref.center_crop_using_short_edge(_t(clip_u8)))
    for top in (False, True):
        _exact(T.center_crop_th_tw(clip_u8, 16, 24, top),
               ref.center_crop_th_tw(_t(clip_u8), 16, 24, top))


def test_center_crop_too_small_raises(ref, clip_u8):
    with pytest.raises(ValueError):
        T.center_crop(clip_u8, (100, 30))
    with pytest.raises(ValueError):
        ref.center_crop(_t(clip_u8), (100, 30))


def test_hflip_normalize_exact(ref, clip_u8):
    _exact(T.hflip(clip_u8), ref.hflip(_t(clip_u8)))
    # normalize is channel-first [C, T, H, W] (ref Normalize docstring)
    f = np.moveaxis(clip_u8, 1, 0).astype(np.float32) / 255.0
    mean, std = (0.5, 0.4, 0.3), (0.5, 0.6, 0.7)
    got = T.normalize(f.copy(), mean, std)
    want = ref.normalize(_t(f.copy()), mean, std).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    _exact(T.normalize_video(clip_u8), ref.normalize_video(_t(clip_u8)))
    with pytest.raises(TypeError):
        T.normalize_video(f)


def test_resize_close_to_torch_bilinear(ref):
    """cv2 resampling vs the reference's antialiased torch bilinear on a
    smooth image (resampling methods only agree on band-limited
    content): mean delta within a few gray levels."""
    yy, xx = np.mgrid[0:37, 0:53].astype(np.float32)
    smooth = (
        127 + 60 * np.sin(yy / 7.0) + 60 * np.cos(xx / 9.0)).astype(
        np.float32)
    clip = np.broadcast_to(smooth, (4, 3, 37, 53)).copy()
    for size in ((18, 26), (74, 106)):  # down and up
        ours = T.resize(clip, size)
        theirs = ref.resize(_t(clip), size, "bilinear").numpy()
        assert ours.shape == theirs.shape
        assert np.abs(ours - theirs).mean() < 4.0  # of 255


def test_resize_scale_short_edge_rule(ref, clip_u8):
    ours = T.resize_scale(clip_u8.astype(np.float32), (20, 999))
    theirs = ref.resize_scale(_t(clip_u8).float(), (20, 999), "bilinear")
    assert ours.shape == tuple(theirs.shape)  # scale = 20/min(H,W)


def test_class_transforms_shapes(ref, clip_u8):
    assert T.RandomCropVideo(16)(clip_u8).shape == (4, 3, 16, 16)
    assert T.SpatialStrideCropVideo(8)(clip_u8).shape == (4, 3, 32, 48)
    got = T.LongSideResizeVideo(40)(clip_u8)
    assert got.shape == (4, 3, int(37 * 40 / 53), 40)
    assert T.LongSideResizeVideo(64, skip_low_resolution=True)(
        clip_u8).shape == clip_u8.shape
    assert T.CenterCropResizeVideo((24, 24))(clip_u8).shape \
        == (4, 3, 24, 24)
    assert T.UCFCenterCropVideo(24)(clip_u8).shape == (4, 3, 24, 24)
    assert T.KineticsRandomCropResizeVideo((20, 28))(clip_u8).shape \
        == (4, 3, 20, 28)
    assert T.CenterCropVideo((20, 30))(clip_u8).shape == (4, 3, 20, 30)
    ours255 = T.Normalize255()(clip_u8)
    _exact(ours255, ref.Normalize255()(_t(clip_u8)))
    # Normalize consumes channel-first [C, T, H, W]
    n = T.Normalize((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))(
        np.moveaxis(ours255, 1, 0))
    assert n.min() >= -1.0 and n.max() <= 1.0


def test_random_transforms_cover_both_branches(clip_u8):
    flip_always = T.RandomHorizontalFlipVideo(
        p=1.0, rng=random.Random(0))(clip_u8)
    np.testing.assert_array_equal(flip_always, clip_u8[..., ::-1])
    flip_never = T.RandomHorizontalFlipVideo(
        p=0.0, rng=random.Random(0))(clip_u8)
    np.testing.assert_array_equal(flip_never, clip_u8)
    got = T.random_shift_crop(clip_u8, rng=random.Random(1))
    assert got.shape == (4, 3, 37, 37)


def test_temporal_samplers_match_reference(ref):
    """Same rng stream → identical windows (both use random.randint /
    random.choice semantics, ref transform.py:520-555)."""
    for total, size in ((100, 32), (10, 32), (33, 32)):
        random.seed(4)
        want = ref.TemporalRandomCrop(size)(total)
        got = T.TemporalRandomCrop(size, rng=random.Random(4))(total)
        assert got == tuple(want)
        assert got[1] - got[0] <= size

    random.seed(9)
    want = ref.DynamicSampleDuration(4, True)(21, 8, 8)
    got = T.DynamicSampleDuration(4, True, rng=random.Random(9))(21, 8, 8)
    assert got == tuple(want)


def test_compose_pipeline(clip_u8):
    """The reference getdataset chain (scripts/dataset/__init__.py:10-39):
    CenterCropResizeVideo → Normalize255-style scaling."""
    pipe = T.Compose([
        T.Normalize255(),
        T.CenterCropResizeVideo((24, 32)),
        lambda c: np.moveaxis(c, 1, 0),  # TCHW → CTHW for Normalize
        T.Normalize((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
        lambda c: np.moveaxis(c, 0, 1),
    ])
    out = pipe(clip_u8)
    assert out.shape == (4, 3, 24, 32)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
