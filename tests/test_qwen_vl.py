"""qwen_vl vision-preprocessing parity vs wan/utils/qwen_vl_utils.py."""

import base64
import io as _io

import numpy as np
import pytest

from moviigen_tpu.utils import qwen_vl
from ref_loader import ref_available, load_ref_qwen_vl

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference tree absent")


@pytest.fixture(scope="module")
def ref():
    return load_ref_qwen_vl()


SIZES = [(1080, 1920), (28, 28), (10, 1500), (720, 1280), (833, 1921),
         (4000, 4000), (56, 1)]


def test_smart_resize_parity(ref):
    for h, w in SIZES:
        assert qwen_vl.smart_resize(h, w) == ref.smart_resize(h, w)
    # custom budgets
    assert qwen_vl.smart_resize(512, 512, factor=14, min_pixels=1000,
                                max_pixels=20000) == \
        ref.smart_resize(512, 512, factor=14, min_pixels=1000,
                         max_pixels=20000)


def test_smart_resize_rejects_extreme_aspect(ref):
    with pytest.raises(ValueError):
        qwen_vl.smart_resize(1, 300)
    with pytest.raises(ValueError):
        ref.smart_resize(1, 300)


def test_by_factor_helpers_parity(ref):
    for n in (0, 1, 27, 28, 29, 55, 57, 300):
        for f in (2, 28):
            assert qwen_vl.round_by_factor(n, f) == \
                ref.round_by_factor(n, f)
            assert qwen_vl.ceil_by_factor(n, f) == ref.ceil_by_factor(n, f)
            assert qwen_vl.floor_by_factor(n, f) == \
                ref.floor_by_factor(n, f)


@pytest.mark.parametrize("ele,total,fps", [
    ({"nframes": 17}, 100, 30.0),
    ({"fps": 2.0}, 300, 30.0),
    ({}, 50, 24.0),
    ({"fps": 1.0, "min_frames": 10, "max_frames": 20}, 600, 30.0),
])
def test_smart_nframes_parity(ref, ele, total, fps):
    assert qwen_vl.smart_nframes(dict(ele), total, fps) == \
        ref.smart_nframes(dict(ele), total_frames=total, video_fps=fps)


def test_smart_nframes_rejects_fps_and_nframes(ref):
    with pytest.raises(AssertionError):
        qwen_vl.smart_nframes({"fps": 2.0, "nframes": 4}, 100, 30.0)


def _png_bytes(h=33, w=57):
    from PIL import Image

    rng = np.random.default_rng(0)
    im = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = _io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def test_fetch_image_from_path_and_base64(tmp_path):
    p = tmp_path / "img.png"
    p.write_bytes(_png_bytes())
    img = qwen_vl.fetch_image({"image": str(p)})
    w, h = img.size
    assert w % qwen_vl.IMAGE_FACTOR == 0 and h % qwen_vl.IMAGE_FACTOR == 0
    assert qwen_vl.MIN_PIXELS <= w * h <= qwen_vl.MAX_PIXELS

    uri = "data:image/png;base64," + \
        base64.b64encode(_png_bytes()).decode()
    img2 = qwen_vl.fetch_image({"image_url": uri})
    assert img2.size == img.size

    img3 = qwen_vl.fetch_image({"image": "file://" + str(p)})
    assert img3.size == img.size


def test_fetch_image_resized_hw(tmp_path):
    p = tmp_path / "img.png"
    p.write_bytes(_png_bytes())
    img = qwen_vl.fetch_image({"image": str(p), "resized_height": 56,
                               "resized_width": 112})
    assert img.size == (112, 56)


def test_fetch_video_from_array(tmp_path):
    rng = np.random.default_rng(1)
    vid = rng.integers(0, 255, (20, 30, 44, 3), dtype=np.uint8)
    p = tmp_path / "clip.npy"
    np.save(p, vid)
    out = qwen_vl.fetch_video({"video": str(p), "nframes": 8})
    assert out.shape[0] == 8 and out.shape[1] == 3
    assert out.dtype == np.float32
    assert out.shape[2] % qwen_vl.IMAGE_FACTOR == 0
    assert out.shape[3] % qwen_vl.IMAGE_FACTOR == 0


def test_fetch_video_image_list_pads_to_frame_factor(tmp_path):
    p = tmp_path / "img.png"
    p.write_bytes(_png_bytes())
    frames = qwen_vl.fetch_video({"video": [str(p)] * 3})
    assert len(frames) == 4          # ceil(3, FRAME_FACTOR=2)
    assert frames[-1] is frames[-2]  # padded with last frame


def test_process_vision_info(tmp_path):
    p = tmp_path / "img.png"
    p.write_bytes(_png_bytes())
    v = tmp_path / "clip.npy"
    np.save(v, np.zeros((8, 28, 28, 3), np.uint8))
    convo = [
        {"role": "user", "content": [
            {"type": "image", "image": str(p)},
            {"type": "video", "video": str(v), "nframes": 4},
            {"type": "text", "text": "hi"},
        ]},
    ]
    images, videos = qwen_vl.process_vision_info(convo)
    assert len(images) == 1 and len(videos) == 1
    assert videos[0].shape[0] == 4

    images, videos = qwen_vl.process_vision_info(
        [{"role": "user", "content": "no vision"}])
    assert images is None and videos is None
