"""Video/metadata tooling CLI (reference resize_videos.py /
video_process.py / others/copy_csv.py equivalents)."""

import json
import os

import numpy as np
import pytest

from moviigen_tpu.cli.video_tools import (
    _resample_indices, is_16_9_ratio, main)


def _write_mp4(path, t=12, h=90, w=160, fps=12, seed=0):
    from moviigen_tpu.utils.io import cache_video

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, (t, h, w, 3)).astype(np.float32)
    out = cache_video(frames.transpose(3, 0, 1, 2), save_file=str(path),
                      fps=fps, value_range=(0, 255))
    if out is None or not str(out).endswith(".mp4"):
        pytest.skip("no mp4 encoder in environment")
    return out


def test_16_9_tolerance():
    assert is_16_9_ratio(1920, 1080)
    assert is_16_9_ratio(1600, 900)
    assert not is_16_9_ratio(1920, 832)   # 21:9
    assert not is_16_9_ratio(1080, 1920)  # portrait


def test_resample_indices_retiming():
    # 12 frames @ 12fps → 6 frames @ 6fps, duration preserved
    idx = _resample_indices(12, 12.0, 6.0)
    assert len(idx) == 6 and idx[0] == 0 and max(idx) <= 11
    # upsampling duplicates frames
    assert len(_resample_indices(10, 10.0, 20.0)) == 20


def test_resize_cli(tmp_path):
    src = tmp_path / "src" / "sub"
    src.mkdir(parents=True)
    _write_mp4(src / "a.mp4", h=90, w=160)          # 16:9 → converted
    _write_mp4(src / "b.mp4", h=120, w=120, seed=1)  # 1:1 → skipped
    out = tmp_path / "out"
    rc = main(["resize", "--input_dir", str(tmp_path / "src"),
               "--output_dir", str(out), "--width", "64", "--height", "36",
               "--fps", "6", "--max_workers", "1"])
    assert rc == 0
    converted = out / "sub" / "a.mp4"
    assert converted.exists()
    assert not (out / "sub" / "b.mp4").exists()
    from moviigen_tpu.data.video_reader import probe_video

    n, fps, h, w = probe_video(str(converted))
    assert (h, w) == (36, 64)
    assert n == 6  # 12f @ 12fps retimed to 6fps → 6 frames


def test_metadata_cli(tmp_path):
    d = tmp_path / "data" / "setA"
    d.mkdir(parents=True)
    _write_mp4(d / "clip1.mp4")
    _write_mp4(d / "clip2.mp4", seed=2)
    (d / "caps.csv").write_text(
        "Filename,Video Description\nclip1.mp4,a cat\n", encoding="utf-8")
    out = tmp_path / "meta.json"
    rc = main(["metadata", str(tmp_path / "data"), str(out)])
    assert rc == 0
    entries = json.loads(out.read_text(encoding="utf-8"))
    assert len(entries) == 2
    by_path = {e["path"]: e for e in entries}
    e1 = by_path["setA/clip1.mp4"]
    assert e1["cap"] == ["a cat"]
    assert e1["resolution"] == {"width": 160, "height": 90}
    assert by_path["setA/clip2.mp4"]["cap"] == []
    # the emitted entries feed T2V_dataset's merge-file format
    assert all({"path", "resolution", "fps", "duration", "cap"}
               <= set(e) for e in entries)


def test_copy_csv_cli(tmp_path):
    src = tmp_path / "s"
    (src / "x" / "y").mkdir(parents=True)
    (src / "a.csv").write_text("1")
    (src / "x" / "y" / "b.csv").write_text("2")
    dst = tmp_path / "d"
    assert main(["copy-csv", "--src_dir", str(src),
                 "--dst_dir", str(dst)]) == 0
    assert (dst / "a.csv").read_text() == "1"
    assert (dst / "x" / "y" / "b.csv").read_text() == "2"


def test_cache_video_cv2_mp4_fallback(tmp_path):
    """cache_video writes real .mp4 through OpenCV when imageio has no
    ffmpeg backend (utils/io.py cv2 stage)."""
    out = _write_mp4(tmp_path / "v.mp4")
    assert os.path.getsize(out) > 0
