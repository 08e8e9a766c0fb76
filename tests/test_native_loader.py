"""Native C++ cache reader tests (skips when no toolchain)."""

import numpy as np
import pytest

from moviigen_tpu.native import (NativeReaderPool, native_available,
                                 read_npy_batch)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no native toolchain")


def test_read_npy_batch_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    paths, refs = [], []
    for i, shape in enumerate([(4, 8), (3, 5, 7), (128,), (2, 2, 2, 2)]):
        arr = rng.standard_normal(shape).astype(
            [np.float32, np.float16, np.int32, np.float64][i % 4])
        p = tmp_path / f"a{i}.npy"
        np.save(p, arr)
        paths.append(str(p))
        refs.append(arr)

    pool = NativeReaderPool(num_threads=3)
    got = read_npy_batch(pool, paths)
    for g, r in zip(got, refs):
        np.testing.assert_array_equal(g, r)
    pool.close()


def test_many_concurrent_reads(tmp_path):
    rng = np.random.default_rng(1)
    arrs = [rng.standard_normal((64, 64)).astype(np.float32)
            for _ in range(32)]
    paths = []
    for i, a in enumerate(arrs):
        p = tmp_path / f"f{i}.npy"
        np.save(p, a)
        paths.append(str(p))
    pool = NativeReaderPool(num_threads=8)
    got = read_npy_batch(pool, paths)
    for g, r in zip(got, arrs):
        np.testing.assert_array_equal(g, r)
    pool.close()


def test_missing_file_raises(tmp_path):
    pool = NativeReaderPool(num_threads=1)
    dst = np.empty((4,), np.float32)
    t = pool.submit(str(tmp_path / "nope.npy"), dst)
    with pytest.raises(IOError):
        pool.wait(t)
    pool.close()


def test_dataloader_uses_native_path(tmp_path):
    """DataLoader with npy caches goes through the native batch reader
    and produces identical batches to the python path."""
    import json

    from moviigen_tpu.training.data import (AspectRatioLengthBucketSampler,
                                            DataLoader, LatentDataset)

    d = tmp_path / "ds"
    (d / "latent").mkdir(parents=True)
    (d / "prompt_embed").mkdir()
    rng = np.random.default_rng(0)
    annos = []
    for i in range(6):
        np.save(d / "latent" / f"v{i}.npy",
                rng.standard_normal((4, 3, 8, 8)).astype(np.float32))
        np.save(d / "prompt_embed" / f"v{i}.npy",
                rng.standard_normal((7, 32)).astype(np.float32))
        annos.append({"latent_path": f"v{i}.npy",
                      "prompt_embed_path": f"v{i}.npy",
                      "length": 3, "aspect_ratio_bin": 0})
    (d / "v.json").write_text(json.dumps(annos))

    def make_loader(use_native):
        ds = LatentDataset(str(d / "v.json"), num_latent_t=2,
                           txt_max_len=16, text_dim=32)
        sampler = AspectRatioLengthBucketSampler(
            batch_size=2, dataset_size=len(ds), rank=0, world_size=1,
            lengths=ds.lengths, aspect_ratios=list(ds.aspect_ratios))
        return DataLoader(ds, sampler, batch_size=2, prefetch=0,
                          use_native=use_native)

    batches_native = list(make_loader(True))
    batches_python = list(make_loader(False))
    assert len(batches_native) == len(batches_python) == 3
    for bn, bp in zip(batches_native, batches_python):
        for a, b in zip(bn, bp):
            np.testing.assert_array_equal(a, b)
