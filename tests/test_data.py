"""Data pipeline tests: preprocessing semantics, cache behavior, loader."""
import os

import numpy as np
import pytest

from ldm_image_generator_tpu.data import BatchLoader, ImageDataset, LatentImageDataset
from ldm_image_generator_tpu.data.dataset import preprocess_image


@pytest.fixture()
def imgdir(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(5):
        arr = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.jpg")
    return tmp_path


def test_preprocess_square_pad_and_range(imgdir):
    arr = preprocess_image(str(imgdir / "0.jpg"), 16)
    assert arr.shape == (16, 16, 3)
    assert arr.dtype == np.float32
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    # 20x30 (h x w) landscape -> resized to w=16, h=10 -> vertical black pad
    assert np.all(arr[0] == -1.0) and np.all(arr[-1] == -1.0)


def test_dataset_cache_reused_not_rebuilt(imgdir, tmp_path):
    cache = str(tmp_path / "cache")
    ds = ImageDataset([str(imgdir)], cache_dir=cache, size=8)
    assert len(ds) == 5
    files = sorted(os.listdir(cache))
    mtimes = [os.path.getmtime(os.path.join(cache, f)) for f in files]
    # second construction must reuse the cache (the reference rmtree-
    # rebuilds every time, dataset.py:28-41)
    ds2 = ImageDataset([str(imgdir)], cache_dir=cache, size=8)
    files2 = sorted(os.listdir(cache))
    assert files == files2
    assert mtimes == [os.path.getmtime(os.path.join(cache, f)) for f in files2]
    # different size -> new cache entries, old preserved
    ImageDataset([str(imgdir)], cache_dir=cache, size=4)
    assert len(os.listdir(cache)) == 10


def test_dataset_set_size(imgdir, tmp_path):
    """Reference ImageDataset.set_size (dataset.py:34) counterpart:
    re-targets the size in place; switching back to an already-built
    size is free (content-addressed cache, no rmtree)."""
    cache = str(tmp_path / "cache")
    ds = ImageDataset([str(imgdir)], cache_dir=cache, size=8)
    assert ds[0].shape == (8, 8, 3)
    ds.set_size(4)
    assert ds.size == 4
    assert ds[0].shape == (4, 4, 3)
    assert len(os.listdir(cache)) == 10  # both sizes cached
    mtimes = sorted(os.path.getmtime(os.path.join(cache, f))
                    for f in os.listdir(cache))
    ds.set_size(8)  # switch back: nothing rebuilt
    assert ds[0].shape == (8, 8, 3)
    assert sorted(os.path.getmtime(os.path.join(cache, f))
                  for f in os.listdir(cache)) == mtimes


def test_dataset_getitem_and_corrupt_fallback(imgdir, tmp_path):
    cache = str(tmp_path / "cache")
    ds = ImageDataset([str(imgdir)], cache_dir=cache, size=8)
    x = ds[3]
    assert x.shape == (8, 8, 3) and x.dtype == np.float32
    # corrupt one cache file -> falls back to item 0 (dataset.py:79-85)
    os.truncate(ds._cache_paths[2], 3)
    np.testing.assert_array_equal(ds[2], ds[0])


def test_latent_dataset_batched_encode(imgdir, tmp_path):
    calls = []

    def encode(batch):
        calls.append(batch.shape)
        return batch[:, ::2, ::2, :] * 0.5  # fake encoder, 2x down

    ds = LatentImageDataset([str(imgdir)], cache_dir=str(tmp_path / "c"),
                            size=8, encode_fn=encode, encode_batch=4)
    assert len(ds) == 5
    z = ds[0]
    assert z.shape == (4, 4, 3)
    # 5 images, batch 4 -> two padded batches of 4
    assert calls == [(4, 8, 8, 3), (4, 8, 8, 3)]


def test_batch_loader_shapes_and_epoch(imgdir, tmp_path):
    ds = ImageDataset([str(imgdir)], cache_dir=str(tmp_path / "c"), size=8)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # 5 items, drop_last
    assert all(b.shape == (2, 8, 8, 3) for b in batches)
    assert len(loader) == 2


def test_native_pipeline_matches_pil(imgdir):
    """C++ decode+preprocess vs the PIL fallback: same geometry, same
    normalization; pixel values match closely (resize rounding only)."""
    from ldm_image_generator_tpu.data import native_loader
    from ldm_image_generator_tpu.data.dataset import preprocess_image

    if not native_loader.available():
        pytest.skip("native library not built")

    path = str(imgdir / "0.jpg")
    nat = native_loader.preprocess_image_native(path, 16)
    pil = preprocess_image(path, 16, use_native=False)
    assert nat.shape == pil.shape == (16, 16, 3)
    assert nat.dtype == np.float32
    # padding rows identical (exact -1)
    np.testing.assert_array_equal(nat[0], pil[0])
    # content: same pixels up to resize/blur rounding differences
    diff = np.abs(nat - pil)
    assert float(np.mean(diff)) < 0.08, float(np.mean(diff))


def test_native_pipeline_png(imgdir, tmp_path):
    from PIL import Image

    from ldm_image_generator_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native library not built")
    rng = np.random.RandomState(3)
    arr = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    out = native_loader.preprocess_image_native(str(p), 8)
    assert out is not None and out.shape == (8, 8, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_native_pipeline_corrupt_returns_none(tmp_path):
    from ldm_image_generator_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native library not built")
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"\xff\xd8 garbage not a real jpeg")
    assert native_loader.preprocess_image_native(str(p), 8) is None


def test_native_batch_api_matches_single(imgdir, tmp_path):
    from PIL import Image

    from ldm_image_generator_tpu.data.native_loader import (
        available,
        preprocess_batch_native,
        preprocess_image_native,
    )

    if not available():
        pytest.skip("native library not built")
    # mix of formats + one corrupt file
    png = tmp_path / "x.png"
    Image.fromarray(np.full((12, 9, 3), 80, np.uint8)).save(png)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not an image at all")
    paths = [str(imgdir / "0.jpg"), str(png), str(bad),
             str(imgdir / "1.jpg")]
    res = preprocess_batch_native(paths, 16, num_threads=3)
    assert res is not None
    imgs, status = res
    assert imgs.shape == (4, 16, 16, 3) and imgs.dtype == np.float32
    assert list(status != 0) == [False, False, True, False]
    # per-image equality with the single-image native call
    for i in (0, 1, 3):
        single = preprocess_image_native(paths[i], 16)
        np.testing.assert_array_equal(imgs[i], single)
    # failed slot is all black (-1)
    assert np.all(imgs[2] == -1.0)


def test_dataset_cache_built_via_native_batch(imgdir, tmp_path):
    """The cache built through the C++ batch path must byte-match the
    per-image build (same preprocess, same float16 cache format)."""
    from ldm_image_generator_tpu.data import dataset as ds_mod
    from ldm_image_generator_tpu.data.native_loader import available

    if not available():
        pytest.skip("native library not built")
    ds_a = ImageDataset([str(imgdir)], cache_dir=str(tmp_path / "a"), size=16)
    # force the joblib/PIL-or-single-native path for comparison
    ds_b = ImageDataset.__new__(ImageDataset)
    ds_b.source_dirs = [str(imgdir)]
    ds_b.cache_dir = str(tmp_path / "b")
    ds_b.size = 16
    ds_b.n_workers = 1
    ds_b.paths = ds_a.paths
    os.makedirs(ds_b.cache_dir, exist_ok=True)
    ds_b._cache_paths = [ds_b._cache_path(p) for p in ds_b.paths]
    for i in range(len(ds_b.paths)):
        ds_b._build_one(i)
    for i in range(len(ds_a)):
        np.testing.assert_array_equal(ds_a[i], ds_b[i])


def test_batch_loader_multihost_sharding(imgdir, tmp_path):
    """Per-host stripes: same seed -> identical permutation across
    'hosts'; each host gets a disjoint per_host slice of every global
    batch, and the union reassembles the single-host batch."""
    ds = ImageDataset([str(imgdir)], cache_dir=str(tmp_path / "c"), size=8)
    whole = [b for b in BatchLoader(ds, 4, seed=3, prefetch=1)]
    h0 = [b for b in BatchLoader(ds, 4, seed=3, prefetch=1,
                                 shard_index=0, shard_count=2)]
    h1 = [b for b in BatchLoader(ds, 4, seed=3, prefetch=1,
                                 shard_index=1, shard_count=2)]
    assert len(whole) == len(h0) == len(h1)
    for w, a, b in zip(whole, h0, h1):
        assert a.shape[0] == b.shape[0] == 2
        np.testing.assert_array_equal(np.concatenate([a, b]), w)


def test_batch_loader_shard_divisibility_checked(imgdir, tmp_path):
    ds = ImageDataset([str(imgdir)], cache_dir=str(tmp_path / "c2"), size=8)
    with pytest.raises(AssertionError):
        BatchLoader(ds, 3, shard_index=0, shard_count=2)


def test_load_raw_and_device_cast(imgdir, tmp_path):
    """The warm fast path: load_raw serves the fp16 cache zero-copy;
    default batches are float32 and bit-equal to per-item loading;
    device_cast=True ships the fp16 batch as-is (the consumer casts on
    device — lossless because the cache is fp16-quantized either way)."""
    ds = ImageDataset([str(imgdir)], cache_dir=str(tmp_path / "c"), size=8)
    raw = ds.load_raw(0)
    assert raw.dtype == np.float16
    item = ds[0]
    assert item.dtype == np.float32
    np.testing.assert_array_equal(item, raw.astype(np.float32))

    for device_cast, want in ((False, np.float32), (True, np.float16)):
        loader = BatchLoader(ds, batch_size=2, shuffle=False,
                             device_cast=device_cast)
        batch = next(iter(loader))
        assert batch.dtype == want
        assert batch.shape == (2, 8, 8, 3)
        np.testing.assert_array_equal(
            batch.astype(np.float32),
            np.stack([ds[0], ds[1]]),
        )


def test_empty_dataset_fails_fast(tmp_path):
    """An empty/missing source dir must error with the searched paths
    (the reference trains silently over an empty loader)."""
    with pytest.raises(ValueError, match="no .jpg/.png images"):
        ImageDataset([str(tmp_path / "nope")],
                     cache_dir=str(tmp_path / "c"), size=8)
