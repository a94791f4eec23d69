"""Native C++ runtime vs the Python reference paths."""

import numpy as np
import pytest

from image_retrieval_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++/libjpeg)"
)


@pytest.fixture(scope="module")
def jpeg_files(tmp_path_factory):
    from image_retrieval_tpu.data.synthetic import synth_image

    folder = tmp_path_factory.mktemp("native_imgs")
    paths = []
    for i in range(4):
        p = folder / f"img_{i}.jpg"
        synth_image(i, "brown", i).save(p, quality=95)
        paths.append(str(p))
    png = folder / "img.png"
    synth_image(5, "white", 0).save(png)
    paths.append(str(png))
    return paths


def test_decode_preprocess_close_to_pil(jpeg_files):
    from image_retrieval_tpu.models.preprocess import preprocess_host

    batch, ok = native.decode_preprocess_batch(jpeg_files, size=224, threads=2)
    assert ok.all()
    assert batch.shape == (5, 224, 224, 3)
    for i, p in enumerate(jpeg_files):
        ref = preprocess_host(p)
        # bilinear (native) vs bicubic (PIL parity path): close but not equal
        err = np.abs(batch[i] - ref).mean()
        assert err < 0.1, (p, err)


def test_decode_preprocess_u8_matches_f32_form(jpeg_files):
    """The u8 ingest form + device normalize must equal the host-complete
    f32 form up to the u8 rounding of the bilinear output (<= 0.5/255
    pre-normalize, ~0.008 after CLIP std)."""
    from image_retrieval_tpu.models.preprocess import CLIP_MEAN, CLIP_STD

    f32, ok_f = native.decode_preprocess_batch(jpeg_files, size=224, threads=2)
    u8, ok_u = native.decode_preprocess_batch_u8(jpeg_files, size=224,
                                                 threads=2)
    assert ok_f.all() and ok_u.all()
    assert u8.shape == (5, 224, 224, 3) and u8.dtype == np.uint8
    norm = (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    assert np.abs(norm - f32).max() < 0.011


def test_normalize_u8_device_matches_host(jpeg_files):
    from image_retrieval_tpu.models.preprocess import (
        CLIP_MEAN,
        CLIP_STD,
        normalize_u8_device,
    )

    u8, ok = native.decode_preprocess_batch_u8(jpeg_files[:2], size=64)
    assert ok.all()
    dev = np.asarray(normalize_u8_device(u8))
    host = (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(dev, host, rtol=0, atol=1e-6)


def test_decode_bad_file_u8(tmp_path, jpeg_files):
    bad = tmp_path / "junk.jpg"
    bad.write_bytes(b"not an image at all")
    batch, ok = native.decode_preprocess_batch_u8(
        [str(bad), jpeg_files[0]], size=64)
    assert not ok[0] and ok[1]
    assert np.all(batch[0] == 0)


def test_decode_bad_file(tmp_path, jpeg_files):
    bad = tmp_path / "junk.jpg"
    bad.write_bytes(b"not an image at all")
    batch, ok = native.decode_preprocess_batch([str(bad), jpeg_files[0]], size=64)
    assert not ok[0] and ok[1]
    assert np.all(batch[0] == 0)


def test_thumbnails(jpeg_files):
    batch, ok = native.decode_thumbnail_batch(jpeg_files, size=64)
    assert ok.all()
    assert batch.shape == (5, 64, 64, 3) and batch.dtype == np.uint8
    assert batch.max() > 50  # actually decoded something


def test_native_cosine_topk_matches_numpy(rng):
    g = rng.normal(size=(500, 64)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = rng.normal(size=(64,)).astype(np.float32)
    scores, idx = native.cosine_topk(q, g, k=10, threads=2)
    ref = g @ q / np.linalg.norm(q)
    order = np.argsort(-ref, kind="stable")[:10]
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_allclose(scores, ref[order], rtol=1e-5, atol=1e-6)
