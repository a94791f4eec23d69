"""Prefetching ingest pipeline."""

import numpy as np
import pytest

from image_retrieval_tpu.data.loader import ImageBatchLoader, encode_folder
from image_retrieval_tpu.models.encoder import FakeEncoder


@pytest.fixture(scope="module")
def img_files(tmp_path_factory):
    from image_retrieval_tpu.data.synthetic import synth_image

    folder = tmp_path_factory.mktemp("loader_imgs")
    paths = []
    for i in range(10):
        p = folder / f"i{i}.jpg"
        synth_image(i % 10, "white", i).save(p)
        paths.append(str(p))
    return paths


@pytest.mark.parametrize("use_native", [False, True])
def test_loader_batches(img_files, use_native):
    loader = ImageBatchLoader(img_files, batch_size=4, size=64, use_native=use_native)
    assert len(loader) == 3
    seen = []
    for chunk, batch, ok in loader:
        assert batch.shape[1:] == (64, 64, 3)
        assert batch.dtype == np.float32
        assert ok.all()
        seen.extend(chunk)
    assert seen == img_files


def test_loader_handles_bad_files(tmp_path, img_files):
    bad = tmp_path / "bad.jpg"
    bad.write_text("nope")
    loader = ImageBatchLoader([str(bad)] + img_files[:3], batch_size=4, size=64,
                              use_native=False)
    chunk, batch, ok = next(iter(loader))
    assert not ok[0] and ok[1:].all()


def test_encode_folder_pipeline(img_files):
    enc = FakeEncoder(dim=512)
    ok_paths, embs = encode_folder(enc, img_files, batch_size=4, size=224,
                                   use_native=False)
    assert len(ok_paths) == 10
    assert embs.shape == (10, 512)
    # equals the direct path
    direct = enc.encode_images(img_files)
    np.testing.assert_allclose(embs, direct, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("use_native", [False, True])
def test_loader_u8_emit(img_files, use_native):
    """emit='u8' yields raw uint8 batches; FakeEncoder normalizes them to
    the same embeddings as the f32 form (up to the u8 rounding of the
    bilinear output)."""
    if use_native:
        from image_retrieval_tpu.utils import native

        if not native.available():
            pytest.skip("native library unavailable")
    loader = ImageBatchLoader(img_files, batch_size=4, size=64,
                              use_native=use_native, emit="u8")
    enc = FakeEncoder(dim=64)
    embs_u8, embs_f32 = [], []
    for chunk, batch, ok in loader:
        assert batch.dtype == np.uint8 and ok.all()
        embs_u8.append(enc.encode_pixels(batch))
    for chunk, batch, ok in ImageBatchLoader(
            img_files, batch_size=4, size=64, use_native=use_native):
        embs_f32.append(enc.encode_pixels(batch))
    u8 = np.concatenate(embs_u8)
    f32 = np.concatenate(embs_f32)
    # u8 quantization of pixels perturbs fake embeddings slightly
    assert np.abs(u8 - f32).max() < 0.2
    assert np.linalg.norm(u8 - f32, axis=1).max() < 0.5


def test_producer_exception_surfaces(tmp_path, monkeypatch):
    """A producer-thread crash must raise in the consumer, not silently
    truncate the corpus (the None sentinel used to mask it)."""
    from image_retrieval_tpu.data import loader as L

    paths = [str(tmp_path / f"x{i}.jpg") for i in range(8)]

    def boom(chunk, size, emit="f32"):
        raise MemoryError("decode blew up")

    monkeypatch.setattr(L, "_decode_chunk_pil", boom)
    with pytest.raises(MemoryError):
        list(L.ImageBatchLoader(paths, batch_size=4, use_native=False))


def test_abandoned_iterator_does_not_leak_producer(tmp_path, rng):
    """Breaking out of iteration must let the producer thread exit even when
    the bounded queue is full (q.put observes the stop event)."""
    import threading
    import time

    from PIL import Image
    from image_retrieval_tpu.data.loader import ImageBatchLoader

    paths = []
    for i in range(12):
        p = tmp_path / f"i{i}.png"
        Image.fromarray(rng.uniform(0, 255, (8, 8, 3)).astype(np.uint8)).save(p)
        paths.append(str(p))
    before = threading.active_count()
    it = iter(ImageBatchLoader(paths, batch_size=1, prefetch=1, use_native=False))
    next(it)
    it.close()  # abandon: GeneratorExit triggers the finally/stop path
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_ingest_bench_full_chain(tmp_path):
    """tools/ingest_bench.py runs the measured chain end to end (small
    corpus, fake encoder) and reports every bound-decomposition field."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from ingest_bench import run_ingest_bench
    finally:
        sys.path.pop(0)
    from image_retrieval_tpu.models.encoder import FakeEncoder

    res = run_ingest_bench(
        FakeEncoder(dim=64), str(tmp_path / "corpus"), n_images=24,
        batch_size=8,
    )
    for key in ("decode_img_per_s_core", "encode_img_per_s_device",
                "e2e_img_per_s", "overlap_efficiency",
                "cores_to_saturate_device", "serial_floor_img_per_s",
                "e2e_wait_decode_s", "e2e_wait_device_s", "e2e_insert_s"):
        assert key in res and res[key] >= 0, key
    assert res["n_images"] == 24


def test_process_decode_loader(tmp_path):
    """use_process=True decodes in a spawned subprocess (GIL-free from the
    parent) and yields identical batches to the in-process path."""
    from PIL import Image

    rng = np.random.default_rng(9)
    paths = []
    for i in range(6):
        p = tmp_path / f"p{i}.jpg"
        Image.fromarray(
            rng.uniform(0, 255, (48, 48, 3)).astype(np.uint8)
        ).save(p, quality=90)
        paths.append(str(p))
    paths.append(str(tmp_path / "missing.jpg"))  # per-image failure

    def collect(**kw):
        out = []
        for chunk, batch, ok in ImageBatchLoader(
            paths, batch_size=4, size=32, use_native=False, **kw
        ):
            out.append((list(chunk), batch.copy(), ok.copy()))
        return out

    a = collect()
    b = collect(use_process=True)
    assert len(a) == len(b)
    for (c1, b1, o1), (c2, b2, o2) in zip(a, b):
        assert c1 == c2
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(b1, b2)
    assert not a[-1][2][-1]  # the missing file is a per-image skip
