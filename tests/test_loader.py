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
