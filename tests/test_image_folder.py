"""ImageFolderDataset / load_data pipeline tests."""
import os

import numpy as np
import pytest

from dxmi_tpu.data.image_folder import (ImageFolderDataset, center_crop_arr,
                                        list_image_files_recursively, load_data)


@pytest.fixture()
def image_dir(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(6):
            arr = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{cls}_{i}.png")
    return str(tmp_path)


def test_listing_and_classes(image_dir):
    files = list_image_files_recursively(image_dir)
    assert len(files) == 12
    ds = ImageFolderDataset(image_dir, image_size=32, class_cond=True)
    assert len(ds) == 12
    assert set(np.asarray(ds.classes)) == {0, 1}


def test_cachefile(image_dir, tmp_path):
    cache = str(tmp_path / ".cache")
    ds1 = ImageFolderDataset(image_dir, 32, class_cond=True, cachefile=cache)
    assert os.path.exists(cache)
    ds2 = ImageFolderDataset("/nonexistent", 32, class_cond=True,
                             cachefile=cache)  # served from cache
    assert ds2.files == ds1.files


def test_center_crop():
    from PIL import Image

    img = Image.fromarray(np.zeros((100, 140, 3), np.uint8))
    arr = center_crop_arr(img, 32)
    assert arr.shape == (32, 32, 3)


def test_load_data_batches(image_dir):
    gen = load_data(image_dir, batch_size=4, image_size=32, class_cond=True,
                    seed=0)
    x, extra = next(gen)
    assert x.shape == (4, 32, 32, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert extra["y"].shape == (4,)
    # infinite: survives dataset exhaustion
    for _ in range(6):
        x, extra = next(gen)
    assert x.shape == (4, 32, 32, 3)


def test_load_data_threaded_prefetch(image_dir):
    """num_workers>0: threaded decode yields the same deterministic
    batches as the synchronous path when augmentation RNG is off."""
    kw = dict(batch_size=4, image_size=32, class_cond=True,
              deterministic=True, random_flip=False, seed=0)
    sync = load_data(image_dir, **kw)
    thr = load_data(image_dir, num_workers=3, prefetch=2, **kw)
    for _ in range(5):
        xs, es = next(sync)
        xt, et = next(thr)
        np.testing.assert_array_equal(xs, xt)
        np.testing.assert_array_equal(es["y"], et["y"])
    # randomized path still produces valid batches
    gen = load_data(image_dir, batch_size=4, image_size=32, class_cond=False,
                    num_workers=2, seed=1)
    x, _ = next(gen)
    assert x.shape == (4, 32, 32, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_load_data_sharding(image_dir):
    g0 = load_data(image_dir, batch_size=2, image_size=32, class_cond=False,
                   deterministic=True, process_index=0, process_count=2)
    g1 = load_data(image_dir, batch_size=2, image_size=32, class_cond=False,
                   deterministic=True, process_index=1, process_count=2)
    x0, _ = next(g0)
    x1, _ = next(g1)
    assert not np.allclose(x0, x1)  # disjoint shards


def test_tensor_file_dataset(tmp_path):
    """README MVTec layout (datasets/mvtec/train_data.pth): tensor files
    load to NHWC [-1,1] with optional labels and batch infinitely."""
    import torch

    from dxmi_tpu.data.tensor_file import load_tensor_dataset, tensor_batches

    imgs = torch.rand(10, 3, 16, 16)  # NCHW in [0,1]
    p = tmp_path / "train_data.pth"
    torch.save(imgs, p)
    arr, labels = load_tensor_dataset(str(p))
    assert arr.shape == (10, 16, 16, 3) and labels is None
    assert -1.0 <= arr.min() and arr.max() <= 1.0

    # (data, labels) tuple form + infinite batching
    torch.save((imgs * 255, torch.arange(10)), p)
    gen = tensor_batches(str(p), 4, seed=0)
    for _ in range(5):
        x, extra = next(gen)
        assert x.shape == (4, 16, 16, 3)
        assert extra["y"].shape == (4,)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        next(tensor_batches(str(p), 4, image_size=32))
