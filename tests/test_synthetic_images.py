"""structured_class_images: the learnable fake-data substrate for the
large-image convergence recipes (round 5)."""
import numpy as np

from dxmi_tpu.data.synthetic import structured_class_images


def test_structured_class_images_deterministic_and_ranged():
    x1, y1 = structured_class_images(32, 16, 4, seed=5)
    x2, y2 = structured_class_images(32, 16, 4, seed=5)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    assert x1.shape == (32, 16, 16, 3) and x1.dtype == np.float32
    assert x1.min() >= -1.0 and x1.max() <= 1.0
    assert y1.min() >= 0 and y1.max() < 4
    # class signal exists: per-class means differ
    m = [x1[y1 == c].mean() for c in range(4) if (y1 == c).any()]
    assert np.std(m) > 1e-3
