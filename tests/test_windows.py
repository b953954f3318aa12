import numpy as np
import pytest

from dynavsr_tpu.data.windows import all_windows, index_generation


def test_interior_window():
    assert index_generation(10, 100, 5) == [8, 9, 10, 11, 12]
    assert index_generation(10, 100, 7) == [7, 8, 9, 10, 11, 12, 13]


def test_replicate_borders():
    assert index_generation(0, 100, 5, "replicate") == [0, 0, 0, 1, 2]
    assert index_generation(99, 100, 5, "replicate") == [97, 98, 99, 99, 99]


def test_reflection_borders():
    assert index_generation(0, 100, 5, "reflection") == [2, 1, 0, 1, 2]
    assert index_generation(1, 100, 5, "reflection") == [1, 0, 1, 2, 3]
    assert index_generation(99, 100, 5, "reflection") == [97, 98, 99, 98, 97]


def test_reflection_circle_borders():
    # Never reuses the center; borrows from the far side of the window.
    assert index_generation(0, 100, 5, "reflection_circle") == [4, 3, 0, 1, 2]
    assert index_generation(99, 100, 5, "reflection_circle") == [97, 98, 99, 96, 95]


def test_new_info_borders():
    assert index_generation(0, 100, 5, "new_info") == [4, 3, 0, 1, 2]
    assert index_generation(99, 100, 5, "new_info") == [97, 98, 99, 96, 95]


def test_all_windows_shape_and_validity():
    w = all_windows(30, 7, "reflection")
    assert w.shape == (30, 7)
    assert w.min() >= 0 and w.max() < 30
    np.testing.assert_array_equal(w[15], np.arange(12, 19))


def test_invalid_padding_raises():
    with pytest.raises(ValueError):
        index_generation(0, 10, 5, "bogus")
