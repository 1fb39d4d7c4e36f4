"""Unit tests for the zero-copy column helpers (omni_ray/arrowcols.py)."""

import numpy as np
import pyarrow as pa

from omni_ray.arrowcols import col_np, vec_mat


def test_col_np_int_roundtrip():
    arr = pa.chunked_array([pa.array([1, 2, 3]), pa.array([4, 5])])
    out = col_np(arr, np.int64)
    assert out.dtype == np.int64
    assert out.tolist() == [1, 2, 3, 4, 5]


def test_col_np_negative_to_uint64_preserves_bits():
    arr = pa.array([-1, -2], pa.int64())
    out = col_np(arr, np.uint64)
    assert out.tolist() == [2**64 - 1, 2**64 - 2]


def test_vec_mat_uniform_chunked():
    m = np.arange(24, dtype=np.float64).reshape(6, 4)
    col = pa.chunked_array(
        [pa.array(list(m[:3]), pa.list_(pa.float64())),
         pa.array(list(m[3:]), pa.list_(pa.float64()))]
    )
    assert np.array_equal(vec_mat(col), m)


def test_vec_mat_sliced_list_array():
    m = np.arange(40, dtype=np.float64).reshape(10, 4)
    arr = pa.array(list(m), pa.list_(pa.float64())).slice(2, 5)
    assert np.array_equal(vec_mat(arr), m[2:7])


def test_vec_mat_fixed_size_list_sliced():
    m = np.arange(40, dtype=np.float64).reshape(10, 4)
    f = pa.FixedSizeListArray.from_arrays(pa.array(m.ravel()), 4).slice(3, 4)
    assert np.array_equal(vec_mat(f), m[3:7])


def test_vec_mat_empty():
    arr = pa.array([], pa.list_(pa.float64()))
    assert vec_mat(arr).shape[0] == 0


def test_vec_mat_ragged_falls_back_to_stack_error():
    # ragged rows are a caller bug; np.stack in the fallback raises
    arr = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64()))
    try:
        vec_mat(arr)
        raised = False
    except ValueError:
        raised = True
    assert raised
