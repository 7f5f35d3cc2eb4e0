"""embedding_matrix: the Arrow-flatten fast path must agree exactly with the
boxed to_pylist conversion it replaced (every ANN/PQ/semantic stage now
routes through it)."""
import numpy as np
import pyarrow as pa

from brdrq_ray.functions.vecs import embedding_matrix


def test_list_column_matches_boxed():
    rows = [[1.0, 2.0, 3.0], [4.5, -1.25, 0.0], [7.0, 8.0, 9.0]]
    arr = pa.array(rows, pa.list_(pa.float64()))
    out = embedding_matrix(arr)
    assert out.dtype == np.float64 and out.shape == (3, 3)
    np.testing.assert_array_equal(out, np.asarray(rows, dtype=np.float64))


def test_float32_and_fixed_size_list():
    rows = [[1.0, 2.0], [3.0, 4.0]]
    f32 = pa.array(rows, pa.list_(pa.float32()))
    np.testing.assert_allclose(embedding_matrix(f32),
                               np.asarray(rows), rtol=1e-6)
    fsl = pa.array(rows, pa.list_(pa.float64(), 2))
    np.testing.assert_array_equal(embedding_matrix(fsl), np.asarray(rows))


def test_chunked_and_sliced():
    rows = [[float(i), float(i + 1)] for i in range(6)]
    chunked = pa.chunked_array([pa.array(rows[:2], pa.list_(pa.float64())),
                                pa.array(rows[2:], pa.list_(pa.float64()))])
    np.testing.assert_array_equal(embedding_matrix(chunked), np.asarray(rows))
    sliced = pa.array(rows, pa.list_(pa.float64())).slice(2, 3)
    np.testing.assert_array_equal(embedding_matrix(sliced),
                                  np.asarray(rows[2:5]))


def test_empty_and_ragged_fallback():
    assert embedding_matrix(pa.array([], pa.list_(pa.float64()))).shape == (0, 0)
    # ragged rows take the boxed path and raise the same numpy error
    ragged = pa.array([[1.0], [2.0, 3.0]], pa.list_(pa.float64()))
    try:
        embedding_matrix(ragged)
        raised = False
    except ValueError:
        raised = True
    assert raised
