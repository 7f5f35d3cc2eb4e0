"""(n, dim) matrices from Arrow ``list<float>`` columns without boxing.

``np.asarray(col.to_pylist())`` routes every float through a Python object —
for a dim-64 embedding column that is ~65 boxed objects per row, and it sits
on the hot path of every ANN / PQ / semantic-dedup stage. The fast path here
reads the Arrow child buffer directly (flatten + one reshape, at most one
memcpy) whenever the column satisfies the embedding-table contract: no
nulls, every row the same non-zero length.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n_rows, dim) ndarray from a ``list<float>`` / ``fixed_size_list``
    column (Array or ChunkedArray).

    Fast path: Arrow flatten + reshape when there are no nulls and every row
    has the same non-zero length. Ragged or null inputs fall back to the
    boxed ``to_pylist`` conversion (which raises the same numpy error a
    caller would have seen before this helper existed). The result may be a
    read-only view of the Arrow buffer — callers treat it as immutable.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count == 0:
        lens = pc.list_value_length(arr).to_numpy()
        dim = int(lens[0])
        if dim > 0 and (lens == dim).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(n, dim).astype(dtype, copy=False)
    return np.asarray(arr.to_pylist(), dtype=dtype)
