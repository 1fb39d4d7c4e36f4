"""Zero-copy-ish Arrow column → numpy conversion helpers for hot stages.

``Array.to_pylist()`` round-trips every value through a Python object; for a
numeric column that is ~100× slower than ``to_numpy(zero_copy_only=False)``
(measured: 2.5 s vs 22 ms for 4M int64 on this box).  Every numeric column
access in a per-batch UDF should go through these helpers; ``to_pylist``
stays only for string/struct columns that genuinely need Python objects.

All helpers accept ``pa.Array`` or ``pa.ChunkedArray``.  ``col_np`` assumes
the column has no nulls (true for every internally-constructed column these
hot paths touch); a null would surface as NaN after a silent cast to float,
so callers that may see nulls must fill them first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def col_np(col: "pa.Array | pa.ChunkedArray", dtype=None) -> np.ndarray:
    """Numeric (or bool/temporal) column → 1-D numpy array, no Python objects."""
    a = col.to_numpy(zero_copy_only=False)
    if dtype is not None:
        a = a.astype(dtype, copy=False)
    return a


def vec_mat(col: "pa.Array | pa.ChunkedArray", dtype=np.float64) -> np.ndarray:
    """list<numeric> column of uniform width → (n, d) matrix.

    Flattens the Arrow child buffer directly (no per-row Python lists); falls
    back to ``np.stack(to_pylist())`` only for ragged rows, which the
    embedding tables never have.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        vals = col.values.to_numpy(zero_copy_only=False)
        # .values ignores the slice offset; window it explicitly
        off = col.offset * d
        return vals[off:off + n * d].reshape(n, d).astype(dtype, copy=False)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if (widths == widths[0]).all():
        vals = col.values.to_numpy(zero_copy_only=False)
        flat = vals[offsets[0]:offsets[-1]]
        return flat.reshape(n, int(widths[0])).astype(dtype, copy=False)
    return np.stack(col.to_pylist()).astype(dtype)
