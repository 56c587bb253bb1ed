"""Zero-copy-ish Arrow <-> numpy bridges for ``mapInArrow`` /
``applyInArrow`` kernels (guide §4.2).

The pandas grouped/cogrouped kernels paid twice at the Python boundary:
Arrow -> pandas materializes every ``array<float>`` cell as a boxed
per-row ``np.ndarray`` object, and the kernels re-stacked those objects
with ``np.array(list(...))`` (measured ~1.5-2x of the whole cogroup
stage at the 500k-row selfsearch shape).  An Arrow ``ListArray`` is ONE
contiguous values buffer plus offsets, so the ``(n, dim)`` kernel
operand is a flatten + reshape + one vectorized ``astype`` — the float
bytes are identical, only the conversion layer changes.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "list_matrix",
    "scalar_column",
    "repeat_list_column",
    "matrix_to_list_array",
    "empty_result",
]


def list_matrix(tbl: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    """``(n, dim)`` matrix from a fixed-width ``array<...>`` column.

    ``reshape`` raises if row widths differ — these columns are
    fixed-dim by construction, so failing loudly beats silent padding.
    """
    c = tbl.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    flat = c.flatten().to_numpy(zero_copy_only=False)
    n = len(c)
    out = flat.astype(dtype, copy=False)
    return out.reshape(n, -1) if n else out.reshape(0, 0)


def binary_matrix(tbl: pa.Table, col: str) -> np.ndarray:
    """``(n, nbytes)`` uint8 matrix from an equal-width ``binary``
    column — the packed-bit layout the popcount kernels scan.  Reads the
    Arrow data buffer through the offsets vector (no per-row ``bytes``
    objects, no ``b"".join``)."""
    c = tbl.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    n = len(c)
    if n == 0:
        return np.empty((0, 0), dtype=np.uint8)
    off = np.frombuffer(c.buffers()[1], dtype=np.int32)[
        c.offset : c.offset + n + 1
    ]
    data = np.frombuffer(c.buffers()[2], dtype=np.uint8)
    return data[off[0] : off[-1]].reshape(n, -1)


def scalar_column(tbl: pa.Table, col: str, dtype) -> np.ndarray:
    """Flat numpy array from a scalar column."""
    c = tbl.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False).astype(dtype, copy=False)


def repeat_list_column(tbl: pa.Table, col: str, repeats: int) -> pa.Array:
    """Each list row repeated ``repeats`` times (type preserved exactly,
    values gathered by one vectorized ``take``)."""
    c = tbl.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    idx = np.repeat(np.arange(len(c), dtype=np.int64), repeats)
    return c.take(pa.array(idx))


def matrix_to_list_array(mat: np.ndarray, value_type: pa.DataType) -> pa.Array:
    """``(n, dim)`` matrix -> ``list<value_type>`` array (one values
    buffer + an arithmetic offsets vector — no per-row boxing)."""
    n, dim = mat.shape if mat.ndim == 2 else (0, 0)
    values = pa.array(
        np.ascontiguousarray(mat).reshape(-1), type=value_type
    )
    offsets = pa.array(
        np.arange(0, (n + 1) * dim, dim, dtype=np.int32), type=pa.int32()
    )
    return pa.ListArray.from_arrays(offsets, values)


def empty_result(schema: pa.Schema) -> pa.Table:
    """Zero-row table matching ``schema``."""
    return schema.empty_table()
