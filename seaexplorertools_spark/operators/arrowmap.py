"""RecordBatch-level transforms via ``mapInArrow`` (SURVEY §2.9 surface).

``mapInArrow`` hands the Python function raw ``pyarrow.RecordBatch``es —
no pandas materialization, no per-column Series boxing — the lowest-
overhead Python boundary Spark offers. The right tool when the transform
is already vectorized over Arrow buffers (numpy views) and the schema is
wide or list-typed (pandas conversion of list columns is the usual cost).

Production guidance in this engine: pure-JVM expressions first
(``similarity.py`` norms are `aggregate`/`transform`), Arrow batches only
when Python is unavoidable. This module keeps the machinery itself tested
and oracle-checkable, mirroring ``functions/udtfs.py`` for UDTFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame


def l2_normalize_arrow(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Unit-normalize a ``array<float>`` column batch-at-a-time: flatten the
    Arrow list buffer to one numpy view, one vectorized norm per row, one
    rebuild — no per-row Python, no pandas. Output schema == input schema
    (same column replaced)."""
    schema = df.schema

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            idx = batch.schema.get_field_index(vec_col)
            col = batch.column(idx)
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover — batches are flat
                col = col.combine_chunks()
            lst = col.cast(pa.list_(pa.float64()))
            flat = np.asarray(lst.values)
            offs = np.asarray(lst.offsets)
            lens = np.diff(offs)
            # segment norms without a Python loop: prefix-sum of squares
            # differenced at the list offsets (reduceat would choke on
            # zero-length rows)
            c = np.concatenate([[0.0], np.cumsum(flat * flat)])
            seg = c[offs[1:]] - c[offs[:-1]]
            nrm = np.sqrt(seg)
            nrm[nrm == 0.0] = 1.0
            normed = flat / np.repeat(nrm, lens)
            out = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pa.array(normed, pa.float64()))
            arrays = list(batch.columns)
            arrays[idx] = out.cast(col.type)
            yield pa.RecordBatch.from_arrays(arrays, schema=batch.schema)

    return df.mapInArrow(fn, schema=schema)
