"""Cogrouped-applyInPandas surface — the two-sided keyed Arrow batch API
(`df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas`), exercised as a
twin of the J1 interpolation join: per key, both sides arrive as aligned
pandas frames and numpy interpolates in one vectorized call.

This is the slow-path twin by design (SURVEY §2.9: every Python batch API
gets an oracle-matched exercise): the JVM union+window `interp_join`
(operators/joins.py) is the production shape — one shuffle, codegen,
`bucket=` for giant keys — while cogroup shuffles BOTH sides to the key
and runs Python per group. Use cogroup when per-key logic genuinely needs
both sides as materialized arrays (solvers, per-key model fits), not for
anything a window can say. Semantics match interp_join exactly: NULL
outside the per-value sample hull, exact value at exact time matches,
per-value NULL-sample skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructType


def interp_join_cogrouped(
    samples: DataFrame,
    probes: DataFrame,
    on: str,
    values: list[str],
    partition_by: list[str],
    suffix: str = "",
) -> DataFrame:
    """Cogrouped twin of joins.interp_join (same contract; requires
    ``partition_by`` — cogroup is keyed by construction, and duplicate
    sample times per key resolve to the last occurrence)."""
    import numpy as np
    import pandas as pd  # noqa: F401  (worker-side dependency, imported eagerly)

    out_fields = [f for f in probes.schema.fields]
    names = []
    for v in values:
        name = v + suffix if suffix else v
        if name in probes.columns:
            raise ValueError(f"output column {name!r} collides with a probe column; pass a suffix")
        names.append(name)
    schema = StructType(out_fields)
    for name in names:
        schema = schema.add(name, DoubleType())

    probe_cols = list(probes.columns)
    sample_cols = [on, *values]

    # re-alias EVERY column with a side prefix before cogrouping: when
    # both sides derive from the same plan, Spark's relation
    # deduplication collapses identically-derived attributes and one
    # side's Arrow batches arrive MISSING those columns (observed on a
    # shared withColumn under Spark 4.1). Fresh per-side aliases get
    # fresh expression ids, which makes the operator safe regardless of
    # caller lineage.
    s_df = samples.select(
        *[F.col(c).alias(f"__s_{c}") for c in [*partition_by, *sample_cols]]
    )
    p_df = probes.select(*[F.col(c).alias(f"__p_{c}") for c in probe_cols])

    def fn(left, right):
        import pandas as pd

        # a key present on only one side delivers the other side as an
        # empty frame (possibly without columns) — normalize both
        if len(right) == 0:
            return pd.DataFrame({c: [] for c in probe_cols + names})
        if len(left) == 0:
            left = pd.DataFrame({f"__s_{c}": [] for c in sample_cols})
        out = right[[f"__p_{c}" for c in probe_cols]].copy()
        out.columns = probe_cols
        t = out[on].astype("float64").to_numpy()
        for v, name in zip(values, names):
            s = (
                left[[f"__s_{on}", f"__s_{v}"]]
                .dropna()
                .sort_values(f"__s_{on}", kind="mergesort")
                .drop_duplicates(f"__s_{on}", keep="last")
            )
            if len(s) == 0:
                out[name] = np.nan
                continue
            xp = s[f"__s_{on}"].astype("float64").to_numpy()
            fp = s[f"__s_{v}"].astype("float64").to_numpy()
            y = np.interp(t, xp, fp)
            y[(t < xp[0]) | (t > xp[-1])] = np.nan  # NULL outside the hull
            out[name] = y
        return out

    return (
        s_df.groupBy(*[f"__s_{c}" for c in partition_by])
        .cogroup(p_df.groupBy(*[f"__p_{c}" for c in partition_by]))
        .applyInPandas(fn, schema)
    )
