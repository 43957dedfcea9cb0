"""User-defined function surface: vectorized UDF, grouped-map UDAF,
and Python UDTF.

SURVEY.md §2B "UDF/UDAF/UDTF surface": the reference's only extension
mechanism is the whole-DataFrame processor class
(`base_processor.py:39-51`, loaded by dotted path,
`streaming_pipeline.py:103-143`). The engine keeps that (pipeline.py)
and adds the column-level Spark-native tiers:

- scalar `pandas_udf` (Arrow-batched) — see operators/similarity.py
  `_lsh_buckets_udf` for the production use;
- grouped-map UDAF via `applyInPandas` (this module);
- table function via `@udtf` (this module).

Scale notes (100 TB): `applyInPandas` shuffles once on the grouping
key and streams each group through one Python worker as Arrow
batches — per-group memory is the constraint, so it is for
small-to-medium groups (here: per-user event histories), never for a
global group. A UDTF is a narrow per-row flatMap (no shuffle, no
state); rows cross to Python in Arrow batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf

TRIMMED_SCHEMA = (
    "user_id bigint, n_events bigint, sum_cents bigint, trimmed_mean double"
)


def _trimmed_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-user trimmed mean over integer cents for ONE
    coarse group (many users per call).

    All arithmetic is int64 (cents), so the result is exact and
    independent of pandas' row order — required for the DuckDB oracle
    hash compare. The divisions happen on exact integers (<= 2^53 in
    the double), bit-identical to the previous one-user-per-call form.
    """
    import numpy as np

    # floor(x*100 + 0.5): identical IEEE ops to the oracle's SQL form
    # (numpy .round() would use half-even, DuckDB ROUND half-away —
    # this form is the one both engines compute bit-identically)
    cents = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64")
    g = pd.DataFrame(
        {"user_id": pdf["user_id"].to_numpy(), "c": cents}
    ).groupby("user_id", sort=False)["c"]
    n = g.size().to_numpy()
    total = g.sum().to_numpy()
    mn = g.min().to_numpy()
    mx = g.max().to_numpy()
    # select numerator/denominator BEFORE dividing so the n==2 lane
    # never evaluates a zero denominator
    num = np.where(n > 2, total - mn - mx, total)
    den = np.where(n > 2, 100.0 * (n - 2), 100.0 * n)
    return pd.DataFrame(
        {
            "user_id": g.size().index.to_numpy().astype("int64"),
            "n_events": n,
            "sum_cents": total,
            "trimmed_mean": num / den,
        }
    )


def trimmed_stats_per_user(df: DataFrame, coarse: int = 256) -> DataFrame:
    """Grouped-map UDAF: per-user robust (min/max-trimmed) mean of
    ``value``, computed in pandas.

    The shuffle groups on a deterministic COARSE key
    (``pmod(user_id, coarse)``) rather than on ``user_id`` itself:
    every row of a user still lands in exactly one group, but the
    Python side is invoked ``coarse`` times total instead of once per
    user, and the per-user aggregation inside runs as ONE vectorized
    pandas groupby over the whole Arrow batch (guide §4.2 — hand whole
    batches to vectorized code; per-group dispatch was ~85% of this
    operator's wall time at sf0.1). Per-task memory is bounded by
    |users|/coarse histories — size ``coarse`` with the data, the same
    dial as any salt count."""
    from pyspark.sql import functions as F

    return (
        df.withColumn(
            "__cg", F.pmod(F.col("user_id"), F.lit(coarse)).cast("int")
        )
        .groupBy("__cg")
        .applyInPandas(_trimmed_stats, TRIMMED_SCHEMA)
    )


@udtf(returnType="pos int, token string, token_len int", useArrow=True)
class TokenizeUdtf:
    """Python UDTF: one input string -> one row per whitespace token.

    The table-function tier of the UDF surface. Functionally
    equivalent to explode(split(...)) — which is what production code
    should use (JVM-side); the UDTF exists to cover the extension
    point for logic that genuinely needs Python per-row expansion.
    useArrow=True picks the vectorized (ArrowEvalPythonUDTF) transfer
    path instead of row-pickled BatchEvalPythonUDTF.
    """

    def eval(self, text: str):  # noqa: D102 — contract fixed by Spark
        if text is None:
            return
        pos = 0
        for tok in text.split():
            yield pos, tok, len(tok)
            pos += 1


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL use (LATERAL joins etc.)."""
    spark.udtf.register("tokenize", TokenizeUdtf)
