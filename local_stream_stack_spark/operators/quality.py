"""Data-quality expectations: declarative row/set rules evaluated in
one pass, reported as (rule, n_violations) rows.

The dbt-test / Great-Expectations primitive a curation pipeline runs
before admitting a snapshot: NOT NULL, accepted values, ranges,
cross-column predicates (row rules) and key uniqueness (set rules).

Scale shape: every ROW rule is a conditional count inside ONE
aggregate over one scan — adding rules adds zero scans and zero
shuffles (the single-row global aggregate moves |rules| longs).
Each UNIQUENESS rule is one extra distinct-style aggregate on its key
columns (count minus distinct count), partial-aggregated scan-side.
Violation counts (not failing rows) are the report contract — at
100 TB the rows themselves are a follow-up filtered scan, never a
driver materialization.

No reference analog (the reference validates config shape only,
`streaming_pipeline.py:60-62`); this extends the pipeline the same
way the YAML `validate` stage gestures at.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(
    df: DataFrame,
    row_rules: Mapping[str, Column],
    unique_rules: Mapping[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Evaluate expectations and return (rule, n_violations) rows.

    ``row_rules`` maps rule name -> a BOOLEAN Column that is TRUE when
    the row VIOLATES the rule (e.g. ``F.col("price") <= 0``). All row
    rules share one aggregate. ``unique_rules`` maps rule name -> key
    columns whose combination must be unique; violations = number of
    surplus rows (total - distinct combinations, so a key seen 3x
    contributes 2).

    Output is one row per rule, ordered by rule name.
    """
    if not row_rules and not unique_rules:
        raise ValueError("at least one rule required")
    spark = df.sparkSession
    pieces: list[DataFrame] = []
    if row_rules:
        aggs = [
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(name)
            for name, cond in row_rules.items()
        ]
        wide = df.agg(*aggs)
        stacked = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("rule"),
                            F.col(name).alias("n_violations"),
                        )
                        for name in row_rules
                    ]
                )
            ).alias("r")
        ).select("r.rule", "r.n_violations")
        pieces.append(stacked)
    for name, keys in (unique_rules or {}).items():
        k = [F.col(c) for c in keys]
        agg = df.agg(
            (F.count(F.lit(1)) - F.count_distinct(*k))
            .cast("bigint")
            .alias("n_violations")
        )
        pieces.append(agg.select(F.lit(name).alias("rule"), "n_violations"))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    # tiny result set (|rules| rows) — the sort is driver-cheap
    return out.orderBy("rule")


def observe_expectations(
    df: DataFrame, name: str, row_rules: Mapping[str, Column]
):
    """Attach expectations as OBSERVED METRICS (``df.observe``):
    violation counters computed inside whatever action the caller
    already runs — ZERO extra scans or shuffles, the production
    monitoring form of ``expectations_report`` (which answers the same
    question as a standalone query).

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` AFTER an action has consumed ``df``. Works on
    batch frames; on streaming frames the same metrics surface per
    micro-batch via ``QueryProgressEvent.observedMetrics[name]``.
    """
    from pyspark.sql import Observation

    if not row_rules:
        raise ValueError("at least one rule required")
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).cast("bigint").alias("n_rows")] + [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias(rule)
        for rule, cond in row_rules.items()
    ]
    return df.observe(obs, *metrics), obs
