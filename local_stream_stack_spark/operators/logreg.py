"""Distributed integer-exact logistic-regression trainer — the
fasttext-style document-quality classifier a curation pipeline
bootstraps from rule labels (VERDICT r7 task #8: the trainer family's
missing member next to k-means/PQ/BPE).

Training at 100 TB is one bounded-shuffle moment aggregation per
iteration with driver-side parameter carry — exactly the k-means
discipline: the executors never see python state, the driver never
sees rows. Per round:

1. score: z_raw = sum_i w_i(e6) * x_i(e4)  — exact BIGINT per row
   (weights enter the plan as literals).
2. link: p = 0.5 + 0.5 * z / (2 + |z|), z = z_raw / 1e10. This is the
   ALGEBRAIC sigmoid — same S-shape, gradient sign, and fixpoints as
   the logistic link, but built ONLY from IEEE-correctly-rounded ops
   (+, *, /, abs), so any engine computes bit-identical p from the
   same integers. exp() carries no such guarantee across engines,
   which is why the classic logistic link cannot survive the oracle
   gate (the sqrt-over-pow rule from the statistics family, applied
   to the link function).
3. per-row gradient contribution, SINGLE-rounded to a scaled BIGINT
   BEFORE aggregation: g_i = FLOOR((p - y) * x_i * 100.0 + 0.5)
   (e6 scale) — integer sums are order-independent, so partitioning
   cannot change the result.
4. driver update from the k aggregated sums (one collect of one row):
   w_i -= FLOOR(lr * (G_i / n) + 0.5) — the same double arithmetic an
   unrolled SQL oracle replays.

The decision boundary is the INTEGER compare z_raw >= 0 — scoring
never touches floats at the boundary.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_SCALE = 10_000_000_000.0  # e6 weights x e4 features


def z_raw_sql(weights_e6: Sequence[int], feature_cols: Sequence[str]) -> str:
    """SQL expression for the exact BIGINT score sum_i w_i * x_i."""
    return " + ".join(
        f"({int(w)}L * {c})" for w, c in zip(weights_e6, feature_cols)
    )


def p_sql(z_raw: str) -> str:
    """Algebraic-sigmoid SQL over a raw integer score (see module
    docstring for why not exp())."""
    z = f"(CAST({z_raw} AS DOUBLE) / {Z_SCALE})"
    return f"(0.5 + 0.5 * {z} / (2.0 + abs({z})))"


def grad_e6_sql(p: str, label_col: str, feature_col: str) -> str:
    """Per-row, per-feature gradient contribution, single-rounded to
    an e6 BIGINT before any aggregation."""
    return (
        f"CAST(FLOOR(({p} - {label_col}) * {feature_col} * 100.0 + 0.5)"
        " AS BIGINT)"
    )


def decayed_lrs(lr0: float = 64.0, iterations: int = 12) -> list[float]:
    """The default 1/r learning-rate schedule — measured on the
    quality-classifier corpus to reach ~95-96% rule agreement at both
    sf0.01 and sf0.1 (majority baseline 72-74%); constant schedules
    >= 32 land at the same fixpoint, smaller ones stall at the
    all-positive solution."""
    return [lr0 / (r + 1) for r in range(iterations)]


def train_logreg_e6(
    feats: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    lrs: Sequence[float] | None = None,
    materialize_input: bool = True,
) -> list[int]:
    """Run one quasi-gradient round per ``lrs`` entry; returns the e6
    integer weight vector. ``feats`` must carry e4-scaled BIGINT
    feature columns and a 0/1 integer label. Empty input returns the
    zero vector (nothing to learn, nothing to fail on)."""
    cols = list(feature_cols)
    lrs = decayed_lrs() if lrs is None else list(lrs)
    if materialize_input:
        feats = feats.localCheckpoint(eager=True)
    w = [0] * len(cols)
    for lr in lrs:
        p = p_sql(z_raw_sql(w, cols))
        aggs = [
            F.expr(f"SUM({grad_e6_sql(p, label_col, c)})").alias(f"g{i}")
            for i, c in enumerate(cols)
        ] + [F.count("*").alias("n")]
        row = feats.agg(*aggs).collect()[0]
        n = row["n"]
        if not n:
            return w
        for i in range(len(cols)):
            g = row[f"g{i}"]
            w[i] = w[i] - int(math.floor(lr * (g / n) + 0.5))
    return w


def train_logreg_e6_reference(
    rows: Sequence[Sequence[int]],
    labels: Sequence[int],
    lrs: Sequence[float] | None = None,
) -> list[int]:
    """Pure-python replay of :func:`train_logreg_e6` for pytest
    pinning — same integers in, identical weights out."""
    k = len(rows[0]) if rows else 0
    lrs = decayed_lrs() if lrs is None else list(lrs)
    w = [0] * k
    for lr in lrs:
        g = [0] * k
        for x, y in zip(rows, labels):
            z_raw = sum(wi * xi for wi, xi in zip(w, x))
            z = z_raw / Z_SCALE
            p = 0.5 + 0.5 * z / (2.0 + abs(z))
            for i in range(k):
                g[i] += int(math.floor((p - y) * x[i] * 100.0 + 0.5))
        n = len(rows)
        if not n:
            return w
        for i in range(k):
            w[i] = w[i] - int(math.floor(lr * (g[i] / n) + 0.5))
    return w
