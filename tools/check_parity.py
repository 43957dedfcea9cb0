"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at
the given sf dir, then compares: row count, column names, and
order-insensitive values (columns sorted by name, rows sorted, cells
canonicalized). Reports exact-match and isclose-match per query so
float risk is visible before the real gate runs.

Also reports TYPED-HASH RISK when the oracle's column types differ from
Spark's at the type-family level (e.g. DuckDB HUGEINT/DECIMAL vs Spark
BIGINT/DOUBLE): values can compare equal here yet hash differently under
the driver's typed comparison — that is exactly what failed
percentile_stats and q12_late_shipments in round 1.

Usage: python tools/check_parity.py [sf_dir] [query ...]
       python tools/check_parity.py --window   # show the driver's
           50-entry correctness window and which queries fall outside
       python tools/check_parity.py --vanilla [sf_dir] [query ...]
           # use a DRIVER-SHAPED SparkSession (no engine conf: default
           # timezone, 200 shuffle partitions, no AQE pinning) so any
           # query that silently depends on get_spark()'s settings
           # fails HERE instead of at the real gate
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from local_stream_stack_spark.catalog import TABLES
from local_stream_stack_spark.queries import QUERIES
from local_stream_stack_spark.session import get_spark


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        return float(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return str(v)


def sortable(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def cells_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        exact = a == b
        close = math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
        return exact, close
    eq = a == b
    return eq, eq


def compare(spark_rows, spark_cols, duck_rows, duck_cols):
    issues = []
    if len(spark_rows) != len(duck_rows):
        return [f"row count {len(spark_rows)} vs {len(duck_rows)}"], False, False
    if sorted(spark_cols) != sorted(duck_cols):
        return [f"columns {sorted(spark_cols)} vs {sorted(duck_cols)}"], False, False
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s = sorted(
        (tuple(canon(r[i]) for i in s_idx) for r in spark_rows), key=sortable
    )
    d = sorted(
        (tuple(canon(r[i]) for i in d_idx) for r in duck_rows), key=sortable
    )
    all_exact = all_close = True
    n_bad = 0
    for sr, dr in zip(s, d):
        for a, b in zip(sr, dr):
            exact, close = cells_equal(a, b)
            all_exact &= exact
            all_close &= close
            if not close and n_bad < 3:
                issues.append(f"cell {a!r} vs {b!r}")
                n_bad += 1
    return issues, all_exact, all_close


_TYPE_FAMILY = {
    # int widths <= 64 bits are ONE family: r01 proved the driver's
    # hash tolerates them (topk_per_group rk int32-vs-int64, string_funcs,
    # q7/q8/q9 year columns — all green). Only HUGEINT/UBIGINT (which
    # leave the int64 Arrow representation) broke it (q12).
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "INT": "int",
    "BIGINT": "int",
    "LONG": "int",
    "HUGEINT": "int128",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int128",
    "FLOAT": "float",
    "REAL": "float",
    "DOUBLE": "float",
    "BOOLEAN": "bool",
    "VARCHAR": "str",
    "STRING": "str",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
    # Spark TIMESTAMP_NTZ hashed equal to DuckDB TIMESTAMP in r01 (q3,
    # q18, filter_predicates were green) — same family, not a risk.
    "TIMESTAMP_NTZ": "ts",
}


def _family(type_str: str) -> str:
    t = str(type_str).upper()
    if t.startswith("DECIMAL"):
        return t.replace(" ", "")
    return _TYPE_FAMILY.get(t, t)


def typed_hash_risks(spark_schema, duck_cols, duck_types):
    """Column-name-matched type-family diffs between Spark and DuckDB."""
    spark_fams = {
        f.name: _family(f.dataType.simpleString()) for f in spark_schema.fields
    }
    risks = []
    for col, dt in zip(duck_cols, duck_types):
        sf, df_ = spark_fams.get(col), _family(dt)
        if sf is not None and sf != df_:
            risks.append(f"{col}: spark {sf} vs oracle {df_}")
    return risks


def show_window():
    from local_stream_stack_spark.queries import get_queries

    names = list(get_queries())
    print(f"{len(names)} registered queries; driver verifies the first 50:\n")
    for i, n in enumerate(names):
        spec = QUERIES[n]
        tag = "oracle" if spec.oracle else "rows-only"
        marker = "IN " if i < 50 else "OUT"
        print(f"  {marker} {i + 1:3d}. {n} [{tag}]")
    if len(names) > 50:
        print(
            f"\nWARNING: {len(names) - 50} queries fall OUTSIDE the driver's"
            " window this round (listed OUT above). Rotate"
            " DRIVER_VERIFIED_PREVIOUSLY in queries/registry.py next round."
        )


def main():
    args = sys.argv[1:]
    if args and args[0] == "--window":
        show_window()
        return 0
    vanilla = bool(args) and args[0] == "--vanilla"
    if vanilla:
        args = args[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("parity-vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_pass = n_fail = n_noracle = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(
                f"rows  {name}: {len(spark_rows)} rows (no oracle) "
                f"[{time.time()-t0:.1f}s]"
            )
            n_noracle += 1
            continue
        try:
            rel = con.sql(spec.oracle)
            duck_cols = list(rel.columns)
            duck_types = [str(t) for t in rel.types]
            duck_rows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: DUCKDB ERROR {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        issues, exact, close = compare(spark_rows, spark_cols, duck_rows, duck_cols)
        dt = time.time() - t0
        risks = typed_hash_risks(sdf.schema, duck_cols, duck_types)
        if close or exact:
            tag = "EXACT" if exact else "close"
            risk = f"  TYPED-HASH RISK: {'; '.join(risks)}" if risks else ""
            print(f"pass  {name}: {len(spark_rows)} rows {tag} [{dt:.1f}s]{risk}")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(issues[:5])} [{dt:.1f}s]")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
