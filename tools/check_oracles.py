"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, column names, and order-insensitive values (floats rounded)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(round(v, 6))
            elif pd.isna(v):
                vals.append(None)
            elif isinstance(v, (int,)):
                vals.append(int(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main(sf_dir: str, only: list[str] | None = None) -> int:
    from ckg_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("check_oracles", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            failures += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures += 1
            continue
        cg, ce = _canon(got), _canon(exp)
        if cg != ce:
            bad = [(a, b) for a, b in zip(cg, ce) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            failures += 1
            continue
        # typed compare: the driver hashes typed values, so a DECIMAL/HUGEINT
        # on the oracle side vs DOUBLE/BIGINT on the Spark side diverges even
        # when values match. Approximate by comparing pandas dtype kinds
        # (int-vs-int, float-vs-float), tolerating null-driven upcasts.
        KIND = {"i": "i", "u": "i", "f": "f", "O": "O", "b": "b", "M": "M"}
        dg = {c: KIND.get(got[c].dtype.kind, got[c].dtype.kind) for c in got.columns}
        de = {c: KIND.get(exp[c].dtype.kind, exp[c].dtype.kind) for c in exp.columns}
        mismatched = {
            c: (dg[c], de[c])
            for c in dg
            if dg[c] != de[c]
            and not ({dg[c], de[c]} == {"i", "f"} and (got[c].isna().any() or exp[c].isna().any()))
        }
        if mismatched:
            print(f"WARN {name}: dtype-kind mismatch (possible typed-hash fail): {mismatched}")
        if any(isinstance(v, __import__('decimal').Decimal)
               for c in exp.columns if exp[c].dtype.kind == "O"
               for v in exp[c].head(3)):
            print(f"WARN {name}: oracle returns decimal.Decimal objects (typed-hash risk)")
        print(f"ok   {name}: {len(got)} rows match")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    raise SystemExit(main(sf, only))
