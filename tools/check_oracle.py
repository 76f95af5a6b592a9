#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` twin on DuckDB (same parquet registered as views), then
compares row count, column-name set, and exact values (columns sorted by
name, rows sorted) — stricter than any order-insensitive value hash, so
passing here implies passing the driver's t2 gate.

Usage:
    python3 tools/check_oracle.py            # all queries
    python3 tools/check_oracle.py q1 locf    # substring-filtered subset
    SF_DIR=/root/testdata/sf0.001 python3 tools/check_oracle.py
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events documents embeddings").split()


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted, types normalized."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), key=lambda s: s.map(_sort_key)).reset_index(drop=True)
    return df


def _sort_key(v):
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return ""
    return str(v)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if len(sdf) != len(odf):
        errs.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return errs
    if errs:
        return errs
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            a, b = sv.to_numpy(), ov.astype("float64").to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            eq = (a == b) | both_nan
            if not eq.all():
                diffs = np.abs(a - b)[~eq]
                errs.append(
                    f"col {c!r}: {int((~eq).sum())}/{len(a)} float mismatches, "
                    f"max abs diff {np.nanmax(diffs):.3e}"
                )
        else:
            sa = sv.map(_sort_key)
            oa = ov.map(_sort_key)
            bad = (sa != oa)
            if bad.any():
                i = int(np.argmax(bad.to_numpy()))
                errs.append(
                    f"col {c!r}: {int(bad.sum())}/{len(sa)} mismatches; "
                    f"first at row {i}: spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r} "
                    f"(dtypes {sv.dtype}/{ov.dtype})"
                )
    return errs


def main(filters: list[str]) -> int:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    vanilla = "--vanilla" in filters
    filters = [f for f in filters if f != "--vanilla"]
    names = [n for n in qs if not filters or any(f in n for f in filters)]
    print(f"checking {len(names)} queries at {SF_DIR}" + (" [vanilla session]" if vanilla else ""))

    if vanilla:
        # rehearse the grading driver: a session WITHOUT engine defaults
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]").appName("oracle-vanilla")
            .config("spark.driver.memory", "8g").getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from etlutils_spark.session import get_session

        spark = get_session(
            "oracle-check",
            **{"spark.driver.memory": "8g", "spark.sql.shuffle.partitions": "8"},
        )
    con = duck_con()
    failed = []
    for n in names:
        t0 = time.time()
        try:
            sdf = qs[n](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(n)
            print(f"FAIL {n}: spark raised {type(e).__name__}: {e}")
            continue
        if n not in oracles:
            print(f"pass {n}: rows-only ({len(sdf)} rows, no oracle) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"  WARNING: zero rows from rows-only query {n}")
            continue
        try:
            odf = con.execute(oracles[n]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(n)
            print(f"FAIL {n}: duckdb raised {type(e).__name__}: {e}")
            continue
        errs = compare(n, sdf, odf)
        if errs:
            failed.append(n)
            print(f"FAIL {n} [{time.time()-t0:.1f}s]")
            for e in errs:
                print(f"  {e}")
        else:
            print(f"PASS {n}: {len(sdf)} rows x {len(sdf.columns)} cols [{time.time()-t0:.1f}s]")
    spark.stop()
    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
