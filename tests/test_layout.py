"""Z-order layout: key algebra + the actual pruning property.

The point of a Morton layout is measurable at the storage layer: after
writing, EVERY zorder column's per-file [min, max] envelopes are tight,
so a range filter on any of them overlaps (= must read) only a fraction
of the files. A single-column sort is the control: perfect on the lead
column, useless on the others.
"""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etlutils_spark.sources.files import compact_parquet
from etlutils_spark.sources.layout import (
    hilbert_key,
    zorder_key,
    zorder_layout,
)


def _interleave2(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_bit_interleave(spark):
    # values 0..3 with bits=2 make the min/max normalization the
    # identity (rank == value), so keys are exactly interleaved bits
    rows = [(a, b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = {
        (r.a, r.b): r.k
        for r in df.withColumn("k", zorder_key(df, ["a", "b"], bits=2)).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _interleave2(a, b, 2), (a, b)


def test_zorder_key_rejects_strings_and_wide_keys(spark, star):
    with pytest.raises(TypeError):
        zorder_key(star["nation"], ["n_name"])
    with pytest.raises(ValueError):
        zorder_key(star["lineitem"], ["l_orderkey", "l_partkey"], bits=32)


def test_zorder_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(1, None, 7), (2, None, 7), (3, None, 7)], "a int, b int, c int"
    )
    out = df.withColumn("k", zorder_key(df, ["a", "b", "c"], bits=4)).collect()
    # b (all-null) and c (constant) contribute no bits; a still orders
    ks = {r.a: r.k for r in out}
    assert ks[1] < ks[2] < ks[3]


def _hilbert_d_scalar(x: int, y: int, bits: int) -> int:
    # independent scalar reference (Wikipedia xy2d formulation)
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_key_matches_reference_and_is_a_walk(spark):
    bits, n = 3, 8  # full 8x8 grid, ranks == values
    rows = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = {
        (r.a, r.b): r.k
        for r in df.withColumn("k", hilbert_key(df, ["a", "b"], bits=bits)).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _hilbert_d_scalar(a, b, bits), (a, b)
    # the defining Hilbert property: consecutive keys are GRID NEIGHBORS
    # (manhattan distance 1) — the Z-curve violates this at every
    # quadrant boundary, which is exactly why Hilbert envelopes are
    # tighter
    by_d = sorted(got, key=got.get)
    assert len(set(got.values())) == n * n  # a bijection onto 0..63
    for (a0, b0), (a1, b1) in zip(by_d, by_d[1:]):
        assert abs(a0 - a1) + abs(b0 - b1) == 1, ((a0, b0), (a1, b1))


def test_hilbert_key_validates_args(spark, star):
    with pytest.raises(ValueError):
        hilbert_key(star["lineitem"], ["l_orderkey"])
    with pytest.raises(ValueError):
        hilbert_key(star["lineitem"], ["l_orderkey", "l_partkey"], bits=32)


def test_hilbert_layout_prunes_every_listed_column(spark, star, tmp_path):
    li, cols, nfiles = star["lineitem"], ["l_partkey", "l_orderkey"], 8
    hdir = str(tmp_path / "h")
    zorder_layout(li, cols, num_partitions=nfiles, curve="hilbert").write.parquet(hdir)
    hfiles = glob.glob(f"{hdir}/part-*.parquet")
    for col in cols:
        lo, hi = _low_window(li, col)
        h = _files_overlapping(hfiles, col, lo, hi)
        assert h < nfiles, (col, h)


def _files_overlapping(files: list[str], col: str, lo: float, hi: float) -> int:
    n = 0
    for f in files:
        vals = pq.read_table(f, columns=[col])[col].to_pylist()
        if vals and not (max(vals) < lo or min(vals) > hi):
            n += 1
    return n


def _low_window(df, col, frac=8):
    # a window at the low end of the domain keeps the top rank bits
    # fixed; a mid-domain window would straddle the bit-15 flip and
    # defeat coarse pruning regardless of layout
    mn, mx = df.agg(F.min(col), F.max(col)).first()
    return mn, mn + (mx - mn) / frac


def test_zorder_layout_prunes_every_listed_column(spark, star, tmp_path):
    li, cols, nfiles = star["lineitem"], ["l_partkey", "l_orderkey"], 8
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_layout(li, cols, num_partitions=nfiles).write.parquet(zdir)
    (
        li.repartitionByRange(nfiles, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(sdir)
    )
    zfiles = glob.glob(f"{zdir}/part-*.parquet")
    sfiles = glob.glob(f"{sdir}/part-*.parquet")
    assert len(zfiles) == nfiles

    for col in cols:
        lo, hi = _low_window(li, col)
        z = _files_overlapping(zfiles, col, lo, hi)
        # a narrow window on EITHER column must skip files under zorder
        assert z < nfiles, (col, z)
    # the control: single-column sort leaves the second column
    # unclustered — (nearly) every file overlaps its window
    lo, hi = _low_window(li, "l_orderkey")
    s = _files_overlapping(sfiles, "l_orderkey", lo, hi)
    z = _files_overlapping(zfiles, "l_orderkey", lo, hi)
    assert z < s, (z, s)


def test_compact_parquet_zorder_roundtrip(spark, star, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    star["orders"].repartition(16).write.parquet(src)
    compact_parquet(
        spark, src, dst, target_rows_per_file=10_000,
        zorder_by=["o_custkey", "o_totalprice"],
    )
    back = spark.read.parquet(dst)
    assert back.count() == star["orders"].count()
    with pytest.raises(ValueError):
        compact_parquet(spark, src, dst, sort_by=["o_custkey"], zorder_by=["o_custkey"])
