"""Scalar column utilities: recoder / rename_columns / factorise.

Reference semantics from /root/reference/R/utils.R (SURVEY §2.3-2.4).
All three are pure Column/DataFrame expressions — JVM-side, fully
codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def recoder(col: Column | str, from_vals: Sequence, to_vals: Sequence) -> Column:
    """Value remap with identity passthrough (R/utils.R:24-32).

    Values not listed in ``from_vals`` map to themselves (the reference
    appends unseen values to both sides of the mapping, R/utils.R:25-30);
    an unlisted NULL maps to NULL (NA→NA), and a ``None`` LISTED in
    ``from_vals`` remaps like any other value — R's ``match()`` does
    match NA against an NA in ``from`` (R/utils.R:31), and the plain
    ``==`` comparison silently never fired for it (three-valued logic;
    review catch), so None entries compare with ``eqNullSafe``.
    Compiled to a CASE WHEN chain —
    constant-folded by Catalyst, no lookup table shipped to executors
    (the map is in the plan itself, fine for the dictionary-sized
    mappings this is for).
    """
    if len(from_vals) != len(to_vals):
        raise ValueError("from_vals and to_vals must be the same length")
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for f_val, t_val in zip(from_vals, to_vals):
        cond = c.eqNullSafe(F.lit(f_val)) if f_val is None else c == F.lit(f_val)
        expr = F.when(cond, F.lit(t_val)) if expr is None else expr.when(cond, F.lit(t_val))
    if expr is None:
        return c
    # identity passthrough incl. NULL→NULL: otherwise() returns the
    # original value, and a NULL input fails every `==` so it falls
    # through to otherwise(NULL).
    return expr.otherwise(c)


def recode_column(df: DataFrame, column: str, from_vals: Sequence, to_vals: Sequence) -> DataFrame:
    """DataFrame-level convenience: replace ``column`` with its recode."""
    return df.withColumn(column, recoder(column, from_vals, to_vals))


def rename_columns(df: DataFrame, from_cols: Sequence[str], to_cols: Sequence[str]) -> DataFrame:
    """Rename columns from→to (R/utils.R:71-80).

    The reference validates equal lengths and implements this as
    ``recoder`` over ``colnames``; unseen columns keep their names
    (identity passthrough) — same here via withColumnsRenamed.
    """
    if len(from_cols) != len(to_cols):
        raise ValueError("from_cols and to_cols must be the same length")
    missing = [c for c in from_cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    return df.withColumnsRenamed(dict(zip(from_cols, to_cols)))


def factorise(df: DataFrame, logicals: bool = False) -> DataFrame:
    """Character→factor conversion (R/utils.R:101-137) — a documented
    near-no-op in Spark.

    Strings stay ``StringType`` (Parquet dictionary-encodes them at the
    storage layer, which is what ff factors actually bought the
    reference — SURVEY §1.2). With ``logicals=True`` boolean columns are
    cast to string, mirroring ``factorise(..., logicals=TRUE)``
    (R/utils.R:117-123) which turns 3-valued logicals into categorical;
    NULL stays NULL.
    """
    if not logicals:
        return df
    # R renders logical factor levels as TRUE/FALSE (not Spark's
    # lowercase cast) — same coercion table as r_paste_key; NULL
    # falls through the outer when to stay NULL
    casts = {
        f.name: F.when(
            F.col(f.name).isNotNull(),
            F.when(F.col(f.name), "TRUE").otherwise("FALSE"),
        )
        for f in df.schema.fields
        if isinstance(f.dataType, T.BooleanType)
    }
    return df.withColumns(casts) if casts else df


def with_ordered_levels(df: DataFrame, column: str, levels: Sequence[str]) -> DataFrame:
    """Ordered-factor support (colClasses="ordered", R/ffsql.R:222-227).

    Spark has no ordered-categorical type; the reference's virtual
    ramclass patch becomes column METADATA carrying the level order,
    plus a companion ``<column>__ord`` integer column so ordering ops
    (sorts, comparisons, windows) can use the factor order directly.
    Unknown values get NULL rank (sort them last with asc_nulls_last).
    """
    meta = {"ordered_levels": list(levels)}
    rank = None
    for i, lv in enumerate(levels):
        cond = F.col(column) == F.lit(lv)
        rank = F.when(cond, F.lit(i)) if rank is None else rank.when(cond, F.lit(i))
    rank = rank.otherwise(F.lit(None)) if rank is not None else F.lit(None)
    return df.withColumn(column, F.col(column).alias(column, metadata=meta)).withColumn(
        f"{column}__ord", rank.cast("int")
    )


def ordered_levels(df: DataFrame, column: str) -> list[str] | None:
    """Read back the level order attached by ``with_ordered_levels``."""
    meta = df.schema[column].metadata
    return list(meta["ordered_levels"]) if "ordered_levels" in meta else None


def factor_levels(df: DataFrame, column: str) -> DataFrame:
    """The observable side of a factor: its sorted level dictionary.

    One distinct + sort over a single pruned column; this is what
    ``levels(x$col)`` exposes in the reference's data model.
    """
    return df.select(column).where(F.col(column).isNotNull()).distinct().orderBy(column)


def profile_table(df, columns=None):
    """Per-column data-quality profile: one output row per column with
    ``n_rows``, ``n_nulls``, ``n_distinct`` (exact), and min/max
    rendered as strings (type-stable output schema across mixed column
    types). The generalization of the reference's ``colClass``
    introspection (R/ffsql.R:1183-1199) from types to data.

    Scale: ONE scan computes every column's stats together. Honest cost
    model (review catch — this used to claim the aggregation itself was
    single-pass): N exact ``countDistinct`` in one agg compile to
    Catalyst's Expand, which multiplies each scanned row ~(N+1)x
    through the partial aggregate, so the SCAN is single but the
    aggregation work and shuffle are per-column. At very wide / very
    large corpora swap n_distinct to approx_count_distinct
    (sketches.py), which aggregates all columns in one pass with no
    Expand — exact distinct stays the default because it is the
    oracle-checkable form.
    """
    from pyspark.sql import functions as F

    cols = list(columns) if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    # internal aliases are INDEX-based and the output label travels as a
    # lit(): no column name is ever interpolated into parsed SQL, so
    # names with spaces/dots/quotes profile fine (the old stack()
    # selectExpr crashed on any non-bare-identifier name — review
    # catch). Backtick-quote the input reference so a dotted name binds
    # literally instead of parsing as a struct path.
    def _ref(c: str) -> Column:
        return F.col("`" + c.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.when(_ref(c).isNull(), 1).otherwise(0)).alias(f"__nn_{i}"),
            F.countDistinct(_ref(c)).alias(f"__nd_{i}"),
            # aggregate in the column's native type, THEN render: a
            # lexicographic min over string-cast numerics is wrong as a
            # profile ('100' < '99')
            F.min(_ref(c)).cast("string").alias(f"__mn_{i}"),
            F.max(_ref(c)).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__nn_{i}").alias("n_nulls"),
            F.col(f"__nd_{i}").alias("n_distinct"),
            F.col(f"__mn_{i}").alias("min_str"),
            F.col(f"__mx_{i}").alias("max_str"),
        )
        for i, c in enumerate(cols)
    ]
    return one.select(
        F.col("__n").alias("n_rows"), F.explode(F.array(*entries)).alias("s")
    ).select(
        "s.column", "n_rows", "s.n_nulls", "s.n_distinct",
        "s.min_str", "s.max_str",
    )


def profile_drift(df_a, df_b, columns=None):
    """Snapshot drift report: ``profile_table`` of two corpus versions
    joined per column, with deltas — the audit run between dataset
    releases (did nulls appear? did cardinality collapse? did a range
    shift?). Output one row per column:
    (column, n_rows_a/b + delta, n_nulls_a/b + delta,
    n_distinct_a/b + delta, min_changed, max_changed).

    Scale: each side is ONE aggregation pass (profile_table); the join
    is |columns| rows. Comparing a 100 TB release against its
    predecessor costs two scans, nothing more."""
    from pyspark.sql import functions as F

    if columns is None:
        cols = [c for c in df_a.columns if c in set(df_b.columns)]
        if not cols:
            raise ValueError(
                "profile_drift: the two frames share no column names — "
                "nothing to compare (review catch: this used to reach "
                "a malformed stack(0,) parse error)"
            )
    else:
        cols = list(columns)
        if not cols:
            raise ValueError(
                "profile_drift: columns=[] profiles nothing; pass None "
                "to profile all shared columns"
            )
    pa = profile_table(df_a, cols)
    pb = profile_table(df_b, cols)
    a = pa.select(
        "column",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_nulls").alias("n_nulls_a"),
        F.col("n_distinct").alias("n_distinct_a"),
        F.col("min_str").alias("__mn_a"),
        F.col("max_str").alias("__mx_a"),
    )
    b = pb.select(
        "column",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_nulls").alias("n_nulls_b"),
        F.col("n_distinct").alias("n_distinct_b"),
        F.col("min_str").alias("__mn_b"),
        F.col("max_str").alias("__mx_b"),
    )
    j = a.join(b, "column")
    return j.select(
        "column",
        "n_rows_a", "n_rows_b",
        (F.col("n_rows_b") - F.col("n_rows_a")).alias("n_rows_delta"),
        "n_nulls_a", "n_nulls_b",
        (F.col("n_nulls_b") - F.col("n_nulls_a")).alias("n_nulls_delta"),
        "n_distinct_a", "n_distinct_b",
        (F.col("n_distinct_b") - F.col("n_distinct_a")).alias("n_distinct_delta"),
        (~F.col("__mn_a").eqNullSafe(F.col("__mn_b"))).alias("min_changed"),
        (~F.col("__mx_a").eqNullSafe(F.col("__mx_b"))).alias("max_changed"),
    )


def corpus_diff(
    df_a,
    df_b,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Document-level release diff — the row-granular complement to
    ``profile_drift``'s column stats: full-outer join of two corpus
    versions on ``id_col`` comparing content digests. Output one row
    per doc id with ``status`` in {added, removed, changed, unchanged}
    (plus both digests, NULL where absent) — the audit table a release
    pipeline publishes alongside the data.

    Scale: one shuffle on the id key (or zero with id-bucketed
    layouts); digests are computed in the scan projection so text
    never shuffles — at 100 TB the join moves (id, md5) pairs only.

    A present row with NULL text digests to the sentinel ``__null__``
    (NULL digests would be indistinguishable from row absence in the
    full-outer join, misclassifying NULL-text docs as added/removed)."""
    from pyspark.sql import functions as F

    sentinel = F.lit("__null__")
    a = df_a.select(
        F.col(id_col),
        F.coalesce(F.md5(F.col(text_col)), sentinel).alias("md5_a"),
    )
    b = df_b.select(
        F.col(id_col),
        F.coalesce(F.md5(F.col(text_col)), sentinel).alias("md5_b"),
    )
    return a.join(b, id_col, "full_outer").select(
        id_col,
        "md5_a",
        "md5_b",
        F.when(F.col("md5_a").isNull(), "added")
        .when(F.col("md5_b").isNull(), "removed")
        .when(F.col("md5_a") != F.col("md5_b"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
