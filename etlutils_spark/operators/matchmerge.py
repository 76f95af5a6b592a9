"""matchmerge — the reference's hash lookup join, Spark-first.

Reference semantics (R/matchmerge.R:95-182 in /root/reference):
- equi-join of ``x`` against ``y`` on one key; ``all_x=True`` → left
  outer, ``all_x=False`` (default) → inner (R/matchmerge.R:27-29,40-43).
- right key must be unique; ``check_duplicates=True`` errors on
  duplicate right keys ("Key of y contains doubles which is not
  allowed", R/matchmerge.R:148-160).
- output carries all columns of ``x`` plus ``add_columns`` of ``y``
  (projection pushdown on the right side, R/matchmerge.R:166-174);
  name collisions are suffixed ``.y`` → here ``_y`` (valid Spark
  identifier; R/matchmerge.R:48,168-171).
- multi-column keys: the reference space-concatenates into one string
  key (R/matchmerge.R:113-126); we join on the column tuple by default
  (idiomatic, avoids the type-coercion pitfalls of string concat).
  ``paste_keys=True`` opts into bug-for-bug parity with the reference's
  pasted key for R-code ports that rely on coerced-string matching:
  each key column is coerced the way R's ``paste``/``as.character``
  would — integral doubles print without a trailing ``.0`` (R prints
  ``1``, not ``1.0``), and NULL/NA becomes the literal string ``"NA"``,
  so NA keys MATCH each other (and any honest ``"NA"`` value) exactly
  as they do in R, where SQL join semantics would drop them.
- expression keys (``by.iskey=TRUE``, R/matchmerge.R:127-161) map to
  joining on arbitrary Column expressions via ``by_x_expr``/``by_y_expr``.
- row order of ``x`` preserved (R/matchmerge.R:180-181): DataFrames are
  unordered; with ``preserve_order=True`` the join captures x's
  partition-local position and re-sorts the output to x's row order
  (meaningful locally / per-partition; at cluster scale order is a
  presentation concern and the flag defaults off).

Scale design: the reference's unique-right-key contract makes the right
side a *dimension*; we broadcast it when small (the common case) so the
join is a map-side BroadcastHashJoin with no shuffle of the fact side.
``broadcast_right`` accepts True (hint broadcast), False (let
Catalyst/AQE choose), or "auto" (broadcast only if the optimized-plan
size estimate of the projected right side fits the session's broadcast
threshold). The uniqueness check is one aggregation over the (small)
right side only — never over ``x``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class DuplicateKeyError(ValueError):
    """Right-side join key is not unique (reference: R/matchmerge.R:158)."""


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate (bytes)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def _should_broadcast(df: DataFrame) -> bool:
    try:
        threshold = int(
            df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
    except Exception:  # noqa: BLE001 - unparsable (e.g. "10m") -> be conservative
        return False
    if threshold <= 0:
        return False
    try:
        return _estimated_bytes(df) <= threshold
    except Exception:  # noqa: BLE001 - stats unavailable
        return False


def assert_unique_key(df: DataFrame, keys: Sequence[str]) -> None:
    """Error if ``keys`` is not a unique key of ``df``.

    Mirrors R/matchmerge.R:148-160. One groupBy over the dimension side;
    ``F.lit(1)`` count avoids touching non-key columns so the scan
    prunes to the key columns only.
    """
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise DuplicateKeyError("Key of y contains doubles which is not allowed")


def r_paste_key(df: DataFrame, cols: Sequence[str]) -> Column:
    """The reference's composite key, reproduced coercion-for-coercion:
    ``do.call(paste, as.list(df[, cols]))`` (R/matchmerge.R:113-126) —
    space-joined ``as.character`` of each column, where integral
    doubles drop the trailing ``.0`` (R prints ``as.character(1.0)`` as
    ``"1"``), NaN/Inf print as R's ``NaN``/``Inf``/``-Inf`` (not
    Spark's ``Infinity``), and NA prints as the literal ``"NA"`` (so NA
    keys compare equal, unlike SQL NULL). Pure column algebra — stays
    in codegen.

    Parity bound (documented divergence): non-integral doubles render
    via Spark's cast-to-string, which matches R for plain-decimal
    magnitudes but switches to ``1.5E-5``-style scientific notation
    where R prints ``1.5e-05`` — keys relying on scientific-notation
    text equality diverge. INTEGRAL doubles render all digits via the
    decimal path, which matches R only while R's fixed form is the
    shorter one: R's ``as.character`` switches to scientific whenever
    that is narrower, so round magnitudes from 1e5 up diverge
    (``100000.0`` -> Spark ``'100000'`` vs R ``'1e+05'``; ``123456.0``
    agrees — review catch: the earlier note claimed parity to 2^63,
    which only holds for values like 123456 whose digits don't
    compress). Integral magnitudes strictly above
    2^63 (where ``floor`` saturates, so the integral test is false)
    render via the plain string cast (``1.0E38`` vs R's ``1e+38``);
    exactly ±2^63 still takes the decimal path (the saturated long
    rounds back to the same double). The correctness GATE for this
    mode is the DuckDB-coercion oracle (matchmerge_paste_key), which
    pins the digit-for-digit decimal rendering cross-engine; R-text
    parity is best-effort documentation, not a contract. The
    hypothesis differential pins the plain-decimal range."""
    from pyspark.sql import types as T

    parts = []
    for c in cols:
        col = F.col(c)
        dt = df.schema[c].dataType
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            d = col.cast("double")
            s = (
                F.when(F.isnan(d), "NaN")
                .when(d == float("inf"), "Inf")
                .when(d == float("-inf"), "-Inf")
                # floor(double) returns LONG and saturates at ±2^63, so
                # this predicate is false for |d| STRICTLY greater than
                # 2^63 (at exactly ±2^63 the saturated long rounds back
                # to the same double, equality holds, and the decimal
                # path still renders it — no overflow: 2^63 << 1e38);
                # beyond that, huge integral magnitudes fall to the
                # plain string cast (documented parity bound: R prints
                # '1e+38', Spark '1.0E38'). ANSI decimal cast would
                # throw, not NULL — and can never be reached with an
                # out-of-range value. Pinned by the huge-integral test.
                .when(d == F.floor(d), col.cast("decimal(38,0)").cast("string"))
                .otherwise(col.cast("string"))
            )
        elif isinstance(dt, T.BooleanType):
            # R prints logicals as TRUE/FALSE, not true/false; a NULL
            # condition must fall through to NULL (-> 'NA'), not to the
            # otherwise-branch
            s = F.when(col.isNotNull(), F.when(col, "TRUE").otherwise("FALSE"))
        else:
            s = col.cast("string")
        parts.append(F.coalesce(s, F.lit("NA")))
    return F.concat_ws(" ", *parts)


def matchmerge(
    x: DataFrame,
    y: DataFrame,
    by_x: str | Sequence[str] | None = None,
    by_y: str | Sequence[str] | None = None,
    all_x: bool = False,
    add_columns: Sequence[str] | None = None,
    check_duplicates: bool = True,
    trace: bool = False,
    by_x_expr: Column | None = None,
    by_y_expr: Column | None = None,
    broadcast_right: bool | str = True,
    preserve_order: bool = False,
    paste_keys: bool = False,
) -> DataFrame:
    """Lookup join with the reference's semantics (see module docstring).

    Either ``by_x``/``by_y`` (column names) or ``by_x_expr``/``by_y_expr``
    (arbitrary expressions — the reference's ``by.iskey=TRUE`` mode).
    """
    if preserve_order:
        order_col = "__mm_row_order"
        x_ord = x.withColumn(order_col, F.monotonically_increasing_id())
        out = matchmerge(
            x_ord, y, by_x=by_x, by_y=by_y, all_x=all_x,
            add_columns=add_columns, check_duplicates=check_duplicates,
            trace=trace, by_x_expr=by_x_expr, by_y_expr=by_y_expr,
            broadcast_right=broadcast_right, preserve_order=False,
            paste_keys=paste_keys,
        )
        return out.orderBy(order_col).drop(order_col)

    how = "left" if all_x else "inner"

    if by_x_expr is not None or by_y_expr is not None:
        if by_x_expr is None or by_y_expr is None:
            raise ValueError("by_x_expr and by_y_expr must be given together")
        if paste_keys:
            # expression keys are already a single derived value per
            # side; silently falling through to tuple-join semantics
            # would hand a caller who asked for R paste-key parity
            # something else entirely (round-6 advice fix)
            raise ValueError(
                "paste_keys=True is not supported with expression keys "
                "(by_x_expr/by_y_expr); paste the expressions yourself "
                "or pass column names"
            )
        return _merge_on_expr(x, y, by_x_expr, by_y_expr, how, add_columns,
                              check_duplicates, trace, broadcast_right)

    if by_x is None:
        raise ValueError("provide by_x/by_y column names or expression keys")
    keys_x = [by_x] if isinstance(by_x, str) else list(by_x)
    if by_y is None and len(keys_x) == 1 and len(y.columns) == 1:
        # bare-vector y with no by_y: its only column IS the key
        by_y = y.columns[0]
    by_y = by_y if by_y is not None else by_x
    keys_y = [by_y] if isinstance(by_y, str) else list(by_y)
    if len(keys_x) != len(keys_y):
        raise ValueError("by_x and by_y must name the same number of columns")

    if paste_keys:
        # Reference parity mode: join on the single pasted-string key
        # exactly as R builds it (R/matchmerge.R:113-126), then drop the
        # derived key — output layout matches tuple mode. The uniqueness
        # check runs on the pasted key, as in the reference. Single-
        # column keys take the same path: R's match() coerces mixed
        # types and matches NA to NA there too, so the flag must not
        # silently no-op on one-key joins.
        kcol = "__mm_paste_key"
        # bare-key-vector y with a requested label (single-key form):
        # materialize the label as the ORIGINAL typed key value BEFORE
        # pasting — otherwise the inner call would alias the pasted
        # string as the label (string '1' / literal 'NA' instead of the
        # typed value / NULL, diverging from R, which never pastes the
        # merged vector's values)
        if (
            len(keys_y) == 1
            and list(y.columns) == keys_y
            and add_columns is not None
            and len(list(add_columns)) == 1
        ):
            label = list(add_columns)[0]
            y = y.select(F.col(keys_y[0]), F.col(keys_y[0]).alias(label))
            add_columns = [label]
        if add_columns is None:
            add_columns = [c for c in y.columns if c not in keys_y]
        drop_keys = [k for k in keys_y if k not in add_columns]
        out = matchmerge(
            x.withColumn(kcol, r_paste_key(x, keys_x)),
            y.withColumn(kcol, r_paste_key(y, keys_y)).drop(*drop_keys),
            by_x=kcol, by_y=kcol, all_x=all_x, add_columns=add_columns,
            check_duplicates=check_duplicates, trace=trace,
            broadcast_right=broadcast_right,
        )
        return out.drop(kcol)

    # Vector-y modes (reference: y may be a bare vector, R/matchmerge.R:
    # 32-34,100-110; the joined value column is relabeled to
    # add.columns[1], R/matchmerge.R:175-178). Spark's row-aligned
    # equivalent of (y vector, by.y vector) is one DataFrame carrying
    # (key, value); a single-column y is the key-only membership/value
    # form.
    if len(keys_y) == 1 and keys_y[0] in y.columns:
        non_key = [c for c in y.columns if c != keys_y[0]]
        if not non_key and add_columns:
            # bare key vector + a requested label: carry the key value
            # itself under that name (NULL where unmatched on a left join)
            label = list(add_columns)[0]
            if len(list(add_columns)) != 1:
                raise ValueError("single-column y carries exactly one value column")
            y = y.select(F.col(keys_y[0]), F.col(keys_y[0]).alias(label))
            add_columns = [label]
        elif (
            add_columns is not None
            and len(list(add_columns)) == 1
            and list(add_columns)[0] not in y.columns
            and len(non_key) == 1
        ):
            # (key, value) vector pair + relabel request: rename the value
            # column to add_columns[0] before the join
            y = y.withColumnRenamed(non_key[0], list(add_columns)[0])

    # Right-side projection pushdown (R/matchmerge.R:166-174): only the
    # key + requested payload columns survive to the join, so the scan
    # of y prunes columns at the source.
    if add_columns is None:
        add_columns = [c for c in y.columns if c not in keys_y]
    missing = [c for c in add_columns if c not in y.columns]
    if missing:
        raise ValueError(f"add_columns not in y: {missing}")
    y_proj = y.select(*keys_y, *add_columns)

    if check_duplicates:
        assert_unique_key(y_proj, keys_y)

    # Collision suffix "_y" (reference uses ".y"; "." is not a plain
    # Spark identifier char).
    renames = {}
    for c in add_columns:
        if c in x.columns:
            renames[c] = c + "_y"
    for old, new in renames.items():
        y_proj = y_proj.withColumnRenamed(old, new)
    # Align right key names onto the left's so we can use the
    # name-based join (single output key column, no ambiguity).
    for kx, ky in zip(keys_x, keys_y):
        if ky != kx:
            y_proj = y_proj.withColumnRenamed(ky, kx)

    if broadcast_right == "auto":
        broadcast_right = _should_broadcast(y_proj)
    rhs = F.broadcast(y_proj) if broadcast_right else y_proj
    out = x.join(rhs, on=keys_x, how=how)
    # Reference output layout: x's columns first, then the added ones.
    added = [renames.get(c, c) for c in add_columns]
    out = out.select(*x.columns, *added)
    if trace:
        print(f"matchmerge: {how} join on {keys_x}, adding {added}")
    return out


def fuzzy_matchmerge(
    x: DataFrame,
    y: DataFrame,
    by_x: str,
    by_y: str,
    max_distance: int = 2,
    all_x: bool = False,
    add_columns: Sequence[str] | None = None,
    row_key: str | Sequence[str] | None = None,
    best_only: bool = True,
    broadcast_right: bool = True,
) -> DataFrame:
    """Edit-distance lookup join: match each ``x`` row to ``y`` rows whose
    ``by_y`` string is within ``max_distance`` Levenshtein edits of
    ``by_x`` — the data-cleaning generalization of ``matchmerge`` (typo'd
    codes against a clean dictionary; the reference's ``recoder`` handles
    only exact values, R/utils.R:24-32).

    ``best_only=True`` keeps one match per X ROW: minimum distance,
    ties broken on the matched value. Row identity comes from
    ``row_key`` when given; by default each x row gets a synthetic id,
    so two distinct x rows sharing the same ``by_x`` string each keep
    their best match — partitioning the rank window by ``by_x`` alone
    silently collapsed such rows to one, deleting whole payload rows
    nondeterministically (review catch). Pass ``row_key`` only when
    you WANT per-key dedup of x itself. ``all_x=True`` left-joins,
    NULL-filling rows with no candidate within the budget.

    Output: all of x ++ matched ``by_y`` value ++ ``add_columns`` ++
    ``distance``. ``add_columns`` colliding with x's column names are
    suffixed ``_y`` (the matchmerge convention — an unsuffixed
    collision crashed the final select with AMBIGUOUS_REFERENCE;
    review catch).

    Scale: y is a *dictionary* (same dimension contract as matchmerge's
    unique-right-key side) — the join is a broadcast nested-loop with
    two JVM-side prunes: a length band (|len(a)-len(b)| <= d is a
    necessary condition for edit distance <= d, evaluated before the
    O(len^2) levenshtein) and the threshold itself. Cost is
    |x| * |dict| cheap comparisons, embarrassingly parallel over x
    partitions, no shuffle of x; for corpus-sized BOTH sides you want
    n-gram blocking + verify (jaccard_pairs / minhash), not this.
    """
    if add_columns is None:
        add_columns = []
    missing = [c for c in (*add_columns, by_y) if c not in y.columns]
    if missing:
        raise ValueError(f"columns not in y: {missing}")
    matched = "matched_" + by_y if by_y in x.columns else by_y
    # suffix colliding payload columns like matchmerge does
    renames = {c: f"{c}_y" for c in add_columns if c in x.columns}
    added = [renames.get(c, c) for c in add_columns]
    y_proj = y.select(
        F.col(by_y).alias(matched),
        *[F.col(c).alias(renames.get(c, c)) for c in add_columns],
    )
    rhs = F.broadcast(y_proj) if broadcast_right else y_proj
    lk, rk = F.col(by_x), F.col(matched)
    cond = (
        (F.abs(F.length(lk) - F.length(rk)) <= max_distance)
        & (F.levenshtein(lk, rk) <= max_distance)
    )
    # synthetic per-row id BEFORE the join: the default best_only
    # identity is the x ROW, not the by_x value
    x_id = x.withColumn("__fm_rid", F.monotonically_increasing_id())
    out = (
        x_id.join(rhs, cond, "left" if all_x else "inner")
        .withColumn("distance", F.levenshtein(lk, rk))
    )
    if best_only:
        if row_key is None:
            keys = ["__fm_rid"]
        else:
            keys = [row_key] if isinstance(row_key, str) else list(row_key)
        w = Window.partitionBy(*keys).orderBy(
            F.col("distance").asc_nulls_last(), F.col(matched).asc_nulls_last()
        )
        out = (
            out.withColumn("__fm_rank", F.row_number().over(w))
            .filter(F.col("__fm_rank") == 1)
            .drop("__fm_rank")
        )
    return out.select(*x.columns, matched, *added, "distance")


def _merge_on_expr(
    x: DataFrame,
    y: DataFrame,
    by_x_expr: Column,
    by_y_expr: Column,
    how: str,
    add_columns: Sequence[str] | None,
    check_duplicates: bool,
    trace: bool,
    broadcast_right: bool,
) -> DataFrame:
    """Expression-key mode (reference by.iskey=TRUE, R/matchmerge.R:127-161).

    Materializes the key expressions as hidden columns, then delegates
    to the column-name path so duplicate checking, projection and
    suffixing behave identically.
    """
    xk, yk = "__mm_key_x", "__mm_key_y"
    x2 = x.withColumn(xk, by_x_expr)
    y2 = y.withColumn(yk, by_y_expr)
    if add_columns is None:
        add_columns = list(y.columns)
    out = matchmerge(
        x2, y2, by_x=xk, by_y=yk, all_x=(how == "left"),
        add_columns=list(add_columns), check_duplicates=check_duplicates,
        trace=trace, broadcast_right=broadcast_right,
    )
    return out.drop(xk)
