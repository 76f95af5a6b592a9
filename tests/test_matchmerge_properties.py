"""matchmerge vs pandas.merge — differential semantics on random inputs
(the generalization of the reference's fixed examples), plus the
auto-broadcast strategy switch."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlutils_spark.operators.matchmerge import matchmerge

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(0, 6)


@SET
@given(
    st.lists(st.tuples(keys, st.integers(0, 99)), min_size=1, max_size=12),
    st.lists(keys, min_size=1, max_size=7, unique=True),
    st.booleans(),
)
def test_matchmerge_matches_pandas_merge(spark, left_rows, right_keys, all_x):
    left = pd.DataFrame(left_rows, columns=["k", "v"])
    right = pd.DataFrame({"k": right_keys, "w": [f"w{k}" for k in right_keys]})
    x = spark.createDataFrame(left)
    y = spark.createDataFrame(right)
    got = matchmerge(x, y, by_x="k", by_y="k", all_x=all_x).toPandas()
    want = left.merge(right, on="k", how="left" if all_x else "inner")
    got_s = sorted(map(tuple, got.fillna("~").itertuples(index=False)))
    want_s = sorted(map(tuple, want.fillna("~").itertuples(index=False)))
    assert got_s == want_s


def test_matchmerge_auto_broadcast(star):
    from etlutils_spark.plans.checks import uses_broadcast_join

    out = matchmerge(
        star["lineitem"], star["part"], by_x="l_partkey", by_y="p_partkey",
        add_columns=["p_brand"], broadcast_right="auto",
    )
    assert uses_broadcast_join(out)  # part is tiny -> auto broadcasts


def test_matchmerge_auto_respects_disabled_threshold(spark, star):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = matchmerge(
            star["lineitem"], star["part"], by_x="l_partkey", by_y="p_partkey",
            add_columns=["p_brand"], broadcast_right="auto",
        )
        from etlutils_spark.plans.checks import physical_plan

        # no broadcast hint was injected; with broadcasting disabled the
        # planner must fall back to a shuffle join
        assert "BroadcastHashJoin" not in physical_plan(out)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )

def test_paste_keys_reproduces_r_coerced_matching(spark):
    """R golden (run against the reference semantics):
    ``do.call(paste, list(c(1L,2L,NA), c("u","v","w")))`` is
    ``c("1 u","2 v","NA w")`` and ``paste`` of ``c(1.0, NA)`` with
    ``c("u","w")`` is ``c("1 u","NA w")`` — the double 1.0 coerces to
    "1" and NA to the literal "NA", so rows 1 and 3 match. SQL tuple
    join drops the NA row; paste_keys=True must keep it."""
    x = spark.createDataFrame(
        [(1, "u"), (2, "v"), (None, "w")], "a int, b string"
    )
    y = spark.createDataFrame(
        [(1.0, "u", "one"), (None, "w", "na-w")],
        "a double, b string, val string",
    )
    pasted = matchmerge(x, y, by_x=["a", "b"], by_y=["a", "b"],
                        paste_keys=True)
    got = {(r.a, r.b, r.val) for r in pasted.collect()}
    assert got == {(1, "u", "one"), (None, "w", "na-w")}
    # default tuple mode: NULL keys never match (SQL semantics)
    tup = matchmerge(x, y, by_x=["a", "b"], by_y=["a", "b"])
    assert {(r.a, r.b, r.val) for r in tup.collect()} == {(1, "u", "one")}
    # the unique-key check runs on the PASTED key: two y rows that
    # collide only after coercion ("1 u" from 1L and from 1.0) error
    import pytest

    from etlutils_spark.operators.matchmerge import DuplicateKeyError

    y_dup = spark.createDataFrame(
        [(1.0, "u", "one"), (1.0, "u", "uno")],
        "a double, b string, val string",
    )
    with pytest.raises(DuplicateKeyError):
        matchmerge(x, y_dup, by_x=["a", "b"], by_y=["a", "b"],
                   paste_keys=True).collect()


def test_r_paste_key_coercions(spark):
    """as.character parity table: integral doubles drop '.0', TRUE/FALSE
    casing, NA -> 'NA', plain strings pass through."""
    from etlutils_spark.operators.matchmerge import r_paste_key

    df = spark.createDataFrame(
        [(1.0, True, "s", 7), (2.5, False, None, None)],
        "d double, l boolean, s string, i int",
    )
    got = [r.k for r in
           df.select(r_paste_key(df, ["d", "l", "s", "i"]).alias("k"))
           .collect()]
    assert got == ["1 TRUE s 7", "2.5 FALSE NA NA"]


def test_r_paste_key_huge_integral_double_not_na(spark):
    """Huge integral doubles must render via the plain string cast —
    never as literal 'NA' (colliding with genuine NA keys) and never
    through the decimal(38,0) cast (which ANSI mode would abort on).
    The mechanism: floor(double) is a saturating LONG, so the
    integral-double predicate is false for |d| >= ~9.2e18 and the
    value falls through; this pins that behavior against regressions
    (e.g. a floor -> double-returning refactor)."""
    from etlutils_spark.operators.matchmerge import r_paste_key

    df = spark.createDataFrame(
        [(1e38,), (-2.5e40,), (None,)], "d double"
    )
    got = [r.k for r in
           df.select(r_paste_key(df, ["d"]).alias("k")).collect()]
    assert got[0] != "NA" and got[1] != "NA"
    assert got[2] == "NA"
    assert got[0] != got[2] and got[1] != got[2]


def test_paste_keys_rejected_with_expression_keys(spark):
    """paste_keys=True used to be silently ignored when expression keys
    were given; it must raise instead (round-6 advice fix)."""
    import pyspark.sql.functions as F

    x = spark.createDataFrame([(1, "a")], "k int, v string")
    y = spark.createDataFrame([(1, "b")], "k int, w string")
    with pytest.raises(ValueError, match="paste_keys.*expression"):
        matchmerge(x, y, by_x_expr=F.col("k") + 1, by_y_expr=F.col("k") + 1,
                   paste_keys=True)


def _r_paste_ref(vals):
    """Python reference of R's do.call(paste, ...) cell coercion."""
    out = []
    for v in vals:
        if v is None:
            out.append("NA")
        elif isinstance(v, bool):
            out.append("TRUE" if v else "FALSE")
        elif isinstance(v, float):
            out.append(str(int(v)) if v == int(v) else repr(v))
        else:
            out.append(str(v))
    return " ".join(out)


@SET
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-999, 999)),
            st.one_of(
                st.none(),
                st.floats(-1e6, 1e6, allow_nan=False).map(
                    lambda f: round(f, 3)
                ),
            ),
            st.one_of(st.none(), st.booleans()),
            st.one_of(st.none(), st.text("abcNA ", min_size=0, max_size=5)),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_r_paste_key_matches_python_reference(spark, rows):
    """r_paste_key must coerce every cell exactly as R's paste would
    (via the Python reference above) for ints, short-decimal doubles,
    logicals, strings, and NULLs in any combination."""
    from etlutils_spark.operators.matchmerge import r_paste_key

    df = spark.createDataFrame(
        rows, "i int, d double, l boolean, s string"
    )
    got = [r.k for r in
           df.select(r_paste_key(df, ["i", "d", "l", "s"]).alias("k"))
           .collect()]
    want = [_r_paste_ref(list(t)) for t in rows]
    assert got == want


def test_paste_keys_single_column_matches_na(spark):
    """paste_keys must not silently no-op on one-key joins: R's match()
    coerces types and matches NA there too."""
    x = spark.createDataFrame([(1,), (None,)], "k int")
    y = spark.createDataFrame([(1.0, "one"), (None, "na")],
                              "k double, v string")
    out = {(r.k, r.v) for r in
           matchmerge(x, y, by_x="k", by_y="k", paste_keys=True).collect()}
    assert out == {(1, "one"), (None, "na")}
    # NaN pastes as R's 'NaN' (not 'NA' / not Spark's 'Infinity' family)
    from etlutils_spark.operators.matchmerge import r_paste_key

    df = spark.createDataFrame(
        [(float("nan"),), (float("inf",),), (float("-inf"),), (None,)],
        "d double",
    )
    got = [r.k for r in df.select(r_paste_key(df, ["d"]).alias("k")).collect()]
    assert got == ["NaN", "Inf", "-Inf", "NA"]
