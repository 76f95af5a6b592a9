"""Golden tests lifted from the reference's runnable examples (FIXTURES.md §2-3).

These are the package's only correctness fixtures (the reference has no
test suite, SURVEY §5) — exact expected values from the roxygen examples.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etlutils_spark.operators.locf import na_locf_plus_one
from etlutils_spark.operators.matchmerge import DuplicateKeyError, matchmerge
from etlutils_spark.operators.recode import (
    factor_levels,
    factorise,
    recode_column,
    recoder,
    rename_columns,
)


# ---- matchmerge (R/matchmerge.R:56-68; FIXTURES.md §2a) -------------------

@pytest.fixture(scope="module")
def left(spark):
    return spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C"), (4, "D"), (3, "E"), (4, "F"), (5, "G")],
        "idlhs int, a string",
    )


@pytest.fixture(scope="module")
def right(spark):
    return spark.createDataFrame(
        [(1, "H"), (2, "I"), (3, "J"), (4, "K")], "idrhs int, b string"
    )


def test_matchmerge_inner(left, right):
    out = matchmerge(left, right, by_x="idlhs", by_y="idrhs")
    rows = {(r.idlhs, r.a, r.b) for r in out.collect()}
    assert rows == {(1, "A", "H"), (2, "B", "I"), (3, "C", "J"), (4, "D", "K"),
                    (3, "E", "J"), (4, "F", "K")}  # id 5 dropped
    assert out.columns == ["idlhs", "a", "b"]


def test_matchmerge_left_outer(left, right):
    out = matchmerge(left, right, by_x="idlhs", by_y="idrhs", all_x=True)
    assert out.count() == 7
    g = {r.idlhs: r.b for r in out.collect() if r.idlhs == 5}
    assert g == {5: None}  # non-match NA-filled (R/matchmerge.R:41-43)


def test_matchmerge_duplicate_right_key_errors(left, spark):
    dup = spark.createDataFrame([(1, "H"), (1, "I")], "idrhs int, b string")
    with pytest.raises(DuplicateKeyError, match="doubles"):
        matchmerge(left, dup, by_x="idlhs", by_y="idrhs")
    # check_duplicates=False skips the validation (R/matchmerge.R:50)
    out = matchmerge(left, dup, by_x="idlhs", by_y="idrhs", check_duplicates=False)
    assert out.count() == 2  # idlhs=1 matches both


def test_matchmerge_add_columns_and_suffix(left, spark):
    y = spark.createDataFrame([(1, "H", "x1"), (2, "I", "x2")], "idrhs int, b string, a string")
    out = matchmerge(left, y, by_x="idlhs", by_y="idrhs", add_columns=["b", "a"])
    assert out.columns == ["idlhs", "a", "b", "a_y"]  # collision suffixed (R/matchmerge.R:48)


def test_matchmerge_vector_y_relabel(left, right):
    """Reference vector-y example (R/matchmerge.R:66-68): y = right$b,
    by.y = right$idrhs, add.columns = 'b.renamed'. The Spark row-aligned
    form of the (value vector, key vector) pair is the (key, value)
    DataFrame; the carried value column is relabeled to add_columns[0]
    (R/matchmerge.R:175-178)."""
    out = matchmerge(
        left, right, by_x="idlhs", by_y="idrhs", all_x=True,
        add_columns=["b_renamed"],
    )
    assert out.columns == ["idlhs", "a", "b_renamed"]
    got = {(r.idlhs, r.a): r.b_renamed for r in out.collect()}
    assert got == {
        (1, "A"): "H", (2, "B"): "I", (3, "C"): "J", (4, "D"): "K",
        (3, "E"): "J", (4, "F"): "K", (5, "G"): None,
    }


def test_matchmerge_bare_key_vector(left, spark):
    """Single-column y (a bare key vector): inner join = membership
    filter; with a label, the key value itself is carried (NULL where
    unmatched on a left join)."""
    keys = spark.createDataFrame([(1,), (3,)], "idrhs int")
    # membership: add_columns=None adds nothing, inner join filters x
    member = matchmerge(left, keys, by_x="idlhs")
    assert member.columns == ["idlhs", "a"]
    assert {r.idlhs for r in member.collect()} == {1, 3}
    # key-as-value under a label, left join
    val = matchmerge(left, keys, by_x="idlhs", all_x=True, add_columns=["matched_id"])
    assert val.columns == ["idlhs", "a", "matched_id"]
    got = {r.a: r.matched_id for r in val.collect()}
    assert got == {"A": 1, "B": None, "C": 3, "D": None, "E": 3, "F": None, "G": None}


def test_fuzzy_matchmerge_golden(spark):
    """Edit-distance lookup join: typo'd codes recover their dictionary
    entry; rows beyond the edit budget NULL-fill under all_x=True and
    drop under inner; ties break on the matched value."""
    from etlutils_spark.operators.matchmerge import fuzzy_matchmerge

    dirty = spark.createDataFrame(
        [(1, "aple"), (2, "banana"), (3, "xyzzy"), (4, "pean")],
        "row_id int, fruit string",
    )
    fruits = spark.createDataFrame(
        [("apple",), ("banana",), ("pear",), ("bean",)], "name string"
    )
    out = fuzzy_matchmerge(
        dirty, fruits, by_x="fruit", by_y="name",
        max_distance=1, all_x=True, row_key="row_id",
    )
    got = {r.row_id: (r.name, r.distance) for r in out.collect()}
    assert got == {
        1: ("apple", 1),
        2: ("banana", 0),
        3: (None, None),          # nothing within 1 edit
        4: ("bean", 1),           # tie with 'pear' (also distance 1) -> 'bean' first
    }
    inner = fuzzy_matchmerge(
        dirty, fruits, by_x="fruit", by_y="name",
        max_distance=1, row_key="row_id",
    )
    assert {r.row_id for r in inner.collect()} == {1, 2, 4}


def test_fuzzy_matchmerge_duplicate_by_x_rows_both_kept(spark):
    """best_only with the DEFAULT row identity must keep one best match
    per x ROW: partitioning the rank window by by_x alone silently
    collapsed two distinct x rows sharing a by_x string into one,
    deleting a payload row nondeterministically (review catch)."""
    from etlutils_spark.operators.matchmerge import fuzzy_matchmerge

    dirty = spark.createDataFrame(
        [(1, "aple"), (2, "aple")], "payload int, fruit string"
    )
    fruits = spark.createDataFrame([("apple",)], "name string")
    out = fuzzy_matchmerge(dirty, fruits, by_x="fruit", by_y="name",
                           max_distance=1)
    got = {(r.payload, r.name) for r in out.collect()}
    assert got == {(1, "apple"), (2, "apple")}  # both rows survive


def test_fuzzy_matchmerge_add_columns_collision_suffixed(spark):
    """add_columns colliding with x's names take the matchmerge '_y'
    suffix instead of crashing the final select with
    AMBIGUOUS_REFERENCE (review catch)."""
    from etlutils_spark.operators.matchmerge import fuzzy_matchmerge

    dirty = spark.createDataFrame(
        [(1, "aple", "x-v")], "row_id int, fruit string, v string"
    )
    fruits = spark.createDataFrame(
        [("apple", "y-v")], "name string, v string"
    )
    out = fuzzy_matchmerge(
        dirty, fruits, by_x="fruit", by_y="name", max_distance=1,
        add_columns=["v"],
    )
    rows = out.collect()
    assert set(out.columns) == {"row_id", "fruit", "v", "name", "v_y",
                                "distance"}
    assert rows[0].v == "x-v" and rows[0].v_y == "y-v"


def test_matchmerge_expression_keys(spark):
    # products×sales star (R/matchmerge.R:81-94): key is a concat expression
    products = spark.createDataFrame(
        [("p1", "t1", "s1", "d1"), ("p2", "t2", "s2", "d2")],
        "product string, type string, size string, distributor string",
    )
    sales = spark.createDataFrame(
        [("p1.t1.s1", 10.0), ("p1.t1.s1", 5.0), ("p2.t2.s2", 7.0)],
        "item string, sales double",
    )
    out = matchmerge(
        sales, products,
        by_x_expr=F.col("item"),
        by_y_expr=F.concat_ws(".", "product", "type", "size"),
        all_x=True,
        add_columns=["size", "distributor"],
    )
    assert out.count() == 3
    assert set(out.columns) == {"item", "sales", "size", "distributor"}
    agg = {r.distributor: r.total for r in
           out.groupBy("distributor").agg(F.sum("sales").alias("total")).collect()}
    assert agg == {"d1": 15.0, "d2": 7.0}


# ---- recoder (R/utils.R:22-31; FIXTURES.md §3) ----------------------------

def test_recoder_golden(spark):
    letters = [chr(ord("A") + i) for i in range(26)]
    data = [(v,) for v in letters[:5] + [None] + letters[5:]]
    df = spark.createDataFrame(data, "x string")
    out = recode_column(df, "x", ["A", "B"], ["a.123", "b.123"])
    vals = [r.x for r in out.collect()]
    expect = ["a.123", "b.123"] + letters[2:5] + [None] + letters[5:]
    assert sorted(v for v in vals if v is not None) == sorted(v for v in expect if v is not None)
    assert vals.count(None) == 1  # NA -> NA


def test_recoder_numeric(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (None,)], "x int")
    out = df.select(recoder("x", [1, 2], [10, 20]).alias("x"))
    assert sorted([r.x for r in out.collect()], key=lambda v: (v is None, v)) == [3, 10, 20, None]


def test_recoder_none_in_from_vals_remaps_null(spark):
    """A None LISTED in from_vals remaps like any other value — R's
    match() does match NA against an NA in `from` (R/utils.R:31), but
    the plain == comparison silently never fired for it and NULLs
    stayed NULL (review catch). Unlisted NULLs still pass through."""
    df = spark.createDataFrame([("a",), (None,), ("z",)], "x string")
    out = df.select(
        recoder("x", [None, "a"], ["missing", "A"]).alias("x")
    )
    assert sorted(r.x for r in out.collect()) == ["A", "missing", "z"]
    # without None in from_vals: NULL -> NULL unchanged
    out2 = df.select(recoder("x", ["a"], ["A"]).alias("x"))
    vals = [r.x for r in out2.collect()]
    assert vals.count(None) == 1


def test_profile_table_non_identifier_column_names(spark):
    """Column names with spaces/dots profile fine: the output label
    travels as a literal and internal aliases are index-based — the
    old stack() selectExpr crashed on any non-bare-identifier name
    (review catch). Disjoint drift inputs fail with a clear message."""
    import pytest as _pytest

    from etlutils_spark.operators.recode import profile_drift, profile_table

    df = spark.createDataFrame(
        [(1, "x"), (2, None)], ["user id", "the.value"]
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["user id"].n_nulls == 0 and prof["user id"].n_distinct == 2
    assert prof["the.value"].n_nulls == 1 and prof["the.value"].n_distinct == 1
    with _pytest.raises(ValueError, match="no columns to profile"):
        profile_table(df, columns=[])
    other = spark.createDataFrame([(1,)], ["unrelated"])
    with _pytest.raises(ValueError, match="share no column names"):
        profile_drift(df, other)


# ---- na_locf_plus_one (R/utils.R:45-52) -----------------------------------

def test_na_locf_plus_one_golden(spark):
    xs = [2.0, None, None, 4.0, 5.0, 2.0, None]
    df = spark.createDataFrame([Row(ord=i, x=v) for i, v in enumerate(xs)])
    out = na_locf_plus_one(df, "x", order_by="ord")
    got = [r.x for r in out.orderBy("ord").collect()]
    assert got == [2.0, 3.0, 4.0, 4.0, 5.0, 2.0, 3.0]


def test_na_locf_leading_nulls_partitioned(spark):
    # leading NULLs have no LOCF anchor -> stay NULL-ish (locf is NULL);
    # reference zoo::na.locf with na.rm=TRUE would drop them; we keep NULL.
    rows = [Row(g="a", ord=0, x=None), Row(g="a", ord=1, x=1.0), Row(g="a", ord=2, x=None),
            Row(g="b", ord=0, x=5.0), Row(g="b", ord=1, x=None)]
    df = spark.createDataFrame(rows, "g string, ord int, x double")
    out = na_locf_plus_one(df, "x", order_by="ord", partition_by="g", output_col="y")
    got = {(r.g, r.ord): r.y for r in out.collect()}
    assert got[("a", 1)] == 1.0
    assert got[("a", 2)] == 2.0
    assert got[("b", 1)] == 6.0
    assert got[("a", 0)] is None


# ---- rename_columns / factorise (R/utils.R:68-79, 96-137) -----------------

def test_rename_columns_golden(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "x int, y string")
    out = rename_columns(df, ["x", "y"], ["digits", "letters"])
    assert out.columns == ["digits", "letters"]
    with pytest.raises(ValueError):
        rename_columns(df, ["x"], ["a", "b"])


def test_ordered_levels_metadata(spark):
    from etlutils_spark.operators.recode import ordered_levels, with_ordered_levels

    df = spark.createDataFrame(
        [("1-URGENT",), ("5-LOW",), ("3-MEDIUM",), ("weird",)], "prio string"
    )
    levels = ["5-LOW", "3-MEDIUM", "1-URGENT"]
    out = with_ordered_levels(df, "prio", levels)
    assert ordered_levels(out, "prio") == levels
    ranks = {r.prio: r.prio__ord for r in out.collect()}
    assert ranks == {"5-LOW": 0, "3-MEDIUM": 1, "1-URGENT": 2, "weird": None}
    # factor order drives sorting (the point of ordered factors);
    # unknown values (NULL rank) go last
    srt = [r.prio for r in out.orderBy(F.asc_nulls_last("prio__ord")).collect()]
    assert srt == levels + ["weird"]


def test_factorise(spark):
    df = spark.createDataFrame([(1, "A", True), (2, "B", None)], "x int, y string, b boolean")
    assert factorise(df) is df  # no-op without logicals
    out = factorise(df, logicals=True)
    assert dict(out.dtypes)["b"] == "string"
    assert dict(out.dtypes)["x"] == "int"  # untouched
    # R factor-from-logical renders TRUE/FALSE (not Spark's lowercase
    # cast); NULL stays NULL (r6 parity fix, same table as r_paste_key)
    vals = {r.x: r.b for r in out.collect()}
    assert vals == {1: "TRUE", 2: None}
    df3 = spark.createDataFrame([(False,)], "b boolean")
    assert factorise(df3, logicals=True).collect()[0].b == "FALSE"
    levels = [r.y for r in factor_levels(df, "y").collect()]
    assert levels == ["A", "B"]


def test_trans_fun_schema_infer(spark):
    """schema='infer' reproduces the reference's schema-by-first-chunk
    ergonomics (R/ffsql.R:181-220): a column-adding transform needs no
    explicit schema — the sampled output's dtypes become the plan
    schema — and an empty sample output fails loudly."""
    import pytest

    from etlutils_spark.operators.transfun import trans_fun

    df = spark.createDataFrame(
        [(1, 2.0), (2, 3.5), (3, 5.0)], "k long, v double"
    )

    def add_cols(pdf):
        out = pdf.copy()
        out["v2"] = out["v"] * 2
        out["tag"] = "x" + out["k"].astype(str)
        return out

    got = trans_fun(df, add_cols, "infer")
    assert [f.name for f in got.schema.fields] == ["k", "v", "v2", "tag"]
    rows = {(r.k, r.v2, r.tag) for r in got.collect()}
    assert rows == {(1, 4.0, "x1"), (2, 7.0, "x2"), (3, 10.0, "x3")}
    # explicit-schema path unchanged
    same = trans_fun(df, add_cols, "k long, v double, v2 double, tag string")
    assert same.schema == got.schema
    # empty sample output cannot resolve dtypes -> loud error
    with pytest.raises(ValueError, match="infer"):
        trans_fun(df, lambda pdf: pdf.iloc[0:0], "infer")


def test_paste_keys_single_bare_vector_label_keeps_typed_value(spark):
    """Single-key paste mode with a bare key vector + label: the label
    must carry the ORIGINAL typed key value (R never pastes the merged
    values), NULL where unmatched — not the pasted string."""
    x = spark.createDataFrame([(1,), (2,), (None,)], "k int")
    y = spark.createDataFrame([(1.0,), (None,)], "k double")
    out = {r.k: r.lab for r in matchmerge(
        x, y, by_x="k", by_y="k", all_x=True,
        add_columns=["lab"], paste_keys=True,
    ).collect()}
    assert out[1] == 1.0          # typed double, not string '1'
    assert out[2] is None         # unmatched -> NULL, not 'NA'
    assert out[None] is None      # NA matched NA; label is the
                                  # original key value (NULL)
