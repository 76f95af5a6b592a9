import pytest
from pyspark.sql import functions as F

from etlutils_spark.operators.matchmerge import matchmerge
from etlutils_spark.plans.checks import DomainError, assert_levels
from etlutils_spark.sources.sql import ingest_to_parquet


def test_assert_levels_pass_and_fail(star):
    assert_levels(
        star["orders"], "o_orderstatus", ["O", "F", "P"]
    )  # passes silently (the levels= domain role, R/ffsql.R:190-200)
    with pytest.raises(DomainError, match="o_orderstatus"):
        assert_levels(star["orders"], "o_orderstatus", ["O", "F"])


def test_matchmerge_preserve_order(spark):
    x = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b"), (1, "a2")], "k int, v string"
    ).coalesce(1)
    y = spark.createDataFrame([(1, "Y1"), (2, "Y2"), (3, "Y3")], "k int, w string")
    out = matchmerge(x, y, by_x="k", by_y="k", all_x=True, preserve_order=True)
    got = [(r.k, r.v, r.w) for r in out.collect()]
    # x's row order survives the join (R/matchmerge.R:180-181)
    assert got == [(3, "c", "Y3"), (1, "a", "Y1"), (2, "b", "Y2"), (1, "a2", "Y1")]


def test_matchmerge_preserve_order_is_partition_local(spark):
    """The documented contract is PARTITION-LOCAL order, not global:
    monotonically_increasing_id ranks rows within each input partition
    (partition id in the high bits), so within-partition x order always
    survives, while cross-partition interleaving follows partition id —
    NOT any global property of the data. This pin stops a refactor from
    silently promoting (or demoting) the promise (VERDICT.md r5 'What's
    wrong' #4)."""
    x = (
        spark.createDataFrame(
            [(9, "d"), (1, "a"), (5, "c"), (2, "b")], "k int, v string"
        )
        .repartitionByRange(2, "k")
        .sortWithinPartitions(F.desc("k"))  # within-partition order != k asc
    )
    y = spark.createDataFrame(
        [(9, "Y9"), (1, "Y1"), (5, "Y5"), (2, "Y2")], "k int, w string"
    )
    # the contract: output order == x.collect() order (partition id,
    # then within-partition position) — exactly what collect() yields
    expected = [(r.k, r.v) for r in x.collect()]
    out = matchmerge(x, y, by_x="k", by_y="k", all_x=True,
                     preserve_order=True)
    got = [(r.k, r.v) for r in out.collect()]
    assert got == expected
    # and that contract is genuinely partition-local, not global: the
    # desc sort-within makes the preserved order differ from any
    # global k ordering
    ks = [k for k, _ in expected]
    assert ks != sorted(ks) and ks != sorted(ks, reverse=True)


def test_ingest_verbose_prints_rate(star, tmp_path, capsys):
    ingest_to_parquet(star["region"], str(tmp_path / "r"), verbose=True)
    out = capsys.readouterr().out
    assert "TOTAL=" in out and "rows/sec" in out


def test_funnel_ordering_semantics(spark):
    """A click BEFORE any view must not convert; one at-or-after the
    first view must. Purchase requires a qualified click before it."""
    import datetime as dt

    import __spark_entry__ as em
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, off, typ):
        return (i, t0 + dt.timedelta(minutes=off), u, typ, 0.0, "{}")

    rows = [
        # user 1: click(1) view(2) click(3) purchase(4) -> full funnel,
        # click_ts = minute 3 (the pre-view click at minute 1 ignored)
        ev(1, 1, 1, "click"), ev(2, 1, 2, "view"),
        ev(3, 1, 3, "click"), ev(4, 1, 4, "purchase"),
        # user 2: purchase(1) view(2) click(3) -> stage 2, purchase NULL
        # (the purchase predates the qualified click)
        ev(5, 2, 1, "purchase"), ev(6, 2, 2, "view"), ev(7, 2, 3, "click"),
        # user 3: error only -> stage 0
        ev(8, 3, 1, "error"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="funnel_t_")  # funnel only reads events
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r.user_id: (r.stage, r.click_ts, r.purchase_ts)
           for r in em.queries()["funnel_stages_user"](spark, d).collect()}
    assert out[1][0] == 3 and out[1][1] == t0 + dt.timedelta(minutes=3)
    assert out[2][0] == 2 and out[2][2] is None
    assert out[3][0] == 0


def test_funnel_single_exchange(spark, sf_dir):
    """Both running-min windows and the per-user aggregate must share
    ONE shuffle on user_id (same-window-spec reuse)."""
    import __spark_entry__ as em
    from etlutils_spark.plans.checks import physical_plan

    import re

    plan = physical_plan(em.queries()["funnel_stages_user"](spark, sf_dir))
    # formatted mode prints each node once in the tree as "(n) Exchange"
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Sort", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 2, plan


def test_profile_drift_detects_planted_changes(spark):
    from etlutils_spark.operators.recode import profile_drift

    a = spark.createDataFrame(
        [(1, "en", 10), (2, "de", 20), (3, "fr", 30)],
        "doc_id long, lang string, n long",
    )
    b = spark.createDataFrame(
        [(1, "en", 10), (2, None, 99)],  # row dropped, null appeared, max shifted
        "doc_id long, lang string, n long",
    )
    out = {r.column: r for r in profile_drift(a, b).collect()}
    assert out["doc_id"].n_rows_delta == -1
    assert out["lang"].n_nulls_delta == 1
    # en/de/fr -> en only (NULL is excluded from distinct counts)
    assert out["lang"].n_distinct_delta == -2
    assert out["n"].max_changed is True and out["n"].min_changed is False
    # columns=None means "all shared columns"; an explicit empty list
    # is a caller bug and must not silently widen to everything
    import pytest

    with pytest.raises(ValueError, match="columns"):
        profile_drift(a, b, columns=[])


def test_funnel_matches_python_reference_random(spark):
    """Random event sequences vs an independent O(n) scan reference:
    the window formulation must equal the obvious sequential algorithm
    for every ordering of views/clicks/purchases."""
    import datetime as dt
    import random

    from etlutils_spark.event_queries import funnel_stages

    rng = random.Random(7)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(25):
        for k in range(rng.randint(1, 12)):
            eid += 1
            rows.append(
                (eid, u,
                 t0 + dt.timedelta(minutes=rng.randint(0, 500)),
                 rng.choice(["view", "click", "purchase", "error"])))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r.user_id: (r.view_ts, r.click_ts, r.purchase_ts, r.stage)
           for r in funnel_stages(df).collect()}

    # sequential reference: scan events in (ts, event_id) order keeping
    # the earliest qualifying timestamp per stage
    from collections import defaultdict

    per_user = defaultdict(list)
    for e, u, ts, typ in rows:
        per_user[u].append((ts, e, typ))
    for u, evs in per_user.items():
        v = c = p = None
        for ts, _e, typ in sorted(evs):
            if typ == "view" and v is None:
                v = ts
            elif typ == "click" and v is not None and ts >= v and c is None:
                c = ts
            elif typ == "purchase" and c is not None and ts >= c and p is None:
                p = ts
        stage = 3 if p else (2 if c else (1 if v else 0))
        assert got[u] == (v, c, p, stage), u


def test_corpus_diff_classifies_all_states(spark):
    from etlutils_spark.operators.recode import corpus_diff

    a = spark.createDataFrame(
        [(1, "same"), (2, "old"), (3, "gone")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(1, "same"), (2, "new"), (4, "fresh")], "doc_id long, text string"
    )
    out = {r.doc_id: r.status for r in corpus_diff(a, b).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_null_text_is_presence_not_absence(spark):
    from etlutils_spark.operators.recode import corpus_diff

    a = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    b = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
    out = {r.doc_id: r.status for r in corpus_diff(a, b).collect()}
    assert out == {1: "unchanged", 2: "changed"}


def test_check_constraints_null_predicate_violates(spark):
    """A NULL predicate result is a VIOLATION, not a pass: ~cond is
    NULL for NULL inputs and the old when/otherwise counted the row as
    passing — a 100%-NULL column sailed through every rule silently
    (review catch). Empty input audits as 0 violations, and rule names
    containing quotes work (no parsed SQL)."""
    import pyspark.sql.functions as F
    import pytest

    from etlutils_spark.plans.checks import check_constraints

    df = spark.createDataFrame(
        [(1.0,), (None,), (-2.0,)], "price double"
    )
    rows = {r.rule: r for r in check_constraints(
        df, rules={"price isn't null and > 0": F.col("price") > 0}
    ).collect()}
    r = rows["price isn't null and > 0"]
    assert r.n_violations == 2 and r.passed is False  # NULL + negative
    empty = df.filter(F.lit(False))
    out = check_constraints(
        empty, rules={"pos": F.col("price") > 0},
        unique_keys={"uniq": "price"},
    ).collect()
    assert all(x.n_violations == 0 and x.passed for x in out)
    with pytest.raises(ValueError, match="no rules"):
        check_constraints(df, {}, {})


def test_vector_dot_null_products_contribute_zero(spark):
    """Ragged arrays / NULL elements: zip_with's padding produces NULL
    products, which must contribute ZERO like the DuckDB twin's SUM
    (the uncoalesced fold turned the whole dot into NULL — review
    catch)."""
    from etlutils_spark.functions.vectors import dot_exact, dot_fast

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0, 4.0], [1.0, 1.0])], "a array<double>, b array<double>"
    )
    got = df.select(
        dot_exact("a", "b").alias("de"), dot_fast("a", "b").alias("df")
    ).first()
    assert got.de == 3.0 and got.df == 3.0  # partial dot over shared dims


def test_vector_dot_empty_or_all_null_is_null(spark):
    """An EMPTY or all-NULL product array must yield NULL, like the
    DuckDB twin's SUM over zero qualifying rows (the coalesce-to-zero
    fold returned 0.0 there, diverging from the oracle on exactly the
    malformed-embedding edge it documents as matched — review catch)."""
    import duckdb

    from etlutils_spark.functions.vectors import dot_exact, dot_fast

    df = spark.createDataFrame(
        [
            (1, [], []),
            (2, [None, None], [1.0, 1.0]),
            (3, [1.0, None], [2.0, 5.0]),
        ],
        "id long, a array<double>, b array<double>",
    )
    rows = {
        r.id: (r.de, r.df)
        for r in df.select(
            "id", dot_exact("a", "b").alias("de"), dot_fast("a", "b").alias("df")
        ).collect()
    }
    assert rows[1] == (None, None)  # empty arrays: undefined, not 0.0
    assert rows[2] == (None, None)  # all products NULL
    assert rows[3] == (2.0, 2.0)  # a NULL product still contributes zero
    # the DuckDB twin (SUM over unnested subscripts) agrees on the edge
    got = duckdb.sql(
        "SELECT CAST(SUM(CAST(CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)"
        " AS DECIMAL(30,12))) AS DOUBLE)"
        " FROM (SELECT [NULL, NULL]::DOUBLE[] AS a, [1.0, 1.0]::DOUBLE[] AS b),"
        " UNNEST(generate_series(1, 2)) AS t(i)"
    ).fetchone()[0]
    assert got is None


def test_ccnet_n_buckets_guard(spark):
    import pytest

    from etlutils_spark.operators.search import ccnet_lm_buckets

    df = spark.createDataFrame([(1, "a b c", "en")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="n_buckets"):
        ccnet_lm_buckets(df, n_buckets=0)
    with pytest.raises(ValueError, match="no thresholds"):
        ccnet_lm_buckets(df, n_buckets=1, mode="approx")
