"""LIVE query-mode JDBC pushdown against a second backend (DuckDB).

Derby rejects Spark's ``query``-option schema probe (``SELECT * FROM
(<query>) SPARK_GEN_SUBQ_0``), so test_jdbc_derby.py exercises table
mode only. DuckDB's JDBC driver accepts the subquery-alias form, making
it the live test of ``read_sql(query=...)`` — the reference's
arbitrary-SQL ingest mode (R/ffsql.R:53-65 passes a full SELECT string
to ``read.dbi.ffdf``).

The driver jar is NOT vendored: the test discovers the public
``org.duckdb:duckdb_jdbc`` Maven artifact in the usual local jar caches
(coursier/ivy/maven) and skips if absent. It runs in a SUBPROCESS
session because the shared test session's JVM is already up without the
jar on its classpath (spark.jars is a startup-time setting).

The seed table is written with the Python duckdb wheel (same 1.0.0
storage version as the jar in this image), not Spark's JDBC writer:
Spark opens a fresh JDBC connection per write task, and duckdb-jdbc
1.0.0 gives each connection an independent database instance for the
same file, so cross-connection DDL visibility isn't usable for writes —
the Derby module owns the live write path.
"""

import glob
import os
import re
import subprocess
import sys

import pytest

_JAR_GLOBS = [
    os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc-*.jar"),
    os.path.expanduser("~/.ivy2/**/duckdb_jdbc-*.jar"),
    os.path.expanduser("~/.m2/**/duckdb_jdbc-*.jar"),
]


def _find_jar() -> str | None:
    """Prefer the jar matching the installed duckdb wheel's storage
    version (required: the probe's seed file is written by the wheel);
    otherwise the highest version found. None if no jar — or no wheel
    to write the seed with."""
    try:
        import duckdb
    except ImportError:
        return None
    hits = []
    for pat in _JAR_GLOBS:
        hits.extend(glob.glob(pat, recursive=True))
    if not hits:
        return None

    def ver(path: str) -> tuple:
        m = re.search(r"duckdb_jdbc-([0-9.]+?)\.jar$", os.path.basename(path))
        return tuple(int(p) for p in m.group(1).split(".")) if m else ()

    wheel = tuple(int(p) for p in duckdb.__version__.split(".")[:3]
                  if p.isdigit())
    exact = [h for h in hits if ver(h) == wheel]
    return (exact or sorted(hits, key=ver, reverse=True))[0]


_PROBE = r"""
import sys
sys.path.insert(0, sys.argv[1])
jar, dbfile = sys.argv[2], sys.argv[3]

import duckdb
con = duckdb.connect(dbfile)
con.execute("CREATE TABLE nation AS "
            "SELECT range AS n_nationkey, 'NATION_' || range AS n_name, "
            "       range % 5 AS n_regionkey "
            "FROM range(25)")
con.close()

from etlutils_spark.session import get_session
from etlutils_spark.sources.sql import read_sql
from etlutils_spark.plans.checks import physical_plan

spark = get_session("duckdb_jdbc_probe", **{
    "spark.driver.memory": "2g",
    "spark.sql.shuffle.partitions": "4",
    "spark.jars": jar,
})
opts = {"driver": "org.duckdb.DuckDBDriver"}
url = "jdbc:duckdb:" + dbfile

# 1) true query-mode: arbitrary SQL (join-free here, but with an
#    aggregate subshape Derby's probe would reject) becomes the scan
q = ("SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name "
     "FROM nation GROUP BY n_regionkey")
agg = read_sql(spark, url=url, query=q, options=opts)
rows = sorted(tuple(r) for r in agg.collect())
assert len(rows) == 5 and all(r[1] == 5 for r in rows), rows
assert rows[0] == (0, 5, "NATION_0"), rows

# 2) Catalyst pushdown INTO query mode: a filter on the query result
#    must reach the JDBC source as PushedFilters, not a Spark-side scan
flt = read_sql(
    spark, url=url, query="SELECT n_nationkey, n_name FROM nation",
    options=opts,
).filter("n_nationkey < 5")
plan = physical_plan(flt)
assert "PushedFilters" in plan and "n_nationkey" in plan.split(
    "PushedFilters")[1][:120], plan
assert flt.count() == 5

# 3) fetchsize derived from batch_bytes survives query mode
bb = read_sql(spark, url=url, query="SELECT * FROM nation", options=opts,
              batch_bytes=1 << 20)
assert bb.count() == 25
spark.stop()
print("DUCKDB_JDBC_OK")
"""


@pytest.mark.skipif(
    _find_jar() is None,
    reason="no local org.duckdb:duckdb_jdbc jar (or no duckdb wheel to "
    "seed the probe db)",
)
def test_query_mode_pushdown_live_duckdb(tmp_path):
    jar = _find_jar()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dbfile = str(tmp_path / "probe.duckdb")
    script = tmp_path / "probe.py"
    script.write_text(_PROBE)
    res = subprocess.run(
        [sys.executable, str(script), root, jar, dbfile],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert "DUCKDB_JDBC_OK" in res.stdout
