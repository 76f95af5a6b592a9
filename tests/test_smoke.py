"""Phase-0 smoke: session boots, star schema loads, SQL surface works."""

from etlutils_spark.sources.files import TABLES


def test_star_loads(star):
    assert set(star) == set(TABLES)
    assert star["lineitem"].count() > 0
    assert star["region"].count() == 5


def test_sql_surface(spark, star):
    n = spark.sql("select count(*) as n from lineitem join orders on l_orderkey = o_orderkey").first()["n"]
    assert n == star["lineitem"].count()  # every lineitem has an order


def test_session_utc(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
