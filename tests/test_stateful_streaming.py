"""applyInPandasWithState custom stateful operator: streaming running
totals must equal the batch aggregate after the stream drains."""

from pyspark.sql import functions as F

from etlutils_spark.streaming.ingest import run_available_now, stream_events_file
from etlutils_spark.streaming.stateful import running_user_totals


def test_stateful_running_totals(spark, sf_dir, star):
    events = stream_events_file(spark, sf_dir)
    out = running_user_totals(events)
    got_df = run_available_now(
        spark, out, query_name="t_state", output_mode="update"
    )
    # last update per user = final totals
    latest = {r.user_id: (r.n_events,) for r in got_df.collect()}
    batch = {
        r.user_id: (r.n,)
        for r in star["events"].groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # in availableNow the whole file is one batch -> single update row per user
    assert latest == batch
