"""Round-4 hardening (VERDICT r3 advice items): NULL passthrough in
typed-value encoders, inverted-range guard in close_open_ranges_at,
cosine_topk broadcast-misuse guard, session-cache eviction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401 (api check)

from wikidata_sparql_history_spark import LONG_MAX
from wikidata_sparql_history_spark.functions import typed_values as tv
from wikidata_sparql_history_spark.operators import similarity
from wikidata_sparql_history_spark.streaming import incremental


def test_encode_null_passthrough(spark):
    """encode(NULL) must be NULL (SQL semantics), not raise_error —
    only genuinely out-of-range ids fail."""
    df = spark.createDataFrame(
        [(None, None, None)], "i long, d double, s string"
    )
    row = df.select(
        tv.encode_integer("i").alias("ei"),
        tv.encode_decimal("d").alias("ed"),
        tv.encode_datetime(F.col("s").cast("timestamp")).alias("et"),
    ).collect()[0]
    assert row["ei"] is None and row["ed"] is None and row["et"] is None


def test_encode_out_of_range_still_raises(spark):
    df = spark.createDataFrame([(tv.MAX_INLINE_ID + 1,)], "i long")
    with pytest.raises(Exception, match="out of inline range"):
        df.select(tv.encode_integer("i")).collect()


def test_close_open_ranges_at_guard(spark):
    arr = spark.createDataFrame(
        [("c0", "s", "p", "o", [(5, LONG_MAX)])],
        "conv_id string, subj string, pred string, obj string, "
        "ranges array<struct<start:long,end:long>>",
    )
    ok = incremental.close_open_ranges_at(
        arr, spark.createDataFrame([("c0", 9)], "conv_id string, at_rev long")
    )
    assert ok.collect()[0]["ranges"] == [(5, 9)]
    # boundary at/below the open range's start would invert the range
    bad = incremental.close_open_ranges_at(
        arr, spark.createDataFrame([("c0", 5)], "conv_id string, at_rev long")
    )
    with pytest.raises(Exception, match="would invert"):
        bad.collect()
    # closed ranges are untouched even by a low boundary
    closed = spark.createDataFrame(
        [("c0", "s", "p", "o", [(5, 8)])],
        "conv_id string, subj string, pred string, obj string, "
        "ranges array<struct<start:long,end:long>>",
    )
    out = incremental.close_open_ranges_at(
        closed, spark.createDataFrame([("c0", 2)], "conv_id string, at_rev long")
    )
    assert out.collect()[0]["ranges"] == [(5, 8)]


def test_cosine_topk_query_bound_guard(spark):
    emb = spark.range(20).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.col("id").cast("double")).alias("embedding"),
    )
    q = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    with pytest.raises(ValueError, match="broadcast cross-product"):
        similarity.cosine_topk(emb, q, k=2, max_queries=10)
    # small probe sets still work
    got = similarity.cosine_topk(emb, q.limit(2), k=2, max_queries=10)
    assert got.count() == 4


def test_session_cache_eviction(spark):
    import __spark_entry__ as entry

    class FakeDF:
        unpersisted = False

        def unpersist(self):
            self.unpersisted = True

    dead = FakeDF()
    live_key = entry._session_key(spark, "/tmp/sf")
    entry._RANGES_CACHE[("dead-app", 0, "/tmp/sf")] = dead
    entry._RANGES_CACHE[live_key] = FakeDF()
    entry._evict_dead_sessions(entry._RANGES_CACHE, spark)
    assert ("dead-app", 0, "/tmp/sf") not in entry._RANGES_CACHE
    assert live_key in entry._RANGES_CACHE
    assert dead.unpersisted
    del entry._RANGES_CACHE[live_key]
