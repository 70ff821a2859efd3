"""spark.sql front door (plans/sql_surface.py): the SQL-text surface
must compute the same tables as the DataFrame API over the same
registered views (SimpleQueryPreparer.java:40-60 analog)."""

from __future__ import annotations

import datetime as dt

from wikidata_sparql_history_spark import LONG_MAX
from wikidata_sparql_history_spark.pipeline import ordering
from wikidata_sparql_history_spark.plans import sql_surface, views


def _fixture(spark):
    ranges = spark.createDataFrame(
        [
            ("c0", "Q1", "P0", "Q1", 2, LONG_MAX),
            ("c0", "Q1", "P2", "Q3", 2, 8),
            ("c0", "Q1", "P2", "Q4", 8, LONG_MAX),
        ],
        "conv_id string, subj string, pred string, obj string, "
        "range_start long, range_end long",
    )
    turns = ordering.ordered_turns(
        spark.createDataFrame(
            [
                ("c0", 2, "user", "t", "", dt.datetime(2024, 1, 1)),
                ("c0", 8, "assistant", "t", "", dt.datetime(2024, 1, 2)),
                ("c0", 11, "user", "t", "", dt.datetime(2024, 1, 3)),
            ],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
    )
    sql_surface.register_views(spark, ranges, turns)
    return ranges, turns


def test_sql_state_at_equals_dataframe_twin(spark):
    ranges, _ = _fixture(spark)
    got = {tuple(r) for r in spark.sql(sql_surface.state_at_sql(8)).collect()}
    want = {tuple(r) for r in views.state_at(ranges, 8).collect()}
    assert got == want == {("c0", "Q1", "P0", "Q1"), ("c0", "Q1", "P2", "Q4")}


def test_sql_asserting_turn_join(spark):
    _fixture(spark)
    rows = {
        (r["conv_id"], r["subj"], r["pred"], r["obj"], r["pos"])
        for r in spark.sql(sql_surface.asserting_turn_sql()).collect()
    }
    # range_start 2 → pos 1, range_start 8 → pos 2
    assert rows == {
        ("c0", "Q1", "P0", "Q1", 1),
        ("c0", "Q1", "P2", "Q3", 1),
        ("c0", "Q1", "P2", "Q4", 2),
    }


def test_sql_metadata_view(spark):
    _fixture(spark)
    rows = {
        (r["turn_idx"], r["rel"], r["value"])
        for r in spark.sql(sql_surface.metadata_sql()).collect()
    }
    assert rows == {
        (2, "next", "8"),
        (8, "next", "11"),
        (8, "prev", "2"),
        (11, "prev", "8"),
    }
