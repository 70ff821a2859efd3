"""Custom stateful streaming operator + watermarked windowed agg."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_sparql_history_spark import LONG_MAX, synth
from wikidata_sparql_history_spark.pipeline.coalesce import coalesce_ranges
from wikidata_sparql_history_spark.pipeline.extract import extract_triples_builtin
from wikidata_sparql_history_spark.pipeline.ordering import ordered_turns
from wikidata_sparql_history_spark.streaming.stateful import (
    fact_state_deltas,
    windowed_turn_counts,
)

N_CONV = 12


def test_fact_state_deltas_match_batch_indexes(spark, tmp_path):
    """The streaming delta operator must agree with the batch
    additions/deletions derived from coalesced ranges."""
    t = synth.transcripts(spark, N_CONV, shuffled=False)
    facts = extract_triples_builtin(t)

    # streaming run: facts as a file stream, one conv-ordered dump
    in_dir = str(tmp_path / "facts_in")
    facts.orderBy("conv_id", "turn_idx").coalesce(1).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(facts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = str(tmp_path / "deltas")
    q = (
        fact_state_deltas(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.conv_id, r.turn_idx, r.kind, r.subj, r.pred, r.obj)
        for r in spark.read.parquet(out_dir).collect()
    }

    # batch truth: range starts = adds; range ends (non-MAX) = dels
    ranges = coalesce_ranges(facts, ordered_turns(t))
    expected = set()
    for r in ranges.collect():
        expected.add((r.conv_id, r.range_start, "add", r.subj, r.pred, r.obj))
        if r.range_end != LONG_MAX:
            expected.add((r.conv_id, r.range_end, "del", r.subj, r.pred, r.obj))
    assert got == expected


def test_windowed_turn_counts_with_watermark(spark, tmp_path):
    t = synth.transcripts(spark, 10, shuffled=False)
    in_dir = str(tmp_path / "t_in")
    t.write.parquet(in_dir)
    stream = spark.readStream.schema(t.schema).parquet(in_dir)
    out = windowed_turn_counts(stream, "1 hour", "2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    res = spark.sql("select * from win_counts")
    # append mode emits only windows closed by the watermark; totals
    # over emitted windows must match the batch count for those windows
    batch = (
        t.groupBy(F.window("ts", "1 hour").alias("win"), "role")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "role", F.col("n"))
    )
    joined = res.join(batch, ["window_start", "role"])
    mism = joined.filter(F.col("n_turns") != F.col("n"))
    assert mism.isEmpty()
    assert res.count() > 0


def test_stale_turn_guard_drops_and_reports(spark, tmp_path):
    """An out-of-order micro-batch (a turn at or below the state's
    high-water mark) must not corrupt deltas: stale rows are dropped
    from the diff and surfaced as kind='stale' rows."""
    t = synth.transcripts(spark, N_CONV, shuffled=False)
    facts = extract_triples_builtin(t)

    in_dir = str(tmp_path / "facts_in")
    # file 1: all turns in order; file 2 (later micro-batch): a REPLAY
    # of each conversation's first turn — strictly stale by then
    facts.orderBy("conv_id", "turn_idx").coalesce(1).write.parquet(in_dir)
    from pyspark.sql import Window

    first_turns = (
        facts.withColumn(
            "_min", F.min("turn_idx").over(Window.partitionBy("conv_id"))
        )
        .filter(F.col("turn_idx") == F.col("_min"))
        .drop("_min")
    )
    first_turns.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(facts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = str(tmp_path / "deltas_stale")
    q = (
        fact_state_deltas(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck_stale"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    res = spark.read.parquet(out_dir)
    got = {
        (r.conv_id, r.turn_idx, r.kind, r.subj, r.pred, r.obj)
        for r in res.filter(F.col("kind") != "stale").collect()
    }

    # deltas (add/del) identical to the clean batch truth
    ranges = coalesce_ranges(facts, ordered_turns(t))
    expected = set()
    for r in ranges.collect():
        expected.add((r.conv_id, r.range_start, "add", r.subj, r.pred, r.obj))
        if r.range_end != LONG_MAX:
            expected.add((r.conv_id, r.range_end, "del", r.subj, r.pred, r.obj))
    assert got == expected

    # every replayed row was counted as stale
    n_stale = res.filter(F.col("kind") == "stale").count()
    assert n_stale == first_turns.count()
