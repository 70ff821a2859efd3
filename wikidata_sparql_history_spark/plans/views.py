"""Temporal snapshot + metadata views (SURVEY.md §2.2 P5/P6, §2.3
J2-J5, §2.5 W3/W4).

The reference exposes history through named graphs
(rev:global/r, rev:additions/r, rev:deletions/r —
RocksTripleSource.java:107-139) and 11 magic predicates. Here each is
a cheap declarative view over two tables:

- `ranges`  : one row per coalesced validity range
              (conv_id, subj, pred, obj, range_start, range_end, ...)
- `turns`   : ordered turn metadata from `ordering.ordered_turns`

All predicates are plain column comparisons → Catalyst pushes them to
the parquet scan (min/max pruning on range_start/range_end when the
table is sorted on write).

Array-form variants (`*_arrays`) consume the packed
array<struct<start,end>> triples table with higher-order `exists`
(LongRangeUtils.java:7-32 analogs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import LONG_MAX


# --- range-row form (primary) --------------------------------------------

def state_at(ranges: DataFrame, rev: int) -> DataFrame:
    """Triples live at revision `rev`: ∃ range with start ≤ rev < end.
    (LongRangeUtils.isInRange, RocksTripleSource.java:264-268)"""
    return ranges.filter(
        (F.col("range_start") <= rev) & (F.lit(rev) < F.col("range_end"))
    ).select("conv_id", "subj", "pred", "obj")


def additions_at(ranges: DataFrame, rev: int) -> DataFrame:
    """Triples added exactly at `rev` (isRangeStart)."""
    return ranges.filter(F.col("range_start") == rev).select(
        "conv_id", "subj", "pred", "obj"
    )


def deletions_at(ranges: DataFrame, rev: int) -> DataFrame:
    """Triples deleted exactly at `rev` (isRangeEnd)."""
    return ranges.filter(F.col("range_end") == rev).select(
        "conv_id", "subj", "pred", "obj"
    )


# --- array form (packed triples table) ------------------------------------

def state_at_arrays(triples: DataFrame, rev: int) -> DataFrame:
    return triples.filter(
        F.exists("ranges", lambda r: (r.start <= rev) & (F.lit(rev) < r.end))
    ).select("conv_id", "subj", "pred", "obj")


def additions_at_arrays(triples: DataFrame, rev: int) -> DataFrame:
    return triples.filter(F.exists("ranges", lambda r: r.start == rev)).select(
        "conv_id", "subj", "pred", "obj"
    )


def deletions_at_arrays(triples: DataFrame, rev: int) -> DataFrame:
    return triples.filter(F.exists("ranges", lambda r: r.end == rev)).select(
        "conv_id", "subj", "pred", "obj"
    )


# --- delta indexes (A5 analogs, derived not stored) ------------------------

def additions_index(ranges: DataFrame) -> DataFrame:
    """revision → sorted list of added triples
    (statement_inserted column family analog, RocksStore.java:153-159)."""
    return ranges.groupBy("conv_id", F.col("range_start").alias("turn_idx")).agg(
        F.sort_array(F.collect_list(F.struct("subj", "pred", "obj"))).alias("added")
    )


def deletions_index(ranges: DataFrame) -> DataFrame:
    return (
        ranges.filter(F.col("range_end") != LONG_MAX)
        .groupBy("conv_id", F.col("range_end").alias("turn_idx"))
        .agg(
            F.sort_array(F.collect_list(F.struct("subj", "pred", "obj"))).alias(
                "deleted"
            )
        )
    )


# --- magic-predicate metadata views (J2-J5, W3-W4) -------------------------

def revision_about(turns: DataFrame) -> DataFrame:
    """schema:about — turn → conversation (RocksTripleSource.java:583-649)."""
    return turns.select("conv_id", "turn_idx")


def revision_author(turns: DataFrame) -> DataFrame:
    """hist:author analog — turn → role (contributor)."""
    return turns.select("conv_id", "turn_idx", F.col("role").alias("author"))


def revision_date(turns: DataFrame) -> DataFrame:
    """schema:dateCreated analog."""
    return turns.select("conv_id", "turn_idx", "ts")


def parent_revision(turns: DataFrame) -> DataFrame:
    """schema:isBasedOn — parent pointer via ordering lag (J3)."""
    return turns.filter(F.col("parent_turn_idx").isNotNull()).select(
        "conv_id", "turn_idx", "parent_turn_idx"
    )


def next_previous_revision(turns: DataFrame) -> DataFrame:
    """hist:nextRevision / hist:previousRevision (W3): dense adjacency."""
    return turns.select(
        "conv_id",
        "turn_idx",
        F.col("parent_turn_idx").alias("previous_turn_idx"),
        F.when(F.col("next_turn_idx") == LONG_MAX, None)
        .otherwise(F.col("next_turn_idx"))
        .alias("next_turn_idx"),
    )


def author_revisions(turns: DataFrame) -> DataFrame:
    """contributor → sorted revision list (J4 / A4)."""
    return turns.groupBy("conv_id", "role").agg(
        F.sort_array(F.collect_list("turn_idx")).alias("turn_idxs")
    )


def global_state_at_ts(turns: DataFrame, ts) -> DataFrame:
    """hist:globalStateAt — as-of lookup (J5,
    RocksTripleSource.java:739-768): per conversation, the first turn
    with ts ≥ the probe instant; among equal timestamps the minimum
    turn_idx (W4)."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    cand = turns.filter(F.col("ts") >= ts)
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("conv_id", "turn_idx", "ts")
    )


def adjacency(triples_or_ranges: DataFrame) -> DataFrame:
    """Adjacency table (north rule): subj → list<(pred, obj)>."""
    return triples_or_ranges.groupBy("subj").agg(
        F.sort_array(F.collect_set(F.struct("pred", "obj"))).alias("edges")
    )
