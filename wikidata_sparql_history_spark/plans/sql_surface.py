"""spark.sql front door over the constructed KG tables (SURVEY.md §4).

The reference's query entry point is SPARQL text prepared against its
triple store (SimpleQueryPreparer.java:40-60: parse → optimize →
evaluate over the snapshot/history views). The Spark-native analog is
SQL text against registered temp views — Catalyst is the prepared-query
optimizer, and every view is a lazy DataFrame plan, so SQL queries get
the exact same pushdown/pruning/join-selection as the DataFrame API.

`register_views` publishes the canonical view names:

  kg_ranges_v   — (conv_id, subj, pred, obj, range_start, range_end)
  kg_turns_v    — (conv_id, turn_idx, role, tool, ts, pos,
                   next_turn_idx, parent_turn_idx)

plus derived convenience views mirroring the reference's magic
predicates and snapshot filters:

  kg_metadata_v — the magic-predicate union (next/prev lookahead rows,
                  RevisionFileConverter.java:129-136 analog)

Snapshot-at-revision is parameterized at query time (`state_at_sql`)
— a view per revision would defeat partition pruning of the literal
comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import LONG_MAX

RANGES_VIEW = "kg_ranges_v"
TURNS_VIEW = "kg_turns_v"
METADATA_VIEW = "kg_metadata_v"


def register_views(
    spark: SparkSession, ranges: DataFrame, turns: DataFrame
) -> None:
    """Publish the KG tables as session-scoped temp views. Temp views
    wrap the lazy plans — no materialization happens here, and cached/
    persisted upstream DataFrames keep their storage."""
    ranges.createOrReplaceTempView(RANGES_VIEW)
    turns.createOrReplaceTempView(TURNS_VIEW)
    # one pass over the turns table: both magic-predicate rows of a
    # turn are built in a single projection and exploded — a UNION ALL
    # of per-relation branches would re-run the turn-ordering window
    # once per branch (2 scans / 2 windows where 1 suffices at 100 TB)
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY VIEW {METADATA_VIEW} AS
        SELECT conv_id, turn_idx, r.rel AS rel, r.value AS value
        FROM (
          SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                 explode(array_compact(array(
                   IF(next_turn_idx != {LONG_MAX},
                      named_struct('rel', 'next',
                                   'value', CAST(next_turn_idx AS STRING)),
                      NULL),
                   IF(parent_turn_idx IS NOT NULL,
                      named_struct('rel', 'prev',
                                   'value', CAST(parent_turn_idx AS STRING)),
                      NULL)
                 ))) AS r
          FROM {TURNS_VIEW}
        )
        """
    )


def state_at_sql(rev: int) -> str:
    """Literal SQL text of the flagship snapshot query ("facts live at
    revision rev") against the registered views — the reference
    README's 'humans in Wikidata in 2015' front-door analog."""
    return f"""
        SELECT conv_id, subj, pred, obj FROM {RANGES_VIEW}
        WHERE range_start <= {rev} AND {rev} < range_end
    """


def asserting_turn_sql() -> str:
    """SQL text joining every validity range to the turn that asserted
    it (range_start = the asserting turn's revision id), carrying the
    turn's dense position — a ranges↔turn-metadata join entirely in
    SQL text."""
    return f"""
        SELECT r.conv_id, r.subj, r.pred, r.obj,
               CAST(t.pos AS BIGINT) AS pos
        FROM {RANGES_VIEW} r
        JOIN {TURNS_VIEW} t
          ON r.conv_id = t.conv_id AND r.range_start = t.turn_idx
    """


def metadata_sql() -> str:
    """SQL text over the magic-predicate view (next/prev)."""
    return f"SELECT conv_id, turn_idx, rel, value FROM {METADATA_VIEW}"


ALIASES_VIEW = "kg_aliases_v"


def canonical_map_sql() -> str:
    """Literal `WITH RECURSIVE` SQL for the alias canonical map over
    the registered alias-edge view — Spark 4's recursive CTE on the
    SQL surface, computing the same (src, canon) table as the
    DataFrame path-halving loop (pipeline/canonicalize.py) and as the
    DuckDB oracle's recursive `walk`/`canon` CTEs, text-for-text.

    Spark's recursive CTEs support UNION ALL only (no UNION dedup),
    which is exactly right here: the alias graph is a functional
    forest (validated by canonical_map), so the walk is finite and
    duplicate-free by construction. The terminal filter keeps only
    walk rows ending at a non-source node — the canonical
    representative."""
    return f"""
        WITH RECURSIVE walk(src, dst) AS (
          SELECT src, dst FROM {ALIASES_VIEW}
          UNION ALL
          SELECT w.src, a.dst FROM walk w JOIN {ALIASES_VIEW} a ON w.dst = a.src
        )
        SELECT src, dst AS canon FROM walk
        WHERE dst NOT IN (SELECT src FROM {ALIASES_VIEW})
    """
