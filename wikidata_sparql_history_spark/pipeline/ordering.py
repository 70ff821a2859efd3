"""Stable turn ordering per conversation (SURVEY.md §2.5 W1/W2).

The reference sorts revisions per page with a TreeMap + explicit sort
(RevisionFileConverter.java:70,129-136) and relies on dump-file
ordering. Here the input arrives in arbitrary partition order, so the
order is *declared*: a window over (turn_idx, ts) per conv_id. The
"revision id" of a turn is its turn_idx (ids may be non-dense, exactly
like MediaWiki revision ids); `pos` is the dense 1..n sequence and
`next_turn_idx` is the W2 lookahead (LONG_MAX sentinel on the last
turn, cf. RevisionFileConverter.java:133).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import LONG_MAX

TURN_ORDER = ("turn_idx", "ts")


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Turn-metadata table: the analog of revisions.tsv.gz
    (FileHistoryOutput.java:34-44) — one row per turn with dense
    position and next-revision lookahead.
    """
    w = Window.partitionBy("conv_id").orderBy(*TURN_ORDER)
    return transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "role",
        "tool",
        "ts",
        F.row_number().over(w).alias("pos"),
        F.lead(F.col("turn_idx").cast("long"), 1, LONG_MAX).over(w).alias(
            "next_turn_idx"
        ),
        F.lag(F.col("turn_idx").cast("long"), 1).over(w).alias("parent_turn_idx"),
    )
