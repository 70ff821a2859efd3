"""Custom stateful streaming operator: live fact-state deltas.

The streaming analog of the reference's inserted/deleted delta
indexes (RocksStore.java:153-159): as transcript turns stream in, a
per-conversation state (the set of currently-live facts) is
maintained with `applyInPandasWithState`, and each processed turn
emits `(conv_id, turn_idx, kind∈{add,del,stale}, subj, pred, obj)`
rows — facts asserted that weren't live, live facts the new turn no
longer asserts, and `kind='stale'` audit rows for out-of-order turns
that were DROPPED (see `_fact_state_fn`). Downstream consumers that
aggregate deltas must filter ``kind != 'stale'`` (or route stale rows
to a separate audit sink) so the add/del contract stays robust to
micro-batch file-ordering replays.

Semantics note: deltas are exact when turns arrive in order per
conversation (the micro-batch sorts its rows by turn_idx; across
batches the file source's maxFilesPerTrigger + one-writer-per-conv
layout provides order — the same assumption the reference's dump
reader makes, RevisionFileConverter.java:97-100). The batch pipeline
remains the source of truth; this operator serves low-latency
freshness, mirrored by test parity with the batch additions/deletions
indexes.

Also here: `windowed_turn_counts` — event-time windowed aggregation
with a watermark (late-data handling), the standard Structured
Streaming surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DELTA_SCHEMA = (
    "conv_id string, turn_idx long, kind string, "
    "subj string, pred string, obj string"
)
STATE_SCHEMA = "live array<string>, max_turn long"

_SEP = "\x1f"


def _fact_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        live, max_turn = set(state.get[0]), int(state.get[1])
    else:
        live, max_turn = set(), -1
    rows: list[tuple] = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    # stale-turn guard: a turn at or below the state's high-water mark
    # arrived after its conversation already advanced (out-of-order
    # micro-batch). Replaying it through the live-set diff would emit
    # wrong deltas, so it is dropped and REPORTED — one kind='stale'
    # row per dropped fact row keeps the count queryable downstream
    # instead of a silent corruption.
    stale = batch[batch["turn_idx"] <= max_turn]
    for r in stale.itertuples(index=False):
        rows.append((conv_id, int(r.turn_idx), "stale", r.subj, r.pred, r.obj))
    batch = batch[batch["turn_idx"] > max_turn]
    for turn_idx, turn in batch.sort_values("turn_idx").groupby("turn_idx"):
        asserted = {
            _SEP.join(t)
            for t in zip(turn["subj"], turn["pred"], turn["obj"])
        }
        for f in sorted(asserted - live):
            rows.append((conv_id, int(turn_idx), "add", *f.split(_SEP)))
        for f in sorted(live - asserted):
            rows.append((conv_id, int(turn_idx), "del", *f.split(_SEP)))
        live = asserted
        max_turn = int(turn_idx)
    state.update((sorted(live), max_turn))
    yield pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "kind", "subj", "pred", "obj"]
    )


def fact_state_deltas(facts: DataFrame) -> DataFrame:
    """facts (streaming, (conv_id, turn_idx, subj, pred, obj)) →
    per-turn add/del delta stream with per-conv state."""
    return (
        facts.groupBy("conv_id")
        .applyInPandasWithState(
            _fact_state_fn,
            outputStructType=DELTA_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_turn_counts(
    transcripts: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed turn counts per role with a watermark —
    late rows beyond the watermark are dropped; state is bounded."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )
