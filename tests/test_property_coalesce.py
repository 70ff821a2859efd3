"""Property-based range-coalescing test (hypothesis).

Random per-turn presence patterns → the window implementation, the
applyInPandas reference-loop implementation, and a pure-python oracle
must all agree. This is the deep guarantee behind the [2,9),[11,MAX)
golden: ANY add/remove/re-add pattern coalesces identically.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from wikidata_sparql_history_spark import LONG_MAX
from wikidata_sparql_history_spark.pipeline.coalesce import (
    coalesce_ranges,
    coalesce_ranges_pandas,
)
from wikidata_sparql_history_spark.pipeline.ordering import ordered_turns

# a conversation = sorted distinct turn ids; a fact = subset of turns
conv_strategy = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=10, unique=True
).map(sorted)
presence_strategy = st.dictionaries(
    st.sampled_from(["f1", "f2", "f3"]),
    st.sets(st.integers(min_value=0, max_value=9), min_size=1),
    min_size=1,
    max_size=3,
)


def python_oracle(turns: list[int], present_at: set[int]):
    """Reference semantics in plain python: runs of consecutive
    positions → [turn, next_turn_after_run) with MAX for the tail."""
    out = []
    i = 0
    idx = {t: k for k, t in enumerate(turns)}
    pres = sorted(present_at)
    while i < len(pres):
        j = i
        while j + 1 < len(pres) and idx[pres[j + 1]] == idx[pres[j]] + 1:
            j += 1
        last_pos = idx[pres[j]]
        end = turns[last_pos + 1] if last_pos + 1 < len(turns) else LONG_MAX
        out.append((pres[i], end))
        i = j + 1
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(conv=conv_strategy, presence=presence_strategy)
def test_coalesce_matches_python_oracle(spark, conv, presence):
    base = dt.datetime(2024, 1, 1)
    transcripts = spark.createDataFrame(
        [("c", t, "user", "x", "", base + dt.timedelta(minutes=t)) for t in conv],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = []
    expected = set()
    for fact, pos_set in presence.items():
        present_turns = {conv[p % len(conv)] for p in pos_set}
        rows += [("c", t, "s", fact, "o") for t in present_turns]
        for start, end in python_oracle(conv, present_turns):
            expected.add((fact, start, end))
    facts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj string, pred string, obj string"
    )
    turns = ordered_turns(transcripts)
    for impl in (coalesce_ranges, coalesce_ranges_pandas):
        got = {
            (r.pred, r.range_start, r.range_end) for r in impl(facts, turns).collect()
        }
        assert got == expected, (impl.__name__, sorted(got), sorted(expected))
