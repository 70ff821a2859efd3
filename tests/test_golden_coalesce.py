"""Golden range-coalescing test (FIXTURES.md §2).

Direct port of the reference's end-to-end scenario
(src/test/resources/dump_file_sample.xml +
RevisionFileConverterTest.java:24-66): one conversation with three
turns at revision ids 2, 9, 11. The fact ``(Q1, label_de, "bar")`` is
present at rev 2, absent at rev 9, re-added at rev 11 → must coalesce
to ranges [2,9) and [11,MAX). Facts present at every turn coalesce to
[2,MAX); facts introduced at rev 9 and kept → [9,MAX).
"""

from __future__ import annotations

import datetime as dt

import pytest

from wikidata_sparql_history_spark import LONG_MAX
from wikidata_sparql_history_spark.pipeline.coalesce import (
    coalesce_ranges,
    coalesce_ranges_pandas,
)
from wikidata_sparql_history_spark.pipeline.ordering import ordered_turns


def _fixture(spark):
    ts = [dt.datetime(2024, 1, 1, 0, m) for m in (2, 9, 11)]
    transcripts = spark.createDataFrame(
        [
            # shuffled on purpose: rev 11 first
            ("Q1", 11, "user", "x", "", ts[2]),
            ("Q1", 2, "user", "x", "", ts[0]),
            ("Q1", 9, "assistant", "x", "", ts[1]),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    # fact sets per revision (the extractor output analog):
    #   rev 2:  (Q1, label_en, foo), (Q1, label_de, bar)
    #   rev 9:  (Q1, label_en, foo), (Q1, label_de, baz)
    #   rev 11: (Q1, label_en, foo), (Q1, label_de, bar)   <- re-added
    facts = spark.createDataFrame(
        [
            ("Q1", 2, "Q1", "label_en", "foo"),
            ("Q1", 2, "Q1", "label_de", "bar"),
            ("Q1", 9, "Q1", "label_en", "foo"),
            ("Q1", 9, "Q1", "label_de", "baz"),
            ("Q1", 11, "Q1", "label_en", "foo"),
            ("Q1", 11, "Q1", "label_de", "bar"),
        ],
        "conv_id string, turn_idx int, subj string, pred string, obj string",
    )
    return transcripts, facts


EXPECTED = {
    ("Q1", "label_en", "foo", 2, LONG_MAX),
    ("Q1", "label_de", "bar", 2, 9),
    ("Q1", "label_de", "bar", 11, LONG_MAX),
    ("Q1", "label_de", "baz", 9, 11),
}


@pytest.mark.parametrize("impl", [coalesce_ranges, coalesce_ranges_pandas])
def test_golden_ranges(spark, impl):
    transcripts, facts = _fixture(spark)
    turns = ordered_turns(transcripts)
    got = {
        (r.subj, r.pred, r.obj, r.range_start, r.range_end)
        for r in impl(facts, turns).collect()
    }
    assert got == EXPECTED


def test_both_impls_agree(spark):
    transcripts, facts = _fixture(spark)
    turns = ordered_turns(transcripts)
    a = coalesce_ranges(facts, turns).orderBy("subj", "pred", "obj", "range_start")
    b = coalesce_ranges_pandas(facts, turns).orderBy(
        "subj", "pred", "obj", "range_start"
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
