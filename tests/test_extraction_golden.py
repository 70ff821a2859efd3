"""Extraction golden test (SURVEY.md §5 item 1 — RdfBuilderTest analog):
fixed fixture turns → exact expected triple sets, for both extractor
implementations."""

from __future__ import annotations

import datetime as dt

import pytest

from wikidata_sparql_history_spark.pipeline.extract import (
    extract_triples,
    extract_triples_builtin,
)

TS = dt.datetime(2024, 1, 1)

FIXTURE = [
    # (text, expected triples)
    ("hello [[E1]] <<P2>> [[E3]]", {("E1", "P2", "E3")}),
    ("[[E1]] <<P2>> [[E3]] <<P4>> [[E5]]", {("E1", "P2", "E3"), ("E1", "P4", "E5")}),
    ("no mentions here", set()),
    ("[[E1]] lonely subject", set()),            # no predicate → nothing
    ("<<P9>> [[E2]]", set()),                     # predicate before any subject
    ("[[E1]] <<P2>> [[E3]] <<P2>> [[E3]]", {("E1", "P2", "E3")}),  # per-turn dedup
    ("x [[E7]] y <<P0>> z [[E7]] w", {("E7", "P0", "E7")}),        # self-loop
    # pairing is positional, not textual-order: the i-th <<P>> pairs
    # with the (i+1)-th [[E]] wherever they appear in the turn
    ("[[E1]] [[E2]] <<P3>>", {("E1", "P3", "E2")}),
    # more <<P>> markers than non-subject mentions: the unpaired pred
    # is dropped (ANSI regression guard — element_at would throw here;
    # both impls must instead match the DuckDB oracle's filtered row)
    ("[[E1]] [[E2]] <<P1>> <<P2>>", {("E1", "P1", "E2")}),
    ("[[E1]] <<P1>> <<P2>> <<P3>>", set()),
]


@pytest.mark.parametrize("impl", [extract_triples, extract_triples_builtin])
def test_extraction_golden(spark, impl):
    rows = [
        (f"c{i}", 1, "user", text, "", TS) for i, (text, _) in enumerate(FIXTURE)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got: dict[str, set] = {}
    for r in impl(df).collect():
        got.setdefault(r.conv_id, set()).add((r.subj, r.pred, r.obj))
    for i, (text, expected) in enumerate(FIXTURE):
        assert got.get(f"c{i}", set()) == expected, (i, text)
