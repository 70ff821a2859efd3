"""Batched mention detection + triple extraction (SURVEY.md §2.10).

The reference's extractor is RdfBuilder.java (entity JSON → RDF
statements). Ours turns transcript text into (subj, pred, obj) rows
under the FIXTURES.md mention grammar:

    text = ... [[E<s>]] <<P<j1>>> [[E<k1>]] <<P<j2>>> [[E<k2>]] ...
    emits (E<s>, P<ji>, E<ki>) for each relation marker, i.e. the i-th
    ``<<P>>`` pairs with the (i+1)-th ``[[E]]`` mention; the first
    mention is the subject.

Two implementations with identical output:

- `extract_triples` — **pandas UDF over Arrow batches** via
  `mapInPandas` (the north rule's mandated shape; no per-row Python at
  the Spark level — batches arrive as Arrow, regex runs through
  pandas' vectorized str accessor).
- `extract_triples_builtin` — pure JVM columnar plan
  (`regexp_extract_all` + `posexplode`), fully inside whole-stage
  codegen; the fast path we benchmark against.

Per-turn duplicate triples are dropped (A3 analog of the reference's
HashSet dedup, RevisionFileConverter.java:199-210).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MENTION_RE = r"\[\[(E\d+)\]\]"
PRED_RE = r"<<(P\d+)>>"

EXTRACT_SCHEMA = "conv_id string, turn_idx long, subj string, pred string, obj string"


_EMPTY = pd.DataFrame(
    {
        "conv_id": pd.Series(dtype="object"),
        "turn_idx": pd.Series(dtype="int64"),
        "subj": pd.Series(dtype="object"),
        "pred": pd.Series(dtype="object"),
        "obj": pd.Series(dtype="object"),
    }
)


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    if len(pdf) == 0:
        return _EMPTY.copy()
    pdf = pdf.reset_index(drop=True)
    ments = pdf["text"].str.findall(MENTION_RE)
    preds = pdf["text"].str.findall(PRED_RE)
    meta = pd.DataFrame(
        {
            "conv_id": pdf["conv_id"],
            "turn_idx": pdf["turn_idx"].astype("int64"),
            "subj": ments.str[0],
        }
    )
    # positional pairing: i-th pred joins i-th non-subject mention,
    # via exploded frames index-aligned on (row, position) — no row loop
    pe = preds.explode().dropna().rename("pred").to_frame()
    pe["i"] = pe.groupby(level=0).cumcount()
    oe = ments.str[1:].explode().dropna().rename("obj").to_frame()
    oe["i"] = oe.groupby(level=0).cumcount()
    pairs = pe.reset_index().merge(oe.reset_index(), on=["index", "i"])
    if pairs.empty:
        return _EMPTY.copy()
    out = pairs.merge(meta, left_on="index", right_index=True)
    out = out[out["subj"].notna()]
    return out[["conv_id", "turn_idx", "subj", "pred", "obj"]].drop_duplicates()


def extract_triples(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, subj, pred, obj) via Arrow-batched pandas UDF."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf)

    cols = transcripts.select("conv_id", F.col("turn_idx").cast("long"), "text")
    return cols.mapInPandas(run, schema=EXTRACT_SCHEMA).dropDuplicates(
        ["conv_id", "turn_idx", "subj", "pred", "obj"]
    )


def extract_triples_builtin(transcripts: DataFrame) -> DataFrame:
    """Same semantics, pure built-in expressions (whole-stage codegen)."""
    # r7: no size()-prefilter — it was pushed below the projection,
    # re-evaluating both regexp_extract_all calls in the Filter (2-3x
    # per turn). Empty pred lists explode to zero rows and short
    # mention lists yield NULL subj/obj, so the obj-NOT-NULL filter
    # above the Generate keeps the row set identical with one
    # evaluation per regex (same rewrite as construct.py; guide §1.2).
    df = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        # single-element struct explode: both arrays become ONE
        # generated attribute, so InferFiltersFromGenerate's derived
        # filter for the posexplode is a field access, not a regex
        F.explode(
            F.array(
                F.struct(
                    F.regexp_extract_all("text", F.lit(MENTION_RE), 1).alias(
                        "ments"
                    ),
                    F.regexp_extract_all("text", F.lit(PRED_RE), 1).alias(
                        "preds"
                    ),
                )
            )
        ).alias("mp"),
    )
    df = df.select(
        "conv_id",
        "turn_idx",
        F.posexplode("mp.preds").alias("i", "pred"),
        F.col("mp.ments").alias("ments"),
    ).select(
        "conv_id",
        "turn_idx",
        # try_element_at: NULL (→ filtered) on empty/short mention
        # lists — plain element_at throws under Spark 4 ANSI mode,
        # diverging from the pandas twin
        F.try_element_at("ments", F.lit(1)).alias("subj"),
        "pred",
        F.try_element_at("ments", F.col("i") + 2).alias("obj"),
    )
    return df.filter(F.col("obj").isNotNull()).dropDuplicates(
        ["conv_id", "turn_idx", "subj", "pred", "obj"]
    )
