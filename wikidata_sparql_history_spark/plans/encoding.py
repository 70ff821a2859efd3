"""Dictionary encoding (SURVEY.md §2.3 J6, §1.2).

The reference dictionary-encodes every RDF term into a type-tagged
int64 (NumericValueFactory.java, RWStringStore RocksStore.java:403-453)
so index keys and comparisons are long-vs-long. The Spark analog is a
dict *table* built with a deterministic rank over distinct terms, and
encode/decode as broadcast joins.

Determinism note: `dense_rank over (order by term)` gives stable ids
for a fixed term universe (unlike monotonically_increasing_id) — the
property the DuckDB oracle needs. At 100 TB you'd switch to
`row_number` over a zipWithIndex-style assignment per append batch and
persist the dict; the join shapes below are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dictionary(triples: DataFrame) -> DataFrame:
    """(term, id): every distinct subj/pred/obj, densely numbered."""
    terms = (
        triples.select(F.col("subj").alias("term"))
        .unionByName(triples.select(F.col("pred").alias("term")))
        .unionByName(triples.select(F.col("obj").alias("term")))
        .distinct()
    )
    w = Window.orderBy("term")
    return terms.select("term", F.dense_rank().over(w).cast("long").alias("id"))


def encode_triples(triples: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Rewrite (subj, pred, obj) → (subj_id, pred_id, obj_id) via three
    broadcast joins (ExprValueConverter analog: constants/fact columns
    become int64 before any further joins/filters)."""
    d = F.broadcast(dictionary)
    out = triples
    for col in ("subj", "pred", "obj"):
        out = (
            out.join(d.withColumnRenamed("term", col), col)
            .withColumnRenamed("id", f"{col}_id")
        )
    return out.drop("subj", "pred", "obj")


def decode_triples(encoded: DataFrame, dictionary: DataFrame) -> DataFrame:
    d = F.broadcast(dictionary)
    out = encoded
    for col in ("subj", "pred", "obj"):
        out = (
            out.join(
                d.select(F.col("id").alias(f"{col}_id"), F.col("term").alias(col)),
                f"{col}_id",
            )
        ).drop(f"{col}_id")
    return out
