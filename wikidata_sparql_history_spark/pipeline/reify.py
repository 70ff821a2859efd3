"""Statement reification (SURVEY.md §2.10 depth — the RdfBuilder
statement grammar, RdfBuilder.java:232-285).

Per statement the reference emits: a statement NODE (wds: URI,
RdfBuilder.java:232-266) carrying the ps: value and a rank plus a
BestRank marker, pq: qualifier snaks (:258-260), and
prov:wasDerivedFrom pointing at a content-hashed reference node with
pr: snaks (:261-265; snak trichotomy :273-285). The Spark analog over
the FIXTURES mention grammar's reified segments:

    <<P<j>>>[!] [[E<k>]] [((P<qj>:E<qk>|?|!))] [{{S<r>}}]

(the qualifier inner form carries the snak trichotomy: an entity =
ValueSnak, '?' = SomeValueSnak, '!' = NoValueSnak.)

- ``stmt_id``: sha256/16 of (conv_id, turn_idx, subj, pred, obj) — a
  deterministic stand-in for the reference's statement GUID (not
  derivable from text); qualifier and reference rows attach to it.
- ``stmt_rank``: '!' → preferred, else normal. ``best_rank`` mirrors
  BestRankFilter semantics per (conv_id, subj, pred): preferred beats
  normal; when no preferred exists every normal statement is best.
- reference rows: {{S<r>}} → ``ref_id`` = sha256/16 of the source
  snak, the same content-hashing the reference applies to reference
  nodes (RdfBuilder.java:261-265).

Value-side terms (subj / obj / qualifier object) run through the same
entity-linking + alias-canonicalization as the base pipeline, so the
statement layer agrees with the triples layer term-for-term.

Everything is columnar (regexp_extract_all + posexplode + per-element
regexp_extract inside whole-stage codegen); the only shuffles are the
final distincts and the best-rank window, all keyed on conv_id-prefixed
keys that reuse an upstream hash partitioning when one exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import canonicalize, linking

# one reified segment; inner markers are optional so the base grammar's
# plain segments (and the P0 self-typing fact) parse too
SEG_RE = (
    r"(<<P\d+>>!? \[\[E\d+\]\]"
    r"(?: \(\(P\d+:[^)]+\)\))?"
    r"(?: \{\{S\d+\}\})?)"
)

_SEP = "\x1f"


def reified_segments(transcripts: DataFrame) -> DataFrame:
    """Parse every reified segment of every turn: (conv_id, turn_idx,
    subj, pred, stmt_rank, obj, qual_pred, qual_obj, ref_src) with ''
    for absent optional parts (raw surface forms, pre-linking)."""
    base = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.regexp_extract("text", r"\[\[(E\d+)\]\]", 1).alias("subj"),
        F.posexplode(F.regexp_extract_all("text", F.lit(SEG_RE), 1)).alias(
            "seg_idx", "seg"
        ),
    ).filter(F.col("subj") != "")
    seg = F.col("seg")
    return base.select(
        "conv_id",
        "turn_idx",
        "subj",
        F.regexp_extract(seg, r"<<(P\d+)>>", 1).alias("pred"),
        F.when(seg.contains(">>!"), F.lit("preferred"))
        .otherwise(F.lit("normal"))
        .alias("stmt_rank"),
        F.regexp_extract(seg, r"\[\[(E\d+)\]\]", 1).alias("obj"),
        F.regexp_extract(seg, r"\(\((P\d+):[^)]+\)\)", 1).alias("qual_pred"),
        F.regexp_extract(seg, r"\(\(P\d+:([^)]+)\)\)", 1).alias("qual_obj"),
        F.regexp_extract(seg, r"\{\{(S\d+)\}\}", 1).alias("ref_src"),
    )


def entity_map(candidates: DataFrame, alias_edges: DataFrame) -> DataFrame:
    """(mention, entity): argmax-prior candidate, alias-canonicalized —
    the composed link+canon dimension, built once and broadcast."""
    best = linking.resolve_dict(candidates).select("mention", "entity_id")
    cmap = canonicalize.canonical_map(alias_edges)
    return best.join(
        cmap.withColumnRenamed("src", "entity_id"), "entity_id", "left"
    ).select("mention", F.coalesce("canon", "entity_id").alias("entity"))


def _link(df: DataFrame, emap: DataFrame, col: str) -> DataFrame:
    """Rewrite one surface-form column through the broadcast entity map
    ('' — absent optional part — passes through untouched)."""
    return (
        df.join(
            F.broadcast(emap.withColumnRenamed("mention", col)), col, "left"
        )
        .withColumn(col, F.coalesce("entity", F.col(col)))
        .drop("entity")
    )


def reify_statements(
    transcripts: DataFrame,
    candidates: DataFrame,
    alias_edges: DataFrame,
) -> DataFrame:
    """The linked statement-occurrence table: one row per parsed
    segment with stmt_id attached; feeds statement_nodes /
    statement_qualifiers / statement_references."""
    segs = reified_segments(transcripts)
    emap = entity_map(candidates, alias_edges)
    for col in ("subj", "obj", "qual_obj"):
        segs = _link(segs, emap, col)
    return segs.withColumn(
        "stmt_id",
        F.substring(
            F.sha2(
                F.concat_ws(
                    _SEP, "conv_id", "turn_idx", "subj", "pred", "obj"
                ),
                256,
            ),
            1,
            16,
        ),
    )


def statement_nodes(reified: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, stmt_id, subj, pred, obj, stmt_rank,
    best_rank): the statement-node table with BestRankFilter semantics
    (best_rank as 0/1 int for engine-stable hashing).

    ONE exchange: the explicit repartition on (conv_id, subj, pred)
    satisfies BOTH the distinct (its keys are a superset — equal rows
    hash equal on the subset, Spark's subset rule) and the BestRank
    window (exact key match), so neither adds a shuffle
    (tests/test_reify_golden.py::test_statement_nodes_single_exchange)."""
    nodes = (
        reified.select(
            "conv_id", "turn_idx", "stmt_id", "subj", "pred", "obj", "stmt_rank"
        )
        .repartition("conv_id", "subj", "pred")
        .distinct()
    )
    w = Window.partitionBy("conv_id", "subj", "pred")
    has_pref = F.max(
        F.when(F.col("stmt_rank") == "preferred", 1).otherwise(0)
    ).over(w)
    is_pref = F.when(F.col("stmt_rank") == "preferred", 1).otherwise(0)
    return nodes.withColumn(
        "best_rank",
        F.when(has_pref == 1, is_pref).otherwise(F.lit(1)).cast("int"),
    )


def statement_qualifiers(reified: DataFrame) -> DataFrame:
    """(stmt_id, qual_pred, qual_obj, snak_type): pq: snak rows with
    the full snak trichotomy (RdfBuilder.java:258-260, :273-285):

    - ValueSnak  — grammar ``((P:E))`` → linked entity object
    - SomeValueSnak — ``((P:?))`` → deterministic content-hashed bnode
      (the reference hashes the snak into a skolem bnode id)
    - NoValueSnak — ``((P:!))`` → ``wdno:P`` class marker (the
      reference emits ``rdf:type wdno:P``)
    - quantity ValueSnak — ``((P:V<amt>))`` → the pq: SIMPLE form
      (signed amount lexical, RdfBuilder.java:427-433 canonical
      decimal); the pqv: full value node lives in
      `statement_value_nodes`
    """
    q = reified.filter(F.col("qual_pred") != "")
    is_qty = F.col("qual_obj").rlike(r"^V\d+$")
    snak_type = (
        F.when(F.col("qual_obj") == "?", F.lit("somevalue"))
        .when(F.col("qual_obj") == "!", F.lit("novalue"))
        .otherwise(F.lit("value"))
    )
    bnode = F.concat(
        F.lit("_:"),
        F.substring(
            F.sha2(F.concat_ws(_SEP, "stmt_id", "qual_pred"), 256), 1, 16
        ),
    )
    obj = (
        F.when(F.col("qual_obj") == "?", bnode)
        .when(F.col("qual_obj") == "!", F.concat(F.lit("wdno:"), "qual_pred"))
        .when(is_qty, F.concat(F.lit("+"), F.expr("substring(qual_obj, 2)")))
        .otherwise(F.col("qual_obj"))
    )
    return (
        q.select(
            "stmt_id",
            "qual_pred",
            obj.alias("qual_obj"),
            snak_type.alias("snak_type"),
        )
        .distinct()
    )


def statement_value_nodes(reified: DataFrame) -> DataFrame:
    """(stmt_id, qual_pred, val_id, amount, unit): the pqv:/wdv:
    complex-value emission (RdfBuilder.java:377-425): every quantity
    snak gets a CONTENT-HASHED value node carrying its components
    (amount + unit; unitless quantities use unit '1' like the
    reference). Identical quantities share one node — exactly the
    reference's value-node dedup-by-hash."""
    qty = reified.filter(F.col("qual_obj").rlike(r"^V\d+$"))
    amt_str = F.expr("substring(qual_obj, 2)")
    val_id = F.concat(
        F.lit("wdv:"),
        F.substring(
            F.sha2(
                F.concat_ws(_SEP, F.lit("quantity"), amt_str, F.lit("1")), 256
            ),
            1,
            16,
        ),
    )
    return qty.select(
        "stmt_id",
        "qual_pred",
        val_id.alias("val_id"),
        amt_str.cast("long").alias("amount"),
        F.lit("1").alias("unit"),
    ).distinct()


def statement_references(reified: DataFrame) -> DataFrame:
    """(stmt_id, ref_id, ref_src): prov:wasDerivedFrom rows with the
    content-hashed reference node id (RdfBuilder.java:261-265)."""
    return (
        reified.filter(F.col("ref_src") != "")
        .select(
            "stmt_id",
            F.substring(
                F.sha2(F.concat_ws(_SEP, F.lit("ref"), "ref_src"), 256), 1, 16
            ).alias("ref_id"),
            "ref_src",
        )
        .distinct()
    )
