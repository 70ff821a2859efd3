"""Terms emission: per-entity lang-tagged labels / descriptions /
aliases (SURVEY.md §2.10; reference analog RdfBuilder.java:205-217,
which emits rdfs:label, schema:description and skos:altLabel triples
for every entity document, one per language).

The transcript corpus has no natural-language term source, so terms
derive from the canonical entity set by the same pure-integer-formula
discipline as the rest of the corpus (synth.py): for entity Q<k>

    label        — text 'entity <k>',          lang L[k % 5]
    description  — text 'canonical entity <k>', lang 'en'
    aliases      — k % 3 rows, text 'entity <k> alias <j>',
                   lang L[(k + j + 1) % 5]        (j = 0 .. k%3-1)

with L the Wikimedia language-code family (en, simple, zh-yue, als,
bat-smg), each row also carrying its BCP-47 normalization
(rdf_terms.normalize_lang — RdfBuilder.java:545-551), exactly as the
reference normalizes Wikimedia codes before emitting @lang tags.

Plan shape (audited): ONE scan of the fact table (subj+obj via a
2-element explode), ONE exchange (the entity distinct), then a single
projection building all term rows per entity as an array_compact'd
struct array and exploding it — the first cut's three-way union
re-derived the entity set per branch (6 scans, 3 exchanges), which is
the difference between one fact-table pass and six at 100 TB. No
joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import rdf_terms as rt

WIKIMEDIA_LANGS = ("en", "simple", "zh-yue", "als", "bat-smg")
MAX_ALIASES = 3  # alias count = k % MAX_ALIASES


def canonical_entities(ranges: DataFrame) -> DataFrame:
    """(entity): the distinct canonical Q-entities appearing in the
    triples table (subjects and objects). explode(array(subj, obj))
    instead of a self-union so the fact table is scanned ONCE."""
    return (
        ranges.select(F.explode(F.array("subj", "obj")).alias("entity"))
        .filter(F.col("entity").rlike(r"^Q\d+$"))
        .distinct()
    )


# property scaffolding forms (SURVEY §2.10): every property gets the
# full prefix family the reference emits so SPARQL rewrites can route
# by form — (form name, IRI prefix, OWL typing). wdt:/ps:/pq:/pr: are
# Object properties over simple values; p: links entity→statement
# node; wdno: is the no-value CLASS marker (owl:Class, rdf:type'd by
# NoValueSnak rows in statement_qualifiers).
PROPERTY_FORMS = (
    ("directClaim", "wdt:", "owl:ObjectProperty"),
    ("claim", "p:", "owl:ObjectProperty"),
    ("statementProperty", "ps:", "owl:ObjectProperty"),
    ("qualifier", "pq:", "owl:ObjectProperty"),
    ("reference", "pr:", "owl:ObjectProperty"),
    ("novalue", "wdno:", "owl:Class"),
)


def property_scaffolding(ranges: DataFrame) -> DataFrame:
    """(pred, form, iri, owl_type): one row per (distinct predicate ×
    prefix form) — the property-scaffolding table (RdfBuilder's
    property-document emission analog: each P gets its wdt:/p:/ps:/
    pq:/pr:/wdno: faces plus OWL typing)."""
    preds = (
        ranges.select(F.col("pred"))
        .filter(F.col("pred").rlike(r"^P\d+$"))
        .distinct()
    )
    forms = F.array(
        *[
            F.struct(
                F.lit(name).alias("form"),
                F.lit(prefix).alias("prefix"),
                F.lit(owl).alias("owl_type"),
            )
            for name, prefix, owl in PROPERTY_FORMS
        ]
    )
    return preds.select("pred", F.explode(forms).alias("f")).select(
        "pred",
        F.col("f.form").alias("form"),
        F.concat(F.col("f.prefix"), F.col("pred")).alias("iri"),
        F.col("f.owl_type").alias("owl_type"),
    )


def entity_terms(ranges: DataFrame) -> DataFrame:
    """(entity, term_type, text, lang, bcp47): the terms table.

    All term rows of one entity are built in ONE projection as a
    struct array (label, description, then up to MAX_ALIASES-1 alias
    slots nulled out beyond k % MAX_ALIASES and removed by
    array_compact) and exploded — a union of per-type branches would
    re-derive the entity set once per branch."""
    ents = canonical_entities(ranges)
    k = F.expr("CAST(substring(entity, 2) AS BIGINT)")
    lang_arr = F.array(*[F.lit(c) for c in WIKIMEDIA_LANGS])

    def lang_at(idx):
        return F.element_at(lang_arr, (idx + 1).cast("int"))

    def row(term_type, text, lang):
        return F.struct(
            F.lit(term_type).alias("term_type"),
            text.alias("text"),
            lang.alias("lang"),
        )

    label = row(
        "label",
        F.concat(F.lit("entity "), k),
        lang_at(k % len(WIKIMEDIA_LANGS)),
    )
    desc = row("description", F.concat(F.lit("canonical entity "), k), F.lit("en"))
    aliases = [
        F.when(
            F.lit(j) < k % MAX_ALIASES,
            row(
                "alias",
                F.concat(F.lit("entity "), k, F.lit(" alias "), F.lit(j)),
                lang_at((k + j + 1) % len(WIKIMEDIA_LANGS)),
            ),
        )
        for j in range(MAX_ALIASES - 1)
    ]
    rows = ents.select(
        "entity",
        F.explode(F.array_compact(F.array(label, desc, *aliases))).alias("r"),
    )
    return rows.select(
        "entity",
        F.col("r.term_type").alias("term_type"),
        F.col("r.text").alias("text"),
        F.col("r.lang").alias("lang"),
    ).withColumn("bcp47", rt.normalize_lang(F.col("lang")))
