"""One-shot SPARQL CLI over a materialized store (Main.java:117-122
analog: `-sparql` evaluates one query against the loaded store and
prints the result; web/SparqlEndpoint.java:154-201 negotiates the
result format — here `--format`).

    python -m wikidata_sparql_history_spark.cli \
        --store /path/to/pipeline/output \
        --query 'SELECT ?s ?o WHERE { GRAPH <rev:global/8> { ?s P0 ?o } }' \
        [--format tsv|json|ntriples] [--max-rows 1000]

The store is a `pipeline.materialize.run_pipeline` output directory;
the default graph is the full `ranges` triple history (GRAPH contexts
slice snapshots from the same table; `turns` enables the magic
predicates). Results print to stdout:

- tsv: header + rows (SPARQL results TSV spirit)
- json: the SPARQL 1.1 results JSON shape
  {"head": {"vars": [...]}, "results": {"bindings": [...]}}
- ntriples: for CONSTRUCT/DESCRIBE graph results (subj/pred/obj rows
  serialized with the shared N-Triples escaping helpers)

`--max-rows` bounds the driver-side collect (the endpoint's 300 s
timeout analog is a row bound here: a CLI prints bounded results;
unbounded exports should `df.write` instead — SparqlEndpoint.java:47).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F


def _load(spark, store: str):
    from .sources import catalog

    ranges = catalog.read_table(spark, os.path.join(store, "ranges"))
    turns = None
    turns_path = os.path.join(store, "turns")
    if os.path.isdir(turns_path):
        turns = catalog.read_table(spark, turns_path)
    return ranges, turns


def run_query(spark, store: str, query: str):
    """→ result DataFrame for `query` over the materialized store."""
    from .plans import sparql

    ranges, turns = _load(spark, store)
    triples = ranges.select("subj", "pred", "obj")
    return sparql.evaluate(triples, query, ranges=ranges, turns=turns)


def _emit_tsv(rows, cols, out):
    out.write("\t".join(cols) + "\n")
    for r in rows:
        out.write(
            "\t".join("" if r[c] is None else str(r[c]) for c in cols) + "\n"
        )


def _emit_json(rows, cols, out):
    bindings = [
        {
            c: {"type": "literal", "value": str(r[c])}
            for c in cols
            if r[c] is not None
        }
        for r in rows
    ]
    json.dump(
        {"head": {"vars": cols}, "results": {"bindings": bindings}},
        out,
    )
    out.write("\n")


def _emit_ntriples(df, max_rows, out):
    from .functions import rdf_terms as rt

    if set(df.columns) != {"subj", "pred", "obj"}:
        raise SystemExit(
            "--format ntriples needs a graph result (CONSTRUCT/DESCRIBE)"
        )
    lines = (
        df.select(
            F.concat(
                rt.nt_iri(F.col("subj")),
                F.lit(" "),
                rt.nt_iri(F.col("pred")),
                F.lit(" "),
                rt.nt_iri(F.col("obj")),
                F.lit(" ."),
            ).alias("line")
        )
        .limit(max_rows)
        .collect()
    )
    for r in lines:
        out.write(r["line"] + "\n")


def main(argv=None, spark=None, out=None):
    ap = argparse.ArgumentParser(prog="wikidata_sparql_history_spark.cli")
    ap.add_argument("--store", required=True,
                    help="run_pipeline output directory")
    ap.add_argument("--query", "-q", required=True, help="SPARQL text")
    ap.add_argument("--format", choices=("tsv", "json", "ntriples"),
                    default="tsv")
    ap.add_argument("--max-rows", type=int, default=1000)
    args = ap.parse_args(argv)
    out = out or sys.stdout

    owned = spark is None
    if owned:
        from .session import get_spark

        spark = get_spark("sparql-cli")
    try:
        df = run_query(spark, args.store, args.query)
        if args.format == "ntriples":
            _emit_ntriples(df, args.max_rows, out)
        else:
            rows = df.limit(args.max_rows).collect()
            if args.format == "tsv":
                _emit_tsv(rows, df.columns, out)
            else:
                _emit_json(rows, df.columns, out)
    finally:
        if owned:
            spark.stop()
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
