"""Minimal SPARQL SELECT front door over the snapshot triple view.

The reference's query surface IS SPARQL text (SimpleQueryPreparer.java:
40-60: parse → optimize → evaluate over the history store). This module
provides the Spark-native analog for the workhorse subset:

    SELECT ?v1 ?v2 ... | *
    WHERE { t1 . t2 . ... FILTER(?v = term) ... }
    [ORDER BY ?v [DESC] ...] [LIMIT n]

- Triple patterns ``s p o`` where each position is a variable (``?x``)
  or a constant term (``Q7`` / ``P0`` / ``<iri>`` — angle brackets are
  stripped). Variable predicates are supported.
- Basic graph pattern evaluation = chain of inner joins on shared
  variables — exactly the reference's BGP join (bind-join ordering is
  left to Catalyst/AQE, which replaces its hand-tuned cardinality
  model, HistoryEvaluationStatistics.java:41-106).
- ``FILTER(?v = term)`` equality filters (applied post-join; Catalyst
  pushes them down to the scans).
- ``ORDER BY ?v [DESC]`` (multiple keys allowed) — with LIMIT this
  plans as Spark's TakeOrderedAndProject (O3 top-k, no full sort).
- Graph semantics are GLOBAL (the union over conversations,
  DISTINCT'd), matching the reference's single-graph view; evaluate
  against any (subj, pred, obj) DataFrame — typically
  ``views.state_at(ranges, rev)`` for snapshot-at-revision queries or
  the full ranges table for history-wide queries.

Constants in patterns become scan-side equality filters (the
ExprValueConverter spirit: bind before joining); every pattern scans
the SAME input DataFrame, so a persisted/cached triples table is
scanned from memory per pattern.

Deliberately NOT implemented (rejected loudly): OPTIONAL, UNION,
property paths (use plans/paths.py directly), ORDER BY, aggregates —
the error message names the unsupported token.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SELECT_RE = re.compile(
    r"^\s*SELECT\s+(?P<vars>\*|(?:\?\w+\s*)+)\s*WHERE\s*\{(?P<body>.*)\}"
    r"\s*(?:ORDER\s+BY\s+(?P<order>(?:\?\w+(?:\s+DESC)?\s*)+))?"
    r"\s*(?:LIMIT\s+(?P<limit>\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ORDER_KEY_RE = re.compile(r"\?(\w+)(\s+DESC)?", re.IGNORECASE)
_FILTER_RE = re.compile(
    r"FILTER\s*\(\s*\?(?P<var>\w+)\s*=\s*(?P<term>[^)\s]+)\s*\)",
    re.IGNORECASE,
)
_UNSUPPORTED = ("OPTIONAL", "UNION", "ORDER", "GROUP", "MINUS", "GRAPH")


class SparqlError(ValueError):
    pass


def _term(tok: str) -> str:
    """Strip <...> from IRIs; quoted literals lose their quotes."""
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    if len(tok) >= 2 and tok[0] == '"' and tok[-1] == '"':
        return tok[1:-1]
    return tok


def parse(query: str):
    """→ (select_vars | None for *, patterns, filters, order, limit).

    patterns: list of (s, p, o) where variables keep their '?'.
    filters: list of (var, constant). order: list of (var, desc)."""
    m = _SELECT_RE.match(query)
    if not m:
        raise SparqlError(f"unparseable SPARQL SELECT: {query!r}")
    body = m.group("body")
    for kw in _UNSUPPORTED:
        if re.search(rf"\b{kw}\b", body, re.IGNORECASE):
            raise SparqlError(
                f"unsupported SPARQL feature {kw}: use the DataFrame/SQL "
                "surface (plans/paths.py, plans/sql_surface.py) instead"
            )
    filters = [
        (fm.group("var"), _term(fm.group("term")))
        for fm in _FILTER_RE.finditer(body)
    ]
    body = _FILTER_RE.sub("", body)
    patterns = []
    for clause in (c.strip() for c in body.split(".")):
        if not clause:
            continue
        toks = clause.split()
        if len(toks) != 3:
            raise SparqlError(f"bad triple pattern: {clause!r}")
        patterns.append(tuple(_term(t) for t in toks))
    if not patterns:
        raise SparqlError("empty WHERE block")
    sel = m.group("vars").strip()
    select_vars = (
        None if sel == "*" else [v[1:] for v in re.findall(r"\?\w+", sel)]
    )
    order = [
        (om.group(1), bool(om.group(2)))
        for om in _ORDER_KEY_RE.finditer(m.group("order") or "")
    ]
    limit = int(m.group("limit")) if m.group("limit") else None
    return select_vars, patterns, filters, order, limit


def _is_var(tok: str) -> bool:
    return tok.startswith("?")


def evaluate(triples: DataFrame, query: str) -> DataFrame:
    """Evaluate a SPARQL SELECT against a (subj, pred, obj) DataFrame
    (global-graph semantics: input rows are DISTINCT'd on the three
    term columns first). Returns one column per selected variable."""
    select_vars, patterns, filters, order, limit = parse(query)
    g = triples.select("subj", "pred", "obj").distinct()

    acc = None
    seen_vars: set[str] = set()
    for i, (s, p, o) in enumerate(patterns):
        df = g
        cols = []
        for pos, tok in zip(("subj", "pred", "obj"), (s, p, o)):
            if _is_var(tok):
                cols.append(F.col(pos).alias(f"v_{tok[1:]}"))
            else:
                df = df.filter(F.col(pos) == tok)
        df = df.select(*cols) if cols else df.select()
        pat_vars = {t[1:] for t in (s, p, o) if _is_var(t)}
        if len(pat_vars) < sum(_is_var(t) for t in (s, p, o)):
            # repeated variable within one pattern (?x p ?x): equality
            pairs = [t for t in (s, p, o) if _is_var(t)]
            # the alias collides; rebuild with positional names + filter
            df = g
            for pos, tok in zip(("subj", "pred", "obj"), (s, p, o)):
                if not _is_var(tok):
                    df = df.filter(F.col(pos) == tok)
            keep = {}
            cond = None
            for pos, tok in zip(("subj", "pred", "obj"), (s, p, o)):
                if _is_var(tok):
                    v = tok[1:]
                    if v in keep:
                        c = F.col(keep[v]) == F.col(pos)
                        cond = c if cond is None else (cond & c)
                    else:
                        keep[v] = pos
            df = df.filter(cond).select(
                *[F.col(pos).alias(f"v_{v}") for v, pos in keep.items()]
            )
        if acc is None:
            acc, seen_vars = df, pat_vars
        else:
            on = [f"v_{v}" for v in pat_vars & seen_vars]
            acc = acc.join(df, on) if on else acc.crossJoin(df)
            seen_vars |= pat_vars
    for var, const in filters:
        if var not in seen_vars:
            raise SparqlError(f"FILTER references unbound variable ?{var}")
        acc = acc.filter(F.col(f"v_{var}") == const)
    out_vars = select_vars if select_vars is not None else sorted(seen_vars)
    missing = [v for v in out_vars if v not in seen_vars]
    if missing:
        raise SparqlError(f"SELECT references unbound variables: {missing}")
    acc = acc.select(*[F.col(f"v_{v}").alias(v) for v in out_vars]).distinct()
    for var, _ in order:
        if var not in seen_vars:
            raise SparqlError(f"ORDER BY references unbound variable ?{var}")
        if var not in out_vars:
            raise SparqlError(
                f"ORDER BY ?{var} must be among the selected variables"
            )
    if order:
        acc = acc.orderBy(
            *[
                F.col(v).desc() if desc else F.col(v).asc()
                for v, desc in order
            ]
        )
    if limit is not None:
        acc = acc.limit(limit)
    return acc
