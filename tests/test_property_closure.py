"""Property test: transitive_closure ≡ a python reachability oracle
on random small digraphs (cycles, self-loops, disconnected parts)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from wikidata_sparql_history_spark.plans import paths

NODES = list("abcdefg")

edge = st.tuples(st.sampled_from(NODES), st.sampled_from(NODES))
edge_sets = st.lists(edge, min_size=1, max_size=14, unique=True)


def py_closure(edges):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    out = set()
    for s in {e[0] for e in edges}:
        seen, stack = set(), [*adj.get(s, ())]
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(adj.get(n, ()))
        out |= {(s, d) for d in seen}
    return out


@settings(max_examples=12, deadline=None)
@given(edge_sets)
def test_closure_matches_python_oracle(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {tuple(r) for r in paths.transitive_closure(df).collect()}
    assert got == py_closure(edges)
