"""Property-based SPARQL BGP evaluation (hypothesis): random small
graphs × random 2-pattern queries must match a pure-python binding
enumerator — the deep guarantee behind ★kg_sparql_state_at /
★kg_sparql_join."""

from __future__ import annotations

from itertools import product

from hypothesis import given, settings, strategies as st

from wikidata_sparql_history_spark.plans import sparql

node = st.sampled_from(["Q1", "Q2", "Q3"])
pred = st.sampled_from(["P1", "P2"])
triple = st.tuples(node, pred, node)
graph_st = st.lists(triple, min_size=1, max_size=8)

# each pattern position: a variable from a small pool or a constant
pos = st.sampled_from(["?a", "?b", "?c", "Q1", "Q2", "P1", "P2"])
pattern = st.tuples(pos, pos, pos)
case = st.tuples(graph_st, st.lists(pattern, min_size=1, max_size=2)).filter(
    # at least one variable overall, else SELECT * has nothing to bind
    lambda gc: any(t.startswith("?") for p in gc[1] for t in p)
)


def py_eval(triples, patterns):
    """Enumerate all variable bindings satisfying every pattern."""
    triples = set(triples)
    vars_ = sorted(
        {t[1:] for p in patterns for t in p if t.startswith("?")}
    )
    sols = set()
    for rows in product(triples, repeat=len(patterns)):
        env: dict[str, str] = {}
        ok = True
        for (s, p, o), row in zip(patterns, rows):
            for tok, val in zip((s, p, o), row):
                if tok.startswith("?"):
                    v = tok[1:]
                    if env.setdefault(v, val) != val:
                        ok = False
                elif tok != val:
                    ok = False
            if not ok:
                break
        if ok:
            sols.add(tuple(env[v] for v in vars_))
    return vars_, sols


@settings(max_examples=12, deadline=None)
@given(case)
def test_bgp_matches_python_enumerator(spark, gc):
    triples, patterns = gc
    query = (
        "SELECT * WHERE { "
        + " . ".join(" ".join(p) for p in patterns)
        + " }"
    )
    df = spark.createDataFrame(
        list(set(triples)), "subj string, pred string, obj string"
    )
    got_df = sparql.evaluate(df, query)
    want_vars, want = py_eval(triples, patterns)
    assert got_df.columns == want_vars
    assert {tuple(r) for r in got_df.collect()} == want


# --- round 6: random boolean FILTER trees over one pattern ----------------

# leaf comparisons over the bindings of { ?a ?p ?b }
_LEAVES = [
    ("?a = Q1", lambda e: e["a"] == "Q1"),
    ("?a != ?b", lambda e: e["a"] != e["b"]),
    ("?p = P1", lambda e: e["p"] == "P1"),
    ('STRSTARTS(?b, "Q")', lambda e: e["b"].startswith("Q")),
    ('CONTAINS(?b, "2")', lambda e: "2" in e["b"]),
    ("?b IN (Q1, Q3)", lambda e: e["b"] in ("Q1", "Q3")),
]
leaf = st.sampled_from(_LEAVES)


def boolean_tree(depth):
    if depth == 0:
        return leaf
    sub = boolean_tree(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(st.just("&&"), sub, sub),
        st.tuples(st.just("||"), sub, sub),
        st.tuples(st.just("!"), sub),
    )


def render(t):
    if isinstance(t, tuple) and t[0] in ("&&", "||"):
        return f"({render(t[1])} {t[0]} {render(t[2])})"
    if isinstance(t, tuple) and t[0] == "!":
        return f"!({render(t[1])})"
    return t[0]


def evaluate_tree(t, env):
    if isinstance(t, tuple) and t[0] == "&&":
        return evaluate_tree(t[1], env) and evaluate_tree(t[2], env)
    if isinstance(t, tuple) and t[0] == "||":
        return evaluate_tree(t[1], env) or evaluate_tree(t[2], env)
    if isinstance(t, tuple) and t[0] == "!":
        return not evaluate_tree(t[1], env)
    return t[1](env)


@settings(max_examples=12, deadline=None)
@given(graph_st, boolean_tree(2))
def test_boolean_filter_tree_matches_python(spark, triples, tree):
    """Random &&/||/! trees over comparison / string-fn / IN leaves
    must agree with a pure-python evaluator on every binding of
    { ?a ?p ?b } — the deep guarantee behind ★kg_sparql_filter_bool /
    ★kg_sparql_filter_fn."""
    df = spark.createDataFrame(
        list(set(triples)), "subj string, pred string, obj string"
    )
    q = f"SELECT ?a ?p ?b WHERE {{ ?a ?p ?b . FILTER({render(tree)}) }}"
    got = {tuple(r) for r in sparql.evaluate(df, q).collect()}
    want = {
        (s, p, o)
        for (s, p, o) in set(triples)
        if evaluate_tree(tree, {"a": s, "p": p, "b": o})
    }
    assert got == want
