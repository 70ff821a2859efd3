"""Extra benchmarks for the optimization rounds (guide §1).

NOT the frozen driver bench (`bench.py`). This harness isolates
individual declared queries so optimization work can attribute time
correctly:

- noop sink (`df.write.format("noop")`) instead of `.count()` so the
  timing covers every column of every row, not a count-pruned subtree
  (guide §1.4);
- per-query job descriptions (guide §1.5);
- `--fresh` runs each query in its own subprocess/session so one
  query's persisted blocks / GC pressure can't bleed into the next
  (the r6 driver artifact shows exactly that bleed: kg_ranges_fast
  swings 4.3 s ↔ 22 s depending on what ran before it);
- `--explain` writes `plans/r07/<query>_<tag>.txt` with
  `.explain("formatted")` output for the plan-audit deliverable.

Usage:
  python bench_extra.py --queries kg_ranges kg_ranges_fast --reps 3
  python bench_extra.py --queries kg_ranges --explain before
  python bench_extra.py --fresh --queries kg_ranges kg_ranges_fast
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def _spark():
    from wikidata_sparql_history_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(f"bench-extra-{cpus}", master=f"local[{cpus}]")


def _clear_caches(entry):
    for cache in (entry._RANGES_CACHE, entry._REIFIED_CACHE, entry._DICT_CACHE):
        for df in cache.values():
            try:
                df.unpersist()
            except Exception:
                pass
        cache.clear()


def run_queries(names: list[str], reps: int, explain_tag: str | None,
                keep_cache: bool) -> dict:
    spark = _spark()
    import __spark_entry__ as entry

    qs = entry.queries()
    # same warm-up protocol as bench.py: JIT/codegen/python-daemon costs
    # land here, not in the first timed rep
    try:
        qs["kg_ranges"](spark, "/root/testdata/sf0.001").count()
        qs["dedup_exact_docs"](spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass
    _clear_caches(entry)
    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for r in range(reps):
            if not keep_cache:
                _clear_caches(entry)
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"samples": samples, "min": min(samples)}
        if explain_tag:
            os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(REPO, "plans", "r07", f"{name}_{explain_tag}.txt"),
                "w",
            ) as f:
                f.write(txt)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG")
    ap.add_argument("--fresh", action="store_true",
                    help="each query in its own subprocess/session")
    ap.add_argument("--keep-cache", action="store_true",
                    help="do NOT clear the ranges/reified caches between "
                         "reps (times the cached-reuse path)")
    args = ap.parse_args()
    if args.fresh:
        results = {}
        for name in args.queries:
            cmd = [sys.executable, __file__, "--queries", name,
                   "--reps", str(args.reps)]
            if args.explain:
                cmd += ["--explain", args.explain]
            if args.keep_cache:
                cmd += ["--keep-cache"]
            r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            results[name] = (
                json.loads(lines[-1])[name] if lines else {"err": r.stderr[-800:]}
            )
        print(json.dumps(results))
    else:
        print(json.dumps(run_queries(
            args.queries, args.reps, args.explain, args.keep_cache
        )))


if __name__ == "__main__":
    main()
