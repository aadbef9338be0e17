"""Repo-wide physical-plan audit: build EVERY registry query's executed
plan at a small fixture and sweep it for the anti-patterns that kill a
100 TB run — cartesian products, Python row-at-a-time UDFs (BatchEvalPython),
sort-based aggregation, and un-broadcast small-dim joins. Writes PLANS.md.

This is the sweep version of tests/test_plans.py: the test file pins the
headline queries' exact shapes; this tool proves the NEGATIVE across the
whole registry ("no query anywhere cartesians / drops to per-row Python"),
with a short whitelist for the deliberate exceptions it reports inline.

Usage: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prom_etl_db_spark.functions.scratch import release_scratch  # noqa: E402
from prom_etl_db_spark.queries import QUERIES  # noqa: E402
from prom_etl_db_spark.session import get_spark  # noqa: E402

# A BroadcastNestedLoopJoin is benign when its broadcast (build) side is
# PROVABLY bounded — the lazy-scalar idiom: an ungrouped aggregate
# (grouping keys = []) yields exactly one row, so the "nested loop" is a
# constant-compose, not a join. _bnlj_all_benign proves this from the
# plan SHAPE (r5, VERDICT task #1) instead of a query-name list; the
# name list below remains ONLY for composes whose boundedness is real
# but not shape-provable (grouped aggregate over an enum-bounded key).
NLJ_OK = {
    "promql_raw_over_time",  # per-metric aggregate crossJoin: grouped by
    # metric_name (enum-bounded catalog, not corpus-scale) — boundedness
    # is a data property the plan shape cannot prove.
}

_AGG_EXECS = ("HashAggregateExec", "SortAggregateExec", "ObjectHashAggregateExec")


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.length())]


def _iter_nodes(node):
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(_children(n))


def _has_ungrouped_agg(node) -> bool:
    for m in _iter_nodes(node):
        if m.getClass().getSimpleName() in _AGG_EXECS:
            try:
                if m.groupingExpressions().isEmpty():
                    return True
            except Exception:  # noqa: BLE001 — unexpected node API
                continue
    return False


def _bnlj_all_benign(plan_root) -> bool:
    """True iff every BroadcastNestedLoopJoinExec in the (pre-AQE)
    physical plan builds its broadcast side from an ungrouped aggregate
    — a guaranteed-1-row frame, i.e. the whitelisted scalar-compose
    shape. False as soon as one BNLJ broadcasts anything else."""
    saw = False
    for n in _iter_nodes(plan_root):
        if n.getClass().getSimpleName() != "BroadcastNestedLoopJoinExec":
            continue
        saw = True
        build = str(n.buildSide().toString())
        side = n.right() if "Right" in build else n.left()
        if not _has_ungrouped_agg(side):
            return False
    return saw

OPS = (
    "CartesianProduct|BroadcastNestedLoopJoin|SortMergeJoin|"
    "BroadcastHashJoin|ShuffledHashJoin|SortAggregate|HashAggregate|"
    "ObjectHashAggregate|BatchEvalPython|ArrowEvalPython|MapInPandas|"
    "FlatMapGroupsInPandas|Exchange|ReusedExchange"
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    rows = []
    violations = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            violations.append((name, f"plan build failed: {e}"))
            continue
        finally:
            release_scratch()
        ops = Counter(re.findall(rf"\b({OPS})\b", plan))
        rows.append((name, ops))
        if ops.get("CartesianProduct"):
            violations.append((name, "CartesianProduct"))
        if ops.get("BatchEvalPython"):
            violations.append((name, "row-at-a-time Python UDF (BatchEvalPython)"))
        if ops.get("BroadcastNestedLoopJoin") and name not in NLJ_OK:
            # shape proof: every BNLJ broadcasts a 1-row ungrouped agg
            try:
                benign = _bnlj_all_benign(df._jdf.queryExecution().sparkPlan())
            except Exception:  # noqa: BLE001 — fall back to strict
                benign = False
            if not benign:
                violations.append((name, "unexpected BroadcastNestedLoopJoin"))
    out = ["# PLANS — registry-wide physical-plan audit", ""]
    out.append(
        f"{len(rows)} query plans built at `{sf_dir}` (`tools/plan_audit.py`). "
        "Gate: no CartesianProduct anywhere; no row-at-a-time Python UDFs "
        "(all Python is Arrow-batched MapInPandas/FlatMapGroupsInPandas); "
        "BroadcastNestedLoopJoin only where the broadcast side is "
        "SHAPE-PROVEN to be a 1-row ungrouped aggregate (the lazy-scalar "
        "compose), plus the one documented enum-bounded exception."
    )
    out.append("")
    if violations:
        out.append("## VIOLATIONS")
        out += [f"- **{n}**: {v}" for n, v in violations]
    else:
        out.append("## Violations: none")
    sort_aggs = [n for n, ops in rows if ops.get("SortAggregate")]
    out.append("")
    out.append(
        "SortAggregate note: struct-valued argmax/argmin aggregates "
        "(max/min over a (key, payload) struct, or max_by with a struct "
        "ordering key — the ts_of / CDC-latest / first-occurrence family) "
        "carry an immutable buffer, so Spark plans SortAggregate for them: "
        "a partition-local sort on the grouping key, still hash-partitioned "
        "at the exchange, with map-side partial aggregation intact. The "
        "inputs are each operator's natural granularity (step buckets, "
        "paragraph occurrences, change rows), and the hash-friendly "
        "rewrite (two hash aggs + a co-partitioned self-join) trades the "
        "local sort for an extra join — not obviously better; measured "
        f"acceptable at 10x in SCALE.md. Queries: {', '.join(sort_aggs) or 'none'}."
    )
    out.append("")
    out.append("## Operator census (per plan)")
    out.append("")
    out.append("| query | joins | aggs | python | exchanges |")
    out.append("|---|---|---|---|---|")
    for name, ops in rows:
        joins = ", ".join(
            f"{k}×{v}" for k, v in ops.items()
            if "Join" in k or k == "CartesianProduct"
        ) or "—"
        aggs = ", ".join(f"{k}×{v}" for k, v in ops.items() if "Aggregate" in k) or "—"
        py = ", ".join(
            f"{k}×{v}" for k, v in ops.items() if "Python" in k or "Pandas" in k
        ) or "—"
        ex = ", ".join(f"{k}×{v}" for k, v in ops.items() if "Exchange" in k) or "—"
        out.append(f"| {name} | {joins} | {aggs} | {py} | {ex} |")
    Path("PLANS.md").write_text("\n".join(out) + "\n")
    print(f"{len(rows)} plans, {len(violations)} violations -> PLANS.md")
    for n, v in violations:
        print(f"VIOLATION {n}: {v}")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
