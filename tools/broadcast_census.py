"""Static-broadcast census (r9): hunt the bug CLASS behind the r8
dedup_components kill across the whole doc/embedding tier.

The class: Catalyst's STATIC size estimate puts a corpus-shaped
relation under a BroadcastExchange. The broadcast stage materializes
eagerly (in parallel with the rest of the query), so AQE's runtime
demotion never gets a chance when the input has no shuffle stage to
measure — at real scale the driver dies building the hash relation
(exactly what r9 fixed in the jaccard/containment/minhash verify
joins by pinning them; this tool checks everything ELSE).

Method: for every registered query over the documents/embeddings
tables, build the NON-ADAPTIVE physical plan against the 100x stress
corpus (500k docs / 200k vectors — big enough that a corpus broadcast
is an error, small enough that plan BUILDING is instant) and walk the
plan TREE (py4j, not text): flag each BroadcastExchange whose subtree
reaches a file scan or the persisted corpus cache without passing
through an aggregate/limit/top-k (which would bound its cardinality).
Explicitly-broadcast bounded relations (query sets, centroids,
per-group rollups) pass through an aggregate or a driver-side literal
and are NOT flagged.

A flagged entry is a REVIEW item, not automatically a bug — a
filter-reduced relation can be legitimately broadcastable — but every
true instance of the r8 kill class shows up here. Results merge into
the CURRENT round's stress artifact under "broadcast_census_100x".

Usage: python tools/broadcast_census.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/spark_graft_100x/f100"
# merge target: pass an explicit artifact path as argv[1]; the default
# stays the newest STRESS_r*.json so the row lands in the CURRENT round
# (the hardcoded r10 path silently edited a PRIOR round's artifact once)
import glob as _glob

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_stress = sorted(_glob.glob(os.path.join(_repo, "STRESS_r*.json")))
OUT = (sys.argv[1] if len(sys.argv) > 1
       else (_stress[-1] if _stress
             else os.path.join(_repo, "STRESS_r00.json")))

FAMILIES = ("dedup_", "sim_", "text_", "pipeline_", "mm_", "emb_")

# Adjudicated-benign flags: the subtree reaches a scan, but the scan
# carries a pushed-down QUERY-SET predicate (vec_id < N_QUERIES /
# doc_id % stride = 0) whose cardinality is a CONSTANT of the operator
# contract, not corpus-shaped — the census's structural heuristic
# cannot see filter selectivity, a human can. Re-adjudicate if any of
# these queries' query-set definition changes.
BENIGN = {
    "sim_hybrid_rrf": "bounded query set (50 query docs + vectors)",
    "sim_range_search": "bounded query set (vec_id < 100)",
    "sim_cosine_topk": "bounded query set (vec_id < 100)",
    "text_bm25": "bounded query set (50 query docs)",
    "sim_ann_ivf": "bounded query probe set (vec_id < 100)",
    "sim_ann_ivf_pq": "bounded query probe set (vec_id < 100)",
    # r12: the broadcast HINT on approxSimilarityJoin's query side —
    # the flagged subtree is the vec_id < 100 scan (pushed filter
    # visible in DataFilters), ~100 rows exploded to ~600 hash
    # entries; the hint exists precisely to broadcast this bounded
    # set (STRESS_r12 `brp_census_800k`)
    "sim_ann_brp": "bounded query set (vec_id < 100) under the r12 "
                   "broadcast hint",
}
# nodes that bound the cardinality of everything above them
BOUNDING = ("Aggregate", "Limit", "TakeOrdered", "WindowGroupLimit")
SCAN = ("FileSourceScan", "InMemoryTableScan", "RowDataSourceScan",
        "BatchScan")


def _name(p) -> str:
    return p.getClass().getSimpleName()


def _children(p):
    cs = p.children()
    return [cs.apply(i) for i in range(cs.size())]


def _subtree_unbounded_scan(p) -> str | None:
    """First corpus-shaped scan reachable from p without crossing a
    cardinality-bounding node; None if every path is bounded."""
    n = _name(p)
    if any(b in n for b in BOUNDING):
        return None
    if any(s in n for s in SCAN):
        head = p.toString().split("\n")[0]
        return head[:160]
    for c in _children(p):
        hit = _subtree_unbounded_scan(c)
        if hit is not None:
            return hit
    return None


def _walk(p):
    yield p
    for c in _children(p):
        yield from _walk(c)


def main() -> int:
    from mqtt_influx_storage_service_spark.operators import all_queries
    from mqtt_influx_storage_service_spark.session import get_spark

    spark = get_spark("broadcast_census")
    # static plans only: the census asks what Catalyst decides BEFORE
    # any runtime stat exists — the regime the r8 kill lived in
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = all_queries()
    flagged: dict[str, list[str]] = {}
    clean = skipped = 0
    for name, fn in qs.items():
        if not name.startswith(FAMILIES):
            continue
        try:
            plan = fn(spark, BASE)._jdf.queryExecution().executedPlan()
        except Exception:  # noqa: BLE001 - table absent at f100, etc.
            skipped += 1
            continue
        hits = []
        for node in _walk(plan):
            if "BroadcastExchange" not in _name(node):
                continue
            hit = _subtree_unbounded_scan(node)
            if hit is not None:
                hits.append(hit)
        if hits and name in BENIGN:
            print(f"ok   {name} (adjudicated: {BENIGN[name]})", flush=True)
            clean += 1
        elif hits:
            flagged[name] = sorted(set(hits))
            print("FLAG " + name + ": " + "; ".join(sorted(set(hits)))[:200],
                  flush=True)
        else:
            clean += 1
            print("ok   " + name, flush=True)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    results["broadcast_census_100x"] = {
        "corpus": BASE,
        "clean": clean,
        "skipped_no_table": skipped,
        "flagged": flagged,
        "adjudicated_benign": BENIGN,
        "note": ("flagged = a STATIC BroadcastExchange whose subtree "
                 "reaches a scan with no aggregate/limit bound — the r8 "
                 "dedup_components kill class. The census's first run "
                 "found 8 REAL instances (corpus-sized label/caption/"
                 "lang/docs relations under static broadcasts in "
                 "dedup_components, the _curated_docs family, "
                 "pipeline_dedup_mix, sim_threshold_pairs, "
                 "text_langid_ngram, mm_contrastive_pairs); all are now "
                 "pinned shuffle-hash and this list must stay EMPTY. "
                 "Query-set scans with contract-bounded pushed filters "
                 "are adjudicated benign by name above."),
    }
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(results["broadcast_census_100x"], indent=1)[:2000])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
