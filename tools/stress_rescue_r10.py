"""r10 stress: prove VERDICT r9 #1's fix — the bounded rescue tier for
over-cap shingle buckets recovers the boilerplate-only pair loss.

r9 measured (STRESS_r09 components_fix.cap_recall_10x) that skipping
over-cap blocking shingles outright loses 5.2% of the true jaccard>=0.5
pairs on the 50k depth-growth corpus (20,786 over-cap shingles, worst
df 240) and inflates components 4,876 -> 7,050. The r10 rescue tier
(dedup.py::_shingle_candidates) samples each over-cap bucket to its
SHINGLE_DF_CAP+1 smallest-by-xxhash64(shingle, doc_id) members and
admits over-cap-only pairs that co-occur in >= RESCUE_COOC_MIN sampled
buckets; every admitted pair is still verified EXACTLY against the full
shingle arrays, so precision is unchanged — only recall moves.

This script measures, on the same 50k corpus recipe:
  - Spark capped+rescued pair recall vs the uncapped DuckDB truth
    (target: >= ~98%; DuckDB runs the truth because Spark's uncapped
    plan is the r8 8-GiB kill and cannot),
  - component representative count vs the uncapped truth's,
and re-times the dedup family at 10x and 100x (500k dense docs) at the
DEFAULT heap to prove the rescue tier kept the Σ-bounded pair stage
(the r9 "completes at 8 GiB" claim must survive the extra candidates).

Results merge into STRESS_r10.json under "rescue_tier". Usage:

    python tools/stress_rescue_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = "/tmp/spark_graft_sf1"
BASE_100X = "/tmp/spark_graft_100x"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r10.json")

_SH = """
    list_distinct(list_transform(
        range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        i -> string_split(text, ' ')[i] || ' ' ||
             string_split(text, ' ')[i+1] || ' ' ||
             string_split(text, ' ')[i+2]))
"""


def duckdb_truth(doc_path: str) -> dict:
    """Uncapped exact jaccard>=0.5 pairs + connected components on the
    50k corpus — the oracle semantics the capped plan approximates."""
    import duckdb

    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_path}')")
    t0 = time.time()
    con.execute(f"""
    CREATE TABLE exploded AS
    SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS shingle
    FROM (SELECT doc_id, unnest({_SH}) AS s FROM documents)
    """)
    con.execute(
        "CREATE TABLE counts AS SELECT doc_id, count(*) AS n "
        "FROM exploded GROUP BY 1")
    con.execute("""
    CREATE TABLE truth AS
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM exploded a JOIN exploded b USING (shingle)
    WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    HAVING round(count(*) / (
        (SELECT n FROM counts WHERE doc_id = a.doc_id)
      + (SELECT n FROM counts WHERE doc_id = b.doc_id) - count(*)), 6) >= 0.5
    """)
    sec_pairs = round(time.time() - t0, 1)
    n_truth = con.execute("SELECT count(*) FROM truth").fetchone()[0]
    pairs = set(map(tuple, con.execute(
        "SELECT doc_a, doc_b FROM truth").fetchall()))
    con.close()
    return {"pairs": pairs, "n": n_truth, "sec_pairs": sec_pairs}


def main() -> int:
    # regenerate fixtures if absent (same recipes as r4/r9)
    if not os.path.isdir(SF1_DIR):
        from tools.stress_sf1 import generate
        generate()
    for fanout, d in ((10, f"{BASE_100X}/f10"), (100, f"{BASE_100X}/f100")):
        if not os.path.isdir(d):
            from tools.stress_100x import gen
            gen(fanout, d)

    from bench import _canary
    from mqtt_influx_storage_service_spark.operators import all_queries
    from mqtt_influx_storage_service_spark.operators.dedup import (
        RESCUE_COOC_MIN, SHINGLE_DF_CAP, release_shingles)
    from mqtt_influx_storage_service_spark.session import get_spark

    doc_path = f"{SF1_DIR}/documents.parquet"
    truth = duckdb_truth(doc_path)

    spark = get_spark("stress_rescue_r10")
    qs = all_queries()
    row: dict = {
        "fix": "dedup.py::_shingle_candidates r10 rescue tier — over-cap "
               "buckets sampled to CAP+1 smallest-by-hash members, "
               f"over-cap-only pairs gated at cooc >= {RESCUE_COOC_MIN}; "
               "exact verify unchanged (precision 1.0 by construction)",
        "cap": SHINGLE_DF_CAP,
        "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g (default)"),
        "canary_start_sec": round(_canary(spark), 3),
    }

    # --- recall at the 50k cap-engaged corpus --------------------------
    release_shingles(spark)
    t0 = time.time()
    got = {(r.doc_a, r.doc_b)
           for r in qs["dedup_ngram_jaccard"](spark, SF1_DIR).collect()}
    sec_spark = round(time.time() - t0, 1)
    inter = len(got & truth["pairs"])
    release_shingles(spark)
    reps = qs["dedup_components"](spark, SF1_DIR).filter(
        "is_representative").count()
    release_shingles(spark)
    row["cap_recall_10x"] = {
        "uncapped_truth_pairs": truth["n"],
        "truth_sec_pairs_duckdb": truth["sec_pairs"],
        "spark_pairs": len(got),
        "pair_recall_vs_uncapped": round(inter / truth["n"], 4),
        "false_pairs": len(got - truth["pairs"]),  # must be 0: exact verify
        "sec_spark_pairs": sec_spark,
        "component_reps": reps,
        "uncapped_truth_component_reps": 4876,  # r9 DuckDB measurement
        "r9_capped_was": {"pair_recall": 0.9477, "component_reps": 7050},
    }
    print(json.dumps(row["cap_recall_10x"], indent=1), flush=True)

    # --- heap survival + timings at 10x / 100x -------------------------
    row["timings"] = {}
    for fanout, d in ((10, f"{BASE_100X}/f10"), (100, f"{BASE_100X}/f100")):
        for name in ("dedup_ngram_jaccard", "dedup_containment",
                     "dedup_components", "pipeline_dedup_mix"):
            best = None
            for _ in range(2):
                release_shingles(spark)
                t0 = time.time()
                try:
                    qs[name](spark, d).write.format("noop").mode(
                        "overwrite").save()
                    t = time.time() - t0
                    best = t if best is None else min(best, t)
                except Exception as exc:  # noqa: BLE001 - record, keep going
                    row.setdefault("errors", {})[f"{name}@{fanout}x"] = (
                        str(exc)[:500])
                    break
            row["timings"][f"{name}@{fanout}x"] = (
                round(best, 2) if best is not None else None)
            print(fanout, name, row["timings"][f"{name}@{fanout}x"],
                  flush=True)
        release_shingles(spark)
    row["canary_end_sec"] = round(_canary(spark), 3)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    results["rescue_tier"] = {**results.get("rescue_tier", {}), **row}
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(row, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
