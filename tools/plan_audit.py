"""Plan audit: print the physical-plan quality summary for every
registered query — pushdown, pruning, join strategy, shuffle count,
codegen coverage. Usage:

    python tools/plan_audit.py [query_name ...] [--sf DIR] [--explain]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--explain", action="store_true",
                    help="also dump the formatted plan")
    args = ap.parse_args()

    from mqtt_influx_storage_service_spark import plans
    from mqtt_influx_storage_service_spark.operators import all_queries
    from mqtt_influx_storage_service_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = all_queries()
    names = args.names or sorted(qs)
    for name in names:
        df = qs[name](spark, args.sf)
        s = plans.summarize(df)
        print(f"== {name}")
        print(json.dumps(s, indent=2))
        if args.explain:
            print(plans.plan_str(df))
    return 0


if __name__ == "__main__":
    sys.exit(main())
