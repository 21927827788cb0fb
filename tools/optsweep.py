"""Full-catalog timing sweep for the optimization round (guide §1).

Times EVERY catalog query with the noop sink (computation, not sink; no
count()-induced column pruning), one warm-up pass + N timed passes, jobs
labelled. Streaming-backed entries get a single timed pass (they run a
real micro-batch stream; steady-state == cold for them).

Usage: python tools/optsweep.py out.json [name_prefix_filter]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("OPTSWEEP_PASSES", "2"))


def main() -> None:
    out_path = sys.argv[1]
    prefix = sys.argv[2] if len(sys.argv) > 2 else ""
    from sids_data_pipeline_spark.lifecycle import release_tracked
    from sids_data_pipeline_spark.plans.catalog import all_queries
    from sids_data_pipeline_spark.session import get_spark

    spark = get_spark("optsweep")
    catalog = all_queries()
    results: dict[str, dict] = {}
    for name, q in catalog.items():
        if prefix and not name.startswith(prefix):
            continue
        passes = 1 if name.startswith("streaming_") else PASSES
        spark.sparkContext.setJobDescription(f"optsweep:{name}")
        times = []
        try:
            for _ in range(passes + 1):
                release_tracked()
                t0 = time.time()
                df = q.spark(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            results[name] = {
                "cold": times[0],
                "steady": round(min(times[1:]), 3) if len(times) > 1 else times[0],
                "passes": times,
            }
        except Exception as ex:
            results[name] = {"err": f"{type(ex).__name__}: {ex}"}
            traceback.print_exc()
        print(f"{name}: {results[name]}", flush=True)
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
    ok = {k: v for k, v in results.items() if "steady" in v}
    print(
        json.dumps(
            {
                "n": len(results),
                "errors": sorted(k for k, v in results.items() if "err" in v),
                "steady_total": round(sum(v["steady"] for v in ok.values()), 2),
                "slowest": sorted(
                    ((v["steady"], k) for k, v in ok.items()), reverse=True
                )[:25],
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
