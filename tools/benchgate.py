"""Bench regression gate: re-measure the headline queries and fail on
>20% steady-state regressions vs the last recorded round bench.

Round 7 shipped a persist-layout change that regressed the two heaviest
queries +73%/+69% because nothing in the pre-commit flow measured them;
this gate makes that class of change fail loudly before it lands.

Usage:
    python tools/benchgate.py                 # gate every headline query
    python tools/benchgate.py q1 q2 ...       # gate a subset (faster —
                                              # use the queries whose
                                              # operator files you touched)

Exit 0 = no query regressed more than TOLERANCE vs the previous round's
recorded per-query steady-state; exit 1 = at least one did (each is
printed). Run at sf0.1 like the driver ($SPARK_GRAFT_SF_DIR overrides).

Methodology matches bench.py exactly: one cold pass, then best-of-5
steady-state passes with no cache release between them. The baseline is
the newest BENCH_r*.json with a recoverable per-query map (bench.py's
own loader). TOLERANCE is 30% for sub-second queries (box noise at the
~0.2 s/job scheduling floor swamps 20% there) and 20% above 1 s — the
regressions this gate exists to catch are the data-heavy ones.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: HEADLINE + _previous_round)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:] or list(bench.HEADLINE)
    prev = bench._previous_round()
    if prev is None:
        print("benchgate: no prior BENCH_r*.json with per-query data — "
              "nothing to gate against", file=sys.stderr)
        return 0
    prev_round, prev_queries = prev

    from sids_data_pipeline_spark.plans.catalog import all_queries
    from sids_data_pipeline_spark.session import get_spark

    spark = get_spark("benchgate")
    catalog = all_queries()
    failures = []
    results = {}
    for name in names:
        if name not in prev_queries:
            print(f"benchgate: {name} not in {prev_round} record — skipped",
                  file=sys.stderr)
            continue
        fn = catalog[name].spark
        fn(spark, SF_DIR).count()  # cold
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        base = prev_queries[name]
        tol = 0.30 if base < 1.0 else 0.20
        results[name] = {
            "now": round(best, 3), "base": base,
            "ratio": round(best / base, 3) if base else None,
        }
        if best > base * (1.0 + tol):
            failures.append(
                f"{name}: {best:.3f}s vs {prev_round} {base:.3f}s "
                f"(+{(best / base - 1) * 100:.0f}% > {tol * 100:.0f}% tolerance)"
            )
    spark.stop()
    print(json.dumps({"baseline": prev_round, "results": results,
                      "failures": failures}))
    for f in failures:
        print(f"benchgate FAIL {f}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
