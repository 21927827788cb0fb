"""Streaming-entry decomposition profiler (r15, guide §1).

Splits a streaming catalog entry's wall time into its real phases —
input staging (batch write), the availableNow drain, and the sink
readback — and, for the drain, captures each micro-batch's
StreamingQueryProgress.durationMs (triggerExecution / queryPlanning /
walCommit / commitOffsets / addBatch / getBatch / latestOffset) plus
the Spark job count per phase, so the "~2.7 s drain floor" stops being
one opaque number.

Usage:
    python tools/streamprof.py <entry> [passes]

Entries: streaming_dedup_lsh, streaming_dedup_batch, streaming_attribution,
streaming_ann_enrich (any streaming_* catalog entry — the catalog function
runs unmodified; phases come from monkeypatched hooks, results untouched).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _n_jobs(spark) -> int:
    """Total jobs submitted so far (AppStatusStore)."""
    try:
        return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()
    except Exception:
        return -1


def main() -> None:
    name = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql.streaming.query import StreamingQuery

    from sids_data_pipeline_spark.lifecycle import release_tracked
    from sids_data_pipeline_spark.plans.catalog import all_queries
    from sids_data_pipeline_spark.session import get_spark

    spark = get_spark("streamprof")
    catalog = all_queries()

    # hook 1: capture per-batch progress from every drained stream
    progresses: list[dict] = []
    drain_spans: list[tuple[float, float, int, int]] = []
    orig_await = StreamingQuery.awaitTermination

    def patched_await(self, timeout=None):
        t0, j0 = time.time(), _n_jobs(spark)
        out = orig_await(self, timeout)
        t1, j1 = time.time(), _n_jobs(spark)
        drain_spans.append((t0, t1, j0, j1))
        for p in self.recentProgress:
            progresses.append(
                {
                    "batchId": p["batchId"],
                    "numInputRows": p["numInputRows"],
                    "durationMs": p["durationMs"],
                }
            )
        return out

    StreamingQuery.awaitTermination = patched_await

    for i in range(passes):
        release_tracked()
        progresses.clear()
        drain_spans.clear()
        t0, j0 = time.time(), _n_jobs(spark)
        df = catalog[name].spark(spark, SF_DIR)
        t1, j1 = time.time(), _n_jobs(spark)
        df.write.format("noop").mode("overwrite").save()
        t2, j2 = time.time(), _n_jobs(spark)
        drain_wall = sum(b - a for a, b, _, _ in drain_spans)
        drain_jobs = sum(jb - ja for _, _, ja, jb in drain_spans)
        report = {
            "pass": i,
            "total_s": round(t2 - t0, 3),
            "build_s": round(t1 - t0, 3),
            "readback_noop_s": round(t2 - t1, 3),
            "drain_wall_s": round(drain_wall, 3),
            "stage_plus_misc_s": round((t1 - t0) - drain_wall, 3),
            "jobs_total": j2 - j0,
            "jobs_drain": drain_jobs,
            "jobs_stage_misc": (j1 - j0) - drain_jobs,
            "jobs_readback": j2 - j1,
            "n_streams": len(drain_spans),
            "batches": progresses[:],
        }
        print(json.dumps(report), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
