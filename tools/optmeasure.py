"""Optimization-round measurement harness (guide §1).

Times individual catalog queries in isolation with the noop sink (so the
computation is measured, not the sink or count()'s column pruning) and
captures .explain("formatted") for the plan record.

Usage:
    python tools/optmeasure.py time <name> [passes]     # noop-timed passes
    python tools/optmeasure.py plan <name> <outfile>    # explain(formatted)
    python tools/optmeasure.py count <name> [passes]    # bench-identical count() timing

Names: any catalog query, or the bench extra runners
(similarity_pq_search / similarity_ivf_pq_search /
similarity_ivf_pq_refine_search) via their underlying DataFrames.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _extra_frames(spark):
    """The bench's non-catalog timing rows, as DataFrame factories with
    the same out-of-timed-region fit/encode treatment as bench.py."""
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators import similarity
    from sids_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR)
    books = similarity.pq_fit(emb, m=4, kc=8, iters=2)
    cents, ivf_books = similarity.ivf_pq_fit(emb, kcoarse=8, m=4, kc=8, iters=2)
    enc = similarity.ivf_pq_encode(emb, cents, ivf_books).cache()
    enc.count()
    q = emb.filter(F.col("vec_id") < 5)
    return {
        "similarity_pq_search": lambda: similarity.topk_pq(emb, q, books, k=10),
        "similarity_ivf_pq_search": lambda: similarity.topk_ivf_pq(
            enc, q, cents, ivf_books, k=10, nprobe=2, candidates_encoded=True
        ),
        "similarity_ivf_pq_refine_search": lambda: similarity.topk_ivf_pq_refine(
            emb, q, cents, ivf_books, k=10, kprime=40, nprobe=2, encoded=enc
        ),
    }


def main() -> None:
    mode, name = sys.argv[1], sys.argv[2]
    from sids_data_pipeline_spark.lifecycle import release_tracked
    from sids_data_pipeline_spark.plans.catalog import all_queries
    from sids_data_pipeline_spark.session import get_spark

    spark = get_spark("optmeasure")
    catalog = all_queries()
    extras = _extra_frames(spark) if name.startswith("similarity_") and (
        name.endswith("_search")
    ) else {}

    def build():
        release_tracked()
        if name in extras:
            return extras[name]()
        return catalog[name].spark(spark, SF_DIR)

    if mode == "plan":
        out = sys.argv[3]
        df = build()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
        return

    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark.sparkContext.setJobDescription(f"optmeasure:{name}")
    times = []
    for i in range(passes + 1):  # pass 0 = warm-up (codegen/JIT), reported apart
        t0 = time.time()
        df = build()
        if mode == "time":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        dt = time.time() - t0
        times.append(dt)
    print(
        f"{name} [{mode}] cold={times[0]:.3f} "
        f"passes={' '.join(f'{t:.3f}' for t in times[1:])} "
        f"best={min(times[1:]):.3f} median={sorted(times[1:])[len(times[1:]) // 2]:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
