"""Python UDTF (LATERAL sentence split) and grouped-agg pandas UDAF:
null handling, index stability, partitioning determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from sids_data_pipeline_spark.functions import udxf


def test_sentence_split_lateral(spark):
    udxf.register_udtfs(spark)
    df = spark.createDataFrame(
        [
            (1, "Hello there. How are you? Fine!"),
            (2, None),
            (3, "One sentence"),
            (4, "Trailing dots.. and!  more"),
            (5, ". Leading separator"),
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("udxf_docs")
    rows = spark.sql(
        "SELECT t.* FROM udxf_docs d, LATERAL sentences(d.doc_id, d.text) t"
    ).collect()
    got = {(r.doc_id, r.sentence_idx): r.sentence for r in rows}
    # doc 2 (NULL) emits nothing; blank segments are filtered but keep
    # their enumeration slot (doc 4: '..' splits to '', idx 1 skipped)
    assert got[(1, 0)] == "Hello there"
    assert got[(1, 2)] == "Fine!"
    assert not any(d == 2 for d, _ in got)
    assert got[(3, 0)] == "One sentence"
    # '..' keeps the first dot in the segment; '!  ' consumes both spaces
    assert got[(4, 0)] == "Trailing dots."
    assert got[(4, 1)] == "and" and got[(4, 2)] == "more"
    # a leading separator yields a blank segment: filtered, but its
    # enumeration slot is kept (idx 0 skipped, text lands at idx 1)
    assert (5, 0) not in got and got[(5, 1)] == "Leading separator"


def test_geo_mean_partitioning_deterministic(spark):
    import math

    vals = [(i % 3, float(10 + i * 7 % 90)) for i in range(300)]
    df = spark.createDataFrame(vals, "k long, v double")
    a = {
        r.k: r.gm
        for r in df.groupBy("k").agg(udxf.geo_mean("v").alias("gm")).collect()
    }
    b = {
        r.k: r.gm
        for r in df.repartition(17)
        .groupBy("k")
        .agg(udxf.geo_mean("v").alias("gm"))
        .collect()
    }
    # bit-identical across partitionings (sorted reduction)
    assert a == b
    want = {}
    for k, v in vals:
        want.setdefault(k, []).append(v)
    for k, vs in want.items():
        ref = math.exp(sum(sorted(math.log(x) for x in vs)) / len(vs))
        assert abs(a[k] - ref) < 1e-9
