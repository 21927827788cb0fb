"""Edge fixtures the sf parquet tables don't contain, run through the
SAME engine-vs-DuckDB comparison as the driver's gate: a zero-norm
embedding (cosine undefined — both sides must drop it identically) and
an 810,001-word document (10,125 chunks — past the old hard
range(10000) oracle bound, which is now derived from the fixture's own
MAX(n_chunks); the same doc also guards the engine against the
re-split-per-window regression chunk_documents once had)."""

from __future__ import annotations

import hashlib
import math

import pytest


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _hash_frame(pdf):
    cols = sorted(pdf.columns)
    rows = [
        "\x1f".join(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return len(rows), cols, hashlib.sha256("\n".join(rows).encode()).hexdigest()


def _compare(spark, sf_dir, name):
    import duckdb

    from sids_data_pipeline_spark.plans.catalog import all_queries

    q = all_queries()[name]
    sdf = q.spark(spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        # Spark writes <table>.parquet as a directory of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    odf = con.execute(q.oracle).fetchdf()
    assert _hash_frame(sdf) == _hash_frame(odf)
    return len(sdf)


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    """sf0.001 documents/embeddings plus the two edge rows."""
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path_factory.mktemp("edges"))
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    zero = spark.createDataFrame(
        [(99_999, [0.0] * dim, 0)], schema=emb.schema
    )
    emb.unionByName(zero).coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    big_text = " ".join(f"w{i}" for i in range(810_001))
    big = spark.createDataFrame(
        [(99_999, big_text, "en", "edge", len(big_text))], schema=docs.schema
    )
    docs.unionByName(big).coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_quantized_topk_drops_zero_vector_like_oracle(spark, edge_dir):
    n = _compare(spark, edge_dir, "similarity_topk_quantized")
    assert n > 0


def test_chunk_oracle_bound_derives_from_fixture(spark, edge_dir):
    """810,001 words → 10,125 chunks for the edge doc; both sides must
    agree past the old 10,000 cap."""
    n = _compare(spark, edge_dir, "corpus_chunk")
    assert n > 10_125  # edge doc's chunks plus the sf0.001 corpus
