"""Dataset split + shard packing (operators/sampling.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators import sampling


def test_hash_split_stable_under_growth(spark):
    """A document's split is a pure function of its key: assignments on a
    subset equal assignments on the full corpus (no leakage when data is
    added) and fractions are near the weights."""
    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    full = sampling.hash_split(docs, {"train": 0.8, "eval": 0.1, "test": 0.1})
    sub = sampling.hash_split(
        docs.filter(F.col("doc_id") < 500), {"train": 0.8, "eval": 0.1, "test": 0.1}
    )
    f = {r.doc_id: r.split for r in full.collect()}
    for r in sub.collect():
        assert f[r.doc_id] == r.split
    counts = pd.Series(list(f.values())).value_counts(normalize=True)
    assert abs(counts["train"] - 0.8) < 0.05
    assert abs(counts["eval"] - 0.1) < 0.03
    assert abs(counts["test"] - 0.1) < 0.03


def test_hash_split_partitioning_invariant(spark):
    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = sampling.hash_split(docs.repartition(1), {"a": 0.5, "b": 0.5})
    b = sampling.hash_split(docs.repartition(13), {"a": 0.5, "b": 0.5})
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_shards_budget_and_determinism(spark):
    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 400 + 1).cast("int").alias("n_tokens"),
    )
    out = sampling.pack_shards(docs, max_tokens=1000).toPandas().sort_values("doc_id")
    # shards are contiguous in doc order and non-decreasing
    assert (out["shard_id"].diff().dropna() >= 0).all()
    # each shard holds >= 1 doc; total tokens per shard exceed the budget
    # by at most one document (docs are never split)
    g = out.groupby("shard_id")["n_tokens"].sum()
    assert (g.iloc[:-1] + 1 > 1000 - 400).all()  # near-full packing
    for sid, grp in out.groupby("shard_id"):
        excess = grp["n_tokens"].sum() - 1000
        assert excess <= grp["n_tokens"].max()
    # identical on re-run and under repartitioning
    again = (
        sampling.pack_shards(docs.repartition(7), max_tokens=1000)
        .toPandas()
        .sort_values("doc_id")
    )
    assert out["shard_id"].tolist() == again["shard_id"].tolist()


def test_stratified_sample_exact_k(spark):
    df = spark.createDataFrame(
        [(i, "ab"[i % 2] if i < 90 else "c") for i in range(93)],
        "doc_id long, lang string",
    )
    out = sampling.stratified_sample(df, ["lang"], k=10)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # a and b have 45 docs each -> exactly 10; c has 3 -> all 3
    assert counts == {"a": 10, "b": 10, "c": 3}


def test_stratified_sample_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, "xy"[i % 2]) for i in range(200)], "doc_id long, lang string"
    )
    a = sorted(r.doc_id for r in sampling.stratified_sample(df, ["lang"], 5).collect())
    b = sorted(
        r.doc_id
        for r in sampling.stratified_sample(df.repartition(13), ["lang"], 5).collect()
    )
    assert a == b and len(a) == 10


def test_hash_threshold_sample_stable_subset(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    small = {r.doc_id for r in sampling.hash_threshold_sample(df, 0.1).collect()}
    big = {r.doc_id for r in sampling.hash_threshold_sample(df, 0.3).collect()}
    # monotone in fraction (nested samples) and roughly sized
    assert small <= big
    assert 50 <= len(small) <= 150 and 230 <= len(big) <= 370
    # membership is row-local: unchanged when the corpus grows
    grown = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    grown_small = {
        r.doc_id for r in sampling.hash_threshold_sample(grown, 0.1).collect()
    }
    assert {d for d in grown_small if d < 1000} == small


def test_stratified_prethin_identical_output(spark):
    """Property: the auto pre-thin produces EXACTLY the same sample as
    the unthinned ranking (threshold forced low so the 300-row stratum
    triggers thinning; a small stratum rides along untouched)."""
    df = spark.createDataFrame(
        [(i, "big" if i < 300 else "small") for i in range(310)],
        "doc_id long, lang string",
    )
    plain = sorted(
        r.doc_id
        for r in sampling.stratified_sample(
            df, ["lang"], k=7, prethin_threshold=None
        ).collect()
    )
    thinned = sorted(
        r.doc_id
        for r in sampling.stratified_sample(
            df, ["lang"], k=7, prethin_threshold=100
        ).collect()
    )
    assert plain == thinned


def test_stratified_prethin_shortfall_guard(spark):
    """With a deliberately hostile oversample (<1), the cutoff keeps
    fewer than k rows and the guard must restore the full stratum —
    output still identical to the unthinned ranking."""
    df = spark.createDataFrame(
        [(i, "x") for i in range(250)], "doc_id long, lang string"
    )
    plain = sorted(
        r.doc_id
        for r in sampling.stratified_sample(
            df, ["lang"], k=20, prethin_threshold=None
        ).collect()
    )
    guarded = sorted(
        r.doc_id
        for r in sampling.stratified_sample(
            df, ["lang"], k=20, prethin_threshold=100, oversample=0.05
        ).collect()
    )
    assert plain == guarded


def test_mixture_sample_rates_and_copies(spark):
    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("bulk"), F.lit("rare"), F.lit("mid"), F.lit("drop")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("domain"),
    )
    out = sampling.mixture_sample(
        docs, {"bulk": 0.5, "rare": 3.0, "mid": 1.25}, domain_col="domain"
    )
    rows = out.collect()
    by_dom = pd.Series([r.domain for r in rows]).value_counts()
    assert "drop" not in by_dom  # default_rate=0 drops unlisted domains
    assert by_dom["rare"] == 3000  # exact integer upsampling: 1000 * 3
    assert abs(by_dom["bulk"] - 500) < 100  # hash-gated ~0.5
    assert abs(by_dom["mid"] - 1250) < 100  # 1 full copy + ~0.25
    # copy_id enumerates duplicates 1..n
    rare_copies = pd.Series(
        [r.copy_id for r in rows if r.domain == "rare"]
    ).value_counts()
    assert dict(rare_copies) == {1: 1000, 2: 1000, 3: 1000}


def test_mixture_sample_membership_stable_and_rowlocal(spark):
    """Fractional-copy membership is a pure function of the key: subset
    run == full-corpus run, and the plan has no shuffle."""
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("d").alias("domain")
    )
    full = {
        (r.doc_id, r.copy_id)
        for r in sampling.mixture_sample(docs, {"d": 1.5}, "domain").collect()
    }
    sub = {
        (r.doc_id, r.copy_id)
        for r in sampling.mixture_sample(
            docs.filter(F.col("doc_id") < 200), {"d": 1.5}, "domain"
        ).collect()
    }
    assert sub == {(d, c) for d, c in full if d < 200}
    plan = (
        sampling.mixture_sample(docs, {"d": 1.5}, "domain")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_length_buckets_integer_bit_length(spark):
    from sids_data_pipeline_spark.operators.sampling import length_buckets

    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 7), (5, 8), (6, 255), (7, 256)],
        "doc_id long, n long",
    )
    got = {
        r.bucket: (r.n_docs, r.sum_tokens, r.n_batches_lb)
        for r in length_buckets(df, size_col="n", batch_tokens=4).collect()
    }
    # bit lengths: 1→1, {2,3}→2, {7}→3, {8}→4, {255}→8, {256}→9
    assert got[1] == (1, 1, 1)
    assert got[2] == (2, 5, 2)   # ceil(5/4) = 2
    assert got[3] == (1, 7, 2)
    assert got[4] == (1, 8, 2)
    assert got[8] == (1, 255, 64)
    assert got[9] == (1, 256, 64)


def test_pack_sequences_covers_stream_contiguously(spark):
    from sids_data_pipeline_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 100), (2, 412), (3, 0), (4, 1024), (5, 1)],
        "doc_id long, n_tokens int",
    )
    rows = {r.doc_id: r for r in pack_sequences(df, 512, partitions=2).collect()}
    # exclusive prefix offsets in doc_id order
    assert [rows[i].tok_start for i in (1, 2, 3, 4, 5)] == [0, 100, 512, 512, 1536]
    # doc 2 ends exactly at the seq-0 boundary (100+412=512) → stays in seq 0
    assert (rows[2].first_seq, rows[2].last_seq, rows[2].n_seqs) == (0, 0, 1)
    # empty doc occupies no sequences
    assert (rows[3].last_seq, rows[3].n_seqs) == (None, 0)
    # doc 4 spans seqs 1..2 (tokens 512..1535)
    assert (rows[4].first_seq, rows[4].last_seq, rows[4].n_seqs) == (1, 2, 2)
    assert (rows[5].first_seq, rows[5].last_seq) == (3, 3)
    # spanned sequences tile the stream: sum of per-doc token counts
    # equals the final offset + last size
    assert rows[5].tok_start + 1 == 100 + 412 + 0 + 1024 + 1


def test_pack_sequences_partition_invariant(spark):
    from sids_data_pipeline_spark.operators.sampling import pack_sequences

    df = spark.range(0, 300).selectExpr(
        "id AS doc_id", "CAST(id % 37 AS INT) AS n_tokens"
    )
    a = {(r.doc_id, r.tok_start, r.first_seq, r.last_seq)
         for r in pack_sequences(df, 64, partitions=1).collect()}
    b = {(r.doc_id, r.tok_start, r.first_seq, r.last_seq)
         for r in pack_sequences(df, 64, partitions=7).collect()}
    assert a == b


def test_training_order_is_bijective_and_epoch_varying(spark):
    from sids_data_pipeline_spark.operators.sampling import training_order

    df = spark.range(0, 500).selectExpr("id AS doc_id")
    e0 = {r.doc_id: r.epoch_pos for r in training_order(df, epoch=0).collect()}
    # a permutation: every position 0..N-1 exactly once
    assert sorted(e0.values()) == list(range(500))
    # not the identity (the hash actually shuffles)
    assert any(e0[i] != i for i in range(500))
    # another epoch gives a different permutation, same support
    e1 = {r.doc_id: r.epoch_pos for r in training_order(df, epoch=1).collect()}
    assert sorted(e1.values()) == list(range(500))
    assert any(e0[i] != e1[i] for i in range(500))
    # deterministic across re-runs and partitionings
    again = {r.doc_id: r.epoch_pos
             for r in training_order(df.repartition(13), epoch=0).collect()}
    assert again == e0


def test_pack_sequences_property_vs_reference(spark):
    """Randomized sizes against a pure-Python prefix-sum reference
    (hypothesis drives the size lists; one Spark call per example is
    costly, so examples are few but adversarially shrunk)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sids_data_pipeline_spark.operators.sampling import pack_sequences

    @settings(max_examples=12, deadline=None)
    @given(
        sizes=st.lists(st.integers(0, 50), min_size=1, max_size=40),
        seq_len=st.sampled_from([1, 7, 64]),
    )
    def check(sizes, seq_len):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(sizes)], "doc_id long, n_tokens int"
        )
        got = {r.doc_id: r for r in pack_sequences(df, seq_len, partitions=3).collect()}
        start = 0
        for i, s in enumerate(sizes):
            r = got[i]
            assert r.tok_start == start
            assert r.first_seq == start // seq_len
            if s > 0:
                assert r.last_seq == (start + s - 1) // seq_len
                assert r.n_seqs == r.last_seq - r.first_seq + 1
            else:
                assert r.last_seq is None and r.n_seqs == 0
            start += s

    check()


def test_mixture_sample_null_key_keeps_whole_copies(spark):
    """A NULL key row in a rate>=1 domain must keep its whole copies
    (the SQL twin's CASE ... ELSE 0), not vanish via NULL arithmetic."""
    from sids_data_pipeline_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(1, "web"), (None, "web"), (2, "books")],
        "doc_id long, source string",
    )
    out = mixture_sample(df, {"web": 2.0, "books": 0.0}, "source")
    got = sorted(
        [(r.doc_id, r.copy_id) for r in out.collect()],
        key=lambda t: (t[0] is not None, t[0] or 0, t[1]),
    )
    assert got == [(None, 1), (None, 2), (1, 1), (1, 2)]


def test_stratified_prethin_handles_null_stratum(spark, monkeypatch):
    """A NULL-valued stratum must thin like any other (null-safe digest
    keys) and produce the identical sample with and without thinning."""
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators import sampling

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("en")).alias("lang"),  # half NULL
    )
    plain = sampling.stratified_sample(
        df, ["lang"], k=5, prethin_threshold=None
    )
    thinned = sampling.stratified_sample(
        df, ["lang"], k=5, prethin_threshold=100
    )
    a = sorted((r.doc_id, r.lang) for r in plain.collect())
    b = sorted((r.doc_id, r.lang) for r in thinned.collect())
    assert a == b and len(a) == 10


def test_hash_split_validation_and_single_label(spark):
    import pytest as _pytest

    from sids_data_pipeline_spark.operators.sampling import (
        hash_split,
        o_hash_split,
    )

    df = spark.createDataFrame([(1,), (2,)], "doc_id long")
    with _pytest.raises(ValueError, match="non-empty"):
        hash_split(df, {})
    with _pytest.raises(ValueError, match="sum"):
        hash_split(df, {"a": 0.8, "b": 0.3})
    # single label: valid on both sides (the oracle used to emit a
    # WHEN-less CASE, a parser error)
    out = hash_split(df, {"train": 1.0})
    assert {r.split for r in out.collect()} == {"train"}
    import duckdb

    assert duckdb.sql(
        f"SELECT {o_hash_split('42', {'train': 1.0})} AS s"
    ).fetchone()[0] == "train"


def test_pack_shards_long_ids_and_integer_division(spark):
    """shard_id is LONG (an int32 id overflows at max_tokens * 2^31
    total tokens) and the division is integral."""
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators.sampling import pack_shards

    df = spark.range(0, 4).select(
        F.col("id").alias("doc_id"),
        F.lit(2**40).cast("long").alias("n_tokens"),  # huge docs
    )
    out = pack_shards(df, max_tokens=100)
    rows = {r.doc_id: r.shard_id for r in out.collect()}
    assert dict(out.dtypes)["shard_id"] == "bigint"
    assert rows[0] == 0
    assert rows[3] == (3 * 2**40) // 100  # > int32 range, exact


def test_dsir_weights_directional_and_edges(spark):
    """Target-like documents must score ABOVE corpus-typical ones (the
    paper's defining property); single-word docs carry exactly one gram
    (no bigram blow-up from the descending-sequence trap); empty docs
    report n_grams=0 with a NULL weight; scores are partitioning-stable."""
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators.sampling import dsir_weights

    tgt = "high quality prose about science and careful reasoning"
    raw = "buy now cheap deals click here limited offer"
    rows = [(i, tgt + f" variant {i}", True) for i in range(8)]
    rows += [(i + 8, raw + f" spam {i}", False) for i in range(8)]
    rows += [(16, tgt, False),   # target-LIKE text outside the slice
             (17, "word", False), (18, "", False)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")

    out = dsir_weights(docs, F.col("tgt"))
    got = {r.doc_id: r for r in out.collect()}
    assert got[17].n_grams == 1
    assert got[18].n_grams == 0 and got[18].dsir_logw_micros is None
    # the held-out target-like doc outranks every spam doc
    spam_max = max(got[i].dsir_logw_micros for i in range(8, 16))
    assert got[16].dsir_logw_micros > spam_max

    stable = {
        r.doc_id: r.dsir_logw_micros
        for r in dsir_weights(docs.repartition(7), F.col("tgt")).collect()
    }
    assert stable == {k: v.dsir_logw_micros for k, v in got.items()}


def test_temperature_rates_endpoints(spark):
    """T=1 → every rate exactly 1 (natural distribution, same size);
    high T → per-domain EXPECTED counts equalize; target_total scales."""
    import pytest
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.operators.sampling import (
        mixture_sample,
        temperature_rates,
    )

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 800, "web").otherwise("books").alias("source"),
    )
    r1 = temperature_rates(df, "source", temperature=1.0)
    assert r1 == {"web": 1.0, "books": 1.0}

    r_hi = temperature_rates(df, "source", temperature=1e9)
    # uniform p=1/2 each → expected 500 per domain
    assert r_hi["web"] * 800 == pytest.approx(500, rel=1e-6)
    assert r_hi["books"] * 200 == pytest.approx(500, rel=1e-6)

    r_half = temperature_rates(df, "source", temperature=1.0, target_total=500)
    assert r_half == {"web": 0.5, "books": 0.5}

    # composes with the gated resampler: realized size near expectation
    out = mixture_sample(df, r_hi, "source")
    n = out.count()
    assert abs(n - 1000) < 120  # hash-gate variance at n=1000

    with pytest.raises(ValueError, match="temperature"):
        temperature_rates(df, "source", temperature=0.0)
