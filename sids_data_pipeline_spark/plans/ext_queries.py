"""EXT operator catalog (SURVEY.md §2b, E1-E6): dedup, similarity search,
text analysis, event-time windows, multimodal columns.

Everything deterministic carries a full-value DuckDB oracle; the two
sketch-based operators (pyspark.ml LSH ANN, approx sketches) register
rows-only. The md5-based hash family (functions/hashing.py) is what makes
the MinHash/SimHash pipelines value-reproducible in SQL — the oracle
verifies the *entire* LSH pipeline (signatures → bands → candidates →
verification), not just a final count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sids_data_pipeline_spark.functions.hashing import (
    o_minhash,
    o_token_hash32,
)
from sids_data_pipeline_spark import lifecycle
from sids_data_pipeline_spark.operators import dedup, merge, multimodal, similarity, text, windows
from sids_data_pipeline_spark.plans.base import Query, cents, o_cents, tables

# --- shared SQL fragments -----------------------------------------------------

_TOK_SQL = """
tok AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents,
       unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                          x -> x <> '')) AS t(token)
)
"""

_SHINGLE_SQL = """
w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS ws
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t.s AS token
  FROM w,
       unnest(list_transform(range(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS t(s)
  WHERE len(ws) >= 3
)
"""


def _jaccard_tail_sql(tok_cte: str, threshold: float) -> str:
    """Candidate pairs in ``cand`` + token sets in ``{tok_cte}`` → scored
    pairs with jaccard ≥ threshold. Mirrors dedup.jaccard_on_pairs."""
    return f"""
sz AS (SELECT doc_id, COUNT(*) AS sz FROM {tok_cte} GROUP BY doc_id),
inter AS (
  SELECT c.id1, c.id2, COUNT(*) AS inter
  FROM cand c
  JOIN {tok_cte} t1 ON t1.doc_id = c.id1
  JOIN {tok_cte} t2 ON t2.doc_id = c.id2 AND t2.token = t1.token
  GROUP BY c.id1, c.id2
)
SELECT i.id1, i.id2,
       ROUND(CAST(i.inter AS DOUBLE) / (s1.sz + s2.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sz s1 ON s1.doc_id = i.id1
JOIN sz s2 ON s2.doc_id = i.id2
WHERE CAST(i.inter AS DOUBLE) / (s1.sz + s2.sz - i.inter) >= {threshold}
"""


def _verdict_sym_diff(a: DataFrame, b: DataFrame, cols, found_alias="found_hits"):
    """Gate verdict ``(violations, found)`` in ONE pass (r15, guide
    §2.4): |A△B| via a tagged union + per-row count compare, replacing
    the symmetric anti-join pair ``A\\B ∪ B\\A`` whose plan referenced
    each leg's ENTIRE pipeline twice (plus once more for the found
    probe) — un-persisted, every reference re-ran the encode/search
    subtree, and persisting the tiny legs measured net-negative at this
    scale (cache materialization barriers cost more than the replays
    they save). Requires both legs duplicate-free on ``cols`` — true
    for every top-k output (rank is unique per query) — under which the
    unbalanced-group count equals the old anti-join row count exactly.
    ``found`` = A is non-empty, as before. Empty inputs agree too
    (0 violations, found false)."""
    ta = a.select(*cols).withColumn("_a", F.lit(1)).withColumn("_b", F.lit(0))
    tb = b.select(*cols).withColumn("_a", F.lit(0)).withColumn("_b", F.lit(1))
    g = (
        ta.unionAll(tb)
        .groupBy(*cols)
        .agg(F.sum("_a").alias("_na"), F.sum("_b").alias("_nb"))
    )
    return g.agg(
        F.coalesce(
            F.sum(F.when(F.col("_na") != F.col("_nb"), 1)), F.lit(0)
        ).cast("long").alias("violations"),
        F.coalesce(F.sum("_na") >= 1, F.lit(False)).alias(found_alias),
    )


def _verdict_missing(a: DataFrame, b: DataFrame, cols, found_alias="found_hits"):
    """Asymmetric gate verdict: rows of A absent from B (the old
    ``A left_anti B`` count) plus the A-non-empty probe, in ONE pass
    over a tagged union — A's pipeline evaluates once instead of twice
    (anti-join + found probe). Multiplicity-exact: an A row with no B
    match counts ``_na`` times, like the anti-join kept every copy."""
    ta = a.select(*cols).withColumn("_a", F.lit(1)).withColumn("_b", F.lit(0))
    tb = b.select(*cols).withColumn("_a", F.lit(0)).withColumn("_b", F.lit(1))
    g = (
        ta.unionAll(tb)
        .groupBy(*cols)
        .agg(F.sum("_a").alias("_na"), F.sum("_b").alias("_nb"))
    )
    return g.agg(
        F.coalesce(
            F.sum(F.when(F.col("_nb") == 0, F.col("_na"))), F.lit(0)
        ).cast("long").alias("violations"),
        F.coalesce(F.sum("_na") >= 1, F.lit(False)).alias(found_alias),
    )


# --- E1: exact dedup ------------------------------------------------------------


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, ["text"], "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


_DEDUP_EXACT_SQL = """
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
JOIN (SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text) k
  ON d.doc_id = k.doc_id
"""


def _streaming_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming surface, gate-visible: availableNow exact dedup over a
    file-source documents stream (foreachBatch + persistent digest
    ledger, streaming/jobs.py). The sf tables are single parquet files →
    one micro-batch, so the drained result equals batch exact_dedup and
    the dedup_exact oracle applies in full."""
    import os
    import tempfile

    from sids_data_pipeline_spark.schemas import TABLE_SCHEMAS
    from sids_data_pipeline_spark.streaming.jobs import streaming_exact_dedup

    work = tempfile.mkdtemp(prefix="sdp_stream_dedup_")
    # Stage into a directory: the file-stream source requires a directory
    # (it pins basePath for partition discovery). One file ⇒ one
    # micro-batch ⇒ keep-first is globally min doc_id, same as batch.
    src = os.path.join(work, "src")
    (docs,) = tables(spark, sf_dir, "documents")
    docs.repartition(1).write.parquet(src)
    stream = spark.readStream.schema(TABLE_SCHEMAS["documents"]).parquet(src)
    streaming_exact_dedup(
        spark,
        stream,
        os.path.join(work, "out"),
        os.path.join(work, "ckpt"),
        key_cols=("text",),
        id_col="doc_id",
    )
    rows = spark.read.parquet(os.path.join(work, "out", "rows"))
    return rows.select("doc_id", "lang", "source", "n_chars")


def _streaming_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dup with a full hash oracle: the documents table
    splits into two parquet files and drains through
    streaming_near_dedup with maxFilesPerTrigger=1 — multiple REAL
    micro-batches, each probing the accumulated band/doc ledgers. Every
    near-dup pair is emitted exactly once (in the batch its later member
    arrives), so the drained union equals the batch LSH operator
    REGARDLESS of batch order, and dedup_minhash_lsh's own oracle
    applies in full."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.schemas import TABLE_SCHEMAS
    from sids_data_pipeline_spark.streaming.jobs import streaming_near_dedup

    work = tempfile.mkdtemp(prefix="sdp_stream_lsh_")
    src = os.path.join(work, "src")
    (docs,) = tables(spark, sf_dir, "documents")
    # two files → two micro-batches under maxFilesPerTrigger=1
    docs.filter(F.col("doc_id") < 250).repartition(1).write.mode(
        "append"
    ).parquet(src)
    docs.filter(F.col("doc_id") >= 250).repartition(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    streaming_near_dedup(
        stream,
        os.path.join(work, "out"),
        os.path.join(work, "ckpt"),
        threshold=_MINHASH_THRESHOLD,
    )
    pairs = spark.read.parquet(os.path.join(work, "out", "pairs"))
    return pairs.select("id1", "id2", "jaccard").orderBy("id1", "id2")


def _stage_events_stream(spark: SparkSession, sf_dir: str, work: str):
    """Stage events as a single-file stream directory and return the
    file-source stream (single file ⇒ one availableNow micro-batch)."""
    import os

    from sids_data_pipeline_spark.schemas import TABLE_SCHEMAS

    src = os.path.join(work, "src")
    (events,) = tables(spark, sf_dir, "events")
    events.repartition(1).write.parquet(src)
    return spark.readStream.schema(TABLE_SCHEMAS["events"]).parquet(src)


def _streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join, gate-visible: click→purchase
    attribution over the events stream (streaming/jobs.py). Inner joins
    emit exactly on match, so one availableNow drain equals the static
    equi+range join — the oracle is that batch join in SQL."""
    import os
    import tempfile

    from sids_data_pipeline_spark.streaming.jobs import (
        data_batches_only,
        stream_stream_attribution,
    )

    work = tempfile.mkdtemp(prefix="sdp_stream_attr_")
    stream = _stage_events_stream(spark, sf_dir, work)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    sink = os.path.join(work, "out")
    # inner-join matches emit on arrival (watermark is state-cleanup
    # only), so the drain's trailing no-data micro-batch — a full
    # O(state) pass over every join state store — produces nothing;
    # skip it (streaming/jobs.data_batches_only)
    with data_batches_only(spark):
        q = (
            stream_stream_attribution(clicks, purchases)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(sink).select(
        "user_id", "click_id", "purchase_id",
        "click_ts_us", "purchase_ts_us", "value_cents",
    )


_STREAMING_ATTR_SQL = """
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(p.ts) AS purchase_ts_us,
       CAST(round(p.value * 100, 0) AS BIGINT) AS value_cents
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


def _streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState), gate-visible:
    per-user running totals drained via availableNow. Update mode emits
    the running value per (user, batch); the max over batches is the
    final total, which equals the batch aggregate — the SQL oracle."""
    import os
    import tempfile
    import uuid

    from sids_data_pipeline_spark.streaming.jobs import (
        run_available_now,
        stateful_running_totals,
    )

    work = tempfile.mkdtemp(prefix="sdp_stream_tot_")
    stream = _stage_events_stream(spark, sf_dir, work)
    name = f"sdp_totals_{uuid.uuid4().hex[:8]}"
    run_available_now(
        stateful_running_totals(stream), name, os.path.join(work, "ckpt"),
        output_mode="update",
    )
    return spark.table(name).groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("sum_value_cents").alias("sum_value_cents"),
    )


def _streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment, gate-visible: the event stream joins
    the static customer dimension per micro-batch (the dimension is
    broadcast — no stream state at all, unlike stream-stream joins) and
    aggregates enriched revenue per market segment. One availableNow
    drain in complete mode equals the batch join — the SQL oracle."""
    import os
    import tempfile
    import uuid

    from sids_data_pipeline_spark.streaming.jobs import run_available_now

    work = tempfile.mkdtemp(prefix="sdp_stream_enrich_")
    stream = _stage_events_stream(spark, sf_dir, work)
    (customer,) = tables(spark, sf_dir, "customer")
    enriched = (
        stream.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(customer), stream["user_id"] == customer["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "sum_value_cents"
            ),
        )
    )
    name = f"sdp_enrich_{uuid.uuid4().hex[:8]}"
    run_available_now(enriched, name, os.path.join(work, "ckpt"))
    return spark.table(name)


_STREAM_ENRICH_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events JOIN customer ON user_id = c_custkey
WHERE event_type = 'purchase'
GROUP BY c_mktsegment
"""


def _streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows in Structured Streaming, gate-visible:
    one availableNow drain in complete mode yields exactly the batch
    operator's sessions (same F.session_window semantics), so the SAME
    gap-session oracle applies. In production this runs append-mode with
    the 1 h watermark bounding state; complete mode here avoids the
    sentinel-event dance the append-mode pytest exercises."""
    import os
    import tempfile
    import uuid

    from sids_data_pipeline_spark.streaming.jobs import (
        run_available_now,
        session_windows_stream,
    )

    work = tempfile.mkdtemp(prefix="sdp_stream_sess_")
    stream = _stage_events_stream(spark, sf_dir, work)
    name = f"sdp_sess_{uuid.uuid4().hex[:8]}"
    run_available_now(
        session_windows_stream(stream, "30 minutes", "1 hour"),
        name,
        os.path.join(work, "ckpt"),
    )
    return spark.table(name)


def _streaming_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second custom stateful operator, gate-visible: per-event trailing
    window features in streaming (applyInPandasWithState; state = events
    inside the lookback horizon only). Single staged file ⇒ one batch ⇒
    row-for-row equal to batch rolling_stats, so the SAME range-frame
    oracle applies."""
    import os
    import tempfile
    import uuid

    from sids_data_pipeline_spark.streaming.jobs import (
        run_available_now,
        stateful_rolling_stats,
    )

    work = tempfile.mkdtemp(prefix="sdp_stream_roll_")
    stream = _stage_events_stream(spark, sf_dir, work)
    name = f"sdp_roll_{uuid.uuid4().hex[:8]}"
    run_available_now(
        stateful_rolling_stats(stream, lookback_seconds=3600), name,
        os.path.join(work, "ckpt"), output_mode="append",
    )
    return spark.table(name)


def _streaming_dedup_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup (dropDuplicatesWithinWatermark):
    distinct (user_id, event_type) pairs survive one availableNow drain.
    Projecting only the key columns keeps the result deterministic
    (which duplicate's payload survives is arrival-order-dependent)."""
    import os
    import tempfile
    import uuid

    from sids_data_pipeline_spark.streaming.jobs import (
        data_batches_only,
        run_available_now,
        watermarked_dedup_stream,
    )

    work = tempfile.mkdtemp(prefix="sdp_stream_wm_")
    stream = _stage_events_stream(spark, sf_dir, work)
    name = f"sdp_wm_{uuid.uuid4().hex[:8]}"
    out = watermarked_dedup_stream(
        stream.select("ts", "user_id", "event_type"),
        ("user_id", "event_type"),
        watermark="1 hour",
    ).select("user_id", "event_type")
    # dropDuplicatesWithinWatermark emits survivors in their arrival
    # batch; the trailing no-data micro-batch only expires state the
    # drain-and-stop discards — skip it (data_batches_only)
    with data_batches_only(spark):
        run_available_now(
            out, name, os.path.join(work, "ckpt"), output_mode="append"
        )
    return spark.table(name)


_STREAMING_WM_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""


_STREAMING_TOTALS_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events
GROUP BY user_id
"""


def _dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    uniq = dedup.exact_dedup(docs, ["text"], "doc_id")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
    ).crossJoin(uniq.agg(F.count("*").alias("n_kept")))


_DEDUP_EXACT_STATS_SQL = """
SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique_texts,
       -- exact_dedup keeps ONE survivor for the NULL-text key too
       COUNT(DISTINCT text)
         + MAX(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS n_kept
FROM documents
"""


# --- E2: near-duplicate detection -----------------------------------------------

_MINHASH_THRESHOLD = 0.2
_NGRAM_THRESHOLD = 0.25
_NGRAM_MAX_DF = 20


def _dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return dedup.near_duplicates_minhash(docs, threshold=_MINHASH_THRESHOLD)


def _lsh_candidate_ctes() -> str:
    """The ONE SQL mirror of near_duplicates_minhash's banding scheme
    (h → sig → bands0 → bok/max_bucket → bands → cand), assuming a prior
    ``sh(doc_id, token)`` CTE. Shared by the standalone dedup oracle AND
    the curation-chain oracle so a banding change can never desynchronize
    one of them."""
    num_hashes, bands = dedup.DEFAULT_NUM_HASHES, dedup.DEFAULT_BANDS
    rows = num_hashes // bands
    th = o_token_hash32("token")
    mins = ",\n    ".join(
        f"MIN({o_minhash('th', i)}) AS mh{i}" for i in range(num_hashes)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_idx, concat_ws(',', "
        + ", ".join(f"mh{b * rows + r}" for r in range(rows))
        + ") AS band_val FROM sig"
        for b in range(bands)
    )
    return f"""h AS (SELECT doc_id, {th} AS th FROM sh),
sig AS (
  SELECT doc_id,
    {mins}
  FROM h GROUP BY doc_id
),
bands0 AS (
{band_selects}
),
-- mirror of max_bucket: drop degenerate band buckets before the self-join
bok AS (
  SELECT band_idx, band_val FROM bands0
  GROUP BY band_idx, band_val HAVING COUNT(*) <= {dedup.DEFAULT_MAX_BUCKET}
),
bands AS (
  SELECT b.* FROM bands0 b JOIN bok USING (band_idx, band_val)
),
cand AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
  FROM bands l
  JOIN bands r ON l.band_idx = r.band_idx AND l.band_val = r.band_val
              AND l.doc_id < r.doc_id
)"""


def _minhash_sql() -> str:
    return f"""
WITH {_SHINGLE_SQL},
{_lsh_candidate_ctes()},
{_jaccard_tail_sql('sh', _MINHASH_THRESHOLD)}
"""


_INCR_SPLIT = 400  # docs >= this id form the "new ingest batch"


def _dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 incremental: the corpus keeps a STORED band table; the new
    ingest batch is shingled and signed alone, probes the stored bands
    with one equi-join, and re-shingles only the corpus docs that appear
    in a candidate. Batch-equivalent by construction — the oracle is the
    FULL-corpus LSH pipeline filtered to pairs touching a new doc."""
    (docs,) = tables(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < _INCR_SPLIT)
    new = docs.filter(F.col("doc_id") >= _INCR_SPLIT)
    stored = dedup.minhash_band_table(old)
    return dedup.near_duplicates_incremental(
        new, old, stored, threshold=_MINHASH_THRESHOLD
    ).orderBy("id1", "id2")


def _dedup_incremental_sql() -> str:
    return f"""
SELECT * FROM (
{_minhash_sql()}
) t
WHERE id1 >= {_INCR_SPLIT} OR id2 >= {_INCR_SPLIT}
ORDER BY id1, id2
"""


def _dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return dedup.near_duplicates_ngram(
        docs, n=3, threshold=_NGRAM_THRESHOLD, max_df=_NGRAM_MAX_DF
    )


_NGRAM_SQL = f"""
WITH {_SHINGLE_SQL},
df AS (SELECT token, COUNT(*) AS df FROM sh GROUP BY token),
rare AS (
  SELECT s.doc_id, s.token FROM sh s
  JOIN df ON df.token = s.token AND df.df <= {_NGRAM_MAX_DF}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
  FROM rare l JOIN rare r ON l.token = r.token AND l.doc_id < r.doc_id
),
{_jaccard_tail_sql('sh', _NGRAM_THRESHOLD)}
"""


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return dedup.near_duplicates_simhash(docs, max_hamming=3)


def _simhash_sql() -> str:
    th = o_token_hash32("token")
    bit_sums = ",\n    ".join(
        f"SUM(CASE WHEN (th >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(32)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(32)
    )
    chunk_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {c} AS chunk_idx,"
        f" (simhash >> {8 * c}) & 255 AS chunk_val FROM sim"
        for c in range(4)
    )
    return f"""
WITH {_TOK_SQL},
h AS (SELECT doc_id, {th} AS th FROM tok),
bitsums AS (
  SELECT doc_id,
    {bit_sums}
  FROM h GROUP BY doc_id
),
sim AS (SELECT doc_id, CAST({sim_expr} AS BIGINT) AS simhash FROM bitsums),
chunks AS (
{chunk_selects}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
         l.simhash AS sh1, r.simhash AS sh2
  FROM chunks l
  JOIN chunks r ON l.chunk_idx = r.chunk_idx AND l.chunk_val = r.chunk_val
               AND l.doc_id < r.doc_id
)
SELECT id1, id2, CAST(bit_count(xor(sh1, sh2)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sh1, sh2)) <= 3
"""


_COSINE_PAIR_THRESHOLD = 0.35


def _dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs(
        emb, threshold=_COSINE_PAIR_THRESHOLD, block_col="label"
    )


_EMBED_VEC_SQL = """
n AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
),
m AS (
  SELECT vec_id, label, v,
         CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS norm2
  FROM n
)
"""

_DEDUP_EMBED_SQL = f"""
WITH {_EMBED_VEC_SQL},
p AS (
  -- norm2 > 0 mirrors the engine's zero-norm drop: an all-zero vector's
  -- cosine is 0/0 = NaN, which BOTH engines compare larger than the
  -- threshold — without the guard it would pair with its whole block
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
         a.norm2 AS n1, b.norm2 AS n2
  FROM m a JOIN m b ON a.label = b.label AND a.vec_id < b.vec_id
               AND a.norm2 > 0 AND b.norm2 > 0
)
SELECT id1, id2,
       ROUND(CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))), 6) AS cosine
FROM p
WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) >= {_COSINE_PAIR_THRESHOLD}
"""


# --- corpus curation (E1+E2+E5 composite) ----------------------------------------


def _corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.jobs.curation import curate_corpus

    (docs,) = tables(spark, sf_dir, "documents")
    return curate_corpus(docs).select("doc_id", "lang", "source", "n_chars")


def _curation_sql() -> str:
    """Mirror of the whole curation chain: quality filter → keep-first
    exact dedup → MinHash-LSH near-dup pairs over the survivors → drop
    higher-id pair members."""
    shingles_over_survivors = _SHINGLE_SQL.replace("FROM documents", "FROM survivors")
    return f"""
WITH survivors AS (
  SELECT d.* FROM documents d
  JOIN (
    SELECT text, MIN(doc_id) AS doc_id FROM documents
    WHERE length(text) >= 20 GROUP BY text
  ) k ON d.doc_id = k.doc_id
),
{shingles_over_survivors},
{_lsh_candidate_ctes()},
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id1, c.id2, COUNT(*) AS inter
  FROM cand c
  JOIN sh t1 ON t1.doc_id = c.id1
  JOIN sh t2 ON t2.doc_id = c.id2 AND t2.token = t1.token
  GROUP BY c.id1, c.id2
),
nd_drop AS (
  SELECT DISTINCT i.id2 AS doc_id
  FROM inter i
  JOIN sz s1 ON s1.doc_id = i.id1
  JOIN sz s2 ON s2.doc_id = i.id2
  WHERE CAST(i.inter AS DOUBLE) / (s1.sz + s2.sz - i.inter) >= {_MINHASH_THRESHOLD}
)
SELECT s.doc_id, s.lang, s.source, s.n_chars
FROM survivors s LEFT JOIN nd_drop d ON s.doc_id = d.doc_id
WHERE d.doc_id IS NULL
"""


# --- E3: similarity search -------------------------------------------------------


def _similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.topk_bruteforce(emb, queries, k=10)


_SIMILARITY_TOPK_SQL = f"""
WITH {_EMBED_VEC_SQL},
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) AS BIGINT) AS dot,
         q.norm2 AS qn, c.norm2 AS cn
  FROM m q JOIN m c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, neighbor_id,
         CASE WHEN qn > 0 AND cn > 0 THEN CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) ELSE 'NaN'::DOUBLE END AS cos_raw,
         CAST(ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY CASE WHEN qn > 0 AND cn > 0 THEN CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) ELSE 'NaN'::DOUBLE END DESC,
                       neighbor_id ASC) AS INT) AS rank
  FROM s
)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine, rank
FROM r WHERE rank <= 10
"""


def _ingest_dead_letters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed ingest over deliberately-corrupted string columns: rows with
    un-castable values route to the dead-letter frame with the offending
    field names; the query returns that triage queue."""
    from sids_data_pipeline_spark.operators.quality import split_dead_letters

    (orders,) = tables(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    raw = orders.select(
        k.alias("oid"),
        F.when(k % 7 == 0, F.lit("N/A"))
        .otherwise(cents("o_totalprice").cast("string"))
        .alias("raw_price"),
        F.when(k % 11 == 0, F.lit(None).cast("string"))
        .when(k % 13 == 0, F.concat(F.lit("#"), F.col("o_custkey").cast("string")))
        .otherwise(F.col("o_custkey").cast("string"))
        .alias("raw_cust"),
    )
    _good, dead = split_dead_letters(
        raw,
        {"price_c": ("raw_price", "bigint"), "custkey": ("raw_cust", "bigint")},
        id_cols=["oid"],
    )
    return dead.select(
        "oid",
        "price_c",
        "custkey",
        F.concat_ws(",", "_bad_fields").alias("bad_fields"),
    )


_DEAD_LETTERS_SQL = """
WITH raw AS (
  SELECT o_orderkey AS oid,
         CASE WHEN o_orderkey % 7 = 0 THEN 'N/A'
              ELSE CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
         END AS raw_price,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              WHEN o_orderkey % 13 = 0 THEN '#' || CAST(o_custkey AS VARCHAR)
              ELSE CAST(o_custkey AS VARCHAR)
         END AS raw_cust
  FROM orders
),
flagged AS (
  SELECT oid, raw_price, raw_cust,
         list_filter([
           CASE WHEN raw_price IS NOT NULL
                     AND TRY_CAST(raw_price AS BIGINT) IS NULL
                THEN 'price_c' END,
           CASE WHEN raw_cust IS NOT NULL
                     AND TRY_CAST(raw_cust AS BIGINT) IS NULL
                THEN 'custkey' END
         ], x -> x IS NOT NULL) AS bad
  FROM raw
)
SELECT oid, raw_price AS price_c, raw_cust AS custkey,
       list_aggregate(bad, 'string_agg', ',') AS bad_fields
FROM flagged WHERE len(bad) > 0
"""


def _column_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per returnflag from exact integer moments
    (cents domain; bounded columns so Σx² stays in int64). F.corr would
    be shuffle-order-dependent; this derivation is not."""
    from sids_data_pipeline_spark.operators.profile import column_correlation

    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return column_correlation(
        lineitem,
        [("l_quantity", "l_discount"), ("l_quantity", "l_tax")],
        group_cols=["l_returnflag"],
    )


def _column_corr_sql() -> str:
    # mirrors the engine term-for-term: pairwise-complete rows only,
    # exact HUGEINT moment sums (the DECIMAL(38,0) twin), double formula
    # in the same association order, NULL corr on zero variance
    arms = []
    for x, y in (("l_quantity", "l_discount"), ("l_quantity", "l_tax")):
        arms.append(f"""
SELECT l_returnflag, '{x}' AS col_x, '{y}' AS col_y,
       n0 AS n,
       CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n0) > 0
             AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n0) > 0
            THEN ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n0)
                       / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n0)
                              * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n0)), 6)
            ELSE NULL END AS corr
FROM (
  SELECT l_returnflag,
         COUNT(*) AS n0,
         CAST(SUM(xi) AS HUGEINT) AS sx, CAST(SUM(yi) AS HUGEINT) AS sy,
         CAST(SUM(xi * yi) AS HUGEINT) AS sxy,
         CAST(SUM(xi * xi) AS HUGEINT) AS sxx,
         CAST(SUM(yi * yi) AS HUGEINT) AS syy
  FROM (SELECT l_returnflag,
               CAST(ROUND({x} * 100) AS HUGEINT) AS xi,
               CAST(ROUND({y} * 100) AS HUGEINT) AS yi
        FROM lineitem
        WHERE {x} IS NOT NULL AND {y} IS NOT NULL)
  GROUP BY l_returnflag
)""")
    return "\nUNION ALL\n".join(arms)


def _column_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + MAD of extendedprice per returnflag — the robust
    center/spread pair for outlier-resistant data-quality monitors.
    Even-integer domain keeps both 0.5-quantile interpolations exact."""
    from sids_data_pipeline_spark.operators.profile import robust_stats

    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return robust_stats(lineitem, "l_extendedprice", ["l_returnflag"])


_COLUMN_MAD_SQL = f"""
WITH h AS (
  SELECT l_returnflag AS k, 2 * {o_cents('l_extendedprice')} AS h
  FROM lineitem
),
m AS (
  SELECT k, CAST(quantile_cont(h, 0.5) AS BIGINT) AS med_h
  FROM h GROUP BY k
)
SELECT h.k AS l_returnflag,
       m.med_h AS median_halfcents,
       CAST(quantile_cont(2 * ABS(h.h - m.med_h), 0.5) AS BIGINT)
         AS mad_quartercents
FROM h JOIN m ON h.k IS NOT DISTINCT FROM m.k
GROUP BY h.k, m.med_h
ORDER BY h.k
"""


def _pseudonymize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted sha2 surrogate keys on a customer slice: same value → same
    token, so joinability survives de-identification."""
    (customer,) = tables(spark, sf_dir, "customer")
    sliced = customer.filter(F.col("c_custkey") % 20 == 0).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return text.pseudonymize(sliced, ["c_custkey", "c_name"], salt="s3cr3t")


_PSEUDO_SQL = """
SELECT substring(sha256('s3cr3t' || CAST(c_custkey AS VARCHAR)), 1, 16)
         AS c_custkey,
       substring(sha256('s3cr3t' || c_name), 1, 16) AS c_name,
       c_mktsegment
FROM customer WHERE c_custkey % 20 = 0
"""


def _graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over a 40-node graph derived from orders.
    Integer-micros state makes each round an order-free integer sum; the
    oracle unrolls the same three rounds as SQL CTEs."""
    from sids_data_pipeline_spark.operators.graph import pagerank

    (orders,) = tables(spark, sf_dir, "orders")
    edges = orders.select(
        (F.col("o_custkey") % 40).alias("src"),
        (F.col("o_orderkey") % 40).alias("dst"),
    ).distinct()
    return pagerank(edges, iters=3)


def _graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the part co-purchase graph (parts sharing
    an order). Degree-ordered orientation bounds the wedge intermediate
    at O(m^1.5) even on skewed graphs; the hot-basket cap bounds pair
    generation. The oracle mirrors every stage: edges, degrees,
    orientation, wedge pairing, closing semi-join."""
    from sids_data_pipeline_spark.operators.graph import cobasket_edges, count_triangles

    (lineitem,) = tables(spark, sf_dir, "lineitem")
    edges = cobasket_edges(lineitem, "l_orderkey", "l_partkey", max_group_size=64)
    return count_triangles(edges)


_TRIANGLES_SQL = """
WITH t AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem),
small AS (SELECT g FROM t GROUP BY g HAVING COUNT(*) <= 64),
ts AS (SELECT t.g, t.item FROM t JOIN small USING (g)),
e AS (SELECT DISTINCT a.item AS u, b.item AS v
      FROM ts a JOIN ts b ON a.g = b.g AND a.item < b.item),
deg AS (SELECT node, COUNT(*) AS deg
        FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
        GROUP BY node),
o AS (
  SELECT CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v)
              THEN u ELSE v END AS src,
         CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v)
              THEN v ELSE u END AS dst,
         CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v)
              THEN dv.deg ELSE du.deg END AS deg_dst
  FROM e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
),
w AS (
  SELECT e1.dst AS b, e2.dst AS c
  FROM o e1 JOIN o e2 ON e1.src = e2.src
  WHERE (e1.deg_dst < e2.deg_dst)
     OR (e1.deg_dst = e2.deg_dst AND e1.dst < e2.dst)
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(*) FROM w
        WHERE EXISTS (SELECT 1 FROM o WHERE o.src = w.b AND o.dst = w.c))
         AS n_triangles
"""


def _pagerank_sql() -> str:
    iters = []
    prev = "r0"
    for i in (1, 2, 3):
        iters.append(f"""
c{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(CAST(ROUND(CAST(r AS DOUBLE) / deg) AS BIGINT)) AS BIGINT) AS cin
  FROM edges e JOIN {prev} ON {prev}.node = e.src
               JOIN deg ON deg.src = e.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT nodes.node,
         CAST(ROUND((1 - 0.85) * 1000000 / n + 0.85 * COALESCE(cin, 0))
              AS BIGINT) AS r
  FROM nodes LEFT JOIN c{i} USING (node), nn
)""")
        prev = f"r{i}"
    return f"""
WITH edges AS (
  SELECT DISTINCT o_custkey % 40 AS src, o_orderkey % 40 AS dst FROM orders
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(ROUND(1000000.0 / n) AS BIGINT) AS r FROM nodes, nn),
{','.join(iters)}
SELECT node, r AS rank_micros FROM r3
"""


def _events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour per-event features via ONE range-frame window."""
    (events,) = tables(spark, sf_dir, "events")
    return windows.rolling_stats(events, lookback_seconds=3600)


_ROLLING_SQL = """
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(FLOOR(epoch_us(ts) / 1000000) AS BIGINT) AS sec,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
)
SELECT user_id, ts_us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
       CAST(SUM(vc) OVER w AS BIGINT) AS sum_trailing_cents,
       CAST(SUM(vc) OVER w AS DOUBLE) / (COUNT(*) OVER w) / 100.0
         AS mean_trailing
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def _events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily gap fill over a deliberately sparse slice (high-value
    purchases) so the spine actually has gap days to zero-fill/LOCF."""
    (events,) = tables(spark, sf_dir, "events")
    sparse = events.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 190.0)
    )
    return windows.gap_fill_daily(sparse)


_GAP_FILL_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM events WHERE event_type = 'purchase' AND value > 190.0
  GROUP BY 1
),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily)
)
SELECT strftime(s.day, '%Y-%m-%d') AS day,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.sum_cents, 0) AS sum_cents,
       LAST_VALUE(d.sum_cents IGNORE NULLS) OVER (
         ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS carried_cents
FROM spine s LEFT JOIN daily d USING (day)
"""


def _events_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (>2 sigma to yield rows on the uniform
    fixture): exact integer moments, broadcast join back, no event
    shuffle."""
    (events,) = tables(spark, sf_dir, "events")
    return windows.zscore_outliers(events, threshold_micros=2_000_000)


_OUTLIERS_SQL = """
WITH c AS (
  SELECT event_id, event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
),
m AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(vc) AS BIGINT) AS s,
         CAST(SUM(vc * vc) AS BIGINT) AS ss
  FROM c GROUP BY event_type
)
SELECT event_id, event_type, value_cents, z_micros FROM (
  SELECT c.event_id, c.event_type, c.vc AS value_cents, m.n,
         CAST(ROUND(
           (CAST(c.vc AS DOUBLE) - CAST(s AS DOUBLE) / n)
           / sqrt(CAST(ss AS DOUBLE) / n
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
           * 1000000) AS BIGINT) AS z_micros
  FROM c JOIN m USING (event_type)
  WHERE (CAST(ss AS DOUBLE) / n
         - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) > 0
)
WHERE n >= 2 AND abs(z_micros) > 2000000
"""


def _streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply through the streaming surface: an availableNow change
    stream (insert + update + tombstone per key slice) drains through
    foreachBatch merge_upsert into a versioned state table; the result
    is the current snapshot. Single staged file ⇒ one micro-batch, so
    the oracle is latest-change-per-key minus tombstones."""
    import os
    import tempfile

    from sids_data_pipeline_spark.streaming.jobs import (
        read_cdc_state,
        streaming_cdc_upsert,
    )

    (orders,) = tables(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v1 = orders.filter(k % 5 == 0).select(
        k.alias("okey"),
        F.lit(1).alias("ts"),
        F.lit(0).alias("seq"),
        F.col("o_orderstatus").alias("status"),
        cents("o_totalprice").alias("price_c"),
        F.lit(False).alias("_del"),
    )
    v2 = orders.filter(k % 10 == 0).select(
        k.alias("okey"),
        F.lit(2).alias("ts"),
        F.lit(1).alias("seq"),
        F.lit("UPDATED").alias("status"),
        (cents("o_totalprice") + 100).alias("price_c"),
        F.lit(False).alias("_del"),
    )
    v3 = orders.filter(k % 20 == 0).select(
        k.alias("okey"),
        F.lit(3).alias("ts"),
        F.lit(2).alias("seq"),
        F.lit("X").alias("status"),
        F.lit(0).cast("long").alias("price_c"),
        F.lit(True).alias("_del"),
    )
    changes = v1.unionByName(v2).unionByName(v3)
    work = tempfile.mkdtemp(prefix="sdp_cdc_")
    src = os.path.join(work, "src")
    changes.repartition(1).write.parquet(src)
    stream = spark.readStream.schema(changes.schema).parquet(src)
    streaming_cdc_upsert(
        spark,
        stream,
        os.path.join(work, "state"),
        os.path.join(work, "ckpt"),
        keys=("okey",),
        ts_col="ts",
        tiebreak_col="seq",
        delete_col="_del",
    )
    return read_cdc_state(spark, os.path.join(work, "state")).select(
        "okey", "ts", "seq", "status", "price_c"
    )


_CDC_UPSERT_SQL = """
WITH changes AS (
  SELECT o_orderkey AS okey, 1 AS ts, 0 AS seq, o_orderstatus AS status,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c, FALSE AS del
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, 2, 1, 'UPDATED',
         CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100, FALSE
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 3, 2, 'X', CAST(0 AS BIGINT), TRUE
  FROM orders WHERE o_orderkey % 20 = 0
),
latest AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY okey
                               ORDER BY ts DESC, seq DESC) AS rn
  FROM changes
)
SELECT okey, ts, seq, status, price_c
FROM latest WHERE rn = 1 AND NOT del
"""


def _join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-vs-interval overlap join on arithmetically-derived
    intervals: bucket-grid equi-join with the canonical-bucket trick
    (exactly-once matches, no distinct). Oracle = the naive theta join."""
    from sids_data_pipeline_spark.operators import asof

    (orders,) = tables(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    left = orders.filter(k % 30 == 0).select(
        k.alias("lid"),
        (k % 997).alias("ls"),
        (k % 997 + k % 13 + 40).alias("le"),
    )
    right = orders.filter(k % 40 == 0).select(
        k.alias("rid"),
        (k % 1009).alias("rs"),
        (k % 1009 + k % 17 + 30).alias("re"),
    )
    out = asof.interval_join(left, right, ("ls", "le"), ("rs", "re"))
    return out.select(
        "lid",
        "rid",
        (F.least("le", "re") - F.greatest("ls", "rs")).alias("overlap_len"),
    )


_INTERVAL_SQL = """
WITH l AS (
  SELECT o_orderkey AS lid, o_orderkey % 997 AS ls,
         o_orderkey % 997 + o_orderkey % 13 + 40 AS le
  FROM orders WHERE o_orderkey % 30 = 0
),
r AS (
  SELECT o_orderkey AS rid, o_orderkey % 1009 AS rs,
         o_orderkey % 1009 + o_orderkey % 17 + 30 AS re
  FROM orders WHERE o_orderkey % 40 = 0
)
SELECT lid, rid,
       LEAST(le, re) - GREATEST(ls, rs) AS overlap_len
FROM l JOIN r ON ls <= re AND rs <= le
"""


def _join_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: corrupted supplier names (one substituted char
    on every 3rd key) match back to their source at edit distance 1 via
    the length-band blocked join; oracle is the naive levenshtein theta
    join."""
    from sids_data_pipeline_spark.operators.dedup import fuzzy_join

    (supplier,) = tables(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    dirty = supplier.filter(k % 3 == 0).select(
        k.alias("dirty_key"),
        F.concat(
            F.substring("s_name", 1, 3),
            F.lit("#"),
            F.expr("substring(s_name, 5)"),
        ).alias("dirty_name"),
    )
    clean = supplier.select(k.alias("clean_key"), F.col("s_name").alias("clean_name"))
    out = fuzzy_join(dirty, clean, "dirty_name", "clean_name", max_distance=1)
    return out.select("dirty_key", "dirty_name", "clean_key", "clean_name")


_FUZZY_SQL = """
WITH dirty AS (
  SELECT s_suppkey AS dirty_key,
         substring(s_name, 1, 3) || '#' || substring(s_name, 5) AS dirty_name
  FROM supplier WHERE s_suppkey % 3 = 0
),
clean AS (SELECT s_suppkey AS clean_key, s_name AS clean_name FROM supplier)
SELECT dirty_key, dirty_name, clean_key, clean_name
FROM dirty JOIN clean ON levenshtein(dirty_name, clean_name) <= 1
"""


def _corpus_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge-candidate table: adjacent char-pair counts over
    the corpus, computed from the (much smaller) vocabulary weighted by
    word frequency."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.bpe_pair_counts(docs, top_k=200)


_BPE_PAIRS_SQL = """
WITH words AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                            x -> x <> '')) AS word
  FROM documents
),
vocab AS (SELECT word, COUNT(*) AS n_word FROM words GROUP BY word),
pairs AS (
  SELECT n_word,
         unnest(list_transform(range(1, len(chars)),
                               i -> chars[i] || ' ' || chars[i + 1])) AS pair
  FROM (SELECT n_word, regexp_split_to_array(word, '') AS chars FROM vocab)
)
SELECT pair, CAST(SUM(n_word) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT 200
"""


def _corpus_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/E2: exact repeated-span detection (Lee et al. substring dedup,
    hash-groupBy form) — maximal merged token intervals covered by any
    8-gram occurring ≥2 times in the corpus."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.duplicate_spans(docs, n=8).orderBy(
        "doc_id", "span_start"
    )


# Shared CTE prefix for both dup-span twins: tokenize (ws = lowercase
# grams key, wo = original case for rebuild), 8-gram, dup filter,
# gaps-and-islands merge. ONE copy so an island/gram edit can never
# drift between the span query and the removal query.
_DUP_SPANS_CTES = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS ws,
         list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS wo
  FROM documents
),
g AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         array_to_string(list_slice(ws, i, i + 7), ' ') AS gram
  FROM w, unnest(range(1, len(ws) - 8 + 2)) AS t(i)
  WHERE len(ws) >= 8
),
dup AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
),
hits AS (
  SELECT g.doc_id, CAST(g.pos AS BIGINT) AS s, CAST(g.pos + 7 AS BIGINT) AS e
  FROM g JOIN dup USING (gram)
),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) + 1, s - 1) THEN 1 ELSE 0 END AS new_isl
  FROM hits
),
isl2 AS (
  SELECT doc_id, s, e,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS UNBOUNDED PRECEDING) AS isl_id
  FROM isl
)"""

_DUP_SPANS_SQL = _DUP_SPANS_CTES + r"""
SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end
FROM isl2 GROUP BY doc_id, isl_id
ORDER BY doc_id, span_start
"""


def _corpus_dup_spans_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/E2: the actionable substring-dedup — duplicated regions CUT
    from every document (Lee et al. removal semantics)."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.remove_duplicate_spans(docs, n=8).orderBy("doc_id")


_DUP_SPANS_CLEAN_SQL = _DUP_SPANS_CTES + r""",
spans AS (
  SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end
  FROM isl2 GROUP BY doc_id, isl_id
),
tok AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, wo[i] AS tok
  FROM w, unnest(range(1, len(wo) + 1)) AS t(i)
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM tok t
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = t.doc_id AND t.pos BETWEEN s.span_start AND s.span_end
  )
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       CAST(len(w.ws) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_tokens_removed
FROM w LEFT JOIN agg a ON a.doc_id = w.doc_id
ORDER BY w.doc_id
"""


def _corpus_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: NB quality-classifier filtering (the GPT-3 CommonCrawl recipe
    with the counting-only NB baseline): weak label lang='en', add-1
    smoothing, exact integer-micros log-odds scores."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.nb_quality_classifier(
        docs.withColumn("_is_en", F.col("lang") == "en"), "_is_en"
    ).orderBy("doc_id")


_QUALITY_CLASSIFIER_SQL = r"""
WITH lab AS (
  SELECT doc_id, (lang = 'en') AS pos,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS ws
  FROM documents
),
tc AS (
  SELECT doc_id, pos, t.tok, COUNT(*) AS cnt
  FROM lab, unnest(ws) AS t(tok)
  GROUP BY doc_id, pos, t.tok
),
model AS (
  SELECT tok,
         SUM(CASE WHEN pos THEN cnt ELSE 0 END) AS c_pos,
         SUM(CASE WHEN NOT pos THEN cnt ELSE 0 END) AS c_neg
  FROM tc GROUP BY tok
),
tot AS (
  SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg, COUNT(*) AS v FROM model
),
w AS (
  SELECT tok,
         CAST(ROUND((ln((c_pos + 1.0) / (n_pos + 1.0 * v))
                     - ln((c_neg + 1.0) / (n_neg + 1.0 * v))) * 1000000)
              AS BIGINT) AS w_micros
  FROM model CROSS JOIN tot
),
prior AS (
  SELECT CAST(ROUND(ln(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
                       / SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END)) * 1000000)
              AS BIGINT) AS prior_micros
  FROM lab
),
per_doc AS (
  SELECT tc.doc_id, SUM(tc.cnt) AS n_tok, SUM(tc.cnt * w.w_micros) AS s
  FROM tc JOIN w USING (tok) GROUP BY tc.doc_id
)
SELECT l.doc_id,
       CAST(COALESCE(p.n_tok, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.s, 0) + pr.prior_micros AS BIGINT) AS score_micros,
       (COALESCE(p.s, 0) + pr.prior_micros > 0) AS keep
FROM lab l LEFT JOIN per_doc p USING (doc_id) CROSS JOIN prior pr
ORDER BY l.doc_id
"""


def _corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/E2: CCNet/FineWeb line-level dedup — segments whose normalized
    form appears in ≥2 distinct docs are boilerplate, removed from every
    doc; 5-word windows segment the newline-free fixture corpus."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.remove_hot_lines(
        docs, min_docs=2, sep_regex=None, window_words=5
    ).orderBy("doc_id")


_LINE_DEDUP_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS wo
  FROM documents
),
seg0 AS (
  SELECT doc_id, CAST((i - 1) // 5 AS BIGINT) AS idx,
         lower(array_to_string(
           list_slice(wo, ((i - 1) // 5) * 5 + 1, ((i - 1) // 5) * 5 + 5),
           ' ')) AS key,
         array_to_string(
           list_slice(wo, ((i - 1) // 5) * 5 + 1, ((i - 1) // 5) * 5 + 5),
           ' ') AS orig
  FROM w, unnest(range(1, len(wo) + 1)) AS t(i)
  WHERE (i - 1) % 5 = 0
),
seg AS (SELECT * FROM seg0 WHERE key <> ''),
hot AS (
  SELECT key FROM seg GROUP BY key HAVING COUNT(DISTINCT doc_id) >= 2
),
kept AS (
  SELECT s.doc_id, s.idx, s.orig FROM seg s
  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.key = s.key)
),
agg AS (
  SELECT doc_id, string_agg(orig, ' ' ORDER BY idx) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n0 FROM seg GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       CAST(COALESCE(t.n0, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(t.n0, 0) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


def _corpus_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: CCNet-style LM quality scoring — per-doc mean bigram NLL
    under the add-alpha-smoothed corpus self-LM, exact integer micros."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.lm_perplexity(docs).orderBy("doc_id")


_LM_SCORE_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, ws[i] AS v, ws[i + 1] AS t
  FROM w, unnest(range(1, len(ws))) AS u(i)
  WHERE len(ws) >= 2
),
pc AS (SELECT v, t, COUNT(*) AS c_vt FROM bg GROUP BY v, t),
cc AS (SELECT v, SUM(c_vt) AS c_v FROM pc GROUP BY v),
vv AS (
  SELECT COUNT(DISTINCT tok) AS V
  FROM (SELECT unnest(ws) AS tok FROM w) u
),
model AS (
  SELECT pc.v, pc.t,
         CAST(ROUND(-ln((pc.c_vt + 0.1) / (cc.c_v + 0.1 * vv.V)) * 1000000)
              AS BIGINT) AS nll
  FROM pc JOIN cc ON cc.v = pc.v CROSS JOIN vv
),
sc AS (
  SELECT b.doc_id, COUNT(*) AS n_bigrams, SUM(m.nll) AS s
  FROM bg b JOIN model m ON m.v = b.v AND m.t = b.t
  GROUP BY b.doc_id
)
SELECT w.doc_id,
       COALESCE(sc.n_bigrams, 0) AS n_bigrams,
       CASE WHEN sc.n_bigrams > 0
            THEN CAST(ROUND(CAST(sc.s AS DOUBLE) / sc.n_bigrams) AS BIGINT)
            ELSE NULL END AS avg_nll_micros
FROM w LEFT JOIN sc ON sc.doc_id = w.doc_id
ORDER BY w.doc_id
"""


def _corpus_lm_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: CCNet's actual cross-corpus recipe — the reference LM trains
    on the first half of documents, scores the second half; unseen
    bigrams and unseen contexts back off through the same add-alpha
    formula at zero counts (both cases occur at this split)."""
    (docs,) = tables(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") < 250)
    score = docs.filter(F.col("doc_id") >= 250)
    return text.lm_perplexity_cross(train, score).orderBy("doc_id")


_LM_CROSS_SQL = r"""
WITH tw AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS ws
  FROM documents WHERE doc_id < 250
),
sw AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS ws
  FROM documents WHERE doc_id >= 250
),
tbg AS (
  SELECT ws[i] AS v, ws[i + 1] AS t
  FROM tw, unnest(range(1, len(ws))) AS u(i)
  WHERE len(ws) >= 2
),
sbg AS (
  SELECT doc_id, ws[i] AS v, ws[i + 1] AS t
  FROM sw, unnest(range(1, len(ws))) AS u(i)
  WHERE len(ws) >= 2
),
pc AS (SELECT v, t, COUNT(*) AS c_vt FROM tbg GROUP BY v, t),
cc AS (SELECT v, SUM(c_vt) AS c_v FROM pc GROUP BY v),
vv AS (
  SELECT COUNT(DISTINCT tok) AS V
  FROM (SELECT unnest(ws) AS tok FROM tw) u
),
types AS (SELECT DISTINCT v, t FROM sbg),
model AS (
  SELECT ty.v, ty.t,
         CAST(ROUND(-ln((COALESCE(pc.c_vt, 0) + 0.1)
                        / (COALESCE(cc.c_v, 0) + 0.1 * vv.V)) * 1000000)
              AS BIGINT) AS nll
  FROM types ty
  LEFT JOIN pc ON pc.v = ty.v AND pc.t = ty.t
  LEFT JOIN cc ON cc.v = ty.v
  CROSS JOIN vv
),
sc AS (
  SELECT b.doc_id, COUNT(*) AS n_bigrams, SUM(m.nll) AS s
  FROM sbg b JOIN model m ON m.v = b.v AND m.t = b.t
  GROUP BY b.doc_id
)
SELECT sw.doc_id,
       COALESCE(sc.n_bigrams, 0) AS n_bigrams,
       CASE WHEN sc.n_bigrams > 0
            THEN CAST(ROUND(CAST(sc.s AS DOUBLE) / sc.n_bigrams) AS BIGINT)
            ELSE NULL END AS avg_nll_micros
FROM sw LEFT JOIN sc ON sc.doc_id = sw.doc_id
ORDER BY sw.doc_id
"""


def _text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon char entropy; micros-rounded plog terms sum
    order-free."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.char_entropy(docs)


_CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch FROM documents
),
counts AS (
  SELECT doc_id, ch, COUNT(*) AS c
  FROM chars WHERE ch <> '' GROUP BY doc_id, ch
),
tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY doc_id)
SELECT doc_id,
       CAST(SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / n)
                           * log2(CAST(c AS DOUBLE) / n)
                           * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS entropy_bits
FROM counts JOIN tot USING (doc_id)
GROUP BY doc_id
"""


_BM25_TERMS = ("vector", "hash", "scan")
# explicit join, not str(tuple): a 1-element tuple would render the
# invalid SQL `IN ('x',)`
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


def _text_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 full-text top-10 for a 3-term query. Each term contribution
    rounds to integer micros before the per-doc sum, so the score is an
    order-free integer the oracle reproduces term-for-term."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.search_bm25(docs, list(_BM25_TERMS), k=10)


_BM25_SQL = f"""
WITH ws AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                     x -> x <> '') AS w
  FROM documents
),
corpus AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(w)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM ws
),
stats AS (
  SELECT doc_id, len(w) AS dl, t.token
  FROM ws, unnest(w) AS t(token)
  WHERE t.token IN ({_BM25_TERMS_SQL})
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf, MIN(dl) AS dl
  FROM stats GROUP BY doc_id, token
),
dfq AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY token),
contrib AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ln(1.0 + ((c.n_docs - d.doc_freq) + 0.5) / (d.doc_freq + 0.5))
           * ((tf.tf * (1.2 + 1))
              / (tf.tf + 1.2 * (0.25 + (0.75 * CAST(tf.dl AS DOUBLE)) / c.avgdl)))
           * 1000000) AS BIGINT) AS cmic
  FROM tf JOIN dfq d USING (token) CROSS JOIN corpus c
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
       CAST(SUM(cmic) AS BIGINT) AS score_micros
FROM contrib GROUP BY doc_id
ORDER BY score_micros DESC, doc_id ASC
LIMIT 10
"""


def _embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means assignment (k=8, centroids = 8 smallest
    vec_ids): exact integer squared-L2 in the micros domain, so the
    oracle reproduces every distance bit-for-bit."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    return similarity.kmeans_assign(emb, k=8)


_KMEANS_SQL = """
WITH n AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
),
c AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx
  FROM n ORDER BY vec_id LIMIT 8
),
d AS (
  SELECT e.vec_id, c.cidx,
         CAST(list_sum(list_transform(range(1, len(e.v) + 1),
              i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS BIGINT) AS dist2
  FROM n e CROSS JOIN c
),
r AS (
  SELECT vec_id, cidx, dist2,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist2 ASC, cidx ASC) AS rn
  FROM d
)
SELECT vec_id, CAST(cidx AS INT) AS cluster, dist2
FROM r WHERE rn = 1
"""


def _dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/E3 SemDeDup (Abbas et al. 2023): k-means blocks + within-
    cluster cosine pruning. The fixture's vectors are well-separated
    (max within-cluster cosine ~0.49), so the query plants exact
    re-embeddings (same vector, vec_id+10000) of every 10th row — a
    positive-signal gate: the 50 planted copies land in their twin's
    cluster deterministically, score cosine 1.0 >= 0.95, and must be
    the dropped set (higher id of each pair)."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "embedding")
    planted = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    return similarity.semantic_dedup(
        base.unionAll(planted), k=8, threshold=0.95
    )


_SEMANTIC_DEDUP_SQL = """
WITH src AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 10 = 0
),
n AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM src
),
nn AS (
  SELECT vec_id, v,
         CAST(list_sum(list_transform(range(1, len(v) + 1),
              i -> v[i] * v[i])) AS BIGINT) AS norm2
  FROM n
),
c AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx
  FROM n ORDER BY vec_id LIMIT 8
),
d AS (
  SELECT e.vec_id, c.cidx,
         CAST(list_sum(list_transform(range(1, len(e.v) + 1),
              i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS BIGINT) AS dist2
  FROM n e CROSS JOIN c
),
r AS (
  SELECT vec_id, cidx,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist2 ASC, cidx ASC) AS rn
  FROM d
),
e AS (
  SELECT nn.vec_id, r.cidx AS cluster, nn.v, nn.norm2
  FROM nn JOIN r ON r.vec_id = nn.vec_id AND r.rn = 1
),
p AS (
  SELECT b.vec_id AS id2
  FROM e a JOIN e b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE a.norm2 > 0 AND b.norm2 > 0
    AND CAST(list_sum(list_transform(range(1, len(a.v) + 1),
             i -> a.v[i] * b.v[i])) AS DOUBLE)
        / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE)))
        >= 0.95
),
drops AS (SELECT DISTINCT id2 FROM p)
SELECT e.vec_id, CAST(e.cluster AS INT) AS cluster,
       (drops.id2 IS NOT NULL) AS dropped
FROM e LEFT JOIN drops ON drops.id2 = e.vec_id
"""


def _text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return text.scrub_pii(docs)


def _scrub_pii_sql() -> str:
    """Generated from the SAME pattern inventory as the operator — the
    counts are over the progressively-scrubbed text, so the SQL nests
    the replacements in the same order."""
    from sids_data_pipeline_spark.operators.text import PII_PATTERNS

    order = ("email", "ipv4", "phone")
    cur = "text"
    count_cols = []
    for kind in order:
        pat = PII_PATTERNS[kind]
        count_cols.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT) AS n_{kind}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '<{kind.upper()}>', 'g')"
    return f"""
SELECT doc_id,
       {cur} AS text,
       {', '.join(count_cols)}
FROM documents
"""


def _corpus_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return text.chunk_documents(docs, chunk_words=100, stride=80)


# O(words × overlap) formulation: each word joins the ≤ ceil(100/80) = 2
# chunks covering its position and string_agg rebuilds the window text.
# The obvious per-chunk list_slice over the full word array is
# O(n_chunks × n_words) — quadratic on a long document (an 810k-word doc
# never finishes) — the same trap the engine's transform-lambda re-split
# was (tests/test_oracle_edges.py covers both sides).
_CORPUS_CHUNK_SQL = r"""
WITH w AS (
  -- empty tokens filtered and zero-word docs (incl. NULL text) dropped,
  -- mirroring the engine: an empty doc emits NO chunks
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS ws
  FROM documents
),
c AS (
  SELECT doc_id, ws, len(ws) AS n_words,
         CAST(CEIL(CAST(GREATEST(len(ws) - 100, 0) AS DOUBLE) / 80) AS INT) + 1
           AS n_chunks
  FROM w WHERE len(ws) > 0
),
words AS (
  -- parallel unnest aligns element-wise: word with its 1-based position
  SELECT doc_id, n_words, n_chunks,
         unnest(ws) AS word,
         CAST(unnest(range(1, len(ws) + 1)) AS BIGINT) AS pos
  FROM c
),
memb AS (
  -- 1-based pos belongs to chunk i iff i*80 < pos <= i*80 + 100
  SELECT doc_id, n_words, word, pos, CAST(gs.i AS INT) AS chunk_idx
  FROM words, LATERAL (
    SELECT unnest(generate_series(
      GREATEST(CAST(0 AS BIGINT), CAST(CEIL((pos - 100) / 80.0) AS BIGINT)),
      LEAST(CAST(n_chunks - 1 AS BIGINT), CAST(FLOOR((pos - 1) / 80.0) AS BIGINT))
    )) AS i
  ) gs
)
SELECT doc_id,
       chunk_idx,
       CAST(chunk_idx * 80 AS INT) AS chunk_start_word,
       CAST(n_words AS INT) AS n_words,
       string_agg(word, ' ' ORDER BY pos) AS chunk_text
FROM memb
GROUP BY doc_id, chunk_idx, n_words
"""


def _similarity_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.topk_quantized(emb, queries, k=10)


# int8 quantization mirrored in SQL: maxabs is an exact integer, the
# per-element ROUND(x·127/maxabs) is the same double expression Spark
# evaluates, and scoring repeats the integer-dot/rank pattern above.
_SIMILARITY_QUANT_SQL = f"""
WITH {_EMBED_VEC_SQL},
qv AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(ROUND(CAST(x AS DOUBLE) * 127.0 /
                                           CAST(maxabs AS DOUBLE)) AS BIGINT)) AS q
  FROM (SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) AS maxabs
        FROM m) t
  WHERE maxabs > 0
),
qn AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
  FROM qv
),
s AS (
  SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(qq.q) + 1), i -> qq.q[i] * c.q[i])) AS BIGINT) AS dot,
         qq.n2 AS qn2, c.n2 AS cn2
  FROM qn qq JOIN qn c ON qq.vec_id < 5 AND c.vec_id <> qq.vec_id
),
r AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS cos_raw,
         CAST(ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) DESC,
                       neighbor_id ASC) AS INT) AS rank
  FROM s
)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine, rank
FROM r WHERE rank <= 10
"""


def _similarity_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF probe against the exact brute-force ranking —
    the evaluation loop every ANN deployment needs, as one query. Exact
    integer micros recall so the oracle hash-matches."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.topk_bruteforce(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.topk_ivf(emb, queries, k=10).select(
        "query_id", "neighbor_id", F.lit(1).alias("_hit")
    )
    # one pass over the exact leg (r15): a LEFT join against the
    # (set-valued) approx ranking marks hits per row, and a single
    # groupBy yields k and n_hits together — the old shape referenced
    # the brute-force pipeline twice (semi-join + base counts) and
    # re-joined the two aggregates
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.count("_hit").alias("n_hits"),
        )
        .select(
            "query_id",
            F.col("n_hits"),
            F.round(F.col("n_hits").cast("double") / F.col("k") * 1_000_000, 0)
            .cast("long")
            .alias("recall_micros"),
        )
    )


def _similarity_recall_sql() -> str:
    """Both constituent oracles embed verbatim as derived tables (DuckDB
    allows WITH inside a parenthesized subquery), so this oracle is
    correct by composition."""
    return f"""
WITH ex AS (SELECT query_id, neighbor_id FROM ({_SIMILARITY_TOPK_SQL}) t),
iv AS (SELECT query_id, neighbor_id FROM ({_SIMILARITY_IVF_SQL}) t),
hits AS (
  SELECT ex.query_id, COUNT(*) AS n_hits
  FROM ex JOIN iv USING (query_id, neighbor_id)
  GROUP BY ex.query_id
),
base AS (SELECT query_id, COUNT(*) AS k FROM ex GROUP BY query_id)
SELECT b.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / b.k * 1000000)
            AS BIGINT) AS recall_micros
FROM base b LEFT JOIN hits h ON h.query_id = b.query_id
"""


def _similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.topk_ivf(emb, queries, k=10)


_SIMILARITY_IVF_SQL = f"""
WITH {_EMBED_VEC_SQL},
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) AS BIGINT) AS dot,
         q.norm2 AS qn, c.norm2 AS cn
  FROM m q JOIN m c ON q.vec_id < 5 AND c.label = q.label AND c.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, neighbor_id,
         CASE WHEN qn > 0 AND cn > 0 THEN CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) ELSE 'NaN'::DOUBLE END AS cos_raw,
         CAST(ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY CASE WHEN qn > 0 AND cn > 0 THEN CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) ELSE 'NaN'::DOUBLE END DESC,
                       neighbor_id ASC) AS INT) AS rank
  FROM s
)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine, rank
FROM r WHERE rank <= 10
"""


def _similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ann_lsh(emb, queries, k=10)


def _similarity_ann_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive signal for the seeded ANN sketch (similarity_ann_lsh is
    rows-only by nature): every ANN hit must appear in the BRUTE-FORCE
    top-2k for its query — a derived oracle the exact operator (itself
    full-value-verified by similarity_topk) provides. Output one row
    (violations=0, found_hits=true); the SQL twin states the expected
    verdict, so a recall collapse or a wrong re-rank hash-mismatches."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ann = similarity.ann_lsh(emb, queries, k=10)
    exact2k = similarity.topk_bruteforce(emb, queries, k=20)
    # one-pass verdict (r15): see _verdict_missing — the LSH pipeline
    # evaluates once instead of per reference (anti-join + found probe)
    return _verdict_missing(ann, exact2k, ["query_id", "neighbor_id"])


_ANN_GATE_SQL = "SELECT CAST(0 AS BIGINT) AS violations, TRUE AS found_hits"


def _similarity_pq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive signal for product quantization (E3, r12): train PQ
    codebooks (m=4 subspaces × 8 codewords, exact-integer Lloyd),
    encode the corpus to 4-int codes, run ADC top-10 for five queries
    (similarity.topk_pq — JVM table-lookup fold over the codes, no
    Python in the candidate path), and pin the DEFINING identity of
    asymmetric distance: ADC(q, x) = ‖q − reconstruct(codes(x))‖²
    exactly in the integer domain, so the ADC top-10 must equal —
    row-for-row, including dist2 and rank — the exact L2 top-10 over
    the RECONSTRUCTED corpus (similarity.pq_reconstruct → topk_l2,
    an independent zip_with fold that never sees the lookup tables).
    Unlike a recall bound against the original vectors (which is data-
    dependent and fails on noise-like corpora where PQ is weak), this
    equality is exact at any scale; a codebook, encode, table, ranking
    or tie-break regression produces violations > 0 and
    hash-mismatches the (0, true) verdict row."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    # kc=8/iters=2 keeps the gate cheap (pq_fit is m sequential
    # driver-coordinated Lloyd jobs) — the ADC identity this gate pins
    # is equally strong under any codebook
    books = similarity.pq_fit(emb, m=4, kc=8, iters=2)
    pq = similarity.topk_pq(emb, queries, books, k=10)
    recon = similarity.pq_reconstruct(
        similarity.pq_encode(emb, books), books
    )
    l2 = similarity.topk_l2(recon, queries, k=10)
    # one-pass verdict (r15): each leg's encode+search pipeline now
    # evaluates exactly once — the old symmetric anti-joins replayed pq
    # 3x and l2 2x; same (violations, found_hits) by set identity
    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    return _verdict_sym_diff(pq, l2, cols)


_PQ_GATE_SQL = "SELECT CAST(0 AS BIGINT) AS violations, TRUE AS found_hits"


def _similarity_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ADC (E3, r13 — the VERDICT r12 ask): compose the coarse
    inverted file with residual product quantization (Jégou 2011 §V /
    FAISS IVFPQ) and pin it with the residual form of the ADC identity.
    Train (similarity.ivf_pq_fit: coarse Lloyd + m residual Lloyds),
    search five queries over 2-of-4 probed cells (similarity.topk_ivf_pq
    — numpy probe tables driver-side, broadcast equi-join on cell,
    zero-Python ADC fold), then replay EVERYTHING through an independent
    engine path: probe selection via Spark posexplode+window
    (similarity.ivf_probe), candidates via reconstruction
    x̂ = centroid[cell] + codewords (similarity.ivf_pq_reconstruct), and
    the distance via an exact integer zip_with fold ‖q − x̂‖² that never
    sees the lookup tables. ADC(q,x) = ‖q − x̂‖² exactly in integers, so
    the two top-10s must match row-for-row including dist2 and rank; a
    cell-assignment, probe-ordering, codebook, table, fold, ranking or
    tie-break regression produces violations > 0 and hash-mismatches
    the (0, true) verdict row."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    centroids, books = similarity.ivf_pq_fit(emb, kcoarse=4, m=4, kc=8, iters=2)
    # ONE persisted encode feeds both legs (r15, VERDICT ask #4):
    # topk_ivf_pq with candidates_encoded=False would run the IDENTICAL
    # ivf_pq_encode internally (same function, same args — pinned
    # bit-identical by test_ivf_pq_encode_matches_numpy), so sharing the
    # frame does not weaken the ADC-vs-reconstruction identity; without
    # it the un-persisted encode re-ran once per plan reference (search
    # leg + reconstruction leg)
    enc = lifecycle.track(
        similarity.ivf_pq_encode(emb, centroids, books).persist()
    )
    ivf = similarity.topk_ivf_pq(
        enc, queries, centroids, books, k=10, nprobe=2,
        candidates_encoded=True,
    )
    recon = similarity.ivf_pq_reconstruct(enc, centroids, books)
    probed = similarity.ivf_probe(queries, centroids, nprobe=2)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        similarity._int_vec("embedding").alias("_qv"),
    )
    dist2 = F.aggregate(
        F.zip_with(
            F.col("_qv"),
            similarity._int_vec("embedding"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    exact = (
        recon.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(probed.join(q, "query_id")), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "dist2", "rank")
    )
    # one-pass verdict (r15): see _verdict_sym_diff — each replay leg
    # now evaluates exactly once over the shared persisted encode
    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    return _verdict_sym_diff(ivf, exact, cols)


_IVF_PQ_SQL = "SELECT CAST(0 AS BIGINT) AS violations, TRUE AS found_hits"


def _similarity_pq_pca_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-rotated product quantization (E3, r13): rotate the corpus
    onto its full set of principal components (similarity.pca_fit with
    k = d, an orthogonal basis change — the energy-compaction
    preprocessing OPQ [Ge et al., CVPR 2013] optimizes iteratively;
    this is the standard non-iterative PCA variant), then run the whole
    PQ family in the rotated domain: pq_fit sub-codebooks, 4-int codes,
    ADC top-10 (similarity.topk_pq). The gate pins the same defining
    identity as similarity_pq_gate — ADC(q,x) = ‖q − reconstruct(x)‖²
    exactly in the rotated-then-quantized integer domain, checked
    against the independent pq_reconstruct → topk_l2 path — which
    proves the rotation composes with encode/search/decode without
    breaking exactness (a rotation that leaked into only one side, a
    mean subtracted twice, or a component-order drift between fit and
    transform all produce violations > 0). Orthogonality means L2 in
    the rotated domain IS L2 in the original (up to the shared ×1e6
    quantization), so the searched metric is unchanged."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    first = emb.select("embedding").first()
    d = len(first[0])
    model = similarity.pca_fit(emb, k=d)
    # persist the rotated corpus: the rotation is a d×d literal-matrix
    # projection (d² arithmetic nodes) that pq_fit's Lloyd jobs, the
    # encode, and both search paths would otherwise each re-evaluate
    # per row — materializing it once is exactly what a production
    # pipeline does with a rotated corpus before indexing; track() so
    # the catalog runner's release_tracked unpins it between queries
    # (ADVICE r14: gate persists must not outlive the gate)
    rot = lifecycle.track(
        similarity.pca_transform(emb, model, out_col="_pc")
        .select("vec_id", F.col("_pc").alias("embedding"))
        .persist()
    )
    queries = rot.filter(F.col("vec_id") < 5)
    books = similarity.pq_fit(rot, m=4, kc=8, iters=2)
    pq = similarity.topk_pq(rot, queries, books, k=10)
    recon = similarity.pq_reconstruct(
        similarity.pq_encode(rot, books), books
    )
    l2 = similarity.topk_l2(recon, queries, k=10)
    # one-pass verdict (r15): see _verdict_sym_diff
    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    return _verdict_sym_diff(pq, l2, cols)


_PQ_PCA_SQL = "SELECT CAST(0 AS BIGINT) AS violations, TRUE AS found_hits"


def _streaming_ann_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming vector retrieval (E3 × streaming, r13): a stream of
    query vectors probes a STATIC pre-encoded IVF-ADC index per
    micro-batch (streaming/jobs.ann_enrich_stream — foreachBatch runs
    the SAME batch operator, similarity.topk_ivf_pq with
    candidates_encoded=True, so batch and streaming retrieval share one
    definition). One staged file ⇒ one availableNow micro-batch ⇒ the
    streamed neighbor table must equal the batch search over the same
    query set ROW-FOR-ROW including the exact integer ADC dist2 — the
    derived-oracle verdict row. A drift between the streamed and batch
    paths (a re-encoded index, a lost probe, replay duplicates escaping
    the per-batch overwrite) produces violations > 0."""
    import os
    import tempfile

    from sids_data_pipeline_spark.schemas import TABLE_SCHEMAS
    from sids_data_pipeline_spark.streaming.jobs import ann_enrich_stream

    work = tempfile.mkdtemp(prefix="sdp_stream_ann_")
    (emb,) = tables(spark, sf_dir, "embeddings")
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=4, m=4, kc=8, iters=1)
    enc = lifecycle.track(
        similarity.ivf_pq_encode(emb, cents, books).persist()
    )
    src = os.path.join(work, "src")
    emb.filter(F.col("vec_id") < 5).repartition(1).write.parquet(src)
    qstream = spark.readStream.schema(TABLE_SCHEMAS["embeddings"]).parquet(src)
    out = os.path.join(work, "out")
    ann_enrich_stream(
        qstream, enc, cents, books, out, os.path.join(work, "ckpt"),
        k=10, nprobe=2,
    )
    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    streamed = spark.read.parquet(os.path.join(out, "rows")).select(cols)
    batch = similarity.topk_ivf_pq(
        enc, emb.filter(F.col("vec_id") < 5), cents, books,
        k=10, nprobe=2, candidates_encoded=True,
    ).select(cols)
    # one-pass verdict (r15): see _verdict_sym_diff — the batch replay
    # leg evaluates once instead of per anti-join arm
    return _verdict_sym_diff(streamed, batch, cols)


_STREAM_ANN_SQL = "SELECT CAST(0 AS BIGINT) AS violations, TRUE AS found_hits"


def _similarity_opq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimized product quantization (E3, r14): opq_fit learns the
    rotation jointly with the codebooks — eigenvalue-allocation init
    (OPQ-P) + Procrustes refinement (OPQ-NP), Ge et al. CVPR 2013 —
    instead of the fixed PCA basis the r13 gate composes. Three pins:

    * the returned rotation is ORTHOGONAL (max |R·Rᵀ − I| ≤ 1e-9; a
      non-orthogonal R silently changes the searched metric);
    * the objective trace is non-increasing within Lloyd tolerance
      (alternating minimization that ascends means a sub-step stopped
      being an argmin — the regression class this guards);
    * the defining ADC identity holds in the LEARNED rotated domain:
      topk_pq's table-lookup distance == ‖q − reconstruct(x)‖² exactly
      against the independent pq_reconstruct → topk_l2 replay, proving
      the learned rotation composes with encode/search/decode without
      breaking exactness.

    The driver-side checks fold into the verdict row as literals; the
    identity check is the same distributed anti-join the PQ/PCA gates
    run. Output (violations, found_hits)."""
    import numpy as np

    (emb,) = tables(spark, sf_dir, "embeddings")
    # opq_iters=1 keeps the gate inside the window's time budget while
    # still pinning descent across (allocated init → Procrustes refit);
    # the pytest fixture runs the deeper trace
    model = similarity.opq_fit(emb, m=4, kc=8, iters=1, opq_iters=1)
    rotation = np.asarray(model["rotation"])
    d = rotation.shape[0]
    driver_viol = 0
    if float(np.abs(rotation @ rotation.T - np.eye(d)).max()) > 1e-9:
        driver_viol += 1
    tr = model["sse_trace"]
    if any(b > a * 1.001 for a, b in zip(tr, tr[1:])):
        driver_viol += 1
    rot = lifecycle.track(
        similarity.opq_rotate(emb, model["rotation"], out_col="_r")
        .select("vec_id", F.col("_r").alias("embedding"))
        .persist()
    )
    queries = rot.filter(F.col("vec_id") < 5)
    books = model["codebooks"]
    pq = similarity.topk_pq(rot, queries, books, k=10)
    recon = similarity.pq_reconstruct(
        similarity.pq_encode(rot, books), books
    )
    l2 = similarity.topk_l2(recon, queries, k=10)
    # one-pass verdict (r15): see _verdict_sym_diff; the driver-side
    # orthogonality/descent violations fold onto the same count
    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    return _verdict_sym_diff(pq, l2, cols).select(
        (F.col("violations") + F.lit(driver_viol)).alias("violations"),
        "found_hits",
    )


_OPQ_SQL = "SELECT CAST(0 AS BIGINT) AS violations, TRUE AS found_hits"


def _similarity_ivf_pq_refine_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval gate (E3, r14): topk_ivf_pq_refine — ADC
    shortlist from the code-only index, exact integer re-rank of the
    |Q|·k' surviving pairs against the raw vectors (the FAISS
    refine-over-IVFPQ production pattern; broadcast semi-gather, no
    shuffle of the vector table). Two pins:

    * EXACTNESS at the degenerate point: with kprime = |corpus| and
      every coarse cell probed, refine must equal the independent
      :func:`topk_l2` row-for-row INCLUDING the exact integer dist2 —
      a wrong gather join, a lossy re-rank fold, or a tie-order drift
      all produce violations > 0;
    * DOMINANCE at a real operating point (kprime = 4k, nprobe = 2):
      the refined top-k's summed exact distance per query must be ≤
      the plain IVF-PQ top-k's EXACT distance sum for the same query
      (re-rank can only improve the exact metric over the same-or-
      smaller candidate pool; a refine stage that loses to its own
      shortlist stage is broken).

    Leg sharing (VERDICT r14 ask #4) stops at the persisted ``enc``:
    the dominance pin compares the refined and the plain retrievals as
    two INDEPENDENT paths over the same index, so their shortlists must
    not be shared — a reused shortlist would make "refine ≤ plain" true
    by construction and the pin vacuous. The exactness leg's ``full``
    (kprime=n) shortlist is the whole corpus and shares nothing with
    the operating-point legs by definition."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    n = emb.count()
    kcoarse = 4
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=kcoarse, m=4, kc=8, iters=1)
    enc = lifecycle.track(
        similarity.ivf_pq_encode(emb, cents, books).persist()
    )
    queries = emb.filter(F.col("vec_id") < 5)
    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    full = similarity.topk_ivf_pq_refine(
        emb, queries, cents, books, k=10, kprime=int(n), nprobe=kcoarse,
        encoded=enc,
    ).select(cols)
    l2 = similarity.topk_l2(emb, queries, k=10).select(cols)
    # one-pass exactness verdict (r15): see _verdict_sym_diff — full
    # and l2 evaluate once instead of 3x/2x across the anti-join arms
    # and the found probe
    v1 = _verdict_sym_diff(full, l2, cols)
    refined = similarity.topk_ivf_pq_refine(
        emb, queries, cents, books, k=10, kprime=40, nprobe=2, encoded=enc
    )
    plain = similarity.topk_ivf_pq(
        enc, queries, cents, books, k=10, nprobe=2, candidates_encoded=True
    )
    # exact integer distance of the PLAIN ranking's picks (its own dist2
    # is the ADC approximation, not comparable): re-score via the same
    # zip_with fold topk_l2 plans
    qv = queries.select(
        F.col("vec_id").cast("long").alias("query_id"),
        similarity._int_vec("embedding").alias("_q"),
    )
    cv = emb.select(
        F.col("vec_id").cast("long").alias("neighbor_id"),
        similarity._int_vec("embedding").alias("_c"),
    )
    exact_d2 = F.aggregate(
        F.zip_with(F.col("_q"), F.col("_c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

    def exact_sum(picks):
        return (
            picks.select("query_id", "neighbor_id")
            .join(F.broadcast(qv), "query_id")
            .join(cv, "neighbor_id")
            .select("query_id", exact_d2.alias("_d2"))
            .groupBy("query_id")
            .agg(F.sum("_d2").alias("s"))
        )
    worse = (
        exact_sum(refined).withColumnRenamed("s", "s_ref")
        .join(exact_sum(plain).withColumnRenamed("s", "s_plain"), "query_id")
        .filter(F.col("s_ref") > F.col("s_plain"))
    )
    return (
        v1.withColumnRenamed("violations", "_v1")
        .crossJoin(worse.agg(F.count("*").alias("_v2")))
        .select(
            (F.col("_v1") + F.col("_v2")).alias("violations"), "found_hits"
        )
    )


_REFINE_SQL = "SELECT CAST(0 AS BIGINT) AS violations, TRUE AS found_hits"


def _streaming_ann_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming two-stage retrieval (E3 × streaming, r14): a stream of
    query vectors runs the REFINED serving shape per micro-batch —
    streaming/jobs.ann_enrich_stream with ``refine_with`` set routes
    each batch through operators/similarity.topk_ivf_pq_refine (ADC
    shortlist from the static pre-encoded index, exact integer re-rank
    against the raw vector table), so streamed dist2 is the EXACT L2,
    not the ADC approximation. One staged file ⇒ one availableNow
    micro-batch ⇒ the streamed neighbor table must equal the batch
    refine over the same query set ROW-FOR-ROW including the exact
    integer dist2 — the derived-oracle verdict row. Drift classes this
    pins: a per-batch re-fit (index must stay static), the refine
    stage silently falling back to the ADC ranking, replay duplicates
    escaping the per-batch overwrite, and a gather join keyed on the
    wrong id domain."""
    import os
    import tempfile

    from sids_data_pipeline_spark.schemas import TABLE_SCHEMAS
    from sids_data_pipeline_spark.streaming.jobs import ann_enrich_stream

    work = tempfile.mkdtemp(prefix="sdp_stream_ann_ref_")
    (emb,) = tables(spark, sf_dir, "embeddings")
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=4, m=4, kc=8, iters=1)
    enc = lifecycle.track(
        similarity.ivf_pq_encode(emb, cents, books).persist()
    )
    src = os.path.join(work, "src")
    emb.filter(F.col("vec_id") < 5).repartition(1).write.parquet(src)
    qstream = spark.readStream.schema(TABLE_SCHEMAS["embeddings"]).parquet(src)
    out = os.path.join(work, "out")
    ann_enrich_stream(
        qstream, enc, cents, books, out, os.path.join(work, "ckpt"),
        k=10, nprobe=2, refine_with=emb, kprime=40,
    )
    cols = ["query_id", "neighbor_id", "dist2", "rank"]
    streamed = spark.read.parquet(os.path.join(out, "rows")).select(cols)
    batch = similarity.topk_ivf_pq_refine(
        emb, emb.filter(F.col("vec_id") < 5), cents, books,
        k=10, kprime=40, nprobe=2, encoded=enc,
    ).select(cols)
    # one-pass verdict (r15): see _verdict_sym_diff — the batch replay
    # leg evaluates once instead of per anti-join arm
    return _verdict_sym_diff(streamed, batch, cols)


_STREAM_ANN_REFINE_SQL = (
    "SELECT CAST(0 AS BIGINT) AS violations, TRUE AS found_hits"
)


def _similarity_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute-filtered vector search (E3, late r14) — the production
    shape every vector store names "filtered search" / "pre-filtering"
    (FAISS IDSelector, pgvector WHERE + index scan): ONE static shared
    index serves per-request predicates. The index is fit and encoded
    ONCE over the full corpus (similarity.ivf_pq_fit/ivf_pq_encode —
    the at-ingest step); at query time the predicate is a plain
    DataFrame filter on the (id, cell, codes) CODE table — pushed down
    before the probe equi-join, so filtered-out candidates are never
    ADC-scored and never gathered — and topk_ivf_pq_refine re-ranks the
    survivors exactly against the raw vectors. No second index, no
    post-hoc result trimming (which under-fills k when the filter is
    selective — the classic filtered-ANN bug this entry pins against).

    Run at the degenerate depth (kprime = |filtered codes|, every cell
    probed) the composition must equal the independent exact filtered
    top-k — which IS SQL-expressible, so unlike the sibling E3 gates
    this entry carries a FULL DuckDB value-hash oracle over the whole
    encode → filter → probe → gather → re-rank machinery: dist2 is the
    exact integer micros L2, ties by neighbor_id, self-matches excluded
    (similarity.py:1197), queries need not satisfy the predicate."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    kcoarse = 4
    cents, books = similarity.ivf_pq_fit(emb, kcoarse=kcoarse, m=4, kc=8, iters=1)
    enc = lifecycle.track(
        similarity.ivf_pq_encode(emb, cents, books).persist()
    )
    # query-time attribute predicate, applied to the code table only
    encf = enc.filter(F.col("vec_id") % 3 != 0)
    nf = encf.count()
    return similarity.topk_ivf_pq_refine(
        emb, queries, cents, books, k=10, kprime=int(nf), nprobe=kcoarse,
        encoded=encf,
    )


_FILTERED_SEARCH_SQL = f"""
WITH {_EMBED_VEC_SQL},
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(q.v) + 1),
                                      i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS BIGINT) AS dist2
  FROM m q JOIN m c
    ON q.vec_id < 5 AND c.vec_id % 3 <> 0 AND c.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, neighbor_id, dist2,
         CAST(ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY dist2 ASC, neighbor_id ASC) AS INT) AS rank
  FROM s
)
SELECT query_id, neighbor_id, dist2, rank FROM r WHERE rank <= 10
"""


def _dedup_ml_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive signal for the pyspark.ml MinHashLSH sketch
    (dedup_minhash_ml is rows-only by nature): every sketch pair must
    verify against the md5-family EXACT shingle Jaccard at the same
    threshold (that operator's full pipeline is hash-verified by
    dedup_minhash_lsh). Sketch pairs are candidates-with-exact-distance
    by construction (approxSimilarityJoin's distCol is the true vector
    Jaccard), so disagreement means the shingle domains diverged — the
    bug class this gate pins. Output (violations=0, found_pairs=true)."""
    (docs,) = tables(spark, sf_dir, "documents")
    thr = 0.3
    # NOT persisted (r15, measured): the sketch is referenced twice
    # (exact verification input + the one-pass verdict), but the ml
    # fits run eagerly once either way and replaying the
    # approxSimilarityJoin costs less than the cache barriers
    # (interleaved A/B: persist+2refs ~6.1 s vs replay ~5 s)
    sketch = dedup.near_duplicates_minhash_ml(docs, threshold=thr)
    sh = dedup.shingles(docs, 3).withColumnRenamed("shingle", "token")
    exact = dedup.jaccard_on_pairs(sh, sketch.select("id1", "id2"))
    ok = exact.filter(F.col("jaccard") >= thr - 1e-9).select("id1", "id2")
    # one-pass verdict (r15): see _verdict_missing — replaces the
    # anti-join + separate found probe (a third sketch reference)
    return _verdict_missing(
        sketch, ok, ["id1", "id2"], found_alias="found_pairs"
    )


_ML_GATE_SQL = "SELECT CAST(0 AS BIGINT) AS violations, TRUE AS found_pairs"


# --- E5: text analysis -------------------------------------------------------------


def _text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return text.token_stats(docs)


_TOKEN_STATS_SQL = rf"""
WITH t AS (
  SELECT doc_id, text, lower(text) AS lt,
         len(list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS n_words
  FROM documents
)
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       CAST(n_words AS INT) AS n_words,
       CAST(len(regexp_extract_all(lt, '{text.BPE_REGEX}')) AS INT) AS n_tokens,
       CASE WHEN n_words > 0
            THEN CAST(ROUND(CAST(length(regexp_replace(text, '[ \t\n\x0B\f\r]+', '', 'g')) AS DOUBLE) / n_words * 1000000) AS BIGINT)
            ELSE NULL END AS avg_word_len_micros
FROM t
"""


def _text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return text.quality_score(docs)


def _text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return text.repetition_stats(docs)


# Same exploded shape; fractions mirror the Spark formulation exactly
# (integer numerator × 1e6, one double division, ROUND).
_REPETITION_SQL = r"""
WITH w AS (
  SELECT doc_id, unnest(list_filter(
           regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS word
  FROM documents
), pw AS (
  SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY doc_id, word
)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_words,
       COUNT(*) AS n_distinct,
       CAST(ROUND((SUM(n) - COUNT(*)) * 1000000.0 / SUM(n)) AS BIGINT)
         AS dup_word_frac_micros,
       CAST(ROUND(MAX(n) * 1000000.0 / SUM(n)) AS BIGINT)
         AS top_word_frac_micros
FROM pw GROUP BY doc_id
"""


def _quality_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in text.STOPWORDS["en"])
    return rf"""
WITH t AS (
  SELECT doc_id, text, lower(text) AS lt,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
r AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars,
         CASE WHEN length(text) > 0
              THEN CAST(ROUND(CAST(len(regexp_extract_all(lt, '[^a-z0-9 \t\n\x0B\f\r]')) AS DOUBLE)
                         / length(text) * 1000000) AS BIGINT) END AS punct_ratio_micros,
         CASE WHEN len(words) > 0
              THEN CAST(ROUND(CAST(len(list_filter(words, x -> x IN ({stops}))) AS DOUBLE)
                         / len(words) * 1000000) AS BIGINT) END AS stopword_ratio_micros,
         CASE WHEN length(text) > 0
              THEN CAST(ROUND(CAST(len(regexp_extract_all(lt, '[0-9]')) AS DOUBLE)
                         / length(text) * 1000000) AS BIGINT) END AS digit_ratio_micros
  FROM t
)
SELECT doc_id, n_chars, punct_ratio_micros, stopword_ratio_micros, digit_ratio_micros,
       CASE WHEN n_chars < 20 THEN 'too_short'
            WHEN punct_ratio_micros > 300000 THEN 'too_punct'
            WHEN stopword_ratio_micros >= 40000 THEN 'good'
            ELSE 'low_stopword' END AS quality_bucket
FROM r
"""


def _text_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return text.gopher_rules(docs)


def _gopher_sql() -> str:
    req = " + ".join(
        f"CAST(list_contains(words, '{w}') AS INT)"
        for w in text.GOPHER_REQUIRED_WORDS
    )
    # mirrors gopher_rules term for term; DuckDB regexp_replace needs
    # the explicit 'g' flag where Spark replaces all matches by default
    return rf"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS words,
         list_filter(
           list_transform(regexp_split_to_array(text, '\r?\n'),
                          l -> regexp_replace(l, '^[ \t]+|[ \t]+$', '', 'g')),
           l -> l <> '') AS lines
  FROM documents
),
r AS (
  SELECT doc_id,
         len(words) AS n_words,
         len(lines) AS n_lines,
         length(regexp_replace(text, '[ \t\n\x0B\f\r]+', '', 'g')) AS n_nonws,
         len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '\.\.\.')) AS n_sym,
         len(list_filter(lines, l -> regexp_matches(l, '^[-*•]'))) AS n_bullet,
         len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)$'))) AS n_ell,
         len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
         {req} AS n_required
  FROM t
),
m AS (
  SELECT doc_id, n_words, n_required,
         CASE WHEN n_words > 0 THEN CAST(ROUND(CAST(n_nonws AS DOUBLE) / n_words * 1000000) AS BIGINT) END AS mean_word_len_micros,
         CASE WHEN n_words > 0 THEN CAST(ROUND(CAST(n_sym AS DOUBLE) / n_words * 1000000) AS BIGINT) END AS symbol_ratio_micros,
         CASE WHEN n_lines > 0 THEN CAST(ROUND(CAST(n_bullet AS DOUBLE) / n_lines * 1000000) AS BIGINT) END AS bullet_line_frac_micros,
         CASE WHEN n_lines > 0 THEN CAST(ROUND(CAST(n_ell AS DOUBLE) / n_lines * 1000000) AS BIGINT) END AS ellipsis_line_frac_micros,
         CASE WHEN n_words > 0 THEN CAST(ROUND(CAST(n_alpha AS DOUBLE) / n_words * 1000000) AS BIGINT) END AS alpha_word_frac_micros
  FROM r
)
SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len_micros,
       symbol_ratio_micros, bullet_line_frac_micros,
       ellipsis_line_frac_micros, alpha_word_frac_micros,
       CAST(n_required AS INT) AS n_required_words,
       COALESCE(n_words BETWEEN 50 AND 100000
                AND mean_word_len_micros BETWEEN 3000000 AND 10000000
                AND symbol_ratio_micros <= 100000
                AND bullet_line_frac_micros <= 900000
                AND ellipsis_line_frac_micros <= 300000
                AND alpha_word_frac_micros >= 800000
                AND n_required >= 2, FALSE) AS keep
FROM m
"""


def _text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return text.language_id(docs)


def _langid_sql() -> str:
    score = {
        lang: f"len(list_filter(words, x -> x IN ({', '.join(chr(39) + s + chr(39) for s in stops)})))"
        for lang, stops in text.STOPWORDS.items()
    }
    return rf"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
s AS (
  SELECT doc_id, lang,
         {score['de']} AS s_de, {score['en']} AS s_en,
         {score['es']} AS s_es, {score['fr']} AS s_fr
  FROM t
)
SELECT doc_id, lang,
       CASE WHEN s_de > greatest(0, s_fr, s_es, s_en) THEN 'de'
            WHEN s_en > greatest(0, s_fr, s_es) THEN 'en'
            WHEN s_es > greatest(0, s_fr) THEN 'es'
            WHEN s_fr > 0 THEN 'fr'
            ELSE 'und' END AS predicted_lang
FROM s
"""


_WINNOW_K, _WINNOW_W = 8, 4


def _text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return text.winnowing_fingerprints(docs, k=_WINNOW_K, w=_WINNOW_W)


def _winnowing_sql() -> str:
    k, w = _WINNOW_K, _WINNOW_W
    mod, base = text.WINNOW_MOD, text.WINNOW_BASE
    terms = " + ".join(
        f"(CAST(ascii(substr(_t, i + {j}, 1)) AS BIGINT) "
        f"* {pow(base, k - 1 - j, mod)}) % {mod}"
        for j in range(k)
    )
    return f"""
WITH t AS (
  SELECT doc_id, lower(text) AS _t FROM documents
  WHERE length(lower(text)) >= {k + w - 1}
),
h AS (
  SELECT doc_id,
         list_transform(range(1, length(_t) - {k - 1} + 1),
                        i -> ({terms}) % {mod}) AS hs
  FROM t
),
m AS (
  SELECT doc_id,
         list_transform(range(1, len(hs) - {w - 1} + 1),
                        i -> list_min(hs[i : i + {w - 1}])) AS ms
  FROM h
)
SELECT DISTINCT doc_id, f.f AS fingerprint FROM m, unnest(ms) AS f(f)
"""


def _text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return text.fingerprint(docs)


_FINGERPRINT_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm
  FROM documents
),
w AS (SELECT doc_id, norm, string_split(norm, ' ') AS ws FROM t)
SELECT doc_id, md5(norm) AS md5_fp,
       list_min(list_transform(
         list_transform(range(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
         s -> {o_token_hash32('s')})) AS min_shingle_hash
FROM w
"""


# --- E6: event-time windows ----------------------------------------------------

_TEN_MIN_US = 600_000_000
_GAP_US = 1_800_000_000  # 30 minutes


def _events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    return windows.tumbling(ev, "10 minutes")


_TUMBLING_SQL = f"""
SELECT (epoch_us(ts) // {_TEN_MIN_US}) * {_TEN_MIN_US} AS window_start_us,
       (epoch_us(ts) // {_TEN_MIN_US}) * {_TEN_MIN_US} + {_TEN_MIN_US} AS window_end_us,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY 1, 2, 3
"""


def _events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    return windows.sliding(ev, "30 minutes", "10 minutes")


_SLIDING_SQL = f"""
WITH e AS (
  SELECT event_type,
         ((epoch_us(ts) // {_TEN_MIN_US}) - t.k) * {_TEN_MIN_US} AS window_start_us
  FROM events, unnest(range(3)) AS t(k)
)
SELECT window_start_us,
       window_start_us + 3 * {_TEN_MIN_US} AS window_end_us,
       event_type, COUNT(*) AS n_events
FROM e GROUP BY 1, 2, 3
"""


def _events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    return windows.session(ev, "30 minutes")


_SESSION_SQL = f"""
WITH e AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) + {_GAP_US} AS session_end_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM s GROUP BY user_id, sid
"""


def _join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # backward is the default direction — one body for all three
    # directions lives in _asof_directional below
    return _asof_directional(spark, sf_dir, "backward")


_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
p0 AS (
  SELECT user_id, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
),
purch AS (SELECT user_id, ts, event_id, value FROM p0 WHERE rn = 1)
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
       p.event_id AS purchase_event_id,
       CAST(ROUND(p.value * 100) AS BIGINT) AS purchase_cents
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def _asof_directional(spark: SparkSession, sf_dir: str, direction: str) -> DataFrame:
    from sids_data_pipeline_spark.operators.asof import asof_join, dedupe_right

    (ev,) = tables(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = dedupe_right(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        ),
        by="user_id",
        ts_col="ts",
        tiebreak="event_id",
    )
    out = asof_join(
        clicks,
        purchases,
        by="user_id",
        ts_col="ts",
        right_cols=("event_id", "value"),
        direction=direction,
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id_right").alias("purchase_event_id"),
        F.round(F.col("value_right") * 100, 0).cast("long").alias("purchase_cents"),
    )


def _join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click attaches the EARLIEST purchase at or
    after it (same one-shuffle union+window strategy, leading frame)."""
    return _asof_directional(spark, sf_dir, "forward")


def _join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: closer of the backward/forward matches, ties
    backward (pandas rule). Both window lookups share one shuffle."""
    return _asof_directional(spark, sf_dir, "nearest")


_ASOF_CTES = """
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
p0 AS (
  SELECT user_id, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
),
purch AS (SELECT user_id, ts, event_id, value FROM p0 WHERE rn = 1)
"""

_ASOF_FWD_SQL = f"""
WITH {_ASOF_CTES.strip()}
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
       p.event_id AS purchase_event_id,
       CAST(ROUND(p.value * 100) AS BIGINT) AS purchase_cents
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""

_ASOF_NEAREST_SQL = f"""
WITH {_ASOF_CTES.strip()},
b AS (
  SELECT c.event_id, p.event_id AS pid, p.value AS pv, p.ts AS pts
  FROM clicks c ASOF LEFT JOIN purch p
    ON c.user_id = p.user_id AND c.ts >= p.ts
),
f AS (
  SELECT c.event_id, p.event_id AS pid, p.value AS pv, p.ts AS pts
  FROM clicks c ASOF LEFT JOIN purch p
    ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
       CASE WHEN b.pid IS NULL THEN f.pid
            WHEN f.pid IS NULL THEN b.pid
            WHEN epoch_us(c.ts) - epoch_us(b.pts)
                 <= epoch_us(f.pts) - epoch_us(c.ts) THEN b.pid
            ELSE f.pid END AS purchase_event_id,
       CAST(ROUND(CASE WHEN b.pid IS NULL THEN f.pv
                       WHEN f.pid IS NULL THEN b.pv
                       WHEN epoch_us(c.ts) - epoch_us(b.pts)
                            <= epoch_us(f.pts) - epoch_us(c.ts) THEN b.pv
                       ELSE f.pv END * 100) AS BIGINT) AS purchase_cents
FROM clicks c
JOIN b ON b.event_id = c.event_id
JOIN f ON f.event_id = c.event_id
"""


def _events_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    return windows.latest_per_key(ev)


_LATEST_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def _events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    return windows.funnel(ev)


def _events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    return windows.retention(ev)


# FLOOR(days/7.0) mirrors the Spark formulation (double division then
# floor) so week assignment is bit-identical in both engines.
_RETENTION_SQL = """
WITH p AS (SELECT DISTINCT user_id,
        CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week
      FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, min(week) AS cohort_week FROM p GROUP BY user_id)
SELECT c.cohort_week, p.week - c.cohort_week AS week_offset,
       COUNT(*) AS n_users
FROM p JOIN c ON p.user_id = c.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    return windows.event_transitions(ev)


_EVENTS_TRANSITIONS_SQL = """
WITH p AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM p WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(ROUND(CAST(n AS DOUBLE) * 1000000 / (SELECT SUM(n) FROM c))
            AS BIGINT) AS share_ppm
FROM c ORDER BY from_type, to_type
"""


def _events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the events' semi-structured ``props`` JSON
    column: extraction stays JVM-side (``get_json_object``, no UDF, no
    pre-parse materialization), so the whole plan is one scan + one
    map-side-combined aggregation — the shape that survives a 100 TB
    event lake where the JSON schema drifts per producer."""
    (ev,) = tables(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_EVENTS_PROPS_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# Value-mirrored oracle: the engine's single-pass greedy scan equals this
# min-timestamp cascade (first view anchors; first click within 48 h of
# it; first purchase within 48 h of that click), because taking the
# earliest feasible event at each stage is optimal for reachability.
_FUNNEL_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL 48 HOUR GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL 48 HOUR GROUP BY e.user_id)
SELECT depth, COUNT(*) AS n_users FROM (
  SELECT u.user_id,
         CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                   WHEN c.user_id IS NOT NULL THEN 2
                   WHEN v.user_id IS NOT NULL THEN 1
                   ELSE 0 END AS INT) AS depth
  FROM u LEFT JOIN v ON u.user_id = v.user_id
         LEFT JOIN c ON u.user_id = c.user_id
         LEFT JOIN p ON u.user_id = p.user_id) t
GROUP BY depth ORDER BY depth
"""


# --- E4: multimodal columns -----------------------------------------------------


def _multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    assets = multimodal.documents_to_assets(docs)
    return assets.select(
        "asset_id",
        "modality",
        F.col("meta.mime").alias("mime"),
        F.octet_length("payload").alias("n_bytes"),
    )


_MODALITY_SQL = "(['image','audio','video','text'])[(doc_id % 4) + 1]"

_MULTIMODAL_META_SQL = f"""
SELECT doc_id AS asset_id,
       {_MODALITY_SQL} AS modality,
       'application/x-' || {_MODALITY_SQL} AS mime,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes
FROM documents
"""


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.documents_to_assets(docs))


_MULTIMODAL_FEATURES_SQL = f"""
WITH a AS (
  SELECT doc_id AS asset_id,
         {_MODALITY_SQL} AS modality,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         md5(text) AS checksum
  FROM documents
)
SELECT asset_id, modality, n_bytes,
       n_bytes % 640 AS width,
       (n_bytes * 7) % 480 AS height,
       n_bytes % 24 + 1 AS n_frames,
       checksum
FROM a
"""


def _multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG codec round trip (E4): synthesize deterministic PNGs
    executor-side (imagecodec.png_encode, scanline filter cycling over
    all five RFC 2083 filters), then fully decode them
    (multimodal.decode_images: CRC-checked chunk walk, zlib inflate,
    per-scanline unfilter) and return the recovered dims plus the sum of
    every decoded sample. The oracle recomputes dims and pixel sums from
    the closed-form synth formula — a header parse can fake width and
    height, it cannot fake pixel_sum."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.decode_images(multimodal.synth_png_assets(docs, modulus=7))


# synth formula (imagecodec.synth_image): sample(x,y,c) =
# (7·doc_id + 3x + 5y + 11c) mod 256; dims/channels are doc_id mod-forms.
# range() can't take lateral column bounds in DuckDB, so the oracle cross
# joins the max envelope (32×15×4) and filters — 500 docs × 1920 cells.
_MULTIMODAL_DECODE_PNG_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 29 + 4 AS w, doc_id % 13 + 3 AS h, doc_id % 4 + 1 AS c
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id AS asset_id, 'png' AS format,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height, CAST(c AS INT) AS channels,
       CAST(SUM((doc_id*7 + 3*x.i + 5*y.i + 11*ch.i) % 256) AS BIGINT) AS pixel_sum
FROM d, range(32) x(i), range(15) y(i), range(4) ch(i)
WHERE x.i < w AND y.i < h AND ch.i < c
GROUP BY doc_id, w, h, c
"""


_RESIZE_W, _RESIZE_H = 6, 5


def _multimodal_resize_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real resample gate (E4): synth PNG → resize_images (decode →
    nearest-neighbor floor index map → re-encode) → decode_images. The
    oracle reproduces the floor map in integer SQL, so every resized
    pixel is value-verified through two full codec round trips."""
    (docs,) = tables(spark, sf_dir, "documents")
    resized = multimodal.resize_images(
        multimodal.synth_png_assets(docs, modulus=7), _RESIZE_W, _RESIZE_H
    )
    return multimodal.decode_images(resized)


_MULTIMODAL_RESIZE_PNG_SQL = f"""
WITH d AS (
  SELECT doc_id, doc_id % 29 + 4 AS w, doc_id % 13 + 3 AS h, doc_id % 4 + 1 AS c
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id AS asset_id, 'png' AS format,
       {_RESIZE_W} AS width, {_RESIZE_H} AS height, CAST(c AS INT) AS channels,
       CAST(SUM((doc_id*7 + 3*((x.i*w)//{_RESIZE_W}) + 5*((y.i*h)//{_RESIZE_H})
                 + 11*ch.i) % 256) AS BIGINT) AS pixel_sum
FROM d, range({_RESIZE_W}) x(i), range({_RESIZE_H}) y(i), range(4) ch(i)
WHERE ch.i < c
GROUP BY doc_id, w, h, c
"""


def _multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real baseline-JPEG codec round trip (E4): synthesize
    deterministic JPEGs executor-side (multimodal.synth_jpeg_assets —
    full FDCT + Huffman encode, half with restart markers), then fully
    decode them (multimodal.decode_images → imagecodec.jpeg_decode:
    Huffman walk from the file's own DHT, dequant, batched IDCT) and
    return the recovered dims plus the sum of every decoded sample.
    The fixture is 8×8-block-constant grayscale with all-ones quant
    tables, so the round trip is EXACT (DC-only blocks, zero
    quantization error) and the oracle recomputes dims and pixel sums
    from the closed form — a header parse can fake width and height,
    it cannot fake pixel_sum through a lossy-capable codec."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.decode_images(multimodal.synth_jpeg_assets(docs, modulus=7))


# synth formula (multimodal.synth_jpeg_assets): block value v(bx, by) =
# (7·doc_id + 29·bx + 31·by) mod 256 over wb = doc_id%4+1 × hb =
# doc_id%3+1 blocks of 64 px each → pixel_sum = 64·Σv.
_MULTIMODAL_DECODE_JPEG_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 4 + 1 AS wb, doc_id % 3 + 1 AS hb
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id AS asset_id, 'jpeg' AS format,
       CAST(8 * wb AS INT) AS width, CAST(8 * hb AS INT) AS height,
       CAST(1 AS INT) AS channels,
       CAST(64 * SUM((doc_id*7 + 29*bx.i + 31*by.i) % 256) AS BIGINT) AS pixel_sum
FROM d, range(4) bx(i), range(3) by(i)
WHERE bx.i < wb AND by.i < hb
GROUP BY doc_id, wb, hb
"""


def _multimodal_decode_jpeg_progressive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Progressive-JPEG codec round trip (E4, r12): synthesize
    deterministic SOF2 JPEGs executor-side (multimodal.synth_jpeg_assets
    with progressive=True — the full spectral-selection + successive-
    approximation scan ladder, half with restart markers), then fully
    decode them (imagecodec.jpeg_decode's T.81 Annex G scan loop: DC
    point transform + raw-bit refinement, per-band AC scans, EOB runs)
    and return the recovered dims plus the sum of every decoded sample.
    The fixture is DC-exact (block-constant, all-ones quant), so the
    multi-scan assembly must reconstruct the exact pixels — a header
    parse can fake width and height, it cannot fake pixel_sum through a
    ten-scan progressive stream. The AC first/refinement scan paths are
    additionally pinned by decode(progressive(x)) == decode(baseline(x))
    bit-equality on arbitrary content in tests/test_imagecodec.py."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.decode_images(
        multimodal.synth_jpeg_assets(docs, modulus=7, progressive=True)
    )


def _multimodal_exif_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF orientation extraction (E4, r12): synthesize JPEGs with a
    spliced APP1 TIFF segment (orientation = doc_id % 8 + 1, byte order
    II for odd ids / MM for even — both endian walks in-gate), then
    recover orientation + SOF dims through the marker walk
    (multimodal.exif_orientation → imagecodec.jpeg_exif). The oracle
    recomputes every field in closed form; a parser that ignored the
    TIFF byte order would flip the MM orientations (stored big-endian)
    and hash-mismatch."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.exif_orientation(
        multimodal.synth_jpeg_assets(docs, modulus=7, exif=True)
    )


_MULTIMODAL_EXIF_ORIENTATION_SQL = """
SELECT doc_id AS asset_id,
       TRUE AS has_exif,
       CAST(doc_id % 8 + 1 AS INT) AS orientation,
       CASE WHEN doc_id % 2 = 1 THEN 'II' ELSE 'MM' END AS byte_order,
       CAST(8 * (doc_id % 4 + 1) AS INT) AS width,
       CAST(8 * (doc_id % 3 + 1) AS INT) AS height
FROM documents WHERE doc_id % 7 = 0
"""


def _multimodal_decode_jpeg_multiscan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-scan sequential JPEG round trip (E4, r12): the gray
    fixture promoted to gray-as-RGB and written as THREE
    non-interleaved SOF0 scans (one per component — the layout some
    real encoders emit; 4:2:0 chroma on even ids, restart markers on
    even ids), then decoded through the sequential scan loop
    (per-component block grids, per-scan DC predictors) via
    decode_images. Exact: an R=G=B constant block's YCbCr lands within
    ~1e-13 of (v, 128, 128) and all-ones DC quantization rounds the
    epsilon away, so pixel_sum is exactly 3x the gray closed form."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.decode_images(
        multimodal.synth_jpeg_assets(docs, modulus=7, multiscan=True)
    )


_MULTIMODAL_DECODE_JPEG_MULTISCAN_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 4 + 1 AS wb, doc_id % 3 + 1 AS hb
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id AS asset_id, 'jpeg' AS format,
       CAST(8 * wb AS INT) AS width, CAST(8 * hb AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(3 * 64 * SUM((doc_id*7 + 29*bx.i + 31*by.i) % 256) AS BIGINT)
         AS pixel_sum
FROM d, range(4) bx(i), range(3) by(i)
WHERE bx.i < wb AND by.i < hb
GROUP BY doc_id, wb, hb
"""


def _multimodal_orientation_normalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXIF orientation NORMALIZATION (E4, r12): the EXIF-tagged JPEG
    fixtures (orientation = doc_id % 8 + 1, DC-exact pixels) decoded,
    transformed upright (mirror/rotate/transpose; 5–8 swap dims), and
    checksummed position-weighted: Σ v·(1 + 3x + 7y) over the UPRIGHT
    image. The oracle inverts each of the eight transforms in SQL
    (CASE maps of destination→source coordinates) and recomputes the
    weighted sum from the closed-form pixel formula — a plain sum is
    flip/rotation-invariant, so only this gate can prove the correct
    transform ran for every orientation value."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.normalize_orientation(
        multimodal.synth_jpeg_assets(docs, modulus=7, exif=True)
    )


# Inverse maps (dst (xp, yp) → src (sx, sy)) per EXIF orientation o over
# a w0 × h0 source; o ≥ 5 swaps the output dims. Derived from
# imagecodec.apply_exif_orientation and pinned by its unit tests.
_MULTIMODAL_ORIENTATION_NORMALIZE_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 8 + 1 AS o,
         8 * (doc_id % 4 + 1) AS w0, 8 * (doc_id % 3 + 1) AS h0
  FROM documents WHERE doc_id % 7 = 0
),
dims AS (
  SELECT *, CASE WHEN o >= 5 THEN h0 ELSE w0 END AS w1,
            CASE WHEN o >= 5 THEN w0 ELSE h0 END AS h1
  FROM d
),
px AS (
  SELECT doc_id, o, w0, h0, w1, h1, xp.v AS xp, yp.v AS yp,
         CASE o WHEN 1 THEN xp.v WHEN 2 THEN w0 - 1 - xp.v
                WHEN 3 THEN w0 - 1 - xp.v WHEN 4 THEN xp.v
                WHEN 5 THEN yp.v WHEN 6 THEN yp.v
                WHEN 7 THEN w0 - 1 - yp.v ELSE w0 - 1 - yp.v END AS sx,
         CASE o WHEN 1 THEN yp.v WHEN 2 THEN yp.v
                WHEN 3 THEN h0 - 1 - yp.v WHEN 4 THEN h0 - 1 - yp.v
                WHEN 5 THEN xp.v WHEN 6 THEN h0 - 1 - xp.v
                WHEN 7 THEN h0 - 1 - xp.v ELSE xp.v END AS sy
  FROM dims, range(32) xp(v), range(32) yp(v)
  WHERE xp.v < w1 AND yp.v < h1
)
SELECT doc_id AS asset_id, CAST(o AS INT) AS orientation,
       CAST(w1 AS INT) AS width, CAST(h1 AS INT) AS height,
       CAST(SUM(((doc_id*7 + 29*(sx//8) + 31*(sy//8)) % 256)
                * (1 + 3*xp + 7*yp)) AS BIGINT) AS weighted_sum
FROM px GROUP BY doc_id, o, w1, h1
"""


def _multimodal_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-TIFF image decode (E4, r12): camera/scan TIFFs ride the
    GeoTIFF container, so decode_images routes them through the
    pure-numpy codec (sources/geotiff.py — strips, chunky layout,
    raw/deflate/PackBits/LZW all cycled in-gate) and verifies dims plus
    the decoded sample sum against the closed form — four independent
    decompressors feed one pixel oracle."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.decode_images(
        multimodal.synth_tiff_assets(docs, modulus=7)
    )


# synth formula (multimodal.synth_tiff_assets): v(b, x, y) =
# (5·doc_id + 11b + 3x + 7y) mod 256 over bands = doc_id%3+1,
# w = doc_id%13+2, h = doc_id%7+2.
_MULTIMODAL_DECODE_TIFF_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 3 + 1 AS nb, doc_id % 13 + 2 AS w,
         doc_id % 7 + 2 AS h
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id AS asset_id, 'tiff' AS format,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(nb AS INT) AS channels,
       CAST(SUM((doc_id*5 + 11*b.v + 3*x.v + 7*y.v) % 256) AS BIGINT)
         AS pixel_sum
FROM d, range(3) b(v), range(15) x(v), range(9) y(v)
WHERE b.v < nb AND x.v < w AND y.v < h
GROUP BY doc_id, nb, w, h
"""


def _multimodal_decode_bmp_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLE8 BMP codec round trip (E4, r12): synthesize BI_RLE8
    compressed BMPs executor-side (run-length coded index planes,
    identity palette), decode them through the full RLE op set
    (imagecodec._bmp_rle8_decode: encoded runs, EOL/EOB escapes) via
    decode_images, and verify dims plus the decoded pixel sum against
    the closed form — a header parse can fake dims, it cannot fake the
    sum through a run-length stream whose rows all differ."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.decode_images(
        multimodal.synth_bmp_rle_assets(docs, modulus=7)
    )


# synth formula (multimodal.synth_bmp_rle_assets): idx(x, y) =
# (doc_id + x//3 + 5y) mod 256 over w = doc_id%21+2 x h = doc_id%9+2,
# identity palette -> 1-channel gray, pixel_sum = Σ idx.
_MULTIMODAL_DECODE_BMP_RLE_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 21 + 2 AS w, doc_id % 9 + 2 AS h
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id AS asset_id, 'bmp' AS format,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(1 AS INT) AS channels,
       CAST(SUM((doc_id + x.v // 3 + 5 * y.v) % 256) AS BIGINT) AS pixel_sum
FROM d, range(23) x(v), range(11) y(v)
WHERE x.v < w AND y.v < h
GROUP BY doc_id, w, h
"""


def _multimodal_decode_png_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palette + Adam7 PNG round trip (E4, r11): synthesize
    Adam7-INTERLACED color-type-3 PNGs executor-side (depth 4/8 cycling,
    closed-form indices and palette), decode them through the per-pass
    unfilter core + PLTE expansion and verify the decoded RGB pixel sum
    against the SQL closed form — interlacing can fake nothing (the
    passes must reassemble exactly) and a header parse cannot produce
    the palette-expanded sum."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.decode_images(
        multimodal.synth_png_indexed_assets(docs, modulus=7)
    )


# synth formula (multimodal.synth_png_indexed_assets): idx(x,y) =
# (doc_id + 2x + 3y) mod n over w = doc_id%21+2 x h = doc_id%9+2,
# n = 16 (depth 4, even ids) or 256 (depth 8); palette[i] =
# ((3i+1)%256, (5i+2)%256, (7i+3)%256).
_MULTIMODAL_DECODE_PNG_PALETTE_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 21 + 2 AS w, doc_id % 9 + 2 AS h,
         CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 256 END AS n
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id AS asset_id, 'png' AS format,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(SUM(
           (3 * ((doc_id + 2*x.v + 3*y.v) % n) + 1) % 256
         + (5 * ((doc_id + 2*x.v + 3*y.v) % n) + 2) % 256
         + (7 * ((doc_id + 2*x.v + 3*y.v) % n) + 3) % 256
       ) AS BIGINT) AS pixel_sum
FROM d, range(22) x(v), range(10) y(v)
WHERE x.v < w AND y.v < h
GROUP BY doc_id, w, h
"""


def _multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV codec round trip (E4 audio): synthesize deterministic
    PCM16 WAVs executor-side, decode them back (RIFF chunk walk +
    interleaved int16 payload) and return shape, duration AND the sum
    of every decoded sample — the header can't fake the sum."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.decode_audio(multimodal.synth_wav_assets(docs, modulus=7))


# synth formula (multimodal.synth_wav_assets): sample(i, c) =
# (31·doc_id + 7i + 13c) mod 65536 − 32768 over n = doc_id%50+10
# samples × ch = doc_id%2+1 channels at 8 kHz.
_MULTIMODAL_DECODE_WAV_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 50 + 10 AS n, doc_id % 2 + 1 AS ch
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id AS asset_id,
       8000 AS sample_rate,
       CAST(ch AS INT) AS channels,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
       CAST(SUM((doc_id*31 + 7*i.v + 13*c.v) % 65536 - 32768) AS BIGINT) AS sample_sum
FROM d, range(60) i(v), range(2) c(v)
WHERE i.v < n AND c.v < ch
GROUP BY doc_id, n, ch
"""


def _multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio quality gating (E4/E5 crossover, r11; float + PCM8 +
    extensible paths r12): energy (sum-of-squares), peak, per-channel
    zero-crossing flips and rail-clipping counts over the deterministic
    WAV fixtures. The fixture mixes THREE sample formats — every third
    fixture is an IEEE-float32 WAV whose samples are exact multiples of
    2⁻²⁰ (the operator's Q20 quantization recovers the integer grid
    exactly), odd ids are unsigned PCM8 (offset-128 rails at +127/−128;
    every fourth wrapped in a WAVE_FORMAT_EXTENSIBLE container, which
    must decode identically), the rest PCM16 — so every output stays an
    exact integer, recomputed term-for-term by the SQL oracle (LAG over
    the sample grid for the sign flips; zero float math on either
    side)."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.audio_features(
        multimodal.synth_wav_assets(
            docs, modulus=7, float_every=3, pcm8_odd=True
        )
    )


_MULTIMODAL_AUDIO_FEATURES_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 50 + 10 AS n, doc_id % 2 + 1 AS ch,
         (doc_id % 21 = 0) AS isf,
         (doc_id % 21 <> 0 AND doc_id % 2 = 1) AS is8
  FROM documents WHERE doc_id % 7 = 0
),
s AS (
  SELECT doc_id, n, ch, isf, is8, i.v AS i, c.v AS c,
         CASE WHEN isf
              THEN (doc_id*31 + 7*i.v + 13*c.v) % 2097153 - 1048576
              WHEN is8
              THEN (doc_id*31 + 7*i.v + 13*c.v) % 256 - 128
              ELSE (doc_id*31 + 7*i.v + 13*c.v) % 65536 - 32768
         END AS smp
  FROM d, range(60) i(v), range(2) c(v)
  WHERE i.v < n AND c.v < ch
),
f AS (
  SELECT *, LAG(smp) OVER (PARTITION BY doc_id, c ORDER BY i) AS prev
  FROM s
)
SELECT doc_id AS asset_id,
       CAST(CASE WHEN isf THEN 16000 WHEN is8 THEN 11025
            ELSE 8000 END AS INT) AS sample_rate,
       CAST(ch AS INT) AS channels,
       CAST(n AS BIGINT) AS n_samples,
       CAST(SUM(smp * smp) AS BIGINT) AS sum_sq,
       CAST(MAX(ABS(smp)) AS BIGINT) AS peak_abs,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND prev * smp < 0
                THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(SUM(CASE WHEN (isf AND ABS(smp) >= 1048576)
                      OR (is8 AND smp IN (127, -128))
                      OR (NOT isf AND NOT is8
                          AND smp IN (32767, -32768))
                THEN 1 ELSE 0 END) AS BIGINT) AS clipped_count
FROM f GROUP BY doc_id, n, ch, isf, is8
"""


def _multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real animated-GIF codec round trip (E4 video): synthesize
    deterministic multi-frame GIFs executor-side (LZW-encoded), decode
    them back through the dictionary decoder + frame compositor
    (multimodal.decode_video, one output row per frame) and verify
    per-frame RGB sums against the closed-form oracle — the header can
    fake dims and frame count, it cannot fake composited pixel sums."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.decode_video(multimodal.synth_gif_assets(docs, modulus=7))


# synth formula (multimodal.synth_gif_assets): index(f, x, y) =
# (13·doc_id + 17f + 3x + 5y) mod 256 over w = doc_id%21+4,
# h = doc_id%11+3, n_frames = doc_id%5+2; identity-grayscale palette
# → each RGB sample equals the index, so pixel_sum = 3 × Σ index.
_MULTIMODAL_DECODE_GIF_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 21 + 4 AS w, doc_id % 11 + 3 AS h,
         doc_id % 5 + 2 AS nf
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id AS asset_id,
       CAST(f.v AS INT) AS frame_index,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(3 * SUM((doc_id*13 + 17*f.v + 3*x.v + 5*y.v) % 256) AS BIGINT)
         AS pixel_sum
FROM d, range(6) f(v), range(24) x(v), range(13) y(v)
WHERE f.v < nf AND x.v < w AND y.v < h
GROUP BY doc_id, f.v, w, h
"""


def _multimodal_gif_disposal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF disposal-method compositing gate (E4): four-frame fixtures
    where f1 disposes restore-to-background (its inner rect clears, the
    border ring keeps f0) and f2 disposes restore-to-previous (the
    canvas reverts before f3). The oracle recomputes each composited
    frame as a CASE expression over (x, y) — a keep-only compositor
    gets f2/f3 wrong, a clear-everything compositor gets the ring
    wrong, so the pinned sums prove the rect-scoped disposal
    semantics."""
    (docs,) = tables(spark, sf_dir, "documents")
    return multimodal.decode_video(
        multimodal.synth_gif_disposal_assets(docs, modulus=7)
    )


# synth (multimodal.synth_gif_disposal_assets): v_k(x,y) = (13·doc_id
# + 17k + 3x + 5y) mod 256 frame-local; background = index 0 = black.
# pre(x,y) = the post-f1-disposal canvas: f0 on the border ring, 0 in
# the cleared inner rect. Composites: f0 = v0; f1 = v1 inside the inner
# rect (frame-local coords), ring keeps v0; f2 = v2 on the 2×2 corner
# over pre; f3 = v3 on the top row over pre (f2 reverted).
_MULTIMODAL_GIF_DISPOSAL_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 21 + 4 AS w, doc_id % 11 + 3 AS h
  FROM documents WHERE doc_id % 7 = 0
),
px AS (
  SELECT doc_id, w, h, f.v AS fi, x.v AS x, y.v AS y,
         (doc_id*13 + 3*x.v + 5*y.v) % 256 AS v0,
         CASE WHEN x.v BETWEEN 1 AND w-2 AND y.v BETWEEN 1 AND h-2
              THEN 0 ELSE (doc_id*13 + 3*x.v + 5*y.v) % 256 END AS pre
  FROM d, range(4) f(v), range(24) x(v), range(13) y(v)
  WHERE x.v < w AND y.v < h
)
SELECT doc_id AS asset_id, CAST(fi AS INT) AS frame_index,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(3 * SUM(CASE
         WHEN fi = 0 THEN v0
         WHEN fi = 1 THEN CASE
           WHEN x BETWEEN 1 AND w-2 AND y BETWEEN 1 AND h-2
           THEN (doc_id*13 + 17 + 3*(x-1) + 5*(y-1)) % 256 ELSE v0 END
         WHEN fi = 2 THEN CASE
           WHEN x < 2 AND y < 2 THEN (doc_id*13 + 34 + 3*x + 5*y) % 256
           ELSE pre END
         ELSE CASE
           WHEN y = 0 THEN (doc_id*13 + 51 + 3*x) % 256 ELSE pre END
       END) AS BIGINT) AS pixel_sum
FROM px GROUP BY doc_id, fi, w, h
"""


def _streaming_media_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 through the streaming drop-folder path: deterministic PNG,
    animated-GIF and WAV files land in a watched directory,
    Trigger.AvailableNow drains them through the SAME codec dispatch as
    the batch operators into a features ledger — dims, frame counts and
    sample counts must match the synth closed forms (shared with the
    multimodal_decode_* entries, so batch and streaming cannot drift).
    Each document ALSO drops one corrupt PNG (IDAT CRC byte flipped):
    the gate pins that it lands as a ``status='quarantined'`` row with
    null dims while the stream still completes and decodes every good
    asset — the dead-letter posture that keeps one bad file from
    poison-pilling the drop folder forever."""
    import os
    import tempfile

    import numpy as np

    from sids_data_pipeline_spark.functions import imagecodec as icodec
    from sids_data_pipeline_spark.streaming.jobs import streaming_media_ingest

    (docs,) = tables(spark, sf_dir, "documents")
    ids = [r.doc_id for r in docs.filter("doc_id % 29 = 0").select("doc_id").collect()]
    work = tempfile.mkdtemp(prefix="sdp_smedia_")
    drop = os.path.join(work, "drop")
    os.makedirs(drop)
    for did in ids:
        png = icodec.png_encode(
            icodec.synth_image(did, did % 29 + 4, did % 13 + 3, did % 4 + 1)
        )
        f = np.arange(did % 5 + 2)[:, None, None]
        y = np.arange(did % 11 + 3)[None, :, None]
        x = np.arange(did % 21 + 4)[None, None, :]
        gif = icodec.gif_encode(
            ((did * 13 + 17 * f + 3 * x + 5 * y) % 256).astype(np.uint8)
        )
        i = np.arange(did % 50 + 10)[:, None]
        c = np.arange(did % 2 + 1)[None, :]
        wav = icodec.wav_encode(
            ((did * 31 + 7 * i + 13 * c) % 65536 - 32768).astype(np.int16),
            sample_rate=8000,
        )
        bad = bytearray(png)
        bad[-13] ^= 0xFF  # IDAT CRC byte: recognized magic, corrupt body
        for name, payload in (
            (f"m{did}_png.png", png),
            (f"m{did}_gif.gif", gif),
            (f"m{did}_wav.wav", wav),
            (f"m{did}_bad.png", bytes(bad)),
        ):
            with open(os.path.join(drop, name), "wb") as fh:
                fh.write(payload)
    streaming_media_ingest(
        spark, drop + "/*", os.path.join(work, "ledger"),
        os.path.join(work, "ckpt"),
    )
    return (
        spark.read.parquet(os.path.join(work, "ledger"))
        .select("media_id", "modality", "width", "height", "n_frames", "status")
        .orderBy("media_id")
    )


# same synth closed forms as synth_png_assets / synth_gif_assets /
# synth_wav_assets; the WAV envelope maps (sample_rate, channels,
# sample frames) into (width, height, n_frames). The _bad PNG (flipped
# IDAT CRC) must appear as a quarantined row with null dims — pinning
# that corrupt assets dead-letter instead of failing the stream.
_STREAMING_MEDIA_SQL = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 29 = 0),
m AS (
  SELECT 'm' || doc_id || '_png' AS media_id, 'image' AS modality,
         CAST(doc_id % 29 + 4 AS INT) AS width,
         CAST(doc_id % 13 + 3 AS INT) AS height, 1 AS n_frames,
         'ok' AS status
  FROM d
  UNION ALL
  SELECT 'm' || doc_id || '_gif', 'video',
         CAST(doc_id % 21 + 4 AS INT), CAST(doc_id % 11 + 3 AS INT),
         CAST(doc_id % 5 + 2 AS INT), 'ok'
  FROM d
  UNION ALL
  SELECT 'm' || doc_id || '_wav', 'audio',
         8000, CAST(doc_id % 2 + 1 AS INT), CAST(doc_id % 50 + 10 AS INT),
         'ok'
  FROM d
  UNION ALL
  SELECT 'm' || doc_id || '_bad', 'image',
         CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT),
         'quarantined'
  FROM d
)
SELECT media_id, modality, width, height, CAST(n_frames AS INT) AS n_frames,
       status
FROM m ORDER BY media_id
"""


_SPLIT_WEIGHTS = {"train": 0.8, "eval": 0.1, "test": 0.1}


def _corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.operators import sampling

    (docs,) = tables(spark, sf_dir, "documents")
    return sampling.hash_split(docs, _SPLIT_WEIGHTS).select(
        "doc_id", "lang", "split"
    )


def _corpus_split_sql() -> str:
    from sids_data_pipeline_spark.operators.sampling import o_hash_split

    return f"""
SELECT doc_id, lang, {o_hash_split('doc_id', _SPLIT_WEIGHTS)} AS split
FROM documents
"""


def _text_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Python UDTF via LATERAL join: one doc row → many sentence
    rows (functions/udxf.SentenceSplit)."""
    from sids_data_pipeline_spark.functions.udxf import register_udtfs

    docs = tables(spark, sf_dir, "documents")[0]
    register_udtfs(spark)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT t.doc_id, t.sentence_idx, t.sentence
        FROM _udtf_docs d, LATERAL sentences(d.doc_id, d.text) t
        ORDER BY doc_id, sentence_idx
        """
    )


_SENTENCES_SQL = r"""
SELECT doc_id, CAST(i - 1 AS INT) AS sentence_idx, s[i] AS sentence
FROM (SELECT doc_id, regexp_split_to_array(text, '[.!?][ \t\n\r\f]+') AS s
      FROM documents),
     LATERAL unnest(generate_series(1, len(s))) AS t(i)
WHERE NOT regexp_full_match(s[i], '[ \t\n\r\f]*')
ORDER BY doc_id, sentence_idx
"""


def _agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (the Python UDAF form): per-language
    geometric mean of document length."""
    from sids_data_pipeline_spark.functions.udxf import geo_mean, group_size

    docs = tables(spark, sf_dir, "documents")[0]
    return (
        docs.groupBy("lang")
        .agg(
            F.round(geo_mean(F.col("n_chars").cast("double")), 6).alias(
                "geomean_chars"
            ),
            group_size(F.col("n_chars")).alias("n_docs"),
        )
        .orderBy("lang")
    )


_GEOMEAN_SQL = """
SELECT lang,
       ROUND(EXP(AVG(LN(CAST(n_chars AS DOUBLE)))), 6) AS geomean_chars,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (deterministic ngram path) → transitive clusters
    via iterative min-label propagation (operators/graph.py)."""
    from sids_data_pipeline_spark.operators import graph

    docs = tables(spark, sf_dir, "documents")[0]
    pairs = dedup.near_duplicates_ngram(
        docs, n=3, threshold=_NGRAM_THRESHOLD, max_df=_NGRAM_MAX_DF
    )
    return graph.dedup_clusters(pairs).orderBy("doc_id")


# The iterative Spark algorithm's fixpoint equals "min reachable node id",
# which DuckDB expresses as a recursive CTE — so even the engine's
# iterative-graph operator gets the full value-hash oracle.
_DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_SHINGLE_SQL.strip().lstrip()},
df AS (SELECT token, COUNT(*) AS df FROM sh GROUP BY token),
rare AS (
  SELECT s.doc_id, s.token FROM sh s
  JOIN df ON df.token = s.token AND df.df <= {_NGRAM_MAX_DF}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
  FROM rare l JOIN rare r ON l.token = r.token AND l.doc_id < r.doc_id
),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id1, c.id2, COUNT(*) AS inter
  FROM cand c
  JOIN sh t1 ON t1.doc_id = c.id1
  JOIN sh t2 ON t2.doc_id = c.id2 AND t2.token = t1.token
  GROUP BY c.id1, c.id2
),
pairs AS (
  SELECT i.id1, i.id2
  FROM inter i
  JOIN sz s1 ON s1.doc_id = i.id1
  JOIN sz s2 ON s2.doc_id = i.id2
  WHERE CAST(i.inter AS DOUBLE) / (s1.sz + s2.sz - i.inter) >= {_NGRAM_THRESHOLD}
),
sym AS (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION
  SELECT id2 AS src, id1 AS dst FROM pairs
),
reach(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT e.dst, r.label FROM reach r JOIN sym e ON e.src = r.node
)
SELECT node AS doc_id, MIN(label) AS cluster_id,
       node = MIN(label) AS is_representative
FROM reach GROUP BY node ORDER BY doc_id
"""


_STRAT_K = 7
_STRAT_SALT = "strat"


def _corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.operators import sampling

    (docs,) = tables(spark, sf_dir, "documents")
    return (
        sampling.stratified_sample(docs, ["lang"], _STRAT_K, salt=_STRAT_SALT)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


_STRATIFIED_SQL = f"""
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {o_token_hash32(f"'{_STRAT_SALT}' || CAST(doc_id AS VARCHAR)")},
                    doc_id
         ) AS rn
  FROM documents
) WHERE rn <= {_STRAT_K}
ORDER BY lang, doc_id
"""

_DECON_MOD = 17
_DECON_MIN_SHARED = 3


def _corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark = every 17th document; corpus = the rest. Drop corpus
    docs sharing >= 3 distinct word trigrams with any benchmark doc."""
    from sids_data_pipeline_spark.operators import dedup as dd

    (docs,) = tables(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % _DECON_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _DECON_MOD != 0)
    return (
        dd.decontaminate(corpus, bench, n=3, min_shared=_DECON_MIN_SHARED)
        .select("doc_id")
        .orderBy("doc_id")
    )


_DECON_SQL = f"""
WITH {_SHINGLE_SQL},
bench AS (
  SELECT DISTINCT token FROM sh WHERE doc_id % {_DECON_MOD} = 0
),
hits AS (
  SELECT s.doc_id
  FROM sh s JOIN bench b ON s.token = b.token
  WHERE s.doc_id % {_DECON_MOD} <> 0
  GROUP BY s.doc_id
  HAVING count(*) >= {_DECON_MIN_SHARED}
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id % {_DECON_MOD} <> 0
  AND d.doc_id NOT IN (SELECT doc_id FROM hits)
ORDER BY d.doc_id
"""


_SHARD_TOKENS = 2000
_NTOK = "size(filter(split(lower(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), x -> x != ''))"
_O_NTOK = r"len(list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> ''))"


def _corpus_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.operators import sampling

    (docs,) = tables(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.expr(_NTOK).cast("int").alias("n_tokens")
    )
    return sampling.pack_shards(sized, _SHARD_TOKENS)


_PACK_SHARDS_SQL = f"""
SELECT doc_id, CAST({_O_NTOK} AS INT) AS n_tokens,
       CAST(FLOOR(COALESCE(SUM({_O_NTOK}) OVER (
              ORDER BY doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / {_SHARD_TOKENS}.0) AS INT) AS shard_id
FROM documents
"""


def _embedding_pca_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 dimensionality reduction, gate-shaped: PCA fits from one pass
    of distributed moments (driver reduces d² partials; eigh is on a
    64×64 matrix) and the projection is a literal-matrix codegen
    expression. The gate re-derives the model's own claims from the
    PROJECTED DATA distributively: each component's projected variance
    must equal its eigenvalue and each projected mean must be ~0 —
    a wrong covariance, a mis-ordered eigenvector, or a broken
    projection flips the booleans. Orthonormality and the explained-
    variance ordering are pinned in pytest."""
    from sids_data_pipeline_spark.operators.similarity import (
        pca_fit,
        pca_transform,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    model = pca_fit(emb, k=4)
    proj = pca_transform(emb, model)
    var_ok = F.lit(True)
    mean_ok = F.lit(True)
    for i, ev in enumerate(model["explained"]):
        pc = F.col("pc")[i]
        mean_i = F.avg(pc)
        var_i = F.avg(pc * pc) - mean_i * mean_i
        var_ok = var_ok & (
            F.abs(var_i - F.lit(ev)) <= F.lit(abs(ev) * 1e-6 + 1e-12)
        )
        mean_ok = mean_ok & (F.abs(mean_i) <= F.lit(1e-9))
    return proj.agg(
        F.count(F.lit(1)).alias("n"),
        var_ok.alias("vars_match_eigenvalues"),
        mean_ok.alias("means_centered"),
    )


_PCA_GATE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       TRUE AS vars_match_eigenvalues,
       TRUE AS means_centered
FROM embeddings
"""


def _mv_sketch_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental COUNT DISTINCT via stored mergeable sketches: one
    Datasketches-HLL sketch per ship-month (the partition a new day's
    load appends to), then the global estimate from the SKETCH TABLE
    ALONE — the base scan happens once at sketch-build, never at query.
    Gate shape (like agg_approx_distinct_gate): n_sketches and the exact
    distinct are oracle-verified cross-engine, and the merged estimate
    must land within the lg_k=12 envelope (3·1.04/√4096 ≈ 5%).

    Plan note: the BroadcastNestedLoopJoin in this plan is the crossJoin
    of three ONE-ROW aggregates (1×1×1 by construction) — the benign
    output-bounded re-attach class, not a per-row nested loop."""
    from sids_data_pipeline_spark.operators import merge as mrg

    (li,) = tables(spark, sf_dir, "lineitem")
    monthly = mrg.distinct_sketches(
        li.withColumn("_m", F.trunc("l_shipdate", "month")),
        "l_suppkey",
        ["_m"],
    )
    est = mrg.merged_distinct(monthly)
    counts = monthly.agg(F.count(F.lit(1)).alias("n_sketches"))
    exact = li.agg(F.countDistinct("l_suppkey").alias("exact_distinct"))
    return counts.crossJoin(exact).crossJoin(est).select(
        "n_sketches",
        "exact_distinct",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * F.lit(0.05)
        ).alias("within_bound"),
    )


_MV_SKETCH_SQL = """
SELECT CAST(COUNT(DISTINCT date_trunc('month', l_shipdate)) AS BIGINT)
         AS n_sketches,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_distinct,
       TRUE AS within_bound
FROM lineitem
"""


# Token-id expression for the tokenbin round-trip: md5-family word ids
# (portable across Spark/DuckDB like the LSH hashes), vocab 32768.
_TOKIDS = (
    "transform(filter(split(lower(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), "
    "x -> x != ''), w -> CAST(conv(substring(md5(w), 1, 8), 16, 10) "
    "AS BIGINT) % 32768)"
)
_O_TOKIDS = (
    r"list_transform(list_filter(regexp_split_to_array(lower(text), "
    r"'[ \t\n\x0B\f\r]+'), x -> x <> ''), "
    r"w -> ('0x' || substr(md5(w), 1, 8))::BIGINT % 32768)"
)


def _tokenbin_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 training sink end-to-end: md5-family token ids → pack_shards →
    uint32 .bin shard files → distributed readback. The per-shard
    position-weighted checksum verifies CONTENT AND BYTE ORDER of every
    shard against the oracle, which recomputes the identical stream from
    the documents table (same token ids, same prefix-sum shard split,
    same within-shard doc order) without ever touching the files."""
    import os
    import tempfile

    from sids_data_pipeline_spark.operators import sampling
    from sids_data_pipeline_spark.sinks.tokenbin import (
        read_token_shards,
        write_token_shards,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr(_TOKIDS).alias("tokens"),
        F.expr(_NTOK).cast("int").alias("n_tokens"),
    )
    packed = sampling.pack_shards(toks, _SHARD_TOKENS)
    work = os.path.join(tempfile.mkdtemp(prefix="sdp_tokbin_"), "shards")
    write_token_shards(packed, work)
    back = read_token_shards(spark, work + "/*.bin")
    return back.select(
        "shard_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.expr(
            "aggregate(transform(tokens, (x, i) -> x * (i + 1)), "
            "CAST(0 AS BIGINT), (a, b) -> a + b)"
        ).alias("checksum"),
    ).orderBy("shard_id")


_TOKENBIN_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_O_TOKIDS} AS tokens,
         CAST({_O_NTOK} AS INT) AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, tokens, n_tokens,
         CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                ORDER BY doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {_SHARD_TOKENS}.0) AS BIGINT) AS shard_id
  FROM toks
), offs AS (
  SELECT shard_id, n_tokens, tokens,
         COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard_id ORDER BY doc_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM packed
), per_doc AS (
  SELECT shard_id, n_tokens,
         off * list_sum(tokens)
           + list_sum(list_transform(tokens, (x, i) -> x * i)) AS wsum
  FROM offs
)
SELECT shard_id,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(wsum), 0) AS BIGINT) AS checksum
FROM per_doc
GROUP BY shard_id
-- zero-token shards write a 0-byte file that Spark's binaryFile source
-- skips on readback; mirror the omission (cannot happen unless every
-- doc in the shard is empty)
HAVING CAST(SUM(n_tokens) AS BIGINT) > 0
ORDER BY shard_id
"""


_SEQ_LEN = 512


def _corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.operators import sampling

    (docs,) = tables(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.expr(_NTOK).cast("int").alias("n_tokens")
    )
    return sampling.pack_sequences(sized, _SEQ_LEN)


# Concat-and-split packing is pure integer arithmetic on the exclusive
# prefix sum, so the window mirror verifies every offset and sequence
# index value-for-value (// is DuckDB integer division; all operands
# are non-negative, so floor == trunc).
_PACK_SEQUENCES_SQL = f"""
WITH sized AS (
  SELECT doc_id, CAST({_O_NTOK} AS INT) AS n_tokens FROM documents
),
s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM sized
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // {_SEQ_LEN} AS first_seq,
       CASE WHEN n_tokens > 0
            THEN (tok_start + n_tokens - 1) // {_SEQ_LEN}
            ELSE NULL END AS last_seq,
       CASE WHEN n_tokens > 0
            THEN (tok_start + n_tokens - 1) // {_SEQ_LEN}
                 - tok_start // {_SEQ_LEN} + 1
            ELSE 0 END AS n_seqs
FROM s
"""


def _corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sids_data_pipeline_spark.operators import sampling

    (docs,) = tables(spark, sf_dir, "documents")
    return sampling.training_order(docs.select("doc_id"), epoch=1).select(
        "doc_id", "epoch_pos"
    )


# The oracle realizes the same permutation as one global window — fine
# at fixture scale; the engine's range-partitioned scan is the form that
# survives 100 TB.
_CORPUS_SHUFFLE_SQL = """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
              ORDER BY (('0x' || substr(md5('shuffle:1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) ASC,
                       doc_id ASC) - 1 AS BIGINT) AS epoch_pos
FROM documents
"""


def _multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    frames = multimodal.frame_sample(
        multimodal.documents_to_assets(docs), every_n=8
    )
    # hex-project the slice for the gate: DuckDB's substring is
    # VARCHAR-only, so both engines compare lowercase hex strings
    return frames.select(
        "asset_id", "frame_index",
        F.lower(F.hex("frame_bytes")).alias("frame_hex"),
    )


# UDTF shape (one asset row → many frame rows): the stub decoder's
# arithmetic is deterministic, so even the per-frame byte slices verify
# value-for-value (generate_series = the explode twin).
_MULTIMODAL_FRAMES_SQL = """
WITH v AS (
  SELECT doc_id AS asset_id, encode(text) AS payload,
         CAST(octet_length(encode(text)) AS INT) AS n
  FROM documents WHERE doc_id % 4 = 2
),
f AS (
  SELECT asset_id, payload, n,
         CAST(unnest(range(0, n % 24 + 1, 8)) AS INT) AS frame_index
  FROM v
)
SELECT asset_id, frame_index,
       lower(substring(hex(payload),
                       ((frame_index * 17) % greatest(n - 8, 1)) * 2 + 1, 16))
         AS frame_hex
FROM f
"""


# --- merge / snapshot maintenance (incremental primitives) --------------------


def _merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE fixture over orders: every 20th key is the target table,
    every 30th key is the change batch (priority rewritten to 'MERGED'),
    every 120th key is a tombstone. Covers all three MERGE arms —
    passthrough, update, insert, delete — in one deterministic slice."""
    (orders,) = tables(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    target = orders.filter(k % 20 == 0).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    source = orders.filter(k % 30 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("MERGED").alias("o_orderpriority"),
        (k % 120 == 0).alias("_deleted"),
    )
    return merge.merge_upsert(target, source, ["o_orderkey"], delete_col="_deleted")


_MERGE_UPSERT_SQL = """
WITH t AS (
  SELECT o_orderkey, o_custkey, o_orderpriority
  FROM orders WHERE o_orderkey % 20 = 0
),
s AS (
  SELECT o_orderkey, o_custkey, 'MERGED' AS o_orderpriority,
         (o_orderkey % 120 = 0) AS deleted
  FROM orders WHERE o_orderkey % 30 = 0
)
SELECT o_orderkey, o_custkey, o_orderpriority
FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderpriority
FROM s WHERE NOT deleted
"""


def _snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff fixture over lineitem: 'old' is every 7th order,
    'new' every 8th with quantity bumped on every 3rd — so keys divisible
    by 56 are common (changed only when also divisible by 3), the rest
    split into added/removed."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    old = lineitem.filter(k % 7 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    new = lineitem.filter(k % 8 == 0).select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_quantity")
            + F.when(k % 3 == 0, F.lit(1.0)).otherwise(F.lit(0.0))
        ).alias("l_quantity"),
        "l_returnflag",
    )
    return merge.snapshot_diff(old, new, ["l_orderkey", "l_linenumber"])


_SNAPSHOT_DIFF_SQL = """
WITH o AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
  FROM lineitem WHERE l_orderkey % 7 = 0
),
n AS (
  SELECT l_orderkey, l_linenumber,
         l_quantity + (CASE WHEN l_orderkey % 3 = 0 THEN 1.0 ELSE 0.0 END)
           AS l_quantity,
         l_returnflag
  FROM lineitem WHERE l_orderkey % 8 = 0
)
SELECT * FROM (
  SELECT COALESCE(o.l_orderkey, n.l_orderkey) AS l_orderkey,
         COALESCE(o.l_linenumber, n.l_linenumber) AS l_linenumber,
         CASE WHEN o.l_orderkey IS NULL THEN 'added'
              WHEN n.l_orderkey IS NULL THEN 'removed'
              WHEN (o.l_quantity IS DISTINCT FROM n.l_quantity)
                OR (o.l_returnflag IS DISTINCT FROM n.l_returnflag) THEN 'changed'
         END AS change
  FROM o FULL OUTER JOIN n
    ON o.l_orderkey = n.l_orderkey AND o.l_linenumber = n.l_linenumber
)
WHERE change IS NOT NULL
"""


def _skew_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-15 hottest (event_type, user_id % 100) shuffle keys with
    ppm traffic share — the pre-shuffle diagnostic that decides whether a
    join/agg needs salting."""
    from sids_data_pipeline_spark.operators.skew import heavy_hitters

    (events,) = tables(spark, sf_dir, "events")
    keyed = events.select(
        "event_type", (F.col("user_id") % 100).alias("user_bucket")
    )
    return heavy_hitters(keyed, ["event_type", "user_bucket"], k=15)


_SKEW_HH_SQL = """
WITH counts AS (
  SELECT event_type, user_id % 100 AS user_bucket, COUNT(*) AS n
  FROM events GROUP BY event_type, user_id % 100
),
total AS (SELECT SUM(n) AS t FROM counts)
SELECT event_type, user_bucket, n,
       CAST(ROUND(n * 1000000.0 / t) AS BIGINT) AS share_ppm
FROM counts, total
ORDER BY n DESC, event_type ASC, user_bucket ASC
LIMIT 15
"""


def _skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row key-frequency summary of the same prospective shuffle key."""
    from sids_data_pipeline_spark.operators.skew import key_skew_report

    (events,) = tables(spark, sf_dir, "events")
    keyed = events.select(
        "event_type", (F.col("user_id") % 100).alias("user_bucket")
    )
    return key_skew_report(keyed, ["event_type", "user_bucket"])


_SKEW_REPORT_SQL = """
WITH counts AS (
  SELECT event_type, user_id % 100 AS user_bucket, COUNT(*) AS n
  FROM events GROUP BY event_type, user_id % 100
)
SELECT COUNT(*) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MAX(n) AS BIGINT) AS max_key_rows,
       CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_key_rows,
       CAST(ROUND(MAX(n) * 1000000.0 * COUNT(*) / SUM(n)) AS BIGINT)
         AS skew_ratio_micros
FROM counts
"""


def _mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MV maintenance fixture: the 'materialized' aggregate
    covers orders NOT divisible by 10; the changelog then inserts the
    %10 rows and deletes the %9 rows of the base slice. The engine folds
    the signed deltas into the view (base facts never rescanned); the
    oracle recomputes the same aggregate from the effective final fact
    set — equality proves the view algebra."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    facts = lineitem.select(
        "l_orderkey",
        "l_returnflag",
        "l_linestatus",
        cents("l_quantity").alias("qty_c"),
        cents("l_extendedprice").alias("price_c"),
    )
    base = facts.filter(k % 10 != 0)
    mv = base.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty_c").alias("sum_qty_c"),
        F.sum("price_c").alias("sum_price_c"),
    )
    inserts = facts.filter(k % 10 == 0).withColumn("_sign", F.lit(1))
    deletes = base.filter(k % 9 == 0).withColumn("_sign", F.lit(-1))
    out = merge.maintain_aggregate(
        mv,
        inserts.unionByName(deletes),
        ["l_returnflag", "l_linestatus"],
        {"sum_qty_c": "qty_c", "sum_price_c": "price_c"},
    )
    return out.withColumn(
        "avg_qty",
        F.col("sum_qty_c").cast("double") / F.col("n_rows") / F.lit(100.0),
    ).orderBy("l_returnflag", "l_linestatus")


_MV_INCREMENTAL_SQL = f"""
WITH effective AS (
  SELECT l_returnflag, l_linestatus,
         {o_cents('l_quantity')} AS qty_c,
         {o_cents('l_extendedprice')} AS price_c
  FROM lineitem
  WHERE l_orderkey % 10 = 0
     OR (l_orderkey % 10 <> 0 AND l_orderkey % 9 <> 0)
)
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c,
       CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
       CAST(SUM(qty_c) AS DOUBLE) / COUNT(*) / 100.0 AS avg_qty
FROM effective
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def _layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over two join dimensions: the exact bit
    interleave the layout writer sorts by. The oracle recomputes every
    bit with integer arithmetic, so a single flipped bit anywhere in the
    clamp/shift/interleave chain fails the hash."""
    from sids_data_pipeline_spark.operators.layout import zorder_key

    (lineitem,) = tables(spark, sf_dir, "lineitem")
    keyed = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 1024).alias("pk_bucket"),
        (F.col("l_suppkey") % 1024).alias("sk_bucket"),
    ).withColumn("zkey", zorder_key(["pk_bucket", "sk_bucket"], bits=10))
    return keyed.orderBy("zkey", "l_orderkey", "l_linenumber").limit(500)


def _layout_zorder_sql() -> str:
    from sids_data_pipeline_spark.operators.layout import o_zorder_key

    z = o_zorder_key(["l_partkey % 1024", "l_suppkey % 1024"], bits=10)
    return f"""
SELECT l_orderkey, l_linenumber,
       l_partkey % 1024 AS pk_bucket,
       l_suppkey % 1024 AS sk_bucket,
       {z} AS zkey
FROM lineitem
ORDER BY zkey, l_orderkey, l_linenumber
LIMIT 500
"""


def _layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact-fact join via matching hash buckets: both fact
    projections are written bucketed+sorted on the join key, then joined
    bucket-to-bucket with zero Exchange nodes (tests/test_layout.py pins
    the plan). The write shuffle is paid once and amortized over every
    later join on that key — the 100 TB answer to repeated fact-fact
    joins. The aggregate after the join is value-checked by the oracle
    against a plain (shuffled) join of the raw tables, proving layout
    changes results not at all."""
    import tempfile

    from sids_data_pipeline_spark.operators.layout import bucketed_join, write_bucketed

    orders, lineitem = tables(spark, sf_dir, "orders", "lineitem")
    work = tempfile.mkdtemp(prefix="sdp_bucketed_")
    write_bucketed(
        orders.select(F.col("o_orderkey").alias("okey"), "o_orderpriority"),
        "sdp_orders_by_okey",
        ["okey"],
        num_buckets=8,
        path=f"{work}/orders",
    )
    write_bucketed(
        lineitem.select(
            F.col("l_orderkey").alias("okey"),
            cents("l_extendedprice").alias("price_c"),
        ),
        "sdp_lineitem_by_okey",
        ["okey"],
        num_buckets=8,
        path=f"{work}/lineitem",
    )
    joined = bucketed_join(
        spark, "sdp_lineitem_by_okey", "sdp_orders_by_okey", ["okey"]
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("price_c").alias("price_cents"),
        )
        .orderBy("o_orderpriority")
    )


_BUCKETED_JOIN_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_lines,
       CAST(SUM({o_cents('l_extendedprice')}) AS BIGINT) AS price_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end incremental refresh: diff two fact snapshots (adds,
    removes, AND in-place changes) into a retract+insert changelog, fold
    it into the stale view; oracle recomputes over the new snapshot."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    facts = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        cents("l_quantity").alias("qty_c"),
    )
    old = facts.filter(k % 4 != 0)
    new = facts.filter(k % 5 != 0).withColumn(
        "qty_c", F.col("qty_c") + F.when(k % 7 == 0, 100).otherwise(0)
    )
    mv = old.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("qty_c").alias("sum_qty_c")
    )
    out = merge.refresh_aggregate(
        mv,
        old,
        new,
        ["l_orderkey", "l_linenumber"],
        ["l_returnflag"],
        {"sum_qty_c": "qty_c"},
    )
    return out.orderBy("l_returnflag")


_MV_REFRESH_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM({o_cents('l_quantity')}
                + CASE WHEN l_orderkey % 7 = 0 THEN 100 ELSE 0 END)
            AS BIGINT) AS sum_qty_c
FROM lineitem
WHERE l_orderkey % 5 <> 0
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)


def _table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of orders. approx=False here so the
    DuckDB oracle can match distinct counts exactly; production runs use
    the default HLL path (rows-only comparable)."""
    from sids_data_pipeline_spark.operators.profile import profile_table

    (orders,) = tables(spark, sf_dir, "orders")
    return profile_table(orders, _PROFILE_COLS, approx=False)


def _table_profile_sql() -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
        f"COUNT(*) - COUNT({c}) AS n_nulls, "
        f"COUNT(DISTINCT {c}) AS n_distinct, "
        f"CAST(MIN({c}) AS VARCHAR) AS min_value, "
        f"CAST(MAX({c}) AS VARCHAR) AS max_value FROM orders"
        for c in _PROFILE_COLS
    )
    return arms


_RAW_TOK_SQL = """
rawtok AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                          x -> x <> '')) AS t(token)
)
"""


def _corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with term + document frequency, min_count=3."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.vocab_counts(docs, min_count=3)


_VOCAB_SQL = f"""
WITH {_RAW_TOK_SQL.strip()}
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS term_freq,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM rawtok
GROUP BY token
HAVING COUNT(*) >= 3
"""


def _text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-3-gram boilerplate detection across the corpus: shingles in
    ≥3 distinct docs are boilerplate; per-doc hot fraction in ppm."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.boilerplate_stats(docs, n=3, min_docs=3)


_BOILERPLATE_SQL = f"""
WITH {_SHINGLE_SQL.strip()},
hot AS (SELECT token FROM sh GROUP BY token HAVING COUNT(*) >= 3),
per_doc AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
hpd AS (SELECT sh.doc_id, COUNT(*) AS n_hot
        FROM sh JOIN hot USING (token) GROUP BY sh.doc_id)
SELECT p.doc_id,
       CAST(p.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_hot, 0) AS BIGINT) AS n_hot,
       CAST(ROUND(CAST(COALESCE(h.n_hot, 0) AS DOUBLE) / p.n_shingles
                  * 1000000.0) AS BIGINT) AS boiler_ppm
FROM per_doc p LEFT JOIN hpd h USING (doc_id)
"""


def _corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two sequence-length histogram over whitespace token
    counts — the batch-planning summary (docs, tokens, integer ceil-div
    batch lower bound per length class)."""
    from sids_data_pipeline_spark.operators.sampling import length_buckets

    (docs,) = tables(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), r"[ \t\n\x0B\f\r]+"), lambda w: w != ""
            )
        ).alias("n_words"),
    )
    return length_buckets(sized, size_col="n_words", batch_tokens=256)


_LENGTH_BUCKETS_SQL = """
WITH w AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                         x -> x <> '')) AS n_words
  FROM documents
)
SELECT CAST(LENGTH(bin(n_words)) AS INT) AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS sum_tokens,
       CAST(MIN(n_words) AS BIGINT) AS min_tokens,
       CAST(MAX(n_words) AS BIGINT) AS max_tokens,
       CAST((SUM(n_words) + 255) // 256 AS BIGINT) AS n_batches_lb
FROM w GROUP BY bucket ORDER BY bucket
"""


def _corpus_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of iterative BPE merge learning over the corpus
    vocabulary; the oracle unrolls the identical rounds as SQL."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.bpe_train(docs, n_merges=3)


def _bpe_train_sql(n_merges: int = 3) -> str:
    """Unrolled DuckDB twin of text.bpe_train: same vocabulary weights,
    same each-symbol-delimited encoding, same literal replace per round,
    same (count desc, lexicographic) argmax."""
    sep = "chr(31)"
    parts = [
        f"""
v AS (
  SELECT word, COUNT(*) AS n_word
  FROM (SELECT t.w AS word
        FROM documents,
             unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                                x -> x <> '')) AS t(w))
  GROUP BY word
),
e0 AS (
  SELECT n_word,
         {sep} || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substring(word, i, 1)),
           {sep} || {sep}) || {sep} AS s
  FROM v
)"""
    ]
    for r in range(n_merges):
        parts.append(f"""
p{r} AS (
  SELECT sy[i] AS a, sy[i + 1] AS b, SUM(n_word) AS n
  FROM (SELECT n_word,
               string_split(substring(s, 2, length(s) - 2),
                            {sep} || {sep}) AS sy
        FROM e{r}),
       unnest(range(1, len(sy))) AS t(i)
  GROUP BY a, b
),
best{r} AS (SELECT a, b, n FROM p{r} ORDER BY n DESC, a, b LIMIT 1),
e{r + 1} AS (
  SELECT n_word,
         replace(s, {sep} || a || {sep} || {sep} || b || {sep},
                 {sep} || a || b || {sep}) AS s
  FROM e{r}, best{r}
)""")
    selects = [
        f"SELECT {r} AS merge_rank, a AS left_sym, b AS right_sym, "
        f"a || b AS merged, CAST(n AS BIGINT) AS pair_count FROM best{r}"
        for r in range(n_merges)
    ]
    return "WITH " + ",".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def _corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE over the corpus: per-doc exact token counts
    under the learned rules (vocabulary-only encode, broadcast join
    back). The oracle unrolls the identical chain, carrying the word
    through each merge round."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.bpe_encode(docs, n_merges=3)


def _bpe_encode_sql(n_merges: int = 3) -> str:
    """Unrolled DuckDB twin of text.bpe_encode: the train chain's
    argmax rounds (same as _bpe_train_sql) with the word identity kept
    alongside the delimited encoding, then per-doc sums over the
    (doc, word) stream."""
    sep = "chr(31)"
    parts = [
        f"""
rawtok AS (
  SELECT doc_id, t.w AS word
  FROM documents,
       unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                          x -> x <> '')) AS t(w)
),
v AS (SELECT word, COUNT(*) AS n_word FROM rawtok GROUP BY word),
e0 AS (
  SELECT word, n_word,
         {sep} || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substring(word, i, 1)),
           {sep} || {sep}) || {sep} AS s
  FROM v
)"""
    ]
    for r in range(n_merges):
        parts.append(f"""
p{r} AS (
  SELECT sy[i] AS a, sy[i + 1] AS b, SUM(n_word) AS n
  FROM (SELECT n_word,
               string_split(substring(s, 2, length(s) - 2),
                            {sep} || {sep}) AS sy
        FROM e{r}),
       unnest(range(1, len(sy))) AS t(i)
  GROUP BY a, b
),
best{r} AS (SELECT a, b FROM p{r} ORDER BY n DESC, a, b LIMIT 1),
e{r + 1} AS (
  SELECT word, n_word,
         replace(s, {sep} || a || {sep} || {sep} || b || {sep},
                 {sep} || a || b || {sep}) AS s
  FROM e{r}, best{r}
)""")
    return (
        "WITH " + ",".join(parts) + f""",
wt AS (
  SELECT word,
         len(string_split(substring(s, 2, length(s) - 2),
                          {sep} || {sep})) AS w_toks
  FROM e{n_merges}
)
SELECT r.doc_id, COUNT(*) AS n_words,
       CAST(SUM(wt.w_toks) AS BIGINT) AS n_bpe_tokens
FROM rawtok r JOIN wt USING (word)
GROUP BY r.doc_id
"""
    )


def _corpus_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF over a 1-in-10 document subset (keeps the gate
    row count bounded; doc_freq and N are computed on the same subset)."""
    (docs,) = tables(spark, sf_dir, "documents")
    return text.tfidf(docs.filter(F.col("doc_id") % 10 == 0))


_TFIDF_SQL = """
WITH sub AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
rawtok AS (
  SELECT doc_id, t.token
  FROM sub,
       unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                          x -> x <> '')) AS t(token)
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM rawtok GROUP BY 1, 2),
dfq AS (SELECT token, COUNT(DISTINCT doc_id) AS doc_freq FROM rawtok GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM sub)
SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
       CAST(dfq.doc_freq AS BIGINT) AS doc_freq,
       ROUND(tf.tf * (LN(CAST(n.n + 1 AS DOUBLE) / (dfq.doc_freq + 1)) + 1.0), 6)
         AS tfidf
FROM tf JOIN dfq USING (token), n
"""


_HIST_BINS, _HIST_LO, _HIST_HI = 20, 1000.0, 500000.0


def _column_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of o_totalprice over [1000, 500000)."""
    from sids_data_pipeline_spark.operators.profile import column_histogram

    (orders,) = tables(spark, sf_dir, "orders")
    return column_histogram(
        orders, "o_totalprice", _HIST_BINS, _HIST_LO, _HIST_HI
    )


def _column_hist_sql() -> str:
    width = _HIST_HI - _HIST_LO
    return f"""
SELECT CAST(LEAST(GREATEST(
         FLOOR((CAST(o_totalprice AS DOUBLE) - {_HIST_LO!r}) / {width!r}
               * {_HIST_BINS}), 0), {_HIST_BINS - 1}) AS INT) AS bucket,
       COUNT(*) AS n
FROM orders
WHERE o_totalprice IS NOT NULL
GROUP BY 1
"""


def _dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over orders: passing rules (key present/unique,
    status domain, priority format) and failing ones (price cap, custkey
    uniqueness) in one report."""
    from sids_data_pipeline_spark.operators import quality as q

    (orders,) = tables(spark, sf_dir, "orders")
    return q.check_expectations(
        orders,
        [
            q.not_null("o_orderkey"),
            q.in_range("o_totalprice", 0, 450000),
            q.in_set("o_orderstatus", ["O", "F", "P"]),
            q.matches("o_orderpriority", "^[1-5]-"),
            q.unique("o_orderkey"),
            q.unique("o_custkey"),
        ],
    )


_DQ_SQL = """
SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM (
  SELECT 'not_null(o_orderkey)' AS rule,
         COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'in_range(o_totalprice)',
         COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
                            AND (o_totalprice < 0 OR o_totalprice > 450000))
  FROM orders
  UNION ALL
  SELECT 'in_set(o_orderstatus)',
         COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('O', 'F', 'P'))
  FROM orders
  UNION ALL
  SELECT 'matches(o_orderpriority)',
         COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL
                            AND NOT regexp_matches(o_orderpriority, '^[1-5]-'))
  FROM orders
  UNION ALL
  SELECT 'unique(o_orderkey)',
         COALESCE(SUM(n - 1) FILTER (WHERE n > 1), 0)
  FROM (SELECT COUNT(*) AS n FROM orders WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)
  UNION ALL
  SELECT 'unique(o_custkey)',
         COALESCE(SUM(n - 1) FILTER (WHERE n > 1), 0)
  FROM (SELECT COUNT(*) AS n FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey)
)
"""


_MIX_RATES = {"en": 0.5, "de": 2.0, "zh": 1.25, "fr": 0.3}


def _corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling over documents by lang: downsample the
    bulk domain (en 0.5), upsample rare ones (de 2x, zh 1.25x), drop
    unlisted domains (es, default 0). copy_id distinguishes upsampled
    duplicates."""
    from sids_data_pipeline_spark.operators import sampling

    (docs,) = tables(spark, sf_dir, "documents")
    return sampling.mixture_sample(
        docs.select("doc_id", "lang"), _MIX_RATES, domain_col="lang"
    )


def _corpus_mix_sql() -> str:
    from sids_data_pipeline_spark.operators.sampling import o_mixture_sample

    return o_mixture_sample(
        "SELECT doc_id, lang FROM documents",
        _MIX_RATES,
        domain_col="lang",
        select_cols="doc_id, lang",
    )


_DSIR_BUCKETS = 1024
_DSIR_ALPHA_MICROS = 100_000


def _corpus_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 DSIR data selection (Xie et al. 2023): importance weight of
    every document against the lang='en' target slice, from hashed
    unigram+bigram features; exact-micros log ratios."""
    from sids_data_pipeline_spark.operators import sampling

    (docs,) = tables(spark, sf_dir, "documents")
    return sampling.dsir_weights(
        docs,
        F.col("lang") == F.lit("en"),
        n_buckets=_DSIR_BUCKETS,
        alpha_micros=_DSIR_ALPHA_MICROS,
    )


def _dsir_sql() -> str:
    from sids_data_pipeline_spark.functions.hashing import o_token_hash32

    alpha = _DSIR_ALPHA_MICROS / 1_000_000.0
    ab = alpha * _DSIR_BUCKETS
    # {alpha!r}/{ab!r} interpolate Python's shortest-round-trip double
    # so both engines smooth with the bit-identical constant
    return rf"""
WITH w AS (
  SELECT doc_id, lang = 'en' AS is_target,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS ws
  FROM documents
),
g AS (
  SELECT doc_id, is_target,
         {o_token_hash32('gram')} % {_DSIR_BUCKETS} AS bucket
  FROM (
    SELECT doc_id, is_target, unnest(ws) AS gram FROM w
    UNION ALL
    SELECT doc_id, is_target, ws[i] || ' ' || ws[i + 1] AS gram
    FROM w, unnest(range(1, len(ws))) AS u(i)
    WHERE len(ws) >= 2
  )
),
db AS (
  SELECT doc_id, is_target, bucket, COUNT(*) AS c
  FROM g GROUP BY doc_id, is_target, bucket
),
model AS (
  SELECT bucket, SUM(c) AS c_raw,
         SUM(CASE WHEN is_target THEN c ELSE 0 END) AS c_tgt
  FROM db GROUP BY bucket
),
tot AS (SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt FROM model),
llr AS (
  SELECT bucket,
         CAST(ROUND((ln((c_tgt + {alpha!r}) / (n_tgt + {ab!r}))
                     - ln((c_raw + {alpha!r}) / (n_raw + {ab!r})))
                    * 1000000) AS BIGINT) AS llr_micros
  FROM model CROSS JOIN tot
),
sc AS (
  SELECT db.doc_id, SUM(db.c) AS n_grams,
         SUM(db.c * llr.llr_micros) AS logw
  FROM db JOIN llr USING (bucket) GROUP BY db.doc_id
)
SELECT w.doc_id, w.is_target,
       CAST(COALESCE(sc.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(sc.logw AS BIGINT) AS dsir_logw_micros
FROM w LEFT JOIN sc ON sc.doc_id = w.doc_id
"""


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 fixture: each user's event_type as a tracked attribute —
    consecutive same-type events collapse into one validity episode,
    event_id breaks timestamp ties deterministically."""
    (events,) = tables(spark, sf_dir, "events")
    changes = events.filter(F.col("user_id") % 50 == 0)
    return merge.scd2_history(
        changes,
        keys=["user_id"],
        ts_col="ts",
        value_cols=["event_type"],
        tiebreak_cols=["event_id"],
    )


_SCD2_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type
  FROM events WHERE user_id % 50 = 0
),
episodes AS (
  SELECT *
  FROM (
    SELECT user_id, ts, event_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM e
  )
  WHERE prev_type IS NULL OR prev_type IS DISTINCT FROM event_type
)
SELECT user_id, event_type, valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM (
  SELECT user_id, event_type, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM episodes
)
"""


QUERIES: list[Query] = [
    Query("corpus_curation", _corpus_curation, _curation_sql(),
          doc="E1+E2+E5 flagship: quality filter → exact dedup → "
              "MinHash-LSH near-dup removal, whole chain hash-verified",
          tags=("dedup", "text", "pipeline")),
    Query("dedup_exact", _dedup_exact, _DEDUP_EXACT_SQL,
          doc="E1 exact dedup: sha2 keep-first", tags=("dedup",)),
    Query("dedup_exact_stats", _dedup_exact_stats, _DEDUP_EXACT_STATS_SQL,
          doc="E1 dedup summary counts", tags=("dedup",)),
    Query("streaming_dedup_lsh", _streaming_dedup_lsh,
          "SELECT * FROM (\n" + _minhash_sql() + "\n) ORDER BY id1, id2",
          doc="streaming NEAR-dup: two real micro-batches probe the "
              "accumulated band/doc ledgers (streaming_near_dedup); each "
              "pair emits exactly once so the drained union hash-matches "
              "the batch LSH oracle in full",
          tags=("dedup", "streaming")),
    Query("streaming_dedup_batch", _streaming_dedup_batch, _DEDUP_EXACT_SQL,
          doc="Streaming availableNow exact dedup (foreachBatch + digest "
              "ledger); single-batch drain ⇒ batch-parity oracle",
          tags=("dedup", "streaming")),
    Query("streaming_attribution", _streaming_attribution, _STREAMING_ATTR_SQL,
          doc="Watermarked stream-stream click→purchase join, availableNow "
              "drain ⇒ batch equi+range-join oracle",
          tags=("streaming", "join")),
    Query("streaming_dedup_wm", _streaming_dedup_wm, _STREAMING_WM_SQL,
          doc="bounded-state streaming dedup (dropDuplicatesWithinWatermark"
              "): state expires with the watermark, fits infinite streams",
          tags=("streaming", "dedup")),
    Query("streaming_enrich", _streaming_enrich, _STREAM_ENRICH_SQL,
          doc="stream-static enrichment: broadcast dimension join per "
              "micro-batch (zero stream state), availableNow drain "
              "equals the batch join oracle",
          tags=("streaming", "join", "aggregate")),
    Query("streaming_sessions", _streaming_sessions, _SESSION_SQL,
          doc="gap-based session windows in Structured Streaming "
              "(F.session_window + watermark): availableNow drain equals "
              "the batch gap-session oracle",
          tags=("streaming", "events", "window")),
    Query("streaming_rolling", _streaming_rolling, _ROLLING_SQL,
          doc="custom stateful trailing-window features in streaming "
              "(applyInPandasWithState, horizon-bounded state); one-batch "
              "drain equals the batch range-frame oracle",
          tags=("streaming", "events", "window")),
    Query("streaming_running_totals", _streaming_running_totals,
          _STREAMING_TOTALS_SQL,
          doc="applyInPandasWithState per-user running totals; final "
              "update equals the batch aggregate oracle",
          tags=("streaming", "stateful")),
    Query("dedup_incremental", _dedup_incremental, _dedup_incremental_sql(),
          doc="E2 incremental near-dup: new batch probes the STORED band "
              "table (corpus never re-shingled; verify re-reads only "
              "candidate corpus docs); batch-equivalent, oracle = full "
              "LSH filtered to new-doc pairs",
          tags=("dedup", "merge")),
    Query("dedup_minhash_lsh", _dedup_minhash, _minhash_sql(),
          doc="E2 MinHash + banded LSH → exact Jaccard (hash-verified)",
          tags=("dedup", "lsh")),
    Query("dedup_ngram_jaccard", _dedup_ngram, _NGRAM_SQL,
          doc="E2 n-gram Jaccard with rare-shingle blocking", tags=("dedup",)),
    Query("dedup_simhash", _dedup_simhash, _simhash_sql(),
          doc="E2 SimHash banded blocking + Hamming verify", tags=("dedup",)),
    Query("dedup_minhash_ml",
          lambda spark, sf_dir: dedup.near_duplicates_minhash_ml(
              tables(spark, sf_dir, "documents")[0], threshold=0.5
          ),
          None,  # seeded pyspark.ml sketch → rows-only
          doc="E2 pyspark.ml MinHashLSH approxSimilarityJoin (rows-only)",
          tags=("dedup", "lsh")),
    Query("dedup_embedding_cosine", _dedup_embedding, _DEDUP_EMBED_SQL,
          doc="E2 embedding-cosine near-dup (exact integer domain)",
          tags=("dedup", "similarity")),
    Query("similarity_topk", _similarity_topk, _SIMILARITY_TOPK_SQL,
          doc="E3 brute-force exact top-k cosine", tags=("similarity",)),
    Query("similarity_topk_ivf", _similarity_ivf, _SIMILARITY_IVF_SQL,
          doc="E3 IVF-bucketed ANN: search only the query's coarse bucket",
          tags=("similarity",)),
    Query("embedding_pca_gate", _embedding_pca_gate, _PCA_GATE_SQL,
          doc="E3 PCA: one-pass distributed moments (driver reduces d^2 "
              "partials), literal-matrix codegen projection; gate "
              "re-derives eigenvalues and centering from the projected "
              "data distributively",
          tags=("similarity", "gate")),
    Query("similarity_recall", _similarity_recall, _similarity_recall_sql(),
          doc="E3 evaluation: recall@10 of the IVF probe vs the exact "
              "ranking, oracle correct by composition",
          tags=("similarity", "evaluation")),
    Query("similarity_topk_quantized", _similarity_quantized,
          _SIMILARITY_QUANT_SQL,
          doc="E3 int8-quantized exact top-k (4× smaller store, pure JVM "
              "integer scoring)",
          tags=("similarity", "quantization")),
    Query("similarity_ann_lsh", _similarity_ann, None,
          doc="E3 LSH-bucketed ANN + exact re-rank (rows-only: seeded sketch)",
          tags=("similarity", "lsh")),
    Query("similarity_ann_gate", _similarity_ann_gate, _ANN_GATE_SQL,
          doc="E3 positive signal for the ANN sketch: hits ⊆ brute-force "
              "top-2k (derived oracle pins the verdict row)",
          tags=("similarity", "lsh", "evaluation")),
    Query("similarity_pq_gate", _similarity_pq_gate, _PQ_GATE_SQL,
          doc="E3 product quantization: integer-Lloyd codebooks + 4-int "
              "codes + JVM ADC table-lookup top-k; pinned by the exact "
              "identity ADC(q,x) = L2(q, reconstruct(x)) — the ADC "
              "top-10 must equal the reconstructed-corpus L2 top-10 "
              "row-for-row (derived oracle pins the verdict row)",
          tags=("similarity", "pq", "evaluation")),
    Query("similarity_ivf_pq", _similarity_ivf_pq, _IVF_PQ_SQL,
          doc="E3 IVF-ADC (Jégou 2011 §V): coarse inverted file + "
              "residual PQ codes, nprobe broadcast equi-join on cell + "
              "JVM ADC fold; pinned by the residual ADC identity against "
              "an independent probe/reconstruct/zip_with replay "
              "(derived oracle pins the verdict row)",
          tags=("similarity", "pq", "ivf", "evaluation")),
    Query("similarity_pq_pca_gate", _similarity_pq_pca_gate, _PQ_PCA_SQL,
          doc="E3 PCA-rotated PQ (OPQ-style energy compaction, "
              "non-iterative): full-rank orthogonal rotation composed "
              "with the PQ fit/encode/ADC family; pinned by the exact "
              "ADC == reconstructed-L2 identity in the rotated domain "
              "(derived oracle pins the verdict row)",
          tags=("similarity", "pq", "pca", "evaluation")),
    Query("similarity_opq_gate", _similarity_opq_gate, _OPQ_SQL,
          doc="E3 optimized PQ (Ge CVPR 2013): eigenvalue-allocation "
              "init + Procrustes-refined rotation learned jointly with "
              "the codebooks; pinned by orthogonality, non-increasing "
              "objective, and the exact ADC == reconstructed-L2 "
              "identity in the learned rotated domain (derived oracle "
              "pins the verdict row)",
          tags=("similarity", "pq", "opq", "evaluation")),
    Query("similarity_ivf_pq_refine", _similarity_ivf_pq_refine_gate,
          _REFINE_SQL,
          doc="E3 two-stage retrieval (FAISS refine-over-IVFPQ "
              "pattern): ADC shortlist from the code-only index, exact "
              "integer re-rank of the surviving pairs via a broadcast "
              "semi-gather; pinned by row-for-row equality with topk_l2 "
              "at the degenerate full-shortlist point and per-query "
              "exact-distance dominance over the plain IVF-PQ ranking "
              "(derived oracle pins the verdict row)",
          tags=("similarity", "pq", "ivf", "refine", "evaluation")),
    Query("streaming_ann_enrich", _streaming_ann_enrich, _STREAM_ANN_SQL,
          doc="E3 × streaming: micro-batch retrieval against a static "
              "pre-encoded IVF-ADC index via foreachBatch reusing the "
              "batch operator; streamed == batch row-for-row incl. "
              "exact ADC dist2 (derived oracle pins the verdict row)",
          tags=("similarity", "pq", "ivf", "streaming", "evaluation")),
    Query("streaming_ann_refine", _streaming_ann_refine,
          _STREAM_ANN_REFINE_SQL,
          doc="E3 × streaming, two-stage serving shape: micro-batch "
              "ADC shortlist against the static index + exact integer "
              "re-rank against the raw vector table per batch; "
              "streamed == batch refine row-for-row incl. exact dist2 "
              "(derived oracle pins the verdict row)",
          tags=("similarity", "pq", "ivf", "refine", "streaming",
                "evaluation")),
    Query("similarity_filtered_search", _similarity_filtered_search,
          _FILTERED_SEARCH_SQL,
          doc="E3 attribute-filtered vector search: one static shared "
              "index, query-time predicate on the code table (pushed "
              "down before the probe join), exact re-rank of the "
              "survivors; FULL value-hash oracle vs DuckDB's exact "
              "filtered top-k at the degenerate depth",
          tags=("similarity", "pq", "ivf", "refine", "filter")),
    Query("dedup_minhash_ml_gate", _dedup_ml_gate, _ML_GATE_SQL,
          doc="E2 positive signal for the ml sketch: pairs ⊆ exact "
              "shingle-Jaccard pairs at the threshold (derived oracle)",
          tags=("dedup", "lsh", "evaluation")),
    Query("text_token_stats", _text_token_stats, _TOKEN_STATS_SQL,
          doc="E5 token/char counting (whitespace + BPE-ish regex)",
          tags=("text",)),
    Query("text_gopher_rules", _text_gopher, _gopher_sql(),
          doc="E5 Gopher quality-filter rule set (Rae et al. 2021): seven "
              "per-doc rules + keep verdict, one zero-shuffle codegen "
              "projection",
          tags=("text", "quality")),
    Query("text_quality", _text_quality, _quality_sql(),
          doc="E5 quality scoring (length/punct/stopword ratios)",
          tags=("text",)),
    Query("text_repetition", _text_repetition, _REPETITION_SQL,
          doc="E5 Gopher-style repetition filter (dup-word + top-unigram "
              "fractions)",
          tags=("text", "quality")),
    Query("text_langid", _text_langid, _langid_sql(),
          doc="E5 stopword-density language ID", tags=("text",)),
    Query("text_fingerprint", _text_fingerprint, _FINGERPRINT_SQL,
          doc="E5 md5 + min-shingle-hash fingerprints", tags=("text",)),
    Query("text_winnowing", _text_winnowing, _winnowing_sql(),
          doc="E5 winnowing fingerprints over a Rabin-Karp rolling hash",
          tags=("text", "dedup")),
    Query("text_scrub_pii", _text_scrub_pii, _scrub_pii_sql(),
          doc="E5 PII redaction (email/IPv4/phone) with per-kind counts, "
              "pure JVM regexp chain",
          tags=("text", "curation")),
    Query("corpus_chunk", _corpus_chunk, _CORPUS_CHUNK_SQL,
          doc="EXT overlapping word-window chunking (posexplode of "
              "slice windows)",
          tags=("text", "curation")),
    Query("events_tumbling", _events_tumbling, _TUMBLING_SQL,
          doc="E6 tumbling windows", tags=("events", "window")),
    Query("events_sliding", _events_sliding, _SLIDING_SQL,
          doc="E6 sliding windows", tags=("events", "window")),
    Query("events_session", _events_session, _SESSION_SQL,
          doc="E6 session windows (gap-based)", tags=("events", "window")),
    Query("join_asof_forward", _join_asof_forward, _ASOF_FWD_SQL,
          doc="forward as-of join (earliest right at-or-after): same "
              "one-shuffle union+window strategy with a leading frame",
          tags=("join", "asof")),
    Query("join_asof_nearest", _join_asof_nearest, _ASOF_NEAREST_SQL,
          doc="nearest as-of join (closer of backward/forward, ties "
              "backward): both window lookups share one key shuffle",
          tags=("join", "asof")),
    Query("join_asof", _join_asof, _ASOF_SQL,
          doc="as-of join: latest purchase at-or-before each click "
              "(cogrouped merge_asof vs native DuckDB ASOF JOIN)",
          tags=("events", "join")),
    Query("events_latest", _events_latest, _LATEST_SQL,
          doc="E6 latest-event-per-key dedup", tags=("events", "window")),
    Query("events_funnel", _events_funnel, _FUNNEL_SQL,
          doc="E6 conversion funnel (single-pass greedy scan; 48 h "
              "transition windows)",
          tags=("events", "window")),
    Query("events_transitions", _events_transitions, _EVENTS_TRANSITIONS_SQL,
          doc="event-type transition counts + ppm share (Markov view: "
              "one key shuffle, LEAD window, tiny-domain count)",
          tags=("events", "window", "aggregate")),
    Query("events_props_json", _events_props_json, _EVENTS_PROPS_SQL,
          doc="schema-on-read JSON property extraction over events "
              "(JVM get_json_object, one scan + map-side-combined agg)",
          tags=("events", "json", "aggregate")),
    Query("events_retention", _events_retention, _RETENTION_SQL,
          doc="E6 weekly cohort retention (distinct activity pairs → "
              "min-period cohort → offset counts)",
          tags=("events", "window")),
    Query("multimodal_meta", _multimodal_meta, _MULTIMODAL_META_SQL,
          doc="E4 binary payload + typed metadata plumbing", tags=("multimodal",)),
    Query("multimodal_features", _multimodal_features, _MULTIMODAL_FEATURES_SQL,
          doc="E4 mapInPandas feature extraction (real codecs for sniffed "
              "media magics, documented length-arithmetic fallback for "
              "unrecognized bytes)",
          tags=("multimodal",)),
    Query("multimodal_decode_png", _multimodal_decode_png, _MULTIMODAL_DECODE_PNG_SQL,
          doc="E4 REAL PNG codec round trip: executor-side encode (all 5 "
              "scanline filters, zlib, CRC) -> full decode -> pixel sums "
              "vs closed-form oracle",
          tags=("multimodal", "codec")),
    Query("multimodal_decode_jpeg", _multimodal_decode_jpeg,
          _MULTIMODAL_DECODE_JPEG_SQL,
          doc="E4 REAL baseline-JPEG codec round trip: executor-side "
              "FDCT + Huffman encode (half with restart markers) -> "
              "full decode (file-table Huffman walk, dequant, batched "
              "IDCT) -> pixel sums vs closed-form oracle (exact: "
              "DC-only blocks, all-ones quant tables)",
          tags=("multimodal", "codec")),
    Query("multimodal_decode_jpeg_progressive",
          _multimodal_decode_jpeg_progressive,
          _MULTIMODAL_DECODE_JPEG_SQL,
          doc="E4 REAL progressive-JPEG (SOF2) codec round trip: "
              "executor-side progressive encode (spectral selection + "
              "successive approximation, half with restart markers) -> "
              "full T.81 Annex G multi-scan decode -> pixel sums vs the "
              "same closed-form oracle as the baseline row (exact: "
              "DC-only blocks, all-ones quant tables)",
          tags=("multimodal", "codec")),
    Query("multimodal_orientation_normalize",
          _multimodal_orientation_normalize,
          _MULTIMODAL_ORIENTATION_NORMALIZE_SQL,
          doc="E4 EXIF orientation normalization: decode + upright "
              "transform (all 8 orientations in-gate) -> position-"
              "weighted checksum vs a CASE-inverted closed-form oracle "
              "(a plain sum cannot distinguish the transforms)",
          tags=("multimodal", "codec")),
    Query("multimodal_decode_jpeg_multiscan",
          _multimodal_decode_jpeg_multiscan,
          _MULTIMODAL_DECODE_JPEG_MULTISCAN_SQL,
          doc="E4 multi-scan sequential JPEG: three non-interleaved "
              "SOF0 scans (one per component, 4:2:0 on even ids) -> "
              "sequential scan-loop decode -> pixel sums vs the 3x "
              "gray closed form (exact via DC rounding)",
          tags=("multimodal", "codec")),
    Query("multimodal_decode_tiff", _multimodal_decode_tiff,
          _MULTIMODAL_DECODE_TIFF_SQL,
          doc="E4 plain-TIFF decode through the GeoTIFF codec: "
              "raw/deflate/PackBits/LZW chunky uint8 -> dims + sample "
              "sums vs closed-form oracle (camera TIFFs share the "
              "container)",
          tags=("multimodal", "codec")),
    Query("multimodal_decode_bmp_rle", _multimodal_decode_bmp_rle,
          _MULTIMODAL_DECODE_BMP_RLE_SQL,
          doc="E4 REAL RLE8-BMP codec round trip: executor-side "
              "run-length encode -> full BI_RLE8 decode (runs, EOL/EOB "
              "escapes) -> pixel sums vs closed-form oracle",
          tags=("multimodal", "codec")),
    Query("multimodal_exif_orientation", _multimodal_exif_orientation,
          _MULTIMODAL_EXIF_ORIENTATION_SQL,
          doc="E4 EXIF orientation: APP1 TIFF IFD0 walk (both byte "
              "orders in-gate) + SOF dims vs closed-form oracle — the "
              "pre-training normalization field of a scraped corpus",
          tags=("multimodal", "codec")),
    Query("multimodal_decode_wav", _multimodal_decode_wav, _MULTIMODAL_DECODE_WAV_SQL,
          doc="E4 REAL WAV codec round trip: executor-side PCM16 encode "
              "-> RIFF decode -> sample sums vs closed-form oracle",
          tags=("multimodal", "codec")),
    Query("multimodal_decode_gif", _multimodal_decode_gif, _MULTIMODAL_DECODE_GIF_SQL,
          doc="E4 REAL animated-GIF codec round trip: executor-side LZW "
              "encode -> dictionary decode + frame compositing -> "
              "per-frame RGB sums vs closed-form oracle (UDTF shape)",
          tags=("multimodal", "codec")),
    Query("multimodal_gif_disposal", _multimodal_gif_disposal,
          _MULTIMODAL_GIF_DISPOSAL_SQL,
          doc="E4 GIF disposal-method compositing: restore-to-background "
              "clears only the frame rect, restore-to-previous reverts "
              "the canvas — per-frame sums vs a CASE-expression oracle",
          tags=("multimodal", "codec")),
    Query("multimodal_audio_features", _multimodal_audio_features,
          _MULTIMODAL_AUDIO_FEATURES_SQL,
          doc="E4 audio quality gating: integer energy/peak/"
              "zero-crossing/clipping features over decoded PCM16, "
              "LAG-verified in SQL",
          tags=("multimodal", "codec")),
    Query("multimodal_decode_png_palette", _multimodal_decode_png_palette,
          _MULTIMODAL_DECODE_PNG_PALETTE_SQL,
          doc="E4 palette + Adam7 PNG: interlaced color-type-3 decode "
              "(per-pass unfilter, PLTE expansion, depth 4/8) with the "
              "RGB pixel sum pinned against the SQL closed form",
          tags=("multimodal", "codec")),
    Query("streaming_media_ingest", _streaming_media_ingest, _STREAMING_MEDIA_SQL,
          doc="E4 via the streaming drop-folder path: binaryFile stream "
              "-> distributed mapInPandas codec decode (same dispatch as "
              "batch) -> features ledger; file-source checkpoint as the "
              "exactly-once ledger",
          tags=("multimodal", "codec", "streaming")),
    Query("multimodal_resize_png", _multimodal_resize_png, _MULTIMODAL_RESIZE_PNG_SQL,
          doc="E4 real nearest-neighbor resample: encode -> decode -> "
              "floor-map resize -> re-encode -> decode, resized pixels "
              "value-verified in SQL",
          tags=("multimodal", "codec")),
    Query("corpus_split", _corpus_split, _corpus_split_sql(),
          doc="deterministic hash train/eval/test split (leakage-stable: "
              "per-row pure function, unlike randomSplit)",
          tags=("sampling", "text")),
    Query("corpus_pack_shards", _corpus_pack_shards, _PACK_SHARDS_SQL,
          doc="token-budget shard packing via exclusive running sum "
              "(deterministic byte-stable shards)",
          tags=("sampling", "text", "window")),
    Query("sink_tokenbin_roundtrip", _tokenbin_roundtrip, _TOKENBIN_SQL,
          doc="E8 training sink: md5-family token ids -> pack_shards -> "
              "uint32 .bin shard files (Megatron layout) -> distributed "
              "readback; position-weighted checksum pins content AND "
              "byte order per shard against a file-free oracle",
          tags=("sampling", "text", "sink")),
    Query("corpus_pack_sequences", _corpus_pack_sequences, _PACK_SEQUENCES_SQL,
          doc="concat-and-split sequence packing (GPT-style pretraining "
              "layout): per-doc stream offset + spanned sequence indices "
              "from the distributed prefix scan",
          tags=("sampling", "text", "window")),
    Query("corpus_shuffle", _corpus_shuffle, _CORPUS_SHUFFLE_SQL,
          doc="seed-stable global training-order permutation per epoch "
              "(range-partitioned sort, no global window)",
          tags=("sampling", "text")),
    Query("multimodal_frames", _multimodal_frames, _MULTIMODAL_FRAMES_SQL,
          doc="E4 video frame sampling, UDTF shape: one asset row → many "
              "frame rows (stub decoder, byte slices hash-verified)",
          tags=("multimodal",)),
    Query("corpus_sample_stratified", _corpus_sample_stratified, _STRATIFIED_SQL,
          doc="exact k-per-stratum sample in deterministic content-hash "
              "order (reproducible across runs/partitionings/engines)",
          tags=("sampling", "text", "window")),
    Query("text_sentences_udtf", _text_sentences, _SENTENCES_SQL,
          doc="Python UDTF (LATERAL table function): doc → sentence rows",
          tags=("text", "udtf")),
    Query("agg_geomean_udaf", _agg_geomean, _GEOMEAN_SQL,
          doc="grouped-agg pandas UDF (Python UDAF): per-lang geometric "
              "mean, sorted-reduction deterministic",
          tags=("agg", "udaf")),
    Query("dedup_clusters", _dedup_clusters, _DEDUP_CLUSTERS_SQL,
          doc="near-dup pairs → transitive clusters: iterative min-label "
              "propagation (Pregel-style) vs a DuckDB recursive CTE",
          tags=("dedup", "graph", "iterative")),
    Query("corpus_decontaminate", _corpus_decontaminate, _DECON_SQL,
          doc="benchmark decontamination: drop corpus docs sharing >= 3 "
              "word n-grams with any benchmark doc (shingle equi-join, "
              "never all-pairs)",
          tags=("sampling", "dedup", "text")),
    Query("merge_upsert", _merge_upsert, _MERGE_UPSERT_SQL,
          doc="ANSI MERGE as one anti-join + union: update matched, "
              "insert unmatched, tombstone-delete flagged rows",
          tags=("merge", "incremental")),
    Query("snapshot_diff", _snapshot_diff, _SNAPSHOT_DIFF_SQL,
          doc="added/removed/changed between two snapshots; only "
              "(key, digest) shuffles, unchanged keys dropped",
          tags=("merge", "incremental")),
    Query("scd2_history", _scd2_history, _SCD2_SQL,
          doc="type-2 SCD from a change log: collapse unchanged runs, "
              "LEAD validity intervals — one shuffle, shared window sort",
          tags=("merge", "incremental", "window")),
    Query("ingest_dead_letters", _ingest_dead_letters, _DEAD_LETTERS_SQL,
          doc="safe typed ingest with a dead-letter channel: try_cast "
              "never aborts, malformed rows route out with field names",
          tags=("quality", "source")),
    Query("column_mad", _column_mad, _COLUMN_MAD_SQL,
          doc="exact per-key median + MAD (robust center/spread): "
              "even-integer domain makes both quantile interpolations "
              "exact; two grouped aggs with a broadcast key join",
          tags=("profile", "aggregate")),
    Query("column_corr", _column_corr, _column_corr_sql(),
          doc="Pearson correlation from exact integer moments (order-free, "
              "unlike F.corr); one map-side-combined agg per pair",
          tags=("profile", "agg")),
    Query("pseudonymize_ids", _pseudonymize_ids, _PSEUDO_SQL,
          doc="salted sha2 surrogate keys: deterministic de-identification "
              "preserving joinability; one codegen projection",
          tags=("text", "privacy")),
    Query("graph_pagerank", _graph_pagerank, _pagerank_sql(),
          doc="fixed-iteration PageRank, integer-micros state: order-free "
              "per-round sums, two shuffles per iteration, teleport via "
              "one-row broadcast",
          tags=("graph", "iterative")),
    Query("events_gap_fill", _events_gap_fill, _GAP_FILL_SQL,
          doc="daily date-spine gap fill: zero-fill additive columns, "
              "LOCF carried level (day-count-sized tail after one agg)",
          tags=("events", "window")),
    Query("events_rolling", _events_rolling, _ROLLING_SQL,
          doc="per-event trailing-window features: one range-frame "
              "window, one key shuffle, exact-cents trailing sums",
          tags=("events", "window")),
    Query("events_outliers", _events_outliers, _OUTLIERS_SQL,
          doc="per-key z-score outliers from exact integer moments; "
              "broadcast moments join, event stream never shuffled",
          tags=("events", "profile")),
    Query("streaming_cdc_upsert", _streaming_cdc_upsert, _CDC_UPSERT_SQL,
          doc="CDC apply via foreachBatch merge_upsert into a versioned "
              "replay-safe state table; oracle = latest change per key "
              "minus tombstones",
          tags=("streaming", "merge", "incremental")),
    Query("join_interval_overlap", _join_interval_overlap, _INTERVAL_SQL,
          doc="interval-overlap join: grid-bucket equi-join, canonical "
              "bucket keeps each pair exactly once (no distinct, no "
              "cartesian)",
          tags=("join", "interval")),
    Query("join_fuzzy_names", _join_fuzzy_names, _FUZZY_SQL,
          doc="entity-resolution fuzzy join: completeness-preserving "
              "length-band blocking + exact JVM levenshtein filter, "
              "never all-pairs",
          tags=("join", "dedup")),
    Query("corpus_bpe_pairs", _corpus_bpe_pairs, _BPE_PAIRS_SQL,
          doc="BPE merge-candidate pair counts: vocabulary-first (corpus "
              "collapses to distinct words before pairs explode)",
          tags=("text", "tokenizer")),
    Query("corpus_dup_spans", _corpus_dup_spans, _DUP_SPANS_SQL,
          doc="E5/E2 exact repeated-span detection (Lee et al. substring "
              "dedup as gram-groupBy + gaps-and-islands merge)",
          tags=("text", "dedup")),
    Query("corpus_quality_classifier", _corpus_quality_classifier,
          _QUALITY_CLASSIFIER_SQL,
          doc="E5 NB quality-classifier filter (GPT-3 recipe, counting-"
              "only train): integer-micros log-odds, exact cross-engine",
          tags=("text", "quality")),
    Query("corpus_line_dedup", _corpus_line_dedup, _LINE_DEDUP_SQL,
          doc="E5/E2 CCNet/FineWeb line-level dedup: segments in >=2 "
              "distinct docs removed from every doc, original casing "
              "and order preserved",
          tags=("text", "dedup")),
    Query("corpus_lm_cross", _corpus_lm_cross, _LM_CROSS_SQL,
          doc="E5 CCNet cross-corpus recipe: reference LM trained on one "
              "corpus scores another; unseen bigrams/contexts back off "
              "through the same add-alpha formula at zero counts",
          tags=("text",)),
    Query("corpus_lm_score", _corpus_lm_score, _LM_SCORE_SQL,
          doc="E5 CCNet-style LM quality scoring: per-doc mean bigram "
              "NLL under the add-alpha corpus self-LM (exact micros)",
          tags=("text", "quality")),
    Query("corpus_dup_spans_clean", _corpus_dup_spans_clean,
          _DUP_SPANS_CLEAN_SQL,
          doc="E5/E2 substring-dedup REMOVAL: duplicated regions cut from "
              "every doc, empty/fully-duplicated docs preserved",
          tags=("text", "dedup")),
    Query("text_char_entropy", _text_char_entropy, _CHAR_ENTROPY_SQL,
          doc="per-doc Shannon char entropy (gibberish/boilerplate "
              "detector); micros-rounded plog terms, order-free sum",
          tags=("text", "quality")),
    Query("text_search_bm25", _text_search_bm25, _BM25_SQL,
          doc="BM25 full-text search: posting lists for |Q| terms only, "
              "micros-integer order-free scoring, distributed partial "
              "top-k",
          tags=("text", "search")),
    Query("dedup_semantic", _dedup_semantic, _SEMANTIC_DEDUP_SQL,
          doc="E2/E3 SemDeDup: k-means blocks bound the cosine pair "
              "search; planted re-embeddings make the drop set a "
              "positive-signal gate (50 copies dropped, originals kept)",
          tags=("dedup", "similarity", "clustering")),
    Query("embedding_kmeans", _embedding_kmeans, _KMEANS_SQL,
          doc="k-means assignment step: k x dim centroid literals in one "
              "codegen projection, exact integer micros L2, no join",
          tags=("similarity", "clustering")),
    Query("skew_heavy_hitters", _skew_heavy_hitters, _SKEW_HH_SQL,
          doc="exact top-k hot shuffle keys with ppm share: map-side "
              "combine + distributed partial top-k (TakeOrderedAndProject)",
          tags=("skew", "profile")),
    Query("skew_key_report", _skew_report, _SKEW_REPORT_SQL,
          doc="one-row key-frequency skew summary (max/mean ratio in "
              "micros) — the salt-or-not alert",
          tags=("skew", "profile")),
    Query("layout_zorder", _layout_zorder, _layout_zorder_sql(),
          doc="Z-order clustering key (bit interleave, pure codegen): the "
              "sort key the layout writer range-partitions by so parquet "
              "min/max stats prune on every clustered dimension",
          tags=("layout", "scan")),
    Query("layout_bucketed_join", _layout_bucketed_join, _BUCKETED_JOIN_SQL,
          doc="hash-bucketed co-located fact-fact join: zero Exchange "
              "nodes at read time, write shuffle amortized across joins; "
              "oracle proves layout-invariance of results",
          tags=("layout", "join", "aggregate")),
    Query("graph_triangles", _graph_triangles, _TRIANGLES_SQL,
          doc="exact triangle count via degree-ordered orientation: "
              "O(m^1.5) wedge bound regardless of skew, hot-basket cap "
              "on pair generation, every stage oracle-mirrored",
          tags=("graph", "join")),
    Query("mv_refresh", _mv_refresh, _MV_REFRESH_SQL,
          doc="incremental view refresh = snapshot_diff (retract+insert "
              "changelog) ∘ maintain_aggregate; churn-sized cost, oracle "
              "recomputes over the new snapshot",
          tags=("merge", "incremental", "agg")),
    Query("mv_sketch_distinct_gate", _mv_sketch_distinct_gate, _MV_SKETCH_SQL,
          doc="incremental COUNT DISTINCT: per-month Datasketches-HLL "
              "sketches stored once, global estimate from the sketch "
              "table alone; exact count + partition count oracle-pinned, "
              "estimate gated at the lg_k=12 5% envelope",
          tags=("merge", "sketch")),
    Query("mv_incremental", _mv_incremental, _MV_INCREMENTAL_SQL,
          doc="incremental materialized-view maintenance: signed changelog "
              "folds into COUNT/SUM view, base facts never rescanned; "
              "oracle = full recompute",
          tags=("merge", "incremental", "agg")),
    Query("corpus_dsir", _corpus_dsir, _dsir_sql(),
          doc="E7 DSIR data selection (Xie et al. 2023): hashed-ngram "
              "importance weights vs the lang='en' target; one corpus "
              "exchange + broadcast bucket model, exact micros",
          tags=("sampling", "quality")),
    Query("corpus_mix", _corpus_mix, _corpus_mix_sql(),
          doc="domain-mixture resampling: per-domain up/down-sampling "
              "rates, hash-gated fractional copies, zero shuffles",
          tags=("sampling", "text")),
    Query("table_profile", _table_profile, _table_profile_sql(),
          doc="ANALYZE-style one-pass column profile: nulls, distinct, "
              "min/max per column (exact here; HLL at scale)",
          tags=("profile", "agg")),
    Query("text_boilerplate", _text_boilerplate, _BOILERPLATE_SQL,
          doc="cross-doc hot-n-gram boilerplate detection (C4-style): "
              "one shingle-key shuffle + semi-join back, ppm hot "
              "fraction per doc",
          tags=("text", "quality", "dedup")),
    Query("corpus_length_buckets", _corpus_length_buckets, _LENGTH_BUCKETS_SQL,
          doc="power-of-two sequence-length histogram for batch "
              "planning: integer bit-length buckets (no float log2), "
              "integer ceil-div batch lower bound",
          tags=("sampling", "profile", "text")),
    Query("corpus_bpe_encode", _corpus_bpe_encode, _bpe_encode_sql(),
          doc="train-then-apply BPE: per-doc exact token counts under "
              "the learned merges (vocab-only encode, broadcast join)",
          tags=("text", "aggregate")),
    Query("corpus_bpe_train", _corpus_bpe_train, _bpe_train_sql(),
          doc="iterative BPE merge learning (3 rounds) over the "
              "vocabulary: one-row argmax collect per round, literal-"
              "replace merge application, fully unrolled SQL oracle",
          tags=("text", "tokenizer", "iterative")),
    Query("corpus_vocab", _corpus_vocab, _VOCAB_SQL,
          doc="corpus vocabulary: term + document frequency per token "
              "(tokenizer-training input), one token-key shuffle",
          tags=("text", "profile")),
    Query("corpus_tfidf", _corpus_tfidf, _TFIDF_SQL,
          doc="smoothed TF-IDF per (doc, token): exact-integer tf/df, "
              "one rounded double",
          tags=("text", "profile")),
    Query("column_hist", _column_hist, _column_hist_sql(),
          doc="equi-width histogram with clamped edge buckets; fixed "
              "parenthesization bins identically on any IEEE engine",
          tags=("profile", "agg")),
    Query("dq_checks", _dq_checks, _DQ_SQL,
          doc="data-quality expectations: row-local rules fold into ONE "
              "aggregation pass, uniqueness adds one groupBy each",
          tags=("profile", "quality")),
]
