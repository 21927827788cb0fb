"""Multimodal column operators (EXT E4 — SURVEY.md §2b).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct (schemas.ASSETS). The Spark-side plumbing — schema,
partition-friendly batching, Arrow transfer, UDF signatures — is real and
tested; the actual codec call is isolated in one function
(:func:`_decode_payload`) that this container stubs with a deterministic
fake (no image/audio libs are installed). Swapping in PIL/librosa/ffmpeg
touches only that function.

Generalizes the reference's binary ingestion pattern (GeoTIFF bytes →
pixels via ``binaryFile`` + mapInPandas, SURVEY.md §2a S5); here the
payloads are arbitrary media instead of rasters.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODALITIES = ("image", "audio", "video", "text")

FEATURES_SCHEMA = (
    "asset_id long, modality string, n_bytes int, width int, height int, "
    "n_frames int, checksum string"
)


def documents_to_assets(docs: DataFrame) -> DataFrame:
    """Build an ASSETS-shaped table from the documents fixture: the text
    payload becomes bytes, modality cycles deterministically by id.

    Stands in for `spark.read.format("binaryFile")` over a media lake —
    same schema, same downstream operators.
    """
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % len(MODALITIES) + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-"), modality).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes, modality: str) -> dict:
    """STUB decoder — deterministic fake features derived from the bytes.

    Real deployment: open ``payload`` with PIL (image), soundfile (audio),
    or pyav (video) and emit true dimensions/frame counts. The arithmetic
    here is fixed so tests and the SQL oracle can verify the plumbing
    end-to-end.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640,
        "height": (n * 7) % 480,
        "n_frames": n % 24 + 1,
    }


def extract_features(assets: DataFrame) -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas.

    One Arrow batch in → one feature batch out; executors never hold more
    than a batch of payloads in memory, so the operator scales to
    arbitrarily large media tables (partition count bounds parallelism,
    `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch footprint).
    """
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].to_numpy())
            out.insert(1, "modality", pdf["modality"].to_numpy())
            out["checksum"] = [
                hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
            ]
            yield out

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        decode, FEATURES_SCHEMA
    )


def frame_sample(assets: DataFrame, every_n: int = 8) -> DataFrame:
    """Sample every n-th frame from video payloads (UDTF shape: one asset
    row in → many frame rows out, via mapInPandas).

    The decoder is the same deterministic stub as extract_features: frame
    count derives from the payload bytes, each sampled "frame" is a
    byte-slice tagged with its index. A real build decodes with pyav and
    yields JPEG-encoded frames — same schema, same batch shape. Non-video
    assets pass through with zero rows (filter pushed into the scan).
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = _decode_payload(data, "video")["n_frames"]
                for fi in range(0, n_frames, every_n):
                    lo = (fi * 17) % max(len(data) - 8, 1)
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_index": fi,
                            "frame_bytes": data[lo : lo + 8],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_index", "frame_bytes"]
            )

    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", "payload")
        .mapInPandas(sample, "asset_id long, frame_index int, frame_bytes binary")
    )


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: same mapInPandas shape as extract_features with a
    payload-to-payload signature. The stub passes bytes through and tags
    the metadata struct; a real build replaces the inner lambda with the
    codec call."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["asset_id", "modality", "payload"]].copy()
            out["width"] = width
            out["height"] = height
            yield out

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        do_resize,
        "asset_id long, modality string, payload binary, width int, height int",
    )
