"""E4 multimodal: binary payload columns through mapInPandas.

Two layers under test: the Spark-side plumbing (ASSETS-shaped schema,
Arrow batch transfer of binary columns, UDF signatures, batch-shape
independence) and, since r10, the REAL pure-stdlib codecs behind it
(functions/imagecodec.py): PNG encode→decode round trips with exact
pixel sums, BMP pixel decode, PCM16 WAV round trips, real
nearest-neighbor resampling and true scanline frame slicing. Payloads
with no recognizable magic keep the documented deterministic fallback
(length-derived pseudo-features), which the first tests pin.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators import multimodal
from sids_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return multimodal.documents_to_assets(docs)


def test_assets_schema(assets):
    fields = {f.name: f.dataType.simpleString() for f in assets.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["modality"] == "string"
    assert fields["meta"].startswith("struct<")


def test_extract_features_deterministic(assets, spark, sf_dir):
    feats = multimodal.extract_features(assets).toPandas().set_index("asset_id")
    docs = load_table(spark, "documents", sf_dir).toPandas().set_index("doc_id")
    assert len(feats) == len(docs)
    for doc_id, row in docs.head(25).iterrows():
        payload = row["text"].encode()
        n = len(payload)
        got = feats.loc[doc_id]
        assert got["n_bytes"] == n
        assert got["width"] == n % 640
        assert got["height"] == (n * 7) % 480
        assert got["n_frames"] == n % 24 + 1
        assert got["checksum"] == hashlib.md5(payload).hexdigest()


def test_extract_features_partition_invariant(assets):
    one = (
        multimodal.extract_features(assets.repartition(1))
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    many = (
        multimodal.extract_features(assets.repartition(7))
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    assert one.equals(many)


def test_frame_sample_video_only(assets):
    frames = multimodal.frame_sample(assets, every_n=8).toPandas()
    video_ids = {
        r.asset_id for r in assets.filter("modality = 'video'").collect()
    }
    assert set(frames["asset_id"]) <= video_ids
    assert len(frames) > 0
    # deterministic: indices step by every_n, slices are 8 bytes
    g = frames[frames["asset_id"] == frames["asset_id"].iloc[0]]
    assert list(g["frame_index"]) == list(range(0, g["frame_index"].max() + 1, 8))
    assert all(len(bytes(b)) <= 8 for b in frames["frame_bytes"])


def test_resize_stub_passthrough(assets):
    out = multimodal.resize_stub(assets, 224, 224)
    row = out.filter(F.col("asset_id") == 0).collect()[0]
    src = assets.filter(F.col("asset_id") == 0).collect()[0]
    assert bytes(row["payload"]) == bytes(src["payload"])
    assert (row["width"], row["height"]) == (224, 224)


# ------------------------------------------------------- real codec paths


@pytest.fixture(scope="module")
def png_assets(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return multimodal.synth_png_assets(docs, modulus=7)


def test_decode_images_roundtrip_matches_formula(png_assets):
    """synth (encode, executor-side) → decode_images recovers the exact
    closed-form dims and pixel sum — value-level proof the five
    unfilter paths reconstruct real pixels through real zlib."""
    got = multimodal.decode_images(png_assets).toPandas().set_index("asset_id")
    assert len(got) > 0
    for did, row in got.head(30).iterrows():
        w, h, c = did % 29 + 4, did % 13 + 3, did % 4 + 1
        assert (row["width"], row["height"], row["channels"]) == (w, h, c)
        expected = sum(
            (did * 7 + 3 * x + 5 * y + 11 * ch) % 256
            for x in range(w) for y in range(h) for ch in range(c)
        )
        assert row["pixel_sum"] == expected, did


def test_extract_features_real_png_and_wav(spark):
    import numpy as np

    from sids_data_pipeline_spark.functions import imagecodec as ic

    png = ic.png_encode(ic.synth_image(3, 21, 9, 3))
    wav = ic.wav_encode(np.zeros((4000, 2), dtype=np.int16), sample_rate=8000)
    df = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "audio", bytearray(wav))],
        "asset_id long, modality string, payload binary",
    )
    feats = {r["asset_id"]: r for r in multimodal.extract_features(df).collect()}
    assert (feats[1]["width"], feats[1]["height"], feats[1]["n_frames"]) == (21, 9, 1)
    # WAV maps (sample_rate, channels, sample frames) into the envelope
    assert (feats[2]["width"], feats[2]["height"], feats[2]["n_frames"]) == (8000, 2, 4000)


def test_extract_features_corrupt_png_is_loud(spark):
    from sids_data_pipeline_spark.functions import imagecodec as ic

    bad = bytearray(ic.png_encode(ic.synth_image(5, 8, 8, 1)))
    bad[41] ^= 0xFF
    df = spark.createDataFrame(
        [(1, "image", bad)], "asset_id long, modality string, payload binary"
    )
    with pytest.raises(Exception, match="CRC"):
        multimodal.extract_features(df).collect()


def test_resize_images_real_resample(spark):
    import numpy as np

    from sids_data_pipeline_spark.functions import imagecodec as ic

    arr = ic.synth_image(11, 10, 8, 3)
    df = spark.createDataFrame(
        [(7, "image", bytearray(ic.png_encode(arr)))],
        "asset_id long, modality string, payload binary",
    )
    row = multimodal.resize_images(df, 5, 4).collect()[0]
    dec, meta = ic.png_decode(bytes(row["payload"]))
    assert (meta["width"], meta["height"]) == (5, 4)
    assert np.array_equal(dec, ic.resize_nearest(arr, 5, 4))


def test_frame_sample_png_filmstrip(spark):
    import numpy as np

    from sids_data_pipeline_spark.functions import imagecodec as ic

    # 4-frame filmstrip of 6x6 frames (h=24, w=6), every_n=2 -> frames 0, 2
    strip = ic.synth_image(13, 6, 24, 2)
    df = spark.createDataFrame(
        [(9, "video", bytearray(ic.png_encode(strip)))],
        "asset_id long, modality string, payload binary",
    )
    frames = {
        r["frame_index"]: bytes(r["frame_bytes"])
        for r in multimodal.frame_sample(df, every_n=2).collect()
    }
    assert sorted(frames) == [0, 2]
    for fi, blob in frames.items():
        dec, meta = ic.png_decode(blob)
        assert (meta["width"], meta["height"]) == (6, 6)
        assert np.array_equal(dec, strip[fi * 6 : (fi + 1) * 6])


def test_decode_images_refuses_non_png(assets):
    with pytest.raises(Exception, match="extract_features"):
        multimodal.decode_images(assets.limit(3)).collect()


def test_decode_audio_roundtrip_matches_formula(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    wavs = multimodal.synth_wav_assets(docs, modulus=7)
    got = multimodal.decode_audio(wavs).toPandas().set_index("asset_id")
    assert len(got) > 0
    for did, row in got.head(20).iterrows():
        n, ch = did % 50 + 10, did % 2 + 1
        assert (row["sample_rate"], row["channels"], row["n_samples"]) == (8000, ch, n)
        assert row["duration_ms"] == n * 1000 // 8000
        expected = sum(
            (did * 31 + 7 * i + 13 * c) % 65536 - 32768
            for i in range(n) for c in range(ch)
        )
        assert row["sample_sum"] == expected, did


def test_audio_features_numpy_oracle(spark):
    """audio_features vs a hand-built WAV with known rails, flips and
    energy: a stereo ramp crossing zero plus both int16 rails."""
    import numpy as np
    import pandas as pd

    from sids_data_pipeline_spark.functions import imagecodec as ic

    left = np.array([-3, -1, 2, -2, 32767, 0, 5], dtype=np.int16)
    right = np.array([1, -1, 1, -32768, 4, -4, 4], dtype=np.int16)
    samples = np.stack([left, right], axis=1)
    wav = ic.wav_encode(samples, sample_rate=16_000)
    assets = spark.createDataFrame(
        pd.DataFrame({"asset_id": [9], "payload": [wav]})
    )
    row = multimodal.audio_features(assets).collect()[0]
    s = samples.astype(np.int64)
    assert row.sum_sq == int((s * s).sum())
    assert row.peak_abs == 32768
    # strict sign flips per channel: left -1->2, 2->-2 (0 breaks the
    # 32767->0->5 run); right flips on every step except 4->-4->4 pairs
    # count too — verify against the formula itself
    expected_flips = int((s[1:] * s[:-1] < 0).sum())
    assert row.zero_crossings == expected_flips
    assert row.clipped_count == 2
    assert (row.sample_rate, row.channels, row.n_samples) == (16_000, 2, 7)
    # non-WAV payload refuses loudly
    bad = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1], "payload": [b"not audio"]})
    )
    with pytest.raises(Exception, match="not a RIFF/WAVE"):
        multimodal.audio_features(bad).collect()


def test_decode_images_bmp_path(spark):
    import numpy as np

    from sids_data_pipeline_spark.functions import imagecodec as ic

    arr = ic.synth_image(21, 7, 5, 3)
    df = spark.createDataFrame(
        [(4, "image", bytearray(ic.bmp_encode(arr)))],
        "asset_id long, modality string, payload binary",
    )
    row = multimodal.decode_images(df).collect()[0]
    assert (row["format"], row["width"], row["height"], row["channels"]) == ("bmp", 7, 5, 3)
    assert row["pixel_sum"] == int(arr.astype("int64").sum())


def test_decode_video_gif_matches_formula(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    gifs = multimodal.synth_gif_assets(docs, modulus=7)
    got = multimodal.decode_video(gifs).toPandas()
    assert len(got) > 0
    for _, row in got.head(25).iterrows():
        did, fi = int(row["asset_id"]), int(row["frame_index"])
        w, h = did % 21 + 4, did % 11 + 3
        assert (row["width"], row["height"]) == (w, h)
        expected = 3 * sum(
            (did * 13 + 17 * fi + 3 * x + 5 * y) % 256
            for x in range(w) for y in range(h)
        )
        assert row["pixel_sum"] == expected, (did, fi)


def test_frame_sample_gif_real_frames(spark):
    import numpy as np

    from sids_data_pipeline_spark.functions import imagecodec as ic

    frames = np.stack(
        [np.full((5, 6), 10 * f, dtype=np.uint8) for f in range(5)]
    )
    df = spark.createDataFrame(
        [(3, "video", bytearray(ic.gif_encode(frames)))],
        "asset_id long, modality string, payload binary",
    )
    out = {
        r["frame_index"]: bytes(r["frame_bytes"])
        for r in multimodal.frame_sample(df, every_n=2).collect()
    }
    assert sorted(out) == [0, 2, 4]
    for fi, blob in out.items():
        dec, meta = ic.png_decode(blob)
        assert (meta["width"], meta["height"], meta["channels"]) == (6, 5, 3)
        assert np.all(dec == 10 * fi)


def test_extract_features_gif_frame_count(spark):
    import numpy as np

    from sids_data_pipeline_spark.functions import imagecodec as ic

    frames = np.zeros((4, 7, 9), dtype=np.uint8)
    df = spark.createDataFrame(
        [(5, "video", bytearray(ic.gif_encode(frames)))],
        "asset_id long, modality string, payload binary",
    )
    row = multimodal.extract_features(df).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (9, 7, 4)


def test_audio_features_float_q20_path(spark):
    """Float32 WAVs quantize to the Q20 grid (round(sample·2²⁰)): a
    fixture built from exact multiples of 2⁻²⁰ recovers its integers
    exactly, full-scale ±1.0 counts as clipped, and NaN refuses."""
    import numpy as np
    import pandas as pd

    from sids_data_pipeline_spark.functions import imagecodec as ic

    k = np.array([[-3, 5], [7, -2], [1 << 20, -(1 << 20)], [0, 4]],
                 dtype=np.int64)
    samples = (k / float(1 << 20)).astype(np.float32)
    wav = ic.wav_encode(samples, sample_rate=16_000)
    assets = spark.createDataFrame(
        pd.DataFrame({"asset_id": [3], "payload": [wav]})
    )
    row = multimodal.audio_features(assets).collect()[0]
    assert row.sum_sq == int((k * k).sum())
    assert row.peak_abs == 1 << 20
    assert row.zero_crossings == int((k[1:] * k[:-1] < 0).sum())
    assert row.clipped_count == 2  # both full-scale rails
    assert (row.sample_rate, row.channels, row.n_samples) == (16_000, 2, 4)
    # NaN poisons determinism -> loud refusal by name
    nan_wav = ic.wav_encode(
        np.array([0.5, np.nan], dtype=np.float32), sample_rate=8000
    )
    bad = spark.createDataFrame(
        pd.DataFrame({"asset_id": [4], "payload": [nan_wav]})
    )
    with pytest.raises(Exception, match="NaN/Inf"):
        multimodal.audio_features(bad).collect()


def test_synth_wav_assets_float_every_mixes_formats(spark):
    """float_every=3 turns every third selected doc into an IEEE-float
    WAV (rate 16000) while the rest stay PCM16 (rate 8000)."""
    import pandas as pd

    from sids_data_pipeline_spark.functions import imagecodec as ic

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(0, 64))})
    )
    rows = multimodal.synth_wav_assets(
        docs, modulus=7, float_every=3
    ).collect()
    fmts = {}
    for r in rows:
        info = ic.wav_info(bytes(r.payload))
        fmts[r.asset_id] = (info["bits_per_sample"], info["sample_rate"])
    assert fmts[0] == (32, 16_000) and fmts[21] == (32, 16_000)
    assert fmts[7] == (16, 8_000) and fmts[14] == (16, 8_000)


def test_decode_images_jpeg_progressive_route(spark, sf_dir):
    """decode_images routes SOF2 payloads through the progressive scan
    loop transparently — pixel sums equal the baseline fixture's."""
    docs = load_table(spark, "documents", sf_dir)
    base = multimodal.decode_images(
        multimodal.synth_jpeg_assets(docs, modulus=13)
    ).collect()
    prog = multimodal.decode_images(
        multimodal.synth_jpeg_assets(docs, modulus=13, progressive=True)
    ).collect()

    def key(r):
        return r.asset_id

    assert sorted(base, key=key) == sorted(prog, key=key)


def test_decode_images_tiff_route(spark, sf_dir):
    """Plain TIFFs route through the GeoTIFF codec: all four
    compressions round-trip with exact sample sums; float-sampled
    TIFFs refuse by name (no exact integer pixel_sum)."""
    import numpy as np
    import pandas as pd

    from sids_data_pipeline_spark.functions import imagecodec as ic
    from sids_data_pipeline_spark.sources import geotiff as gt

    docs = load_table(spark, "documents", sf_dir)
    rows = multimodal.decode_images(
        multimodal.synth_tiff_assets(docs, modulus=13)
    ).collect()
    for r in rows:
        did = r.asset_id
        nb, w, h = did % 3 + 1, did % 13 + 2, did % 7 + 2
        b = np.arange(nb)[:, None, None]
        y = np.arange(h)[None, :, None]
        x = np.arange(w)[None, None, :]
        want = int(((did * 5 + 11 * b + 3 * x + 7 * y) % 256).sum())
        assert (r.format, r.width, r.height, r.channels) == ("tiff", w, h, nb)
        assert r.pixel_sum == want
    # float samples refuse by name
    fl = gt.encode_geotiff(
        np.array([[0.5, 1.25]]), 0.0, 0.0, 1.0, dtype="f8"
    )
    assert ic.sniff(fl) == "tiff"
    bad = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1], "payload": [fl]})
    )
    with pytest.raises(Exception, match="float-sampled TIFF"):
        multimodal.decode_images(bad).collect()
    # extract_features reports real dims for tiff payloads
    feats = multimodal.extract_features(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "asset_id": [2],
                    "modality": ["image"],
                    "payload": [
                        gt.encode_geotiff(
                            np.zeros((3, 4)), 0.0, 0.0, 1.0, dtype="u1"
                        )
                    ],
                }
            )
        )
    ).collect()[0]
    assert (feats.width, feats.height, feats.n_frames) == (4, 3, 1)


def test_extract_features_undecodable_tiff_takes_fallback(spark):
    """ADVICE r12: a 4-byte TIFF magic match whose body the codec can't
    parse (truncated / JPEG-compressed TIFFs common in scraped corpora)
    must profile through the unrecognized-bytes fallback instead of
    poison-pilling the Arrow batch. decode_images keeps the loud refusal
    (pinned elsewhere); extract_features is the total-coverage profiler."""
    from sids_data_pipeline_spark.functions import imagecodec as ic

    truncated = b"II\x2a\x00" + b"\x01\x02\x03"  # magic, garbage body
    good = ic.png_encode(ic.synth_image(3, 6, 5, 1))
    df = spark.createDataFrame(
        [(1, "image", bytearray(truncated)), (2, "image", bytearray(good))],
        "asset_id long, modality string, payload binary",
    )
    feats = {
        r["asset_id"]: r for r in multimodal.extract_features(df).collect()
    }
    n = len(truncated)
    assert (feats[1]["width"], feats[1]["height"], feats[1]["n_frames"]) == (
        n % 640, (n * 7) % 480, n % 24 + 1,
    )
    assert (feats[2]["width"], feats[2]["height"]) == (6, 5)


def test_decode_payload_tiff_fallback_is_narrow(monkeypatch):
    """ADVICE r14: the TIFF profiling fallback catches only the error
    types the codec raises for undecodable INPUT (ValueError,
    NotImplementedError, struct.error); a programming error inside the
    codec must propagate, not silently become length-derived
    pseudo-features that mask a regression."""
    from sids_data_pipeline_spark.operators.multimodal import _decode_payload
    from sids_data_pipeline_spark.sources import geotiff

    payload = b"II*\x00" + b"\x07" * 40  # TIFF magic, undecodable body
    # real undecodable input -> deterministic fallback (unchanged)
    fb = _decode_payload(payload, "image")
    n = len(payload)
    assert fb == {
        "n_bytes": n,
        "width": n % 640,
        "height": (n * 7) % 480,
        "n_frames": n % 24 + 1,
    }

    def boom(_buf):
        raise TypeError("codec regression")

    monkeypatch.setattr(geotiff, "decode_geotiff_bands", boom)
    with pytest.raises(TypeError, match="codec regression"):
        _decode_payload(payload, "image")
