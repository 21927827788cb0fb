"""Pure-stdlib media codecs (functions/imagecodec.py): PNG round trips
through real zlib + all five scanline filters, header parsers for
JPEG/GIF/BMP, WAV RIFF walk, nearest-neighbor resampling, magic
sniffing. No Spark needed — these run in milliseconds."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sids_data_pipeline_spark.functions import imagecodec as ic

# --------------------------------------------------------------------- PNG


@pytest.mark.parametrize("shape", [(1, 1, 1), (3, 7, 1), (8, 5, 2), (13, 31, 3), (17, 9, 4)])
def test_png_roundtrip_filter_cycle(shape):
    rng = np.random.default_rng(int(np.prod(shape)))
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec, meta = ic.png_decode(ic.png_encode(arr))
    assert np.array_equal(dec, arr)
    assert (meta["height"], meta["width"], meta["channels"]) == shape


def test_png_roundtrip_filter0_and_2d_input():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    dec, meta = ic.png_decode(ic.png_encode(arr, filter_cycle=False))
    assert np.array_equal(dec[:, :, 0], arr)
    assert meta["channels"] == 1 and meta["color_type"] == 0


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    c=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, c, seed):
    """Every (dims, channels, content) combination survives the encode→
    decode round trip — the filter cycle means h≥5 exercises all five
    unfilter paths including Paeth/Average left-dependency chains."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    dec, _ = ic.png_decode(ic.png_encode(arr))
    assert np.array_equal(dec, arr)


def test_png_crc_corruption_is_loud():
    enc = bytearray(ic.png_encode(ic.synth_image(1, 6, 6, 3)))
    enc[45] ^= 0xFF  # inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        ic.png_decode(bytes(enc))


def test_png_truncation_is_loud():
    enc = ic.png_encode(ic.synth_image(2, 10, 10, 1))
    with pytest.raises(ValueError, match="IEND|truncated"):
        ic.png_decode(enc[: len(enc) - 14])


def test_png_capability_refusals_name_the_gap():
    # depth 3 is illegal for every color type
    ihdr = struct.pack(">IIBBBBB", 4, 4, 3, 0, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(
        ">I", zlib.crc32(b"IEND") & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="depth 3 not supported"):
        ic.png_decode(b"\x89PNG\r\n\x1a\n" + chunk + iend)
    # a legal header with an EMPTY IDAT stream is a loud ValueError, not
    # a leaked zlib.error
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="corrupt IDAT"):
        ic.png_decode(b"\x89PNG\r\n\x1a\n" + chunk + iend)
    # palette color type 3 WITHOUT a PLTE chunk (undecodable by anyone)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="missing PLTE"):
        ic.png_decode(b"\x89PNG\r\n\x1a\n" + chunk + iend)
    # unknown color type
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 5, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="color type 5"):
        ic.png_decode(b"\x89PNG\r\n\x1a\n" + chunk + iend)
    # unknown interlace method (0 = sequential and 1 = Adam7 both decode)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 2)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="interlace method 2"):
        ic.png_decode(b"\x89PNG\r\n\x1a\n" + chunk + iend)


def test_synth_image_matches_formula():
    arr = ic.synth_image(35, 5, 4, 3)
    for y in range(4):
        for x in range(5):
            for c in range(3):
                assert arr[y, x, c] == (35 * 7 + 3 * x + 5 * y + 11 * c) % 256


# ------------------------------------------------------------- header parses


def _synth_jpeg(w, h, ncomp=3, progressive=False):
    marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    body = struct.pack(">BHHB", 8, h, w, ncomp) + bytes(3 * ncomp)
    app0 = b"\xff\xe0" + struct.pack(">H", 6) + b"JFIF"
    return b"\xff\xd8" + app0 + marker + struct.pack(">H", 2 + len(body)) + body + b"\xff\xd9"


def test_jpeg_sof_scan():
    assert ic.jpeg_dims(_synth_jpeg(640, 480)) == (640, 480, 3)
    assert ic.jpeg_dims(_synth_jpeg(31, 17, ncomp=1, progressive=True)) == (31, 17, 1)
    with pytest.raises(ValueError, match="SOF"):
        ic.jpeg_dims(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError, match="magic"):
        ic.jpeg_dims(b"not a jpeg")


def test_gif_and_bmp_dims():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + bytes(3)
    assert ic.gif_dims(gif) == (320, 200)
    with pytest.raises(ValueError, match="magic"):
        ic.gif_dims(b"GIF00a" + bytes(10))
    # BITMAPINFOHEADER, negative height = top-down rows
    bmp = b"BM" + struct.pack("<IHHI", 122, 0, 0, 54) + struct.pack(
        "<IiiHH", 40, 640, -480, 1, 24
    ) + bytes(20)
    assert ic.bmp_dims(bmp) == (640, 480)
    core = b"BM" + struct.pack("<IHHI", 38, 0, 0, 26) + struct.pack(
        "<IHHHH", 12, 64, 48, 1, 8
    )
    assert ic.bmp_dims(core) == (64, 48)


def test_wav_roundtrip_and_info():
    tone = (np.sin(np.arange(8000) / 20) * 3000).astype(np.int16)
    wav = ic.wav_encode(np.stack([tone, -tone], axis=1), sample_rate=8000)
    info = ic.wav_info(wav)
    assert info == {
        "channels": 2,
        "sample_rate": 8000,
        "bits_per_sample": 16,
        "n_samples": 8000,
        "duration_ms": 1000,
    }
    with pytest.raises(ValueError, match="magic"):
        ic.wav_info(b"RIFFxxxxNOPE")


# ---------------------------------------------------------------- sniffing


def test_sniff_rejects_plain_text_and_near_misses():
    assert ic.sniff(b"hello world, this is a document payload") is None
    # 'BM' text must not sniff as bmp (DIB size check)
    assert ic.sniff(b"BMW drivers wrote this sentence for us....") is None
    # 'RIFF' without WAVE must not sniff as wav
    assert ic.sniff(b"RIFF1234AVI LIST" + bytes(8)) is None
    assert ic.sniff(ic.png_encode(ic.synth_image(0, 2, 2, 1))) == "png"
    assert ic.sniff(_synth_jpeg(4, 4)) == "jpeg"


# ---------------------------------------------------------------- resizing


def test_resize_nearest_floor_semantics():
    arr = ic.synth_image(9, 8, 6, 2)
    out = ic.resize_nearest(arr, 3, 5)
    assert out.shape == (5, 3, 2)
    for y in range(5):
        for x in range(3):
            assert np.array_equal(out[y, x], arr[(y * 6) // 5, (x * 8) // 3])
    up = ic.resize_nearest(arr, 16, 12)  # upscale repeats pixels
    assert up.shape == (12, 16, 2)
    assert np.array_equal(up[::2, ::2], arr)
    with pytest.raises(ValueError, match="positive"):
        ic.resize_nearest(arr, 0, 5)


# ------------------------------------------------------------------- BMP/WAV


@pytest.mark.parametrize("shape", [(1, 1, 1), (5, 3, 1), (4, 7, 3), (9, 2, 4)])
def test_bmp_roundtrip(shape):
    rng = np.random.default_rng(int(np.prod(shape)) + 1)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec, meta = ic.bmp_decode(ic.bmp_encode(arr))
    assert np.array_equal(dec, arr)
    assert (meta["height"], meta["width"], meta["channels"]) == shape
    # row padding: width 3 at 3 channels = 9 bytes/row -> padded to 12
    assert ic.sniff(ic.bmp_encode(arr)) == "bmp"


def test_bmp_decode_refusals():
    arr = ic.synth_image(3, 4, 4, 3)
    enc = bytearray(ic.bmp_encode(arr))
    enc[30] = 1  # BI_RLE8 on a 24-bit image: format-illegal combination
    with pytest.raises(ValueError, match="RLE8 requires 8-bit"):
        ic.bmp_decode(bytes(enc))
    enc[30] = 3  # BI_BITFIELDS stays a named capability refusal
    with pytest.raises(ValueError, match="compression=3"):
        ic.bmp_decode(bytes(enc))
    with pytest.raises(ValueError, match="truncated"):
        ic.bmp_decode(ic.bmp_encode(arr)[:-8])


@pytest.mark.parametrize("shape", [(3, 5, 1), (11, 17, 3), (16, 16, 4), (2, 2, 2)])
def test_png_adam7_interlace_roundtrip(shape):
    """Adam7 write → read reproduces pixels exactly for every channel
    count, including dims below the 8-px pass grid (empty passes) and
    non-multiples (ragged pass widths)."""
    rng = np.random.default_rng(int(np.prod(shape)))
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    enc = ic.png_encode(arr, interlace=True)
    dec, meta = ic.png_decode(enc)
    assert np.array_equal(dec, arr)
    assert (meta["height"], meta["width"], meta["channels"]) == shape
    # interlaced and sequential encodes of the same pixels agree
    seq, _ = ic.png_decode(ic.png_encode(arr))
    assert np.array_equal(dec, seq)


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_16bit_roundtrip(channels, interlace):
    """uint16 input writes bit depth 16 (big-endian) and reads back
    exactly — sequential and Adam7, with the filter cycle exercising
    the 2-bytes-per-sample filter distance."""
    rng = np.random.default_rng(channels * 7 + interlace)
    arr = rng.integers(0, 65536, size=(9, 11, channels), dtype=np.uint16)
    dec, meta = ic.png_decode(ic.png_encode(arr, interlace=interlace))
    assert dec.dtype == np.uint16 and np.array_equal(dec, arr)
    assert meta["bit_depth"] == 16 and meta["channels"] == channels


@pytest.mark.parametrize("depth", [2, 4, 8])
def test_png_interlaced_palette_roundtrip(depth):
    """Adam7 + palette together: per-pass bit packing (each pass pads
    its own rows to byte boundaries) must reassemble exactly."""
    rng = np.random.default_rng(depth + 100)
    idx = rng.integers(0, 1 << depth, size=(11, 13), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(1 << depth, 3), dtype=np.uint8)
    enc = ic.png_encode_indexed(idx, pal, depth=depth, interlace=True)
    dec, meta = ic.png_decode(enc)
    assert meta["bit_depth"] == depth and meta["color_type"] == 3
    assert np.array_equal(dec, pal[idx])


def test_png_review_hardening_r11():
    """Review fixes: byte-swapped uint16 encodes as real 16-bit (not
    wrapped 8-bit), oversized PLTE and tRNS-longer-than-PLTE refuse
    with png-named messages instead of numpy errors."""
    swapped = np.array([[256, 1000], [65535, 2]], dtype=">u2")
    dec, meta = ic.png_decode(ic.png_encode(swapped))
    assert meta["bit_depth"] == 16
    assert np.array_equal(dec[:, :, 0], swapped.astype(np.uint16))
    # PLTE with more entries than 2^depth
    idx = np.zeros((2, 2), dtype=np.uint8)
    pal = np.zeros((16, 3), dtype=np.uint8)
    enc = bytearray(ic.png_encode_indexed(idx, pal, depth=4))
    at = enc.index(b"PLTE") - 4
    ln = int.from_bytes(enc[at : at + 4], "big")
    big = ic._png_chunk(b"PLTE", bytes(3 * 32))
    enc[at : at + 12 + ln] = big
    with pytest.raises(ValueError, match="legal maximum is 16"):
        ic.png_decode(bytes(enc))
    # tRNS longer than the palette
    enc = bytearray(ic.png_encode_indexed(idx, pal[:4], trns=np.zeros(3, np.uint8)))
    at = enc.index(b"tRNS") - 4
    enc[at : at + 12 + 3] = ic._png_chunk(b"tRNS", bytes(10))
    with pytest.raises(ValueError, match="tRNS has 10 entries but the PLTE"):
        ic.png_decode(bytes(enc))


def test_png_trns_color_key_gray_and_rgb():
    """tRNS on color types 0/2 is a transparent color KEY: matching
    pixels expand to alpha 0, everything else opaque — for 8- and
    16-bit samples."""
    arr = np.array([[10, 20], [10, 30]], dtype=np.uint8)
    enc = bytearray(ic.png_encode(arr, filter_cycle=False))
    # splice a tRNS chunk (gray key = 10) before IDAT
    at = enc.index(b"IDAT") - 4
    enc[at:at] = ic._png_chunk(b"tRNS", struct.pack(">H", 10))
    dec, meta = ic.png_decode(bytes(enc))
    assert meta["channels"] == 2
    assert np.array_equal(dec[:, :, 0], arr)
    assert np.array_equal(
        dec[:, :, 1], np.where(arr == 10, 0, 255).astype(np.uint8)
    )
    # RGB 16-bit: key = (1, 2, 3)
    rgb = np.zeros((2, 2, 3), dtype=np.uint16)
    rgb[0, 0] = (1, 2, 3)
    rgb[1, 1] = (1, 2, 9999)
    enc = bytearray(ic.png_encode(rgb, filter_cycle=False))
    at = enc.index(b"IDAT") - 4
    enc[at:at] = ic._png_chunk(b"tRNS", struct.pack(">HHH", 1, 2, 3))
    dec, meta = ic.png_decode(bytes(enc))
    assert meta["channels"] == 4 and dec.dtype == np.uint16
    assert dec[0, 0, 3] == 0 and dec[1, 1, 3] == 65535
    # malformed key length refuses
    enc[at:at] = b""  # no-op; rebuild with a short key instead
    bad = bytearray(ic.png_encode(arr, filter_cycle=False))
    at = bad.index(b"IDAT") - 4
    bad[at:at] = ic._png_chunk(b"tRNS", b"\x00")
    with pytest.raises(ValueError, match="tRNS length 1"):
        ic.png_decode(bytes(bad))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray_bit_replication(depth):
    """Color-type-0 at depths 1/2/4 (bitmaps/masks) scales by exact bit
    replication: max sample -> 255, zero rounding (x255/x85/x17)."""
    rng = np.random.default_rng(depth + 50)
    w, h = 11, 4
    vals = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
    # hand-pack a type-0 sub-byte PNG (no public writer for this shape)
    shifts = np.arange(depth - 1, -1, -1, dtype=np.uint8)
    bits = ((vals[:, :, None] >> shifts) & 1).reshape(h, w * depth)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    rows = np.packbits(bits, axis=1)
    lines = bytearray()
    for y in range(h):
        lines.append(0)
        lines.extend(rows[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    enc = (
        b"\x89PNG\r\n\x1a\n"
        + ic._png_chunk(b"IHDR", ihdr)
        + ic._png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + ic._png_chunk(b"IEND", b"")
    )
    dec, meta = ic.png_decode(enc)
    scale = 255 // ((1 << depth) - 1)
    assert meta["bit_depth"] == depth and meta["channels"] == 1
    assert np.array_equal(dec[:, :, 0], vals * scale)
    assert dec.max() <= 255 and (vals.max() == (1 << depth) - 1) == (
        dec.max() == 255
    )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_palette_roundtrip(depth):
    """Depth 1/2/4 palette indices pack big-endian-first with row
    padding; widths chosen to NOT align to byte boundaries."""
    rng = np.random.default_rng(depth)
    w = 13 if depth != 2 else 9  # 13 px at 4bpp = 6.5 bytes -> padded
    idx = rng.integers(0, 1 << depth, size=(5, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(1 << depth, 3), dtype=np.uint8)
    dec, meta = ic.png_decode(ic.png_encode_indexed(idx, pal, depth=depth))
    assert meta["bit_depth"] == depth and meta["channels"] == 3
    assert np.array_equal(dec, pal[idx])


def test_png_depth_matrix_refusals():
    """Spec-illegal depth/type combinations refuse with both named."""
    # 16-bit palette is illegal in the spec
    enc = bytearray(
        ic.png_encode_indexed(
            np.zeros((2, 2), dtype=np.uint8),
            np.zeros((2, 3), dtype=np.uint8),
        )
    )
    ihdr_at = enc.index(b"IHDR") + 4
    enc[ihdr_at + 8] = 16  # depth byte
    body = bytes(enc[ihdr_at : ihdr_at + 13])
    enc[ihdr_at + 13 : ihdr_at + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="depth 16 not supported for color type 3"):
        ic.png_decode(bytes(enc))
    # depth-4 RGB is illegal too
    enc2 = bytearray(ic.png_encode(np.zeros((2, 2, 3), dtype=np.uint8)))
    at = enc2.index(b"IHDR") + 4
    enc2[at + 8] = 4
    body = bytes(enc2[at : at + 13])
    enc2[at + 13 : at + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="depth 4 not supported for color type 2"):
        ic.png_decode(bytes(enc2))


def test_png_palette_decode_plte_and_trns():
    """Color-type-3 decode expands indices through PLTE (RGB) and adds
    the tRNS per-entry alpha channel when present; out-of-range indices
    and a missing PLTE refuse loudly."""
    rng = np.random.default_rng(33)
    idx = rng.integers(0, 16, size=(7, 9), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    dec, meta = ic.png_decode(ic.png_encode_indexed(idx, pal))
    assert meta["channels"] == 3 and meta["color_type"] == 3
    assert np.array_equal(dec, pal[idx])
    # tRNS: entries beyond its length default to opaque 255
    trns = np.array([0, 128, 255], dtype=np.uint8)
    dec4, meta4 = ic.png_decode(ic.png_encode_indexed(idx, pal, trns=trns))
    assert meta4["channels"] == 4
    assert np.array_equal(dec4[:, :, :3], pal[idx])
    lut = np.full(16, 255, dtype=np.uint8)
    lut[:3] = trns
    assert np.array_equal(dec4[:, :, 3], lut[idx])
    # out-of-range index vs a truncated palette refuses at decode
    enc = bytearray(ic.png_encode_indexed(idx, pal))
    with pytest.raises(ValueError, match="outside the"):
        ic.png_encode_indexed(np.full((2, 2), 16, dtype=np.uint8), pal)
    # strip PLTE -> loud refusal (type-3 without a palette is undecodable)
    p = enc.index(b"PLTE") - 4
    ln = int.from_bytes(enc[p : p + 4], "big")
    with pytest.raises(ValueError, match="missing PLTE"):
        ic.png_decode(bytes(enc[:p] + enc[p + 12 + ln :]))


def test_bmp_palette_expansion():
    """8-bit BMP pixels are palette indices (ADVICE r10): a non-identity
    palette must expand to RGB, never be returned as raw gray
    intensities. bmp_encode writes the identity-grayscale table at
    offset 54 (BITMAPINFOHEADER), so patching those 1024 bytes makes a
    fixture no stdlib writer produces."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 6), dtype=np.uint8)
    enc = bytearray(ic.bmp_encode(arr))
    # identity palette still decodes as 1-channel gray
    dec, meta = ic.bmp_decode(bytes(enc))
    assert meta["channels"] == 1 and np.array_equal(dec[:, :, 0], arr)
    # chromatic palette: entry i -> (i, 40, 255-i), stored as BGRA quads
    quads = np.zeros((256, 4), dtype=np.uint8)
    quads[:, 2] = np.arange(256)          # R
    quads[:, 1] = 40                      # G
    quads[:, 0] = 255 - np.arange(256)    # B
    enc[54 : 54 + 1024] = quads.tobytes()
    dec, meta = ic.bmp_decode(bytes(enc))
    assert meta["channels"] == 3
    assert np.array_equal(dec[:, :, 0], arr)
    assert (dec[:, :, 1] == 40).all()
    assert np.array_equal(dec[:, :, 2], 255 - arr)
    # biClrUsed smaller than the indices present -> loud out-of-range
    small = bytearray(ic.bmp_encode(arr))
    small[46:50] = struct.pack("<I", 16)
    with pytest.raises(ValueError, match="outside the 16-entry palette"):
        ic.bmp_decode(bytes(small))


def test_wav_info_truncated_data_chunk():
    """wav_info must refuse a data chunk whose declared length overruns
    the file (ADVICE r10) instead of reporting inflated n_samples —
    matching wav_decode's existing posture."""
    wav = ic.wav_encode(np.zeros(100, dtype=np.int16), sample_rate=8000)
    with pytest.raises(ValueError, match="truncated"):
        ic.wav_info(wav[:-20])
    # intact file still reports the true frame count
    assert ic.wav_info(wav)["n_samples"] == 100


def test_wav_24bit_and_float_roundtrip():
    """PCM24 packs/unpacks sign-extended 3-byte frames; IEEE-float 32
    round-trips exactly; unsupported widths still refuse by name."""
    rng = np.random.default_rng(24)
    s24 = rng.integers(-(1 << 23), 1 << 23, size=(40, 2)).astype(np.int32)
    dec, info = ic.wav_decode(ic.wav_encode(s24, sample_rate=48_000, bits=24))
    assert dec.dtype == np.int32 and np.array_equal(dec, s24)
    assert info["bits_per_sample"] == 24 and info["n_samples"] == 40
    f32 = rng.normal(size=(30, 1)).astype(np.float32)
    dec, info = ic.wav_decode(ic.wav_encode(f32, sample_rate=8000))
    assert dec.dtype == np.float32 and np.array_equal(dec, f32)
    assert info["bits_per_sample"] == 32
    # 24-bit overflow refuses at encode; an unsupported width refuses
    # at decode (8-bit PCM decodes since r12, so 12-bit stands in)
    with pytest.raises(ValueError, match="±2\\^23"):
        ic.wav_encode(np.array([1 << 23], dtype=np.int32), bits=24)
    bad = bytearray(ic.wav_encode(np.zeros(4, dtype=np.int16)))
    bad[34] = 12
    with pytest.raises(ValueError, match="format 1 at 12-bit"):
        ic.wav_decode(bytes(bad))


def test_wav_decode_roundtrip_and_refusals():
    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32768, size=(50, 2)).astype(np.int16)
    wav = ic.wav_encode(samples, sample_rate=8000)
    dec, info = ic.wav_decode(wav)
    assert np.array_equal(dec, samples)
    assert info["n_samples"] == 50 and info["channels"] == 2
    # unsupported width refused: patch bits_per_sample in the fmt
    # chunk (8-bit PCM decodes since r12, so 12-bit stands in)
    bad = bytearray(wav)
    bad[34] = 12
    with pytest.raises(ValueError, match="12-bit not supported"):
        ic.wav_decode(bytes(bad))


# ----------------------------------------------------------------------- GIF


def _lzw_literal_stream(indices):
    """The 'uncompressed GIF' LZW trick (8-bit literals + periodic
    clear), as raw sub-block payload bytes — test-local twin of the
    writer so tests can assemble custom frames/flags byte-by-byte."""
    clear, bits = 256, 9
    codes = []
    for i, px in enumerate(indices):
        if i % 254 == 0:
            codes.append(clear)
        codes.append(int(px))
    codes.append(clear + 1)
    acc = nbits = 0
    out = bytearray()
    for code in codes:
        acc |= code << nbits
        nbits += bits
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(payload):
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _gray_palette():
    return b"".join(bytes((i, i, i)) for i in range(256))


@pytest.mark.parametrize("shape", [(1, 3, 4), (4, 6, 6), (3, 17, 9), (2, 40, 33)])
def test_gif_roundtrip_multiframe(shape):
    rng = np.random.default_rng(int(np.prod(shape)))
    frames = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec, meta = ic.gif_decode(ic.gif_encode(frames))
    assert dec.shape == (*shape, 3)
    for ch in range(3):  # identity grayscale palette
        assert np.array_equal(dec[..., ch], frames)
    assert meta["n_frames"] == shape[0]


def test_gif_lzw_real_compression_decodes():
    """gif_decode must handle REAL dictionary growth, not just the
    literal-stream writer: a highly repetitive frame produces long
    dictionary chains including the KwKwK case via a third-party-style
    compressor — emulate by running our decoder against a stream built
    with an actual LZW compressor implemented in-test."""
    # in-test LZW compressor (standard GIF variant)
    def compress(indices, min_code=8):
        clear, end = 1 << min_code, (1 << min_code) + 1
        table = {bytes((i,)): i for i in range(clear)}
        next_code, bits = end + 1, min_code + 1
        out_codes = [clear]
        w = b""
        for px in bytes(indices):
            wk = w + bytes((px,))
            if wk in table:
                w = wk
            else:
                out_codes.append(table[w])
                if next_code < 4096:
                    table[wk] = next_code
                    next_code += 1
                    if next_code == (1 << bits) + 1 and bits < 12:
                        pass
                # GIF width grows when next emitted code needs more bits
                if next_code == (1 << bits) + 1 and bits < 12:
                    bits += 1
                w = bytes((px,))
        out_codes.append(table[w])
        out_codes.append(end)
        # pack (re-walk widths exactly as a decoder grows them)
        acc = nbits = 0
        stream = bytearray()
        bits = min_code + 1
        nc = end + 1
        for code in out_codes:
            acc |= code << nbits
            nbits += bits
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
            if code == clear:
                bits, nc = min_code + 1, end + 1
            elif nc < 4096:
                nc += 1
                if nc == (1 << bits) and bits < 12:
                    bits += 1
        if nbits:
            stream.append(acc & 0xFF)
        return bytes(stream)

    h, w = 24, 37
    frame = np.tile(np.arange(w, dtype=np.uint8) % 7, (h, 1))  # repetitive
    gif = bytearray(b"GIF89a")
    gif += __import__("struct").pack("<HHBBB", w, h, 0x87, 0, 0)
    gif += _gray_palette()
    gif += b"\x2c" + __import__("struct").pack("<HHHHB", 0, 0, w, h, 0)
    gif.append(8)
    gif += _subblocks(compress(frame.ravel()))
    gif.append(0x3B)
    dec, meta = ic.gif_decode(bytes(gif))
    assert np.array_equal(dec[0, :, :, 0], frame)


def test_gif_interlaced_rows_restored():
    h, w = 13, 5
    frame = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    gif = bytearray(b"GIF89a")
    gif += __import__("struct").pack("<HHBBB", w, h, 0x87, 0, 0)
    gif += _gray_palette()
    gif += b"\x2c" + __import__("struct").pack("<HHHHB", 0, 0, w, h, 0x40)
    gif.append(8)
    gif += _subblocks(_lzw_literal_stream(frame[order].ravel()))
    gif.append(0x3B)
    dec, _ = ic.gif_decode(bytes(gif))
    assert np.array_equal(dec[0, :, :, 0], frame)


def test_gif_transparency_and_reserved_disposal_refusal():
    import struct as st

    h = w = 4
    f1 = np.full((h, w), 9, dtype=np.uint8)
    f2 = np.full((h, w), 200, dtype=np.uint8)
    f2[0, :] = 7  # transparent index
    head = bytearray(b"GIF89a") + st.pack("<HHBBB", w, h, 0x87, 0, 0) + _gray_palette()

    def frame_block(fr, gce_flags=0, tindex=0):
        b = bytearray(b"\x21\xf9\x04") + bytes((gce_flags, 0, 0, tindex, 0))
        b += b"\x2c" + st.pack("<HHHHB", 0, 0, w, h, 0) + bytes((8,))
        b += _subblocks(_lzw_literal_stream(fr.ravel()))
        return b

    gif = head + frame_block(f1) + frame_block(f2, gce_flags=0x01, tindex=7) + b"\x3b"
    dec, meta = ic.gif_decode(bytes(gif))
    assert meta["n_frames"] == 2
    assert np.all(dec[1, 0, :, 0] == 9)      # transparent row kept frame 1
    assert np.all(dec[1, 1:, :, 0] == 200)   # opaque rows painted
    # reserved disposal values (4-7) refuse loudly
    gif = head + frame_block(f1, gce_flags=4 << 2) + b"\x3b"
    with pytest.raises(ValueError, match="reserved disposal"):
        ic.gif_decode(bytes(gif))


def test_gif_disposal_methods_composite_correctly():
    """Disposal 2 clears ONLY the frame's rect to background; disposal 3
    reverts the canvas to its pre-frame state (GIF89a §23)."""
    w, h = 6, 5
    base = np.full((h, w), 50, dtype=np.uint8)
    inner = np.full((h - 2, w - 2), 200, dtype=np.uint8)
    corner = np.full((2, 2), 90, dtype=np.uint8)
    top = np.full((1, w), 130, dtype=np.uint8)
    data = ic.gif_encode_frames(w, h, [
        {"idx": base, "disposal": 1},
        {"idx": inner, "left": 1, "top": 1, "disposal": 2},
        {"idx": corner, "disposal": 3},
        {"idx": top, "disposal": 0},
    ])
    dec, meta = ic.gif_decode(data)
    assert meta["n_frames"] == 4
    g = dec[:, :, :, 0]  # identity palette
    assert (g[0] == 50).all()
    assert (g[1][1:-1, 1:-1] == 200).all() and g[1][0, 0] == 50
    # f2: inner rect cleared to background (bg index 0 = black), ring kept
    assert (g[2][0:2, 0:2] == 90).all()
    assert g[2][0, 2] == 50 and g[2][2, 2] == 0
    # f3: canvas reverted (corner gone), top row painted
    assert (g[3][0, :] == 130).all()
    assert g[3][1, 0] == 50 and g[3][1, 1] == 0 and g[3][2, 2] == 0
    # the header fast path never composites, so it agrees on counts
    assert ic.gif_frame_meta(data)["n_frames"] == 4


def test_gif_frame_meta_matches_full_decode():
    rng = np.random.default_rng(99)
    frames = rng.integers(0, 256, size=(5, 9, 11), dtype=np.uint8)
    enc = ic.gif_encode(frames)
    meta = ic.gif_frame_meta(enc)
    _, full = ic.gif_decode(enc)
    assert meta == full == {"width": 11, "height": 9, "n_frames": 5}
    with pytest.raises(ValueError, match="truncated|magic|no image"):
        ic.gif_frame_meta(enc[: len(enc) // 3])


# --------------------------------------------------------------------------
# JPEG full codec (baseline sequential)


def test_jpeg_block_constant_roundtrip_exact():
    """8×8-block-constant gray + all-ones quant tables round-trip EXACTLY:
    DC-only blocks, zero quantization error — the multimodal_decode_jpeg
    oracle contract."""
    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, (3, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    ones = np.ones(64, dtype=np.int64)
    for rst in (0, 2, 5):
        data = ic.jpeg_encode(img, quant_tables=(ones, ones), restart_interval=rst)
        arr, meta = ic.jpeg_decode(data)
        assert meta == {"width": 32, "height": 24, "channels": 1,
                        "subsampling": "gray"}
        assert (arr[:, :, 0] == img).all()
        assert ic.sniff(data) == "jpeg"
        assert ic.jpeg_dims(data) == (32, 24, 1)


def test_jpeg_gray_rgb_through_color_convert_exact():
    """R=G=B block-constant input means Cb=Cr=128 exactly, so even the
    color-converted path round-trips exactly with all-ones tables."""
    rng = np.random.default_rng(12)
    blocks = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    g = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    rgb = np.stack([g, g, g], axis=2)
    ones = np.ones(64, dtype=np.int64)
    arr, meta = ic.jpeg_decode(ic.jpeg_encode(rgb, quant_tables=(ones, ones)))
    assert meta["channels"] == 3
    assert (arr == rgb).all()


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_jpeg_quality_roundtrip_within_quantization_tolerance(subsampling):
    """Smooth synthetic RGB at quality 95 reconstructs within a small
    per-sample tolerance vs the PNG-path ground truth on the same array
    (the judge's decode(jpeg(x)) ≈ x contract); non-multiple-of-MCU dims
    exercise edge padding + crop."""
    src = ic.synth_image(5, 33, 19, 3)
    truth, _ = ic.png_decode(ic.png_encode(src))  # PNG path is lossless
    arr, meta = ic.jpeg_decode(ic.jpeg_encode(src, quality=95,
                                              subsampling=subsampling))
    assert meta["subsampling"] == subsampling
    assert arr.shape == truth.shape
    err = np.abs(arr.astype(int) - truth.astype(int))
    if subsampling == "4:4:4":
        assert err.max() <= 8
    else:  # chroma is box-averaged then replicated: looser but bounded
        assert err.mean() <= 4.0 and err.max() <= 64


def test_jpeg_noise_roundtrip_bounded_and_deterministic():
    rng = np.random.default_rng(13)
    src = rng.integers(0, 256, (21, 37, 3), dtype=np.uint8)
    d1 = ic.jpeg_encode(src, quality=50, subsampling="4:2:0")
    d2 = ic.jpeg_encode(src, quality=50, subsampling="4:2:0")
    assert d1 == d2  # deterministic encoder
    arr, meta = ic.jpeg_decode(d1)
    assert (meta["width"], meta["height"]) == (37, 21)
    assert arr.shape == (21, 37, 3)


def test_jpeg_refusals_name_the_capability():
    ones = np.ones(64, dtype=np.int64)
    data = ic.jpeg_encode(np.zeros((8, 8), dtype=np.uint8),
                          quant_tables=(ones, ones))
    # arithmetic-coded: flip SOF0 -> SOF9 (progressive SOF2 is now a
    # supported frame type, tested in the test_jpeg_progressive_* group)
    bad = bytearray(data)
    bad[bad.index(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF9"):
        ic.jpeg_decode(bytes(bad))
    # a SOF2 header over a baseline full-band scan is malformed, not a
    # capability gap: a progressive DC scan must carry Se=0
    bad = bytearray(data)
    bad[bad.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive DC scan"):
        ic.jpeg_decode(bytes(bad))
    # truncation at several depths is loud
    for cut in (10, 30, len(data) // 2, len(data) - 3):
        with pytest.raises(ValueError):
            ic.jpeg_decode(data[:cut])
    with pytest.raises(ValueError, match="magic"):
        ic.jpeg_decode(b"nonsense payload")
    with pytest.raises(ValueError, match="quality"):
        ic.jpeg_encode(np.zeros((8, 8), dtype=np.uint8), quality=0)
    with pytest.raises(ValueError, match="subsampling"):
        ic.jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="4:1:1")
    # out-of-range quant values would wrap in the 8-bit DQT (256 -> 0):
    # quantize with one table, dequantize with another — refuse instead
    big = np.full(64, 256, dtype=np.int64)
    with pytest.raises(ValueError, match="1..255"):
        ic.jpeg_encode(np.zeros((8, 8), dtype=np.uint8), quant_tables=(big, big))
    with pytest.raises(ValueError, match="1..255"):
        ic.jpeg_encode(
            np.zeros((8, 8), dtype=np.uint8),
            quant_tables=(np.ones(64, dtype=np.int64), np.zeros(64, dtype=np.int64)),
        )


def test_jpeg_non_divisible_sampling_refuses_by_name():
    """A T.81-legal layout where a component factor does not divide the
    max (Y h=3, chroma h=2) needs fractional upsampling — the decoder
    must refuse with the layout named, not crash in np.stack."""
    ones = np.ones(64, dtype=np.int64)
    data = bytearray(
        ic.jpeg_encode(
            ic.synth_image(3, 24, 24, 3), quality=90, subsampling="4:2:0"
        )
    )
    sof = data.index(b"\xff\xc0")
    # per-component (cid, hv, tq) triples start at marker offset 10;
    # comp0 hv is at +11, comp1 hv at +14
    data[sof + 11] = (3 << 4) | 2  # Y h=3 v=2 (was 2,2) -> hmax=3
    data[sof + 14] = (2 << 4) | 1  # Cb h=2 v=1: 3 % 2 != 0
    with pytest.raises(ValueError, match="non-integer upsampling"):
        ic.jpeg_decode(bytes(data))
    data[sof + 11] = 0x22
    data[sof + 14] = 0x01  # zero h factor
    with pytest.raises(ValueError, match="zero sampling factor"):
        ic.jpeg_decode(bytes(data))


def test_jpeg_decoder_reads_tables_from_the_file():
    """The decoder must use the stream's own DQT, not the Annex K
    constants: doubling the stored table doubles the dequantized DC."""
    img = np.full((8, 8), 192, dtype=np.uint8)
    ones = np.ones(64, dtype=np.int64)
    data = bytearray(ic.jpeg_encode(img, quant_tables=(ones, ones)))
    i = data.index(b"\xff\xdb") + 5  # first DQT entry (zigzag 0 = DC)
    data[i] = 2  # q00: 1 -> 2
    arr, _ = ic.jpeg_decode(bytes(data))
    # DC was 8*(192-128)=512 at q=1; at q=2 the decoder sees 1024 -> clamps 255
    assert (arr == 255).all()


def test_wav_encode_refuses_float64_by_name():
    """ADVICE r11: numpy's default float dtype used to fall through to
    the int16 branch, truncating normalized [-1, 1] audio to all-zero
    PCM16 — dtype picks the format, so a non-float32 float refuses."""
    with pytest.raises(ValueError, match="float64"):
        ic.wav_encode(np.array([0.5, -0.25, 0.9]))
    # the bits=24 branch is covered too (review r12): float input would
    # otherwise truncate to all-zero PCM24
    with pytest.raises(ValueError, match="float"):
        ic.wav_encode(np.array([0.5, -0.25, 0.9]), bits=24)
    with pytest.raises(ValueError, match="float32 with bits=None"):
        ic.wav_encode(np.array([0.5], dtype=np.float32), bits=24)
    # float32 still routes to IEEE-float
    dec, info = ic.wav_decode(
        ic.wav_encode(np.array([0.5, -0.25], dtype=np.float32))
    )
    assert info["bits_per_sample"] == 32
    assert np.allclose(dec[:, 0], [0.5, -0.25])


def test_png_encode_refuses_non_uint_dtypes_by_name():
    """ADVICE r11: dtype carries the bit depth (uint8 vs uint16), so an
    int32/float input refuses instead of silently astype-wrapping."""
    for bad in (
        np.zeros((2, 2), dtype=np.int32),
        np.zeros((2, 2), dtype=np.float64),
        np.zeros((2, 2, 3), dtype=np.int16),
    ):
        with pytest.raises(ValueError, match=str(bad.dtype)):
            ic.png_encode(bad)


def test_png_encode_indexed_refuses_oversized_trns():
    """ADVICE r11: a tRNS longer than the palette produced files the
    repo's own png_decode refuses — the encoder now mirrors the check."""
    idx = np.zeros((2, 2), dtype=np.uint8)
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    with pytest.raises(ValueError, match="3 entries.*palette only 2"):
        ic.png_encode_indexed(idx, pal, trns=np.array([255, 128, 0]))
    # an in-range tRNS still round-trips
    enc = ic.png_encode_indexed(idx, pal, trns=np.array([255, 128]))
    arr, meta = ic.png_decode(enc)
    assert arr.shape == (2, 2, 4)


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2, T.81 Annex G)


def _prog_pair(arr, **kw):
    base = ic.jpeg_encode(arr, **kw)
    prog = ic.jpeg_encode(arr, progressive=True, **kw)
    return ic.jpeg_decode(base), ic.jpeg_decode(prog), prog


def test_jpeg_progressive_equals_baseline():
    """Entropy coding is lossless and both modes share the FDCT+quantize
    stage, so for the SAME input progressive and baseline streams must
    decode BIT-IDENTICALLY — any deviation is a bug in the progressive
    encoder or decoder. Sweeps gray/color, every subsampling, restart
    intervals, noise (max AC density) and flat (EOB-heavy) content."""
    rng = np.random.default_rng(7)
    cases = [
        (8, 8, 1, "4:4:4", 90, 0), (24, 32, 1, "4:4:4", 75, 0),
        (17, 23, 3, "4:4:4", 90, 0), (33, 41, 3, "4:2:0", 80, 0),
        (16, 50, 3, "4:2:2", 60, 0), (40, 40, 3, "4:2:0", 90, 3),
        (25, 25, 1, "4:4:4", 95, 2), (1, 1, 3, "4:2:0", 50, 0),
        (9, 65, 3, "4:2:2", 35, 1),
    ]
    for h, w, ch, sub, q, ri in cases:
        for kind in ("noise", "flat", "ramp"):
            if kind == "noise":
                arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            elif kind == "flat":
                arr = np.full((h, w, ch), 161, dtype=np.uint8)
            else:
                y, x = np.mgrid[0:h, 0:w]
                arr = ((x * 7 + y * 11)[:, :, None] % 256).astype(
                    np.uint8
                ).repeat(ch, 2)
            (db, mb), (dp, mp), _ = _prog_pair(
                arr, quality=q, subsampling=sub, restart_interval=ri
            )
            assert np.array_equal(db, dp), (h, w, ch, sub, q, ri, kind)
            assert mb == mp


def test_jpeg_progressive_exact_blockconstant_roundtrip():
    """The oracle trick extends to SOF2: 8×8-block-constant grayscale
    with all-ones quant tables is DC-only with zero quantization error,
    so the full scan ladder (DC first at Al=1, DC refinement, AC bands
    that are pure EOB runs) must reconstruct the exact pixels."""
    ones = np.ones(64, dtype=np.int64)
    for did in (0, 7, 21, 42, 63):
        wb, hb = did % 4 + 1, did % 3 + 1
        bx = np.arange(wb)[None, :]
        by = np.arange(hb)[:, None]
        blocks = ((did * 7 + 29 * bx + 31 * by) % 256).astype(np.uint8)
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        for ri in (0, 2):
            dec, meta = ic.jpeg_decode(
                ic.jpeg_encode(img, quant_tables=(ones, ones),
                               restart_interval=ri, progressive=True)
            )
            assert np.array_equal(dec[:, :, 0], img), (did, ri)
            assert (meta["width"], meta["height"]) == (8 * wb, 8 * hb)


def test_jpeg_progressive_stream_structure():
    """The emitted stream is structurally progressive: one SOF2, no
    SOF0, multiple SOS segments; header-only parses keep working."""
    arr = ic.synth_image(3, 20, 14, 3)
    prog = ic.jpeg_encode(arr, progressive=True)
    assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
    assert prog.count(b"\xff\xda") == 12  # color scan script length
    assert ic.jpeg_dims(prog) == (20, 14, 3)
    gray = ic.jpeg_encode(arr[:, :, 0], progressive=True)
    assert gray.count(b"\xff\xda") == 8  # grayscale scan script length


def test_jpeg_progressive_multiblock_eob_runs():
    """The in-repo encoder flushes EOB0 per block, but real files
    (libjpeg) emit EOBn runs spanning many blocks with extension bits —
    pin the decoder's EOBRUN bookkeeping directly at the scan-decoder
    level: an EOB1 + 1 extension bit covers (1<<1) + 1 = 3 blocks.
    EOBn symbols for n>0 are deliberately absent from the Annex K
    tables (libjpeg emits them from per-scan optimized tables), so the
    test defines its own tiny table containing 0x10."""
    bits = [1, 2] + [0] * 14  # codes: 0 -> EOB1, 10 -> (1,3), 11 -> EOB0
    vals = [0x10, 0x13, 0x00]
    lut = ic._jpeg_huff_lut(bits, vals)
    codes = ic._jpeg_huff_codes(bits, vals)
    w = ic._JpegBitWriter()
    code, ln = codes[0x10]  # EOB1: r=1, s=0
    w.write(code, ln)
    w.write(1, 1)  # extension bit -> EOBRUN = (1<<1) + 1 = 3 blocks
    # after the run, one block with a single coefficient k=2, value 5
    code, ln = codes[(1 << 4) | 3]  # run 1 (k=1 zero), size 3
    w.write(code, ln)
    w.write(5, 3)
    code, ln = codes[0x00]  # EOB for the rest of the band
    w.write(code, ln)
    w.flush()
    reader = ic._JpegBitReader(bytes(w.out).replace(b"\xff\x00", b"\xff"))
    blocks = [np.zeros(64, dtype=np.int32) for _ in range(4)]
    eobrun = 0
    for b in blocks:
        eobrun = ic._jpeg_prog_ac_first(b, reader, lut, 1, 63, 0, eobrun)
    assert eobrun == 0
    assert all(not b.any() for b in blocks[:3])
    assert blocks[3][2] == 5 and np.count_nonzero(blocks[3]) == 1
    # refinement-scan EOB run: 2 blocks whose band holds history values
    # 8 (at k=1) and -8 (at k=3); correction bits 1 and 0 -> 12 and -8
    w2 = ic._JpegBitWriter()
    code, ln = codes[0x10]  # EOB1, r=1
    w2.write(code, ln)
    w2.write(0, 1)  # extension 0 -> EOBRUN = 2 blocks
    w2.write(1, 1)  # correction bit block 0 (coef 8 -> |p1 at Al=2| set)
    w2.write(0, 1)  # correction bit block 1 (coef -8 unchanged)
    w2.flush()
    r2 = ic._JpegBitReader(bytes(w2.out).replace(b"\xff\x00", b"\xff"))
    b0 = np.zeros(64, dtype=np.int32)
    b0[1] = 8
    b1 = np.zeros(64, dtype=np.int32)
    b1[3] = -8
    eobrun = ic._jpeg_prog_ac_refine(b0, r2, lut, 1, 63, 2, 0)
    assert eobrun == 1
    eobrun = ic._jpeg_prog_ac_refine(b1, r2, lut, 1, 63, 2, eobrun)
    assert eobrun == 0
    assert b0[1] == 12 and b1[3] == -8


def test_jpeg_progressive_malformed_scans_refuse():
    arr = ic.synth_image(1, 24, 16, 3)
    prog = bytearray(ic.jpeg_encode(arr, progressive=True))
    # truncating inside the scan ladder is loud
    with pytest.raises(ValueError):
        ic.jpeg_decode(bytes(prog[: len(prog) // 2]))
    # force the first AC scan's SOS to claim 3 components: progressive
    # AC scans are non-interleaved by the standard
    sos_positions = []
    i = 0
    while True:
        i = prog.find(b"\xff\xda", i)
        if i < 0:
            break
        sos_positions.append(i)
        i += 2
    second = sos_positions[1]  # first AC scan (after the DC scan)
    bad = bytearray(prog)
    ln = int.from_bytes(bad[second + 2 : second + 4], "big")
    body = bad[second + 4 : second + 2 + ln]
    ns = body[0]
    assert ns == 1
    rebuilt = bytes([3]) + bytes(body[1:3]) * 3 + bytes(body[3:])
    bad[second + 2 : second + 2 + ln] = (
        (len(rebuilt) + 2).to_bytes(2, "big") + rebuilt
    )
    with pytest.raises(ValueError, match="non-interleaved"):
        ic.jpeg_decode(bytes(bad))


# ------------------------------------------------- WAV extensible / PCM8


def test_wav_pcm8_and_extensible_roundtrip():
    """Unsigned PCM8 (offset-128, scipy parity: raw uint8 out) and the
    WAVE_FORMAT_EXTENSIBLE container resolving through its KSDATAFORMAT
    SubFormat GUID to every supported sample format."""
    raw = np.array([[0, 255], [128, 127], [5, 250]], dtype=np.uint8)
    for ext in (False, True):
        dec, info = ic.wav_decode(
            ic.wav_encode(raw, sample_rate=11_025, extensible=ext)
        )
        assert dec.dtype == np.uint8 and np.array_equal(dec, raw)
        assert info["bits_per_sample"] == 8
        assert info["sample_rate"] == 11_025
    i16 = np.array([100, -32768, 32767], dtype=np.int16)
    dec, info = ic.wav_decode(ic.wav_encode(i16, extensible=True))
    assert np.array_equal(dec[:, 0], i16) and info["bits_per_sample"] == 16
    s24 = np.array([-(1 << 22), 1 << 22], dtype=np.int32)
    dec, info = ic.wav_decode(ic.wav_encode(s24, bits=24, extensible=True))
    assert np.array_equal(dec[:, 0], s24) and info["bits_per_sample"] == 24
    f32 = np.array([0.5, -0.25], dtype=np.float32)
    dec, info = ic.wav_decode(ic.wav_encode(f32, extensible=True))
    assert np.allclose(dec[:, 0], f32) and info["bits_per_sample"] == 32


def test_wav_extensible_refusals_name_the_gap():
    raw = np.zeros(4, dtype=np.uint8)
    # corrupt the KSDATAFORMAT suffix -> unknown SubFormat GUID
    bad = bytearray(ic.wav_encode(raw, extensible=True))
    i = bad.index(b"\x9b\x71")
    bad[i] ^= 0xFF
    with pytest.raises(ValueError, match="SubFormat GUID"):
        ic.wav_decode(bytes(bad))
    # 0xFFFE tag without the 22-byte extension is loud
    b = bytearray(ic.wav_encode(raw))
    b[20:22] = (0xFFFE).to_bytes(2, "little")
    with pytest.raises(ValueError, match="extensible fmt chunk truncated"):
        ic.wav_decode(bytes(b))


# -------------------------------------------------------------------- EXIF


def test_jpeg_exif_roundtrip_both_byte_orders():
    ones = np.ones(64, dtype=np.int64)
    base = ic.jpeg_encode(np.full((8, 16), 77, dtype=np.uint8),
                          quant_tables=(ones, ones))
    for bo in ("II", "MM"):
        for o in (1, 3, 6, 8):
            data = base[:2] + ic.exif_app1(o, bo) + base[2:]
            got = ic.jpeg_exif(data)
            assert got == {"orientation": o, "tag_count": 1,
                           "byte_order": bo, "width": 16, "height": 8,
                           "channels": 1}
            # APP1 is transparent to the pixel decode and dim walks
            arr, _ = ic.jpeg_decode(data)
            assert (arr == 77).all()
            assert ic.jpeg_dims(data) == (16, 8, 1)
    # no EXIF -> the None envelope (dims still from the same walk)
    assert ic.jpeg_exif(base) == {"orientation": None, "tag_count": 0,
                                  "byte_order": None, "width": 16,
                                  "height": 8, "channels": 1}


def test_jpeg_exif_refusals_name_the_gap():
    ones = np.ones(64, dtype=np.int64)
    base = ic.jpeg_encode(np.zeros((8, 8), dtype=np.uint8),
                          quant_tables=(ones, ones))
    app1 = bytearray(ic.exif_app1(6, "II"))
    # corrupt the TIFF byte-order mark
    bad = bytearray(app1)
    bad[10:12] = b"XX"
    with pytest.raises(ValueError, match="byte order"):
        ic.jpeg_exif(base[:2] + bytes(bad) + base[2:])
    # corrupt the 42 magic
    bad = bytearray(app1)
    bad[12] = 99
    with pytest.raises(ValueError, match="TIFF magic"):
        ic.jpeg_exif(base[:2] + bytes(bad) + base[2:])
    # IFD entry count pointing past the segment
    bad = bytearray(app1)
    bad[18] = 200  # entry count low byte (II)
    with pytest.raises(ValueError, match="past the segment end"):
        ic.jpeg_exif(base[:2] + bytes(bad) + base[2:])
    with pytest.raises(ValueError, match="orientation must be 1..8"):
        ic.exif_app1(9)


def test_jpeg_exif_desync_and_missing_sof_are_loud():
    """A corrupt marker stream or a SOF-less file must raise, not pass
    as 'orientation-less' (review r12) — a file the walk can't parse is
    an error, matching every sibling parser's posture."""
    ones = np.ones(64, dtype=np.int64)
    base = ic.jpeg_encode(np.zeros((8, 8), dtype=np.uint8),
                          quant_tables=(ones, ones))
    app1 = ic.exif_app1(6, "II")
    # garbage after the APP1 desyncs the walk (before the SOF arrives)
    bad = base[:2] + app1 + b"\x00garbage" + base[2:]
    with pytest.raises(ValueError, match="lost marker sync"):
        ic.jpeg_exif(bad)
    # APP1 but no SOF before EOI
    headerless = b"\xff\xd8" + app1[:0] + ic.exif_app1(3) + b"\xff\xd9"
    with pytest.raises(ValueError, match="no SOF"):
        ic.jpeg_exif(headerless)


def test_wav_extensible_cbsize_and_validbits_refusals():
    """Hand-patched extensible chunks: cbSize < 22 and a partial-width
    wValidBitsPerSample both refuse by name (review r12)."""
    wav = bytearray(ic.wav_encode(np.zeros(4, dtype=np.int16),
                                  extensible=True))
    # fmt chunk body starts at 20; cbSize lives at +16 of the body
    assert wav[36:38] == (22).to_bytes(2, "little")
    bad = bytearray(wav)
    bad[36:38] = (21).to_bytes(2, "little")
    with pytest.raises(ValueError, match="cbSize 21 < 22"):
        ic.wav_decode(bytes(bad))
    bad = bytearray(wav)
    bad[38:40] = (12).to_bytes(2, "little")  # wValidBitsPerSample
    with pytest.raises(ValueError, match="wValidBitsPerSample 12"):
        ic.wav_decode(bytes(bad))
    # valid_bits == 0 means unspecified and keeps decoding
    ok = bytearray(wav)
    ok[38:40] = (0).to_bytes(2, "little")
    dec, info = ic.wav_decode(bytes(ok))
    assert info["bits_per_sample"] == 16 and dec.shape == (4, 1)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    color=st.booleans(),
    sub=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
    q=st.integers(5, 100),
    ri=st.sampled_from([0, 1, 2, 5]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_equals_baseline_property(
    w, h, color, sub, q, ri, seed
):
    """Property form of the bit-equality invariant: ANY (dims, content,
    subsampling, quality, restart interval) decodes identically through
    the baseline and progressive entropy paths."""
    rng = np.random.default_rng(seed)
    ch = 3 if color else 1
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    kw = dict(quality=q, subsampling=sub if color else "4:4:4",
              restart_interval=ri)
    db, mb = ic.jpeg_decode(ic.jpeg_encode(arr, **kw))
    dp, mp = ic.jpeg_decode(ic.jpeg_encode(arr, progressive=True, **kw))
    assert np.array_equal(db, dp)
    assert mb == mp


# ---------------------------------------------------------------- BMP RLE8


def test_bmp_rle8_roundtrip_and_palette():
    rng = np.random.default_rng(5)
    for trial in range(12):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        if trial % 3 == 0:  # runs-heavy
            idx = np.repeat(
                rng.integers(0, 256, (h, max(w // 5, 1))), 5, axis=1
            )[:, :w].astype(np.uint8)
        elif trial % 3 == 1:  # worst case: no runs
            idx = rng.integers(0, 256, (h, w), dtype=np.uint8)
        else:  # best case: one run per row
            idx = np.full((h, w), int(rng.integers(0, 256)), dtype=np.uint8)
        dec, meta = ic.bmp_decode(ic.bmp_encode_rle8(idx))
        assert meta["channels"] == 1
        assert np.array_equal(dec[:, :, 0], idx)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        pal[0] = [1, 2, 3]  # force non-identity
        dec2, meta2 = ic.bmp_decode(ic.bmp_encode_rle8(idx, palette=pal))
        assert meta2["channels"] == 3
        assert np.array_equal(dec2, pal[idx])


def _rle8_file(stream: bytes, w: int, h: int) -> bytes:
    pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
    dib = struct.pack(
        "<IiihHIIiiII", 40, w, h, 1, 8, 1, len(stream), 0, 0, 256, 0
    )
    off = 14 + 40 + 1024
    return (
        b"BM" + struct.pack("<IHHI", off + len(stream), 0, 0, off)
        + dib + pal + stream
    )


def test_bmp_rle8_absolute_and_delta_ops():
    """The in-repo encoder emits only runs + EOL/EOB; absolute mode
    (0, n>=3 literal bytes, word-padded) and delta (0, 2, dx, dy —
    skipped pixels keep background 0) come from real encoders, so a
    hand-built stream pins them."""
    stream = bytes([
        0, 3, 9, 8, 7, 0,   # absolute 3 (word-padded)
        0, 2, 2, 0,         # delta dx=2 -> x=5
        1, 5,               # run of 1, value 5
        0, 0,               # EOL
        6, 4,               # run of 6, value 4
        0, 0,               # EOL
        3, 2,               # run of 3, value 2
        0, 1,               # EOB
    ])
    dec, meta = ic.bmp_decode(_rle8_file(stream, 6, 3))
    expect = np.zeros((3, 6), dtype=np.uint8)
    expect[2, 0:3] = [9, 8, 7]   # storage row 0 = display bottom
    expect[2, 5] = 5             # delta-skipped x=3,4 stay 0
    expect[1, :] = 4
    expect[0, 0:3] = 2
    assert np.array_equal(dec[:, :, 0], expect)
    assert (meta["width"], meta["height"]) == (6, 3)


def test_bmp_rle8_refusals_name_the_gap():
    # missing end-of-bitmap
    with pytest.raises(ValueError, match="end-of-bitmap"):
        ic.bmp_decode(_rle8_file(bytes([2, 7, 0, 0]), 2, 1))
    # run overruns the row
    with pytest.raises(ValueError, match="overruns row"):
        ic.bmp_decode(_rle8_file(bytes([5, 7, 0, 1]), 3, 1))
    # absolute run truncated
    with pytest.raises(ValueError, match="absolute run truncated"):
        ic.bmp_decode(_rle8_file(bytes([0, 4, 1, 2]), 6, 1))
    # top-down RLE8 is illegal
    f = bytearray(ic.bmp_encode_rle8(np.zeros((2, 2), dtype=np.uint8)))
    struct.pack_into("<i", f, 22, -2)
    with pytest.raises(ValueError, match="top-down RLE8"):
        ic.bmp_decode(bytes(f))
    # RLE4 (compression=2) still refuses by name
    f = bytearray(ic.bmp_encode_rle8(np.zeros((2, 2), dtype=np.uint8)))
    struct.pack_into("<I", f, 30, 2)
    with pytest.raises(ValueError, match="compression=2"):
        ic.bmp_decode(bytes(f))


# --------------------------------------------- multi-scan sequential JPEG


def test_jpeg_scan_split_equals_interleaved():
    """scan_split writes three non-interleaved SOF0 scans; entropy
    coding is lossless, so split and interleaved streams decode
    bit-identically for any input."""
    rng = np.random.default_rng(17)
    for h, w, sub, q, ri in [
        (16, 24, "4:4:4", 90, 0), (33, 41, "4:2:0", 75, 0),
        (9, 50, "4:2:2", 60, 2), (1, 1, "4:2:0", 50, 0),
    ]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        kw = dict(quality=q, subsampling=sub, restart_interval=ri)
        d1, m1 = ic.jpeg_decode(ic.jpeg_encode(arr, **kw))
        d2, m2 = ic.jpeg_decode(ic.jpeg_encode(arr, scan_split=True, **kw))
        assert np.array_equal(d1, d2) and m1 == m2
    split = ic.jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8),
                           scan_split=True)
    assert split.count(b"\xff\xda") == 3 and b"\xff\xc0" in split


def test_jpeg_scan_split_refusals_and_coverage_check():
    with pytest.raises(ValueError, match="3-channel"):
        ic.jpeg_encode(np.zeros((8, 8), dtype=np.uint8), scan_split=True)
    with pytest.raises(ValueError, match="sequential encoding"):
        ic.jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8),
                       scan_split=True, progressive=True)
    # dropping the last scan leaves a component uncoded -> loud
    split = bytearray(ic.jpeg_encode(
        np.full((8, 8, 3), 99, dtype=np.uint8), scan_split=True
    ))
    last_sos = split.rfind(b"\xff\xda")
    truncated = bytes(split[:last_sos]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="never coded by any scan"):
        ic.jpeg_decode(truncated)
    # duplicating a scan double-codes its component -> loud
    first_sos = bytes(split).find(b"\xff\xda")
    second_sos = bytes(split).find(b"\xff\xda", first_sos + 2)
    dup = bytes(split[:second_sos]) + bytes(
        split[first_sos:second_sos]
    ) + bytes(split[second_sos:])
    with pytest.raises(ValueError, match="coded by two sequential scans"):
        ic.jpeg_decode(dup)


def test_jpeg_zero_component_scan_refuses():
    """A crafted SOS with Ns=0 refuses by name instead of crashing
    (review r12)."""
    ones = np.ones(64, dtype=np.int64)
    data = bytearray(ic.jpeg_encode(np.zeros((8, 8), dtype=np.uint8),
                                    quant_tables=(ones, ones)))
    sos = data.index(b"\xff\xda")
    # rebuild the SOS body as Ns=0 + band params 0/63/0
    data[sos:] = b"\xff\xda" + (2 + 4).to_bytes(2, "big") + bytes(
        [0, 0, 63, 0]
    ) + b"\xff\xd9"
    with pytest.raises(ValueError, match="zero components"):
        ic.jpeg_decode(bytes(data))


def test_apply_exif_orientation_all_eight():
    """Hand-computed 2x3 expectations for every EXIF orientation value
    (TIFF 6.0 table): the stored array is transformed so it displays
    upright; 5-8 swap the dims."""
    a = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)  # [[0,1,2],[3,4,5]]
    got = {o: ic.apply_exif_orientation(a, o)[:, :, 0] for o in range(1, 9)}
    assert np.array_equal(got[1], [[0, 1, 2], [3, 4, 5]])
    assert np.array_equal(got[2], [[2, 1, 0], [5, 4, 3]])
    assert np.array_equal(got[3], [[5, 4, 3], [2, 1, 0]])
    assert np.array_equal(got[4], [[3, 4, 5], [0, 1, 2]])
    assert np.array_equal(got[5], [[0, 3], [1, 4], [2, 5]])
    assert np.array_equal(got[6], [[3, 0], [4, 1], [5, 2]])
    assert np.array_equal(got[7], [[5, 2], [4, 1], [3, 0]])
    assert np.array_equal(got[8], [[2, 5], [1, 4], [0, 3]])
    # the eight transforms are distinct on an asymmetric input
    flat = {o: got[o].tobytes() + bytes(got[o].shape[0]) for o in got}
    assert len(set(flat.values())) == 8
    with pytest.raises(ValueError, match="1..8"):
        ic.apply_exif_orientation(a, 0)


def test_apply_exif_orientation_matches_rot90():
    """Cross-check the quarter-turn cases against numpy's rot90: tag 6
    is stored-rotated-90-CCW (undo = CW = rot90 k=-1), tag 8 the
    opposite."""
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert np.array_equal(
        ic.apply_exif_orientation(a, 6), np.rot90(a, k=-1, axes=(0, 1))
    )
    assert np.array_equal(
        ic.apply_exif_orientation(a, 8), np.rot90(a, k=1, axes=(0, 1))
    )
    assert np.array_equal(ic.apply_exif_orientation(a, 3), np.rot90(a, k=2, axes=(0, 1)))


def test_jpeg_exif_first_app1_wins():
    """ADVICE r12: the EXIF spec (JEITA CP-3451 §4.5.4) makes the FIRST
    APP1 Exif segment authoritative; an editor that appends a fresh
    segment without stripping the stale one must not have the stale
    (later) copy override the original."""
    ones = np.ones(64, dtype=np.int64)
    base = ic.jpeg_encode(np.full((8, 16), 77, dtype=np.uint8),
                          quant_tables=(ones, ones))
    two = base[:2] + ic.exif_app1(6, "II") + ic.exif_app1(1, "MM") + base[2:]
    got = ic.jpeg_exif(two)
    assert got["orientation"] == 6
    assert got["byte_order"] == "II"


def test_wav_encode_refuses_stray_integer_dtypes_by_name():
    """ADVICE r12: integer dtypes outside the documented format map
    (uint8 / int16 / int32-with-bits=24) used to silently wrap through
    astype('<i2'); now they refuse by name like the float guard."""
    with pytest.raises(ValueError, match="int64"):
        ic.wav_encode(np.array([1, 2, 70000]))  # list-default int64
    with pytest.raises(ValueError, match="int32"):
        ic.wav_encode(np.array([1 << 20], dtype=np.int32))  # no bits=24
    with pytest.raises(ValueError, match="uint16"):
        ic.wav_encode(np.array([9], dtype=np.uint16))
    # the documented map still routes
    assert ic.wav_info(ic.wav_encode(
        np.array([5, -5], dtype=np.int16)))["bits_per_sample"] == 16
    assert ic.wav_info(ic.wav_encode(
        np.array([5, 250], dtype=np.uint8)))["bits_per_sample"] == 8
    assert ic.wav_info(ic.wav_encode(
        np.array([1 << 20], dtype=np.int32), bits=24))["bits_per_sample"] == 24
