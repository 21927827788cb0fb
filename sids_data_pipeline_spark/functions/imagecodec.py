"""Pure-stdlib media codecs for the multimodal operators (EXT E4).

The multimodal brief ("image/audio/video as opaque binary columns with
typed metadata") needs at least one REAL codec behind
``extract_features`` — this module provides it without any external
image library (the container has none):

* **PNG** — full decode AND encode. zlib inflate/deflate, per-scanline
  unfilter/filter for all five filter types (None/Sub/Up/Average/Paeth,
  RFC 2083 §6), color types 0 (gray), 2 (RGB), 3 (palette, expanded
  through PLTE/tRNS), 4 (gray+alpha), 6 (RGBA), bit depth 8,
  sequential or Adam7-interlaced (read and write). CRC-32 verified per
  chunk on read, emitted on write. Same hardening posture as the
  GeoTIFF codec (sources/geotiff.py): unsupported variants (non-8-bit
  depths) refuse loudly with the exact capability named — the engine
  does not guess pixels.
* **JPEG** — full baseline-sequential decode AND encode (ITU T.81):
  Huffman entropy coding from the file's own DHT tables, dequant,
  batched 8×8 IDCT (numpy einsum), 4:4:4 / 4:2:2 / 4:2:0 (and any
  sampling-factor layout on decode), restart markers, JFIF YCbCr↔RGB.
  Progressive / arithmetic / 12-bit frames refuse loudly with the
  capability named. ``jpeg_dims`` stays as the header fast path for
  feature extraction.
* **GIF / BMP** — full pixel decodes too (LZW + compositing; BI_RGB
  with palette expansion); ``gif_frame_meta`` / ``bmp_dims`` are the
  header fast paths.
* **WAV** — RIFF chunk walk: channels, sample rate, bit depth, sample
  frames, duration.
* **resize_nearest** — real nearest-neighbor resampling over the
  decoded array (deterministic index map, so a SQL oracle can verify
  resized pixel values exactly).

Everything here is driver/executor-agnostic pure Python + numpy: the
Spark side calls it from ``mapInPandas`` batches
(operators/multimodal.py), so per-executor memory is bounded by the
Arrow batch, not the table.

Reference parity note: the reference pipeline treats media as opaque
blobs and shells out for decoding; this engine decodes natively, the
same relationship as the GeoTIFF codec to the reference's GDAL calls.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # 3 = palette indices
_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type
# Adam7 interlace passes: (x0, y0, dx, dy) — RFC 2083 §2.6
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


# --------------------------------------------------------------------------
# sniffing


def sniff(data: bytes) -> str | None:
    """Identify a payload by magic bytes:
    'png'|'jpeg'|'gif'|'bmp'|'wav'|'tiff', or None for anything
    unrecognized (the caller's documented-fallback path). BMP and WAV
    require a second structural check beyond the 2–4 byte magic so
    arbitrary text payloads can't false-positive; TIFF requires the
    full 4-byte byte-order + version word (classic 42 or BigTIFF 43)."""
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM" and len(data) >= 18:
        dib = struct.unpack_from("<I", data, 14)[0]
        if dib in (12, 40, 52, 56, 64, 108, 124):
            return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] in (
        b"II\x2a\x00", b"MM\x00\x2a",  # classic TIFF
        b"II\x2b\x00", b"MM\x00\x2b",  # BigTIFF
    ):
        return "tiff"
    return None


# --------------------------------------------------------------------------
# PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_scanline(
    ftype: int, raw: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Reverse one scanline filter (RFC 2083 §6.2–6.6). `raw` is the
    filtered bytes of this line, `prev` the RECONSTRUCTED previous line
    (zeros for the first). Sub/Average/Paeth carry a left-neighbor
    dependency, so they reconstruct sequentially; Up is vectorized and
    Sub uses the per-residue-class cumsum identity (out = cumsum(raw)
    mod 256 within each byte lane)."""
    n = raw.shape[0]
    if ftype == 0:  # None
        return raw.copy()
    if ftype == 2:  # Up
        return (raw.astype(np.uint16) + prev).astype(np.uint8)
    if ftype == 1:  # Sub: out[i] = raw[i] + out[i-bpp]
        out = raw.astype(np.uint64).copy()
        for lane in range(bpp):
            out[lane::bpp] = np.cumsum(out[lane::bpp]) & 0xFF
        return out.astype(np.uint8)
    out = np.empty(n, dtype=np.uint8)
    if ftype == 3:  # Average
        for i in range(n):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(raw[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        return out
    if ftype == 4:  # Paeth
        for i in range(n):
            left = int(out[i - bpp]) if i >= bpp else 0
            ul = int(prev[i - bpp]) if i >= bpp else 0
            out[i] = (int(raw[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        return out
    raise ValueError(f"png: invalid scanline filter type {ftype}")


def _filter_scanline(
    ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply one scanline filter for encoding (the forward direction of
    :func:`_unfilter_scanline`; both sides see RECONSTRUCTED neighbors)."""
    n = line.shape[0]
    li = line.astype(np.int32)
    if ftype == 0:
        return line.copy()
    left = np.zeros(n, dtype=np.int32)
    left[bpp:] = line[:-bpp]
    if ftype == 1:
        return ((li - left) & 0xFF).astype(np.uint8)
    pi = prev.astype(np.int32)
    if ftype == 2:
        return ((li - pi) & 0xFF).astype(np.uint8)
    if ftype == 3:
        return ((li - ((left + pi) >> 1)) & 0xFF).astype(np.uint8)
    if ftype == 4:
        out = np.empty(n, dtype=np.uint8)
        for i in range(n):
            a = int(left[i])
            b = int(pi[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            out[i] = (int(line[i]) - _paeth(a, b, c)) & 0xFF
        return out
    raise ValueError(f"png: invalid scanline filter type {ftype}")


def _unfilter_rows(
    raw: bytes, row_bytes: int, height: int, fbpp: int, offset: int
) -> tuple[np.ndarray, int]:
    """Unfilter ``height`` scanlines of ``row_bytes`` bytes starting at
    ``raw[offset]`` (one sub-image: the whole frame, or one Adam7 pass).
    ``fbpp`` is the filter byte distance (max(1, bits_per_pixel // 8),
    RFC 2083 §6.2). Returns ((height, row_bytes) uint8, next offset)."""
    need = (row_bytes + 1) * height
    if offset + need > len(raw):
        raise ValueError(
            f"png: decompressed stream too short ({len(raw)} bytes, "
            f"need {offset + need})"
        )
    buf = np.frombuffer(
        raw, dtype=np.uint8, count=need, offset=offset
    ).reshape(height, row_bytes + 1)
    out = np.empty((height, row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.uint8)
    for y in range(height):
        out[y] = _unfilter_scanline(int(buf[y, 0]), buf[y, 1:], prev, fbpp)
        prev = out[y]
    return out, offset + need


def _png_samples(
    sub: np.ndarray, pw: int, depth: int, spp: int
) -> np.ndarray:
    """(h, row_bytes) unfiltered bytes → (h, pw, spp) sample array
    (uint8 for depths ≤ 8, uint16 for depth 16)."""
    ph = sub.shape[0]
    if depth == 8:
        return sub.reshape(ph, pw, spp)
    if depth == 16:
        return (
            np.ascontiguousarray(sub)
            .view(">u2")
            .astype(np.uint16)
            .reshape(ph, pw, spp)
        )
    # depth 1/2/4 (palette indices or sub-byte gray, spp == 1):
    # big-endian-first bit groups
    bits = np.unpackbits(np.ascontiguousarray(sub), axis=1)
    groups = bits[:, : (sub.shape[1] * 8 // depth) * depth].reshape(
        ph, -1, depth
    )
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (groups * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :pw, None]


def png_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a PNG payload to (array, meta).

    Array shape is (height, width, channels) — uint8, or uint16 for
    16-bit samples; meta carries width/height/channels/color_type/
    bit_depth. Gray, gray+alpha, RGB, RGBA (depths 8 and 16) and
    PALETTE (color type 3 at depths 1/2/4/8, expanded through PLTE to
    RGB — RGBA when a tRNS chunk supplies per-entry alpha), sequential
    or Adam7-interlaced. Verifies every chunk CRC and the IHDR
    capability envelope; refuses (ValueError, capability named)
    depth/type combinations outside that matrix — loud beats wrong,
    per the repo contract.
    """
    if data[:8] != _PNG_MAGIC:
        raise ValueError("png: bad magic (not a PNG payload)")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte: bytes | None = None
    trns: bytes | None = None
    seen_iend = False
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        if pos + 12 + length > len(data):
            raise ValueError("png: truncated chunk (body or CRC cut short)")
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        pos += 12 + length
    if ihdr is None:
        raise ValueError("png: missing IHDR chunk")
    if not seen_iend:
        raise ValueError("png: missing IEND chunk (truncated file)")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"png: color type {color_type} not supported")
    if color_type == 3 and plte is None:
        raise ValueError("png: palette image (color type 3) missing PLTE")
    legal = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(color_type, (8, 16))
    if depth not in legal:
        raise ValueError(
            f"png: bit depth {depth} not supported for color type "
            f"{color_type} (supported: {legal})"
        )
    if comp != 0 or filt != 0:
        raise ValueError("png: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"png: unknown interlace method {interlace}")
    if width == 0 or height == 0:
        raise ValueError("png: zero-dimension image")
    spp = _PNG_CHANNELS[color_type]  # samples per pixel
    fbpp = max(1, depth * spp // 8)  # filter byte distance
    row_bytes = lambda w: -(-(w * depth * spp) // 8)  # noqa: E731
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"png: corrupt IDAT stream ({exc})") from exc
    if interlace == 0:
        sub, off = _unfilter_rows(raw, row_bytes(width), height, fbpp, 0)
        arr = _png_samples(sub, width, depth, spp)
    else:
        # Adam7: seven independently-filtered sub-images, scattered
        # back onto the (y0::dy, x0::dx) grids
        arr = np.zeros(
            (height, width, spp),
            dtype=np.uint16 if depth == 16 else np.uint8,
        )
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw == 0 or ph == 0:
                continue  # empty pass contributes no scanlines
            sub, off = _unfilter_rows(raw, row_bytes(pw), ph, fbpp, off)
            arr[y0::dy, x0::dx] = _png_samples(sub, pw, depth, spp)
    if off != len(raw):
        raise ValueError(
            f"png: {len(raw) - off} trailing bytes after the last scanline"
        )
    channels = spp
    scale = 255 // ((1 << depth) - 1) if depth < 8 else 1
    if color_type == 0 and depth < 8:
        # sub-byte gray (bitmap/mask): bit replication scales exactly to
        # 8-bit — max sample (2^d − 1) maps to 255 with zero rounding
        # (×255, ×85, ×17 for depths 1/2/4), the libpng expansion
        arr = (arr * scale).astype(np.uint8)
    if color_type in (0, 2) and trns is not None:
        # tRNS on gray/RGB is a transparent COLOR KEY (one 16-bit value
        # per channel, high bits zero at depths ≤ 8): pixels equal to
        # the key get alpha 0, everything else 255. Silently dropping
        # it would render keyed-transparent pixels opaque. The key is in
        # the RAW sample domain, so it scales with the sub-byte plane.
        if len(trns) != 2 * spp:
            raise ValueError(
                f"png: tRNS length {len(trns)} invalid for color type "
                f"{color_type} (expected {2 * spp})"
            )
        key = (np.frombuffer(trns, dtype=">u2") * scale).astype(arr.dtype)
        opaque = arr.dtype.type(65535 if depth == 16 else 255)
        alpha = np.where(
            (arr == key[None, None, :]).all(axis=2), arr.dtype.type(0), opaque
        ).astype(arr.dtype)
        arr = np.dstack([arr, alpha])
        channels = spp + 1
    if color_type == 3:
        if len(plte) % 3 or not plte:
            raise ValueError(f"png: PLTE length {len(plte)} not a multiple of 3")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if pal.shape[0] > min(256, 1 << depth):
            raise ValueError(
                f"png: PLTE has {pal.shape[0]} entries, legal maximum "
                f"is {min(256, 1 << depth)} at bit depth {depth}"
            )
        idx = arr[:, :, 0]
        if int(idx.max()) >= pal.shape[0]:
            raise ValueError(
                f"png: palette index {int(idx.max())} outside the "
                f"{pal.shape[0]}-entry PLTE"
            )
        rgb = pal[idx]
        if trns is not None:
            if len(trns) > pal.shape[0]:
                raise ValueError(
                    f"png: tRNS has {len(trns)} entries but the PLTE "
                    f"only {pal.shape[0]}"
                )
            alpha_lut = np.full(pal.shape[0], 255, dtype=np.uint8)
            alpha_lut[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            arr = np.dstack([rgb, alpha_lut[idx]])
            channels = 4
        else:
            arr = rgb
            channels = 3
        arr = np.ascontiguousarray(arr)
    return arr, {
        "width": width,
        "height": height,
        "channels": channels,
        "color_type": color_type,
        "bit_depth": depth,
    }


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_filter_block(
    block: np.ndarray, fbpp: int, filter_cycle: bool
) -> bytearray:
    """Filter one sub-image ((h, w, c) uint8 / uint16 → scanline bytes
    with filter-type prefixes): the whole frame, or one Adam7 pass.
    ``fbpp`` is the filter byte distance."""
    h = block.shape[0]
    if block.dtype == np.uint16:
        flat = (
            block.astype(">u2").view(np.uint8).reshape(h, -1)
        )
    else:
        flat = block.reshape(h, -1)
    lines = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.uint8)
    for y in range(h):
        ftype = (y % 5) if filter_cycle else 0
        lines.append(ftype)
        lines.extend(_filter_scanline(ftype, flat[y], prev, fbpp).tobytes())
        prev = flat[y]
    return lines


def png_encode(
    arr: np.ndarray,
    level: int = 6,
    filter_cycle: bool = True,
    interlace: bool = False,
) -> bytes:
    """Encode a uint8 array (h, w) or (h, w, c) with c in {1,2,3,4} to PNG.

    ``filter_cycle=True`` picks filter type ``y % 5`` per scanline so a
    round trip exercises every unfilter path (the catalog gate relies on
    this); False always uses filter 0. ``interlace=True`` writes Adam7
    (each pass filtered independently, per the spec). A uint16 input
    writes bit depth 16 (big-endian samples).
    """
    a = np.asarray(arr)
    if a.dtype.kind == "u" and a.dtype.itemsize == 2:
        # normalize any byte order to native uint16 — dtype('>u2') is
        # NOT np.uint16 on little-endian hosts, and letting it fall to
        # the uint8 path would silently wrap 16-bit samples
        a = a.astype(np.uint16)
    elif a.dtype != np.uint8:
        # dtype picks the bit depth (uint8 → 8, uint16 → 16), so a
        # silent astype-wrap of int32/float input would pick a depth
        # AND corrupt samples in one move — refuse by name instead
        raise ValueError(
            f"png_encode: expected uint8 or uint16 samples, got dtype "
            f"{a.dtype} — convert explicitly to the intended bit depth"
        )
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _PNG_COLOR_TYPE:
        raise ValueError(
            f"png_encode: expected (h,w[,c<=4]) uint8/uint16, got {arr.shape}"
        )
    height, width, channels = a.shape
    if height == 0 or width == 0:
        raise ValueError("png_encode: zero-dimension image")
    color_type = _PNG_COLOR_TYPE[channels]
    depth = 16 if a.dtype == np.uint16 else 8
    fbpp = channels * depth // 8
    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            block = a[y0::dy, x0::dx]
            if block.shape[0] and block.shape[1]:
                lines.extend(_png_filter_block(block, fbpp, filter_cycle))
    else:
        lines = _png_filter_block(a, fbpp, filter_cycle)

    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + _png_chunk(b"IEND", b"")
    )


def png_encode_indexed(
    indices: np.ndarray,
    palette: np.ndarray,
    trns: np.ndarray | None = None,
    level: int = 6,
    depth: int = 8,
    interlace: bool = False,
) -> bytes:
    """Encode an (h, w) uint8 index plane as a color-type-3 PNG with the
    given (n, 3) palette (and optional per-entry alpha via tRNS) —
    fixture generator for the palette decode path (and a usable sink).
    ``depth`` 1/2/4 packs indices big-endian-first per scanline (padded
    to a byte boundary PER Adam7 PASS when ``interlace`` is set)."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or idx.shape[0] == 0 or idx.shape[1] == 0:
        raise ValueError(f"png_encode_indexed: expected (h,w) uint8, got {indices.shape}")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError(
            f"png_encode_indexed: palette must be (1..256, 3), got {palette.shape}"
        )
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"png_encode_indexed: depth must be 1/2/4/8, got {depth}")
    if int(idx.max()) >= min(pal.shape[0], 1 << depth):
        raise ValueError(
            f"png_encode_indexed: index {int(idx.max())} outside the "
            f"{min(pal.shape[0], 1 << depth)}-entry palette"
        )
    height, width = idx.shape

    def pack_rows(block: np.ndarray) -> np.ndarray:
        if depth == 8:
            return block[:, :, None]
        # expand each index to `depth` bits (MSB first), pad the row to
        # a byte boundary, pack
        shifts = np.arange(depth - 1, -1, -1, dtype=np.uint8)
        bits = ((block[:, :, None] >> shifts) & 1).reshape(
            block.shape[0], block.shape[1] * depth
        )
        pad = (-bits.shape[1]) % 8
        if pad:
            bits = np.pad(bits, ((0, 0), (0, pad)))
        return np.packbits(bits, axis=1)[:, :, None]

    if trns is not None and len(np.asarray(trns)) > pal.shape[0]:
        # decode refuses "tRNS has N entries but the PLTE only M" —
        # keep the encoder from producing files its own decoder rejects
        raise ValueError(
            f"png_encode_indexed: tRNS has {len(np.asarray(trns))} "
            f"entries but the palette only {pal.shape[0]}"
        )
    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            block = idx[y0::dy, x0::dx]
            if block.shape[0] and block.shape[1]:
                lines.extend(
                    _png_filter_block(pack_rows(block), 1, filter_cycle=True)
                )
    else:
        lines = _png_filter_block(pack_rows(idx), 1, filter_cycle=True)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, 3, 0, 0, 1 if interlace else 0
    )
    out = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", np.asarray(trns, dtype=np.uint8).tobytes())
    return out + _png_chunk(b"IDAT", zlib.compress(bytes(lines), level)) + _png_chunk(b"IEND", b"")


# --------------------------------------------------------------------------
# header-only dimension parses


def jpeg_dims(data: bytes) -> tuple[int, int, int]:
    """(width, height, components) from the first SOF marker (baseline,
    extended, or progressive). Marker walk per ITU T.81 §B."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("jpeg: bad magic")
    pos = 2
    sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: lost marker sync at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # no-length markers
            continue
        if marker == 0xD9:
            break  # EOI before any SOF
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        if marker in sof:
            if pos + 2 + seglen > len(data) or seglen < 8:
                raise ValueError("jpeg: truncated SOF segment")
            h, w = struct.unpack_from(">HH", data, pos + 5)
            ncomp = data[pos + 9]
            return w, h, ncomp
        pos += 2 + seglen
    raise ValueError("jpeg: no SOF marker found (truncated or not an image)")


def jpeg_exif(data: bytes) -> dict:
    """One marker walk over a JPEG header → {"orientation": 1..8 |
    None, "tag_count": int, "byte_order": "II" | "MM" | None, "width",
    "height", "channels"}. Orientation is TIFF tag 0x0112 (SHORT) from
    the EXIF APP1 segment — the field a scraped-image corpus must honor
    before training (a 6/8 means the pixels are stored rotated); dims
    come from the SOF of the SAME walk so callers don't scan the header
    twice. A JPEG with no EXIF segment returns the None/0/None EXIF
    fields rather than raising (absence is the common case); a
    PRESENT-but-corrupt TIFF header, a desynced marker stream, or a
    missing SOF raises by name — a file this walk can't parse must not
    silently pass as 'orientation-less'."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("jpeg: bad magic")
    exif = None
    dims = None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: lost marker sync at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError(
                f"jpeg: segment 0x{marker:02x} truncated in EXIF walk"
            )
        if (
            marker == 0xE1
            and data[pos + 4 : pos + 10] == b"Exif\x00\x00"
            and exif is None
        ):
            # EXIF spec (JEITA CP-3451 §4.5.4): the FIRST APP1 Exif
            # segment is authoritative; editors that append a second
            # copy leave a stale duplicate that must not win
            exif = _exif_parse_tiff(data[pos + 10 : pos + 2 + seglen])
        elif marker in (0xC0, 0xC1, 0xC2) and seglen >= 8:
            h, w = struct.unpack_from(">HH", data, pos + 5)
            dims = (w, h, data[pos + 9])
        pos += 2 + seglen
    if dims is None:
        raise ValueError("jpeg: no SOF marker found (truncated or not an image)")
    out = exif or {"orientation": None, "tag_count": 0, "byte_order": None}
    out["width"], out["height"], out["channels"] = dims
    return out


def _exif_parse_tiff(tiff: bytes) -> dict:
    """IFD0 of an EXIF TIFF blob → orientation/tag_count/byte_order."""
    bo = tiff[:2]
    if bo == b"II":
        e = "<"
    elif bo == b"MM":
        e = ">"
    else:
        raise ValueError(f"exif: bad TIFF byte order {bo!r}")
    if len(tiff) < 8:
        raise ValueError("exif: TIFF header truncated")
    magic, off = struct.unpack_from(e + "HI", tiff, 2)
    if magic != 42:
        raise ValueError(f"exif: bad TIFF magic {magic}")
    if off + 2 > len(tiff):
        raise ValueError("exif: IFD0 offset past the segment end")
    n = struct.unpack_from(e + "H", tiff, off)[0]
    if off + 2 + 12 * n > len(tiff):
        raise ValueError(
            f"exif: IFD0 declares {n} entries past the segment end"
        )
    orientation = None
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, base)
        if tag == 0x0112 and typ == 3 and cnt == 1:
            # SHORT with count 1: value left-justified in the 4-byte field
            orientation = struct.unpack_from(e + "H", tiff, base + 8)[0]
    return {
        "orientation": orientation,
        "tag_count": n,
        "byte_order": bo.decode(),
    }


def apply_exif_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Transform (h, w, c) pixels so they display upright, inverting
    the stored EXIF orientation (TIFF 6.0 §Orientation / JEITA CP-3451
    value table): 1 identity, 2 mirror horizontal, 3 rotate 180,
    4 mirror vertical, 5 transpose (mirror along the TL–BR diagonal),
    6 rotate 90° CW, 7 transverse (mirror along the TR–BL diagonal),
    8 rotate 90° CCW. Orientations 5–8 swap the output dims."""
    if not 1 <= orientation <= 8:
        raise ValueError(
            f"apply_exif_orientation: orientation must be 1..8, got {orientation}"
        )
    if orientation == 1:
        out = arr
    elif orientation == 2:
        out = arr[:, ::-1]
    elif orientation == 3:
        out = arr[::-1, ::-1]
    elif orientation == 4:
        out = arr[::-1]
    elif orientation == 5:
        out = arr.transpose(1, 0, 2)
    elif orientation == 6:
        # stored image is the upright one rotated 90° CCW → undo with CW
        out = arr.transpose(1, 0, 2)[:, ::-1]
    elif orientation == 7:
        out = arr.transpose(1, 0, 2)[::-1, ::-1]
    else:  # 8
        out = arr.transpose(1, 0, 2)[::-1]
    return np.ascontiguousarray(out)


def exif_app1(orientation: int, byte_order: str = "II") -> bytes:
    """Build an EXIF APP1 segment holding one IFD0 entry (orientation
    tag 0x0112) — fixture generator for the jpeg_exif parse path.
    Splice it directly after SOI: jpeg[:2] + exif_app1(o) + jpeg[2:]."""
    if not 1 <= orientation <= 8:
        raise ValueError(
            f"exif_app1: orientation must be 1..8, got {orientation}"
        )
    if byte_order not in ("II", "MM"):
        raise ValueError(f"exif_app1: byte order must be II or MM, got {byte_order!r}")
    e = "<" if byte_order == "II" else ">"
    val = struct.pack(e + "H", orientation) + b"\x00\x00"
    ifd = (
        struct.pack(e + "H", 1)
        + struct.pack(e + "HHI", 0x0112, 3, 1)
        + val
        + struct.pack(e + "I", 0)
    )
    tiff = byte_order.encode() + struct.pack(e + "HI", 42, 8) + ifd
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


# --------------------------------------------------------------------------
# JPEG (baseline sequential + progressive DCT: full decode + encode)
#
# ITU-T T.81: SOF0/SOF1 sequential frames (Huffman, 8-bit, interleaved
# single-scan) and SOF2 progressive frames (Annex G: spectral selection,
# successive approximation, EOB runs, refinement correction bits,
# non-interleaved component grids). The decoder reads its Huffman and
# quantization tables from the FILE's own DHT/DQT segments (never from
# the constants below), so an encode→decode round trip is self-consistent
# by construction; the Annex K constants exist for the encoder — and the
# progressive paths are additionally pinned by decode(progressive(x)) ==
# decode(baseline(x)) bit-equality, which holds for ANY input because the
# two modes share the FDCT+quantize stage and entropy coding is lossless.
# Arithmetic coding, 12-bit, lossless and hierarchical frames refuse
# loudly with the capability named — same contract as PNG/GIF.

# zigzag index -> natural (row-major) index, T.81 Figure 5
_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 example quantization tables (natural order)
_JPEG_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_JPEG_QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16] counts, values)
_JPEG_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_JPEG_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix C with C[u,x] = c(u)/2 ·
    cos((2x+1)uπ/16): FDCT is C·f·Cᵀ, IDCT is Cᵀ·F·C (T.81 A.3.3)."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    c[0] /= np.sqrt(2.0)
    return c


_JPEG_C = _jpeg_dct_matrix()


def _jpeg_huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_huff_lut(bits: list[int], values: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek Huffman lookup: sym[peek16], len[peek16]. A code of
    length L with canonical value V owns the peek range [V<<(16−L),
    (V+1)<<(16−L)) — one table index per decoded symbol, no bit walk."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    length = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            sym[lo:hi] = values[k]
            length[lo:hi] = ln
            code += 1
            k += 1
        code <<= 1
    return sym, length


class _JpegBitReader:
    """MSB-first bit reader over an UNSTUFFED entropy-coded segment."""

    __slots__ = ("data", "n", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data) * 8
        self.bitpos = 0

    def peek16(self) -> int:
        byte = self.bitpos >> 3
        chunk = self.data[byte : byte + 3]
        val = int.from_bytes(chunk + b"\xff" * (3 - len(chunk)), "big")
        return (val >> (8 - (self.bitpos & 7))) & 0xFFFF

    def skip(self, nbits: int) -> None:
        self.bitpos += nbits
        if self.bitpos > self.n:
            raise ValueError("jpeg: entropy-coded segment exhausted mid-symbol")

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        val = self.peek16() >> (16 - nbits)
        self.skip(nbits)
        return val


def _jpeg_extend(value: int, cat: int) -> int:
    """T.81 F.12: map a `cat`-bit magnitude code to its signed value."""
    if cat == 0:
        return 0
    if value < (1 << (cat - 1)):
        return value - (1 << cat) + 1
    return value


def _jpeg_split_rst(ecs: bytes) -> list[bytes]:
    """Split an entropy-coded stream on RST0–RST7 markers; each returned
    segment resets DC prediction (and, progressive, the EOB run)."""
    segments = []
    seg_start = 0
    i = 0
    while i + 1 < len(ecs):
        if ecs[i] == 0xFF and 0xD0 <= ecs[i + 1] <= 0xD7:
            segments.append(ecs[seg_start:i])
            seg_start = i + 2
            i += 2
        else:
            i += 1
    segments.append(ecs[seg_start:])
    return segments


def _jpeg_seq_block(reader, dtbl, atbl, pred, cid) -> np.ndarray:
    """One full baseline block: DPCM DC + run/size AC to k=63 (T.81
    F.2.2). Shared by the interleaved single-scan path and the
    non-interleaved multi-scan sequential walk."""
    dsym, dlen = dtbl
    asym, alen = atbl
    block = np.zeros(64, dtype=np.int32)
    p16 = reader.peek16()
    s, ln = int(dsym[p16]), int(dlen[p16])
    if s < 0:
        raise ValueError("jpeg: invalid DC Huffman code")
    reader.skip(ln)
    pred[cid] += _jpeg_extend(reader.read(s), s)
    block[0] = pred[cid]
    k = 1
    while k < 64:
        p16 = reader.peek16()
        rs, ln = int(asym[p16]), int(alen[p16])
        if rs < 0:
            raise ValueError("jpeg: invalid AC Huffman code")
        reader.skip(ln)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC run past block end")
        block[k] = _jpeg_extend(reader.read(s), s)
        k += 1
    return block


def _jpeg_prog_dc(block, reader, tbl, pred, cid, ah, al) -> None:
    """One data unit of a progressive DC scan (T.81 G.1.2.1): first
    scan (Ah=0) DPCM-decodes the point-transformed DC and stores it
    shifted left by Al; refinement scans append one raw bit at Al."""
    if ah == 0:
        dsym, dlen = tbl
        p16 = reader.peek16()
        s, ln = int(dsym[p16]), int(dlen[p16])
        if s < 0:
            raise ValueError("jpeg: invalid DC Huffman code")
        reader.skip(ln)
        pred[cid] += _jpeg_extend(reader.read(s), s)
        block[0] = pred[cid] << al
    elif reader.read(1):
        block[0] |= 1 << al


def _jpeg_prog_ac_first(block, reader, tbl, ss, se, al, eobrun) -> int:
    """One data unit of a first (Ah=0) progressive AC scan over band
    [Ss, Se] (T.81 G.1.2.2): baseline-style run/size symbols plus EOBn
    end-of-band runs. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    asym, alen = tbl
    k = ss
    while k <= se:
        p16 = reader.peek16()
        rs, ln = int(asym[p16]), int(alen[p16])
        if rs < 0:
            raise ValueError("jpeg: invalid AC Huffman code")
        reader.skip(ln)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1  # EOBn: this block is one of 2^r + bits
            if r:
                eobrun += reader.read(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("jpeg: AC run past spectral band end")
        block[k] = _jpeg_extend(reader.read(s), s) << al
        k += 1
    return 0


def _jpeg_prog_ac_refine(block, reader, tbl, ss, se, al, eobrun) -> int:
    """One data unit of a refinement (Ah>0) progressive AC scan (T.81
    G.1.2.3): newly significant coefficients arrive as run/1 symbols
    with a sign bit; coefficients already nonzero from earlier scans
    receive one correction bit each, in band order, interleaved into
    the runs. Returns the remaining EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        asym, alen = tbl
        while k <= se:
            p16 = reader.peek16()
            rs, ln = int(asym[p16]), int(alen[p16])
            if rs < 0:
                raise ValueError("jpeg: invalid AC Huffman code")
            reader.skip(ln)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break
                # ZRL: r stays 15 → skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        "jpeg: refinement scan magnitude must be 1"
                    )
                newval = p1 if reader.read(1) else m1
            # advance past r zero-history coefficients, reading one
            # correction bit for each nonzero-history coefficient passed
            while k <= se:
                v = int(block[k])
                if v != 0:
                    if reader.read(1) and (v & p1) == 0:
                        block[k] = v + (p1 if v >= 0 else m1)
                    k += 1
                    continue
                if r == 0:
                    break
                r -= 1
                k += 1
            if s:
                if k > se:
                    raise ValueError(
                        "jpeg: refinement run past spectral band end"
                    )
                block[k] = newval
            k += 1
    if eobrun > 0:
        # EOB-terminated block: correction bits for the rest of the band
        while k <= se:
            v = int(block[k])
            if v != 0:
                if reader.read(1) and (v & p1) == 0:
                    block[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_decode_progressive_coefs(
    comps, scans, h, w, hmax, vmax, mcus_x, mcus_y
) -> dict[int, np.ndarray]:
    """Run every SOS of a progressive (SOF2) frame over shared
    coefficient planes per T.81 Annex G. DC scans may be interleaved
    (MCU walk) or single-component; AC scans are non-interleaved by
    the standard and walk the component's own ceil(w·hi/hmax/8) ×
    ceil(h·vi/vmax/8) block grid. Restart markers reset DC prediction
    and the EOB run. Returns {cid: (rows, cols, 64) int32}."""
    byid = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    coefs = {
        cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
        for cid, hi, vi, _tq in comps
    }
    for scan_comps, ss, se, ah, al, ecs, ri, huff in scans:
        if ss == 0 and se != 0:
            raise ValueError("jpeg: progressive DC scan must have Se=0")
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError(
                "jpeg: progressive AC scans must be non-interleaved"
            )
        if not 0 <= ss <= se <= 63 or ah > 13 or al > 13:
            raise ValueError(
                f"jpeg: bad progressive scan header Ss={ss} Se={se} "
                f"Ah={ah} Al={al}"
            )
        needs = []
        for cid, dc_t, ac_t in scan_comps:
            if cid not in byid:
                raise ValueError(f"jpeg: scan references unknown component {cid}")
            if ss == 0 and ah == 0:
                tbl = huff.get((0, dc_t))
                if tbl is None:
                    raise ValueError(
                        "jpeg: scan references an undefined Huffman table"
                    )
            elif ss > 0:
                tbl = huff.get((1, ac_t))
                if tbl is None:
                    raise ValueError(
                        "jpeg: scan references an undefined Huffman table"
                    )
            else:
                tbl = None  # DC refinement: raw bits, no table
            needs.append((cid, tbl))
        interleaved = len(scan_comps) > 1
        if interleaved:
            n_units, bw = mcus_x * mcus_y, 0
        else:
            hi, vi, _tq = byid[scan_comps[0][0]]
            bw, bh, _stride = _jpeg_comp_block_grid(
                hi, vi, mcus_x, w, h, hmax, vmax
            )
            n_units = bw * bh
        per_seg = ri if ri else n_units
        unit = 0
        for seg in _jpeg_split_rst(ecs):
            reader = _JpegBitReader(seg.replace(b"\xff\x00", b"\xff"))
            pred = {cid: 0 for cid, _tbl in needs}
            eobrun = 0
            for _ in range(min(per_seg, n_units - unit)):
                if interleaved:
                    my, mx = divmod(unit, mcus_x)
                    for cid, tbl in needs:
                        hi, vi, _tq = byid[cid]
                        plane = coefs[cid]
                        for by in range(vi):
                            for bx in range(hi):
                                _jpeg_prog_dc(
                                    plane[my * vi + by, mx * hi + bx],
                                    reader, tbl, pred, cid, ah, al,
                                )
                else:
                    cid, tbl = needs[0]
                    by, bx = divmod(unit, bw)
                    block = coefs[cid][by, bx]
                    if ss == 0:
                        _jpeg_prog_dc(block, reader, tbl, pred, cid, ah, al)
                    elif ah == 0:
                        eobrun = _jpeg_prog_ac_first(
                            block, reader, tbl, ss, se, al, eobrun
                        )
                    else:
                        eobrun = _jpeg_prog_ac_refine(
                            block, reader, tbl, ss, se, al, eobrun
                        )
                unit += 1
        if unit != n_units:
            raise ValueError(
                f"jpeg: progressive scan short ({unit}/{n_units} data units)"
            )
    return coefs


def jpeg_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a baseline-sequential (SOF0/SOF1) or progressive (SOF2)
    JPEG to (array, meta).

    Array is (height, width, channels) uint8 — channels 1 (grayscale)
    or 3 (YCbCr→RGB, JFIF full-range matrix). Supports any
    sampling-factor layout (4:4:4, 4:2:0, 4:2:2, …) via the general
    Hmax/Vmax MCU walk with pixel-replication chroma upsampling, restart
    intervals, multiple DQT/DHT segments (progressive files may redefine
    table slots between scans — each scan snapshots the table state at
    its SOS). Progressive frames run the full T.81 Annex G scan loop:
    spectral selection, successive approximation (DC point transform +
    raw-bit refinement, AC magnitude refinement with correction bits),
    EOB runs, and non-interleaved component grids. Entropy decode uses
    the file's OWN tables; dequantization and the 8×8 IDCT run batched
    over every block at once (numpy einsum). Arithmetic-coded,
    hierarchical, lossless, 12-bit and 4-component frames refuse loudly.
    """
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("jpeg: bad magic")
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    scans: list[tuple] = []
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: lost marker sync at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError(
                f"jpeg: segment 0x{marker:02x} truncated "
                f"(declares {seglen} bytes at offset {pos})"
            )
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 15
                b += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, b).astype(np.int64)
                    b += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, b).astype(np.int64)
                    b += 128
                quant[tq] = tbl  # zigzag order
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 15
                bits = list(body[b + 1 : b + 17])
                nvals = sum(bits)
                if len(bits) < 16 or b + 17 + nvals > len(body):
                    raise ValueError("jpeg: truncated DHT segment")
                vals = list(body[b + 17 : b + 17 + nvals])
                huff[(tc, th)] = _jpeg_huff_lut(bits, vals)
                b += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise ValueError(f"jpeg: only 8-bit precision supported, got {precision}")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"jpeg: 1 or 3 components supported, got {ncomp}")
            comps = []
            for i in range(ncomp):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, body[8 + 3 * i]))
            frame = (h, w, comps, marker == 0xC2)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: SOF{marker - 0xC0} frames not supported "
                "(baseline sequential and progressive only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15)
                for i in range(ns)
            ]
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            # entropy-coded data: from SOS end to the next non-RST
            # marker (a stream with no trailing marker keeps every byte;
            # the data-unit-count check below catches genuine truncation)
            start = pos + 2 + seglen
            end = start
            while end + 1 < len(data):
                if data[end] == 0xFF and data[end + 1] != 0x00 and not (
                    0xD0 <= data[end + 1] <= 0xD7
                ):
                    break
                end += 1
            else:
                end = len(data)
            # snapshot the table state: progressive files may redefine
            # DHT slots between scans
            scans.append(
                (scan_comps, ss, se, ahal >> 4, ahal & 15,
                 data[start:end], restart_interval, dict(huff))
            )
            pos = end
            continue
        pos += 2 + seglen
    if frame is None or not scans:
        raise ValueError("jpeg: missing SOF or SOS (truncated or unsupported)")
    h, w, comps, progressive = frame
    if h == 0 or w == 0:
        raise ValueError("jpeg: zero-dimension image")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # Integer replication upsampling only covers layouts where every
    # component factor divides the max (all JFIF layouts: 4:4:4, 4:2:2,
    # 4:2:0, 4:1:1); a T.81-legal non-divisible layout (e.g. Y h=3 with
    # Cb h=2) would need fractional resampling — refuse with the layout
    # named, before entropy decode, rather than crash in np.stack later.
    for cid, hi, vi, _tq in comps:
        if hi == 0 or vi == 0:
            raise ValueError("jpeg: zero sampling factor")
        if hmax % hi or vmax % vi:
            raise ValueError(
                f"jpeg: non-integer upsampling layout (component {cid} "
                f"factors h={hi} v={vi} vs max h={hmax} v={vmax}) not "
                "supported — JFIF layouts only"
            )
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    if progressive:
        coefs = _jpeg_decode_progressive_coefs(
            comps, scans, h, w, hmax, vmax, mcus_x, mcus_y
        )
        order = [(cid, hi, vi, tq) for cid, hi, vi, tq in comps]
    else:
        byid = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
        coefs = {
            cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
            for cid, hi, vi, _tq in comps
        }
        coded: list[int] = []
        for scan_comps, ss, se, ah, al, ecs, scan_ri, scan_huff in scans:
            # sequential scans always cover the full band at full
            # precision; anything else in a SOF0/1 stream is corrupt
            if (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError(
                    "jpeg: sequential scan must cover the full band "
                    f"(Ss=0 Se=63 Ah=Al=0, got {ss}/{se}/{ah}/{al})"
                )
            if not scan_comps:
                raise ValueError("jpeg: scan declares zero components")
            tables = []
            for cid, dc_t, ac_t in scan_comps:
                if cid not in byid:
                    raise ValueError(
                        f"jpeg: scan references unknown component {cid}"
                    )
                if cid in coded:
                    raise ValueError(
                        f"jpeg: component {cid} coded by two sequential scans"
                    )
                coded.append(cid)
                if (0, dc_t) not in scan_huff or (1, ac_t) not in scan_huff:
                    raise ValueError(
                        "jpeg: scan references an undefined Huffman table"
                    )
                hi, vi, _tq = byid[cid]
                tables.append(
                    (cid, hi, vi, scan_huff[(0, dc_t)], scan_huff[(1, ac_t)])
                )
            interleaved = len(scan_comps) > 1
            if interleaved:
                n_units, bw = mcus_x * mcus_y, 0
            else:
                _cid0, hi, vi, _d, _a = tables[0]
                bw, bh, _stride = _jpeg_comp_block_grid(
                    hi, vi, mcus_x, w, h, hmax, vmax
                )
                n_units = bw * bh
            per_seg = scan_ri if scan_ri else n_units
            unit = 0
            for seg in _jpeg_split_rst(ecs):
                reader = _JpegBitReader(seg.replace(b"\xff\x00", b"\xff"))
                pred = {cid: 0 for cid, *_ in tables}
                for _ in range(min(per_seg, n_units - unit)):
                    if interleaved:
                        my, mx = divmod(unit, mcus_x)
                        for cid, hi, vi, dtbl, atbl in tables:
                            block_rows = coefs[cid]
                            for by in range(vi):
                                for bx in range(hi):
                                    block_rows[my * vi + by, mx * hi + bx] = (
                                        _jpeg_seq_block(
                                            reader, dtbl, atbl, pred, cid
                                        )
                                    )
                    else:
                        cid, _hi, _vi, dtbl, atbl = tables[0]
                        by, bx = divmod(unit, bw)
                        coefs[cid][by, bx] = _jpeg_seq_block(
                            reader, dtbl, atbl, pred, cid
                        )
                    unit += 1
            if unit != n_units:
                raise ValueError(
                    f"jpeg: entropy data short ({unit}/{n_units} data units)"
                )
        if sorted(coded) != sorted(byid):
            missing = sorted(set(byid) - set(coded))
            raise ValueError(
                f"jpeg: components {missing} never coded by any scan"
            )
        order = [(cid, hi, vi, tq) for cid, hi, vi, tq in comps]

    planes = {}
    inv_zz = _JPEG_ZIGZAG
    for cid, hi, vi, tq, *_ in order:
        if tq not in quant:
            raise ValueError(f"jpeg: component references undefined DQT {tq}")
        zz = coefs[cid].reshape(-1, 64) * quant[tq][None, :]
        nat = np.zeros_like(zz)
        nat[:, inv_zz] = zz  # dezigzag
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        px = np.einsum("ux,nuv,vy->nxy", _JPEG_C, blocks, _JPEG_C)
        px = np.clip(np.round(px) + 128, 0, 255).astype(np.uint8)
        by, bx = coefs[cid].shape[:2]
        plane = (
            px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        # crop to the component's true extent, then replicate to full size
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, vmax // vi, 0), hmax // hi, 1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        arr = planes[comps[0][0]][:, :, None]
        return arr, {"width": w, "height": h, "channels": 1, "subsampling": "gray"}
    y = planes[comps[0][0]].astype(np.float64)
    cb = planes[comps[1][0]].astype(np.float64) - 128.0
    cr = planes[comps[2][0]].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    arr = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    sub = {(1, 1): "4:4:4", (2, 1): "4:2:2", (2, 2): "4:2:0"}.get(
        (comps[0][1], comps[0][2]), f"h{comps[0][1]}v{comps[0][2]}"
    )
    return arr, {"width": w, "height": h, "channels": 3, "subsampling": sub}


class _JpegBitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3


def _jpeg_prog_scan_script(channels: int) -> list[tuple[list[int], int, int, int, int]]:
    """Progressive scan script (comps, Ss, Se, Ah, Al): an interleaved
    DC first scan at Al=1 + DC refinement, spectral-selection AC bands,
    and a two-level successive-approximation ladder on luma AC — every
    Annex G decode path (EOB runs, ZRL-in-refinement, correction bits)
    is exercised by the emitted stream."""
    if channels == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
            ([0], 0, 0, 1, 0),
            ([0], 1, 5, 2, 1), ([0], 6, 63, 2, 1),
            ([0], 1, 5, 1, 0), ([0], 6, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
        ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([0], 1, 5, 2, 1), ([0], 6, 63, 2, 1),
        ([0], 1, 5, 1, 0), ([0], 6, 63, 1, 0),
        ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0),
    ]


def _jpeg_comp_block_grid(
    hi: int, vi: int, mcus_x: int, w: int, h: int, hmax: int, vmax: int
) -> tuple[int, int, int]:
    """(blocks_wide, blocks_high, row_stride) of a component's own
    non-interleaved data-unit grid — ceil(ceil(dim·f/fmax)/8); the
    row stride indexes into the full padded MCU-grid block array.
    Shared by the progressive encoder AND decoder so their
    non-interleaved walks can never desynchronize."""
    bw = -(-(-(-w * hi // hmax)) // 8)
    bh = -(-(-(-h * vi // vmax)) // 8)
    return bw, bh, mcus_x * hi


def _jpeg_enc_ac_first_block(writer, block, act, ss, se, al) -> None:
    """Encode one block of a first (Ah=0) progressive AC scan. EOB runs
    are never accumulated across blocks (EOB0 per block) so restart
    segments carry no cross-block state."""
    r = 0
    for k in range(ss, se + 1):
        v = int(block[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        if v < 0:
            t = -t
        while r > 15:
            code, ln = act[0xF0]
            writer.write(code, ln)
            r -= 16
        s = abs(t).bit_length()
        code, ln = act[(r << 4) | s]
        writer.write(code, ln)
        writer.write(t if t >= 0 else t + (1 << s) - 1, s)
        r = 0
    if r:
        code, ln = act[0x00]
        writer.write(code, ln)


def _jpeg_enc_ac_refine_block(writer, block, act, ss, se, al) -> None:
    """Encode one block of a refinement (Ah>0) progressive AC scan per
    T.81 G.1.2.3: newly significant coefficients (magnitude 1 after the
    point transform) as run/1 + sign, correction bits for coefficients
    significant in earlier scans buffered and flushed after each emitted
    symbol, EOB0 + trailing corrections at block end."""
    absv = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
    eob_rel = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob_rel = i
    r = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob_rel:
            code, ln = act[0xF0]
            writer.write(code, ln)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        code, ln = act[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if int(block[ss + i]) > 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r or br:
        code, ln = act[0x00]
        writer.write(code, ln)
        for b in br:
            writer.write(b, 1)


def _jpeg_encode_progressive_scans(
    comp_blocks, samp, channels, mcus_x, mcus_y, w, h,
    dc_codes, ac_codes, restart_interval,
) -> list[tuple[list[int], int, int, int, int, bytes]]:
    """Entropy-code every scan of the progressive script over the
    already-quantized blocks; returns (comps, Ss, Se, Ah, Al, ecs) per
    scan. Restart markers split each scan every ``restart_interval``
    data units (MCUs for the interleaved DC scans), resetting DC
    prediction exactly as the sequential encoder does."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    out = []
    for comps_idx, ss, se, ah, al in _jpeg_prog_scan_script(channels):
        parts: list[bytes] = []
        writer = _JpegBitWriter()
        rst = 0
        pred = [0] * len(samp)
        interleaved = len(comps_idx) > 1
        if ss == 0 and interleaved:
            n_units, bw, stride = mcus_x * mcus_y, 0, 0
        else:
            bw, bh, stride = _jpeg_comp_block_grid(
                *samp[comps_idx[0]], mcus_x, w, h, hmax, vmax
            )
            n_units = bw * bh
        for unit in range(n_units):
            if restart_interval and unit and unit % restart_interval == 0:
                writer.flush()
                parts.append(bytes(writer.out))
                parts.append(bytes((0xFF, 0xD0 + (rst & 7))))
                rst += 1
                writer = _JpegBitWriter()
                pred = [0] * len(samp)
            if ss == 0:
                if interleaved:
                    my, mx = divmod(unit, mcus_x)
                    units = []
                    for ci in comps_idx:
                        hi, vi = samp[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                units.append(
                                    (ci, (my * vi + by) * (mcus_x * hi)
                                     + mx * hi + bx)
                                )
                else:
                    ci = comps_idx[0]
                    by, bx = divmod(unit, bw)
                    units = [(ci, by * stride + bx)]
                for ci, bi in units:
                    dc0 = int(comp_blocks[ci][bi][0])
                    if ah == 0:
                        v = dc0 >> al  # arithmetic shift per G.1.2.1
                        diff = v - pred[ci]
                        pred[ci] = v
                        s = abs(diff).bit_length()
                        t = 0 if ci == 0 or channels == 1 else 1
                        code, ln = dc_codes[t][s]
                        writer.write(code, ln)
                        if s:
                            writer.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
                    else:
                        writer.write((dc0 >> al) & 1, 1)
            else:
                ci = comps_idx[0]
                by, bx = divmod(unit, bw)
                block = comp_blocks[ci][by * stride + bx]
                t = 0 if ci == 0 or channels == 1 else 1
                if ah == 0:
                    _jpeg_enc_ac_first_block(
                        writer, block, ac_codes[t], ss, se, al
                    )
                else:
                    _jpeg_enc_ac_refine_block(
                        writer, block, ac_codes[t], ss, se, al
                    )
        writer.flush()
        parts.append(bytes(writer.out))
        out.append((comps_idx, ss, se, ah, al, b"".join(parts)))
    return out


def _jpeg_assemble(
    h, w, channels, samp, qtab, ql, qc, scan_outputs,
    restart_interval, progressive,
) -> bytes:
    """Assemble the marker stream: JFIF APP0, DQT(s), SOF0/SOF2, the
    four Annex K DHTs, DRI, then one SOS + entropy segment per scan."""
    zz = _JPEG_ZIGZAG

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql[zz].astype(np.uint8)))
    if channels == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[zz].astype(np.uint8)))
    ncomp = 1 if channels == 1 else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes((ci + 1, (hi << 4) | vi, qtab[ci]))
    out += seg(0xC2 if progressive else 0xC0, sof)

    def dht(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _JPEG_HUFF_DC_LUMA)
    out += dht(1, 0, _JPEG_HUFF_AC_LUMA)
    if channels == 3:
        out += dht(0, 1, _JPEG_HUFF_DC_CHROMA)
        out += dht(1, 1, _JPEG_HUFF_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for comps_idx, ss, se, ah, al, ecs in scan_outputs:
        sos = bytes([len(comps_idx)])
        for ci in comps_idx:
            t = 0 if ci == 0 or channels == 1 else 1
            sos += bytes((ci + 1, (t << 4) | t))
        sos += bytes((ss, se, (ah << 4) | al))
        out += seg(0xDA, sos)
        out += ecs
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_enc_seq_block(writer, block, dct, act, pred_val: int) -> int:
    """Encode one full baseline block (DPCM DC + run/size AC, T.81
    F.1.2) against ``pred_val``; returns the new DC predictor. Shared
    by the interleaved single-scan writer and the non-interleaved
    scan_split writer."""
    dc = int(block[0])
    diff = dc - pred_val
    s = int(abs(diff)).bit_length()
    code, ln = dct[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    k = 1
    run = 0
    while k < 64:
        v = int(block[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            code, ln = act[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        code, ln = act[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        k += 1
    if run:
        code, ln = act[0x00]  # EOB
        writer.write(code, ln)
    return dc


def _jpeg_quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the libjpeg quality curve, clamped 1..255."""
    if not 1 <= quality <= 100:
        raise ValueError(f"jpeg: quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_JPEG_QUANT_LUMA, _JPEG_QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
    restart_interval: int = 0,
    progressive: bool = False,
    scan_split: bool = False,
) -> bytes:
    """Encode a uint8 (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB array
    as baseline sequential JPEG (SOF0, Annex K Huffman tables, JFIF APP0)
    or, with ``progressive=True``, as progressive JPEG (SOF2, the
    spectral-selection + successive-approximation scan script of
    ``_jpeg_prog_scan_script``). Both modes share the FDCT + quantize
    stage, so for the SAME input the two streams decode to IDENTICAL
    pixels — entropy coding is lossless — which is the cross-check the
    progressive tests pin.

    ``subsampling`` is '4:4:4', '4:2:2' (horizontal box-average chroma)
    or '4:2:0' (2x2 box-average chroma).
    ``quant_tables`` overrides the quality-scaled Annex K tables with
    explicit (luma, chroma) 64-vectors in NATURAL order — a table of all
    ones makes 8×8-block-constant grayscale images round-trip EXACTLY
    (DC-only blocks, zero quantization error), which is what the
    multimodal_decode_jpeg oracle pins. ``restart_interval`` > 0 emits
    DRI + RSTn markers every that-many MCUs (data units per scan in
    progressive and scan_split modes). ``scan_split=True`` writes a
    color image as THREE non-interleaved sequential scans (one per
    component, SOF0 multi-scan — the layout some real encoders emit);
    the entropy stage is lossless either way, so split and interleaved
    streams decode identically.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"jpeg_encode: expected (h,w[,1|3]) uint8, got {arr.shape}")
    h, w, channels = a.shape
    if h == 0 or w == 0:
        raise ValueError("jpeg_encode: zero-dimension image")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(
            "jpeg_encode: subsampling must be 4:4:4, 4:2:2 or 4:2:0, "
            f"got {subsampling!r}"
        )
    if quant_tables is None:
        ql, qc = _jpeg_quality_tables(quality)
    else:
        ql = np.asarray(quant_tables[0], dtype=np.int64).reshape(64)
        qc = np.asarray(quant_tables[1], dtype=np.int64).reshape(64)
        # the DQT payload is one byte per entry (pq=0); silently wrapping
        # a 256 to 0 would quantize with one table and dequantize with
        # another — refuse out-of-range values instead of corrupting
        for name, t in (("luma", ql), ("chroma", qc)):
            if int(t.min()) < 1 or int(t.max()) > 255:
                raise ValueError(
                    f"jpeg_encode: {name} quant table values must be in "
                    f"1..255 (8-bit DQT), got [{int(t.min())}, "
                    f"{int(t.max())}]"
                )

    if channels == 1:
        planes = [a[:, :, 0].astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qtab = [0]
    else:
        f = a.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        ycc = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
        ]
        def box(p, fy, fx):
            pe = np.pad(
                p,
                ((0, -p.shape[0] % fy), (0, -p.shape[1] % fx)),
                mode="edge",
            )
            return pe.reshape(
                pe.shape[0] // fy, fy, pe.shape[1] // fx, fx
            ).mean(axis=(1, 3))

        # luma (hi, vi) per mode; chroma stays (1, 1) and is box-averaged
        # by the luma factors — the standard JFIF layouts
        lh, lv = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}[subsampling]
        planes = [
            ycc[0] - 128.0,
            box(ycc[1], lv, lh) - 128.0,
            box(ycc[2], lv, lh) - 128.0,
        ]
        samp = [(lh, lv), (1, 1), (1, 1)]
        qtab = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component: pad to the MCU grid (edge replicate), FDCT + quantize
    zz = _JPEG_ZIGZAG
    comp_blocks = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        th, tw = mcus_y * vi * 8, mcus_x * hi * 8
        p = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        blocks = (
            p.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        fdct = np.einsum("ux,nxy,vy->nuv", _JPEG_C, blocks, _JPEG_C).reshape(-1, 64)
        q = (ql if qtab[ci] == 0 else qc)[None, :]
        # round half away from zero (libjpeg posture), then zigzag
        quantized = np.sign(fdct) * np.floor(np.abs(fdct) / q + 0.5)
        comp_blocks.append(quantized.astype(np.int32)[:, zz])

    # Huffman tables: luma pair always; chroma pair only for color
    dc_codes = [_jpeg_huff_codes(*_JPEG_HUFF_DC_LUMA)]
    ac_codes = [_jpeg_huff_codes(*_JPEG_HUFF_AC_LUMA)]
    if channels == 3:
        dc_codes.append(_jpeg_huff_codes(*_JPEG_HUFF_DC_CHROMA))
        ac_codes.append(_jpeg_huff_codes(*_JPEG_HUFF_AC_CHROMA))

    if progressive:
        if scan_split:
            raise ValueError(
                "jpeg_encode: scan_split applies to sequential encoding "
                "only (progressive already splits into scans)"
            )
        scan_outputs = _jpeg_encode_progressive_scans(
            comp_blocks, samp, channels, mcus_x, mcus_y, w, h,
            dc_codes, ac_codes, restart_interval,
        )
        return _jpeg_assemble(
            h, w, channels, samp, qtab, ql, qc, scan_outputs,
            restart_interval, progressive=True,
        )

    if scan_split:
        if channels != 3:
            raise ValueError(
                "jpeg_encode: scan_split needs a 3-channel image "
                "(grayscale is single-scan already)"
            )
        scan_outputs = []
        for ci in range(3):
            t = 0 if ci == 0 else 1
            dct, act = dc_codes[t], ac_codes[t]
            bw, bh, stride = _jpeg_comp_block_grid(
                *samp[ci], mcus_x, w, h, hmax, vmax
            )
            parts: list[bytes] = []
            writer = _JpegBitWriter()
            rst = 0
            pred_val = 0
            for unit in range(bw * bh):
                if restart_interval and unit and unit % restart_interval == 0:
                    writer.flush()
                    parts.append(bytes(writer.out))
                    parts.append(bytes((0xFF, 0xD0 + (rst & 7))))
                    rst += 1
                    writer = _JpegBitWriter()
                    pred_val = 0
                by, bx = divmod(unit, bw)
                pred_val = _jpeg_enc_seq_block(
                    writer, comp_blocks[ci][by * stride + bx], dct, act,
                    pred_val,
                )
            writer.flush()
            parts.append(bytes(writer.out))
            scan_outputs.append(([ci], 0, 63, 0, 0, b"".join(parts)))
        return _jpeg_assemble(
            h, w, channels, samp, qtab, ql, qc, scan_outputs,
            restart_interval, progressive=False,
        )

    writer = _JpegBitWriter()
    pred = [0] * len(planes)
    n_mcus = mcus_x * mcus_y
    rst = 0
    body_parts: list[bytes] = []
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            body_parts.append(bytes(writer.out))
            body_parts.append(bytes((0xFF, 0xD0 + (rst & 7))))
            rst += 1
            writer = _JpegBitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, blocks in enumerate(comp_blocks):
            hi, vi = samp[ci]
            t = 0 if ci == 0 or channels == 1 else 1
            dct, act = dc_codes[t], ac_codes[t]
            for by in range(vi):
                for bx in range(hi):
                    bi = (my * vi + by) * (mcus_x * hi) + (mx * hi + bx)
                    pred[ci] = _jpeg_enc_seq_block(
                        writer, blocks[bi], dct, act, pred[ci]
                    )
    writer.flush()
    body_parts.append(bytes(writer.out))
    ecs = b"".join(body_parts)
    return _jpeg_assemble(
        h, w, channels, samp, qtab, ql, qc,
        [(list(range(1 if channels == 1 else 3)), 0, 63, 0, 0, ecs)],
        restart_interval, progressive=False,
    )


def gif_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the GIF logical screen descriptor."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad magic")
    if len(data) < 10:
        raise ValueError("gif: truncated logical screen descriptor")
    w, h = struct.unpack_from("<HH", data, 6)
    return w, h


def bmp_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the DIB header (CORE 12-byte uses uint16;
    INFO/V4/V5 use int32, height sign = row order, abs() taken)."""
    if data[:2] != b"BM" or len(data) < 26:
        raise ValueError("bmp: bad magic or truncated header")
    dib = struct.unpack_from("<I", data, 14)[0]
    if dib == 12:
        w, h = struct.unpack_from("<HH", data, 18)
        return w, h
    if dib in (40, 52, 56, 64, 108, 124):
        w, h = struct.unpack_from("<ii", data, 18)
        return w, abs(h)
    raise ValueError(f"bmp: unknown DIB header size {dib}")


# --------------------------------------------------------------------------
# GIF (LZW decode, multi-frame)


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable-width codes packed LSB-first, clear
    code resets the dictionary, dictionary caps at 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    pos = 0
    # dictionary as (prefix_index, suffix_byte); codes < clear are roots
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    suffix[:clear] = np.arange(clear, dtype=np.uint8)

    next_code, width = clear + 2, min_code_size + 1
    acc = 0
    nbits = 0
    prev = -1
    stack = bytearray()
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                next_code, width = clear + 2, min_code_size + 1
                prev = -1
                continue
            if code == end:
                if pos < n_pixels:
                    raise ValueError(
                        f"gif: LZW stream short ({pos}/{n_pixels} pixels)"
                    )
                return out
            if code > next_code or (code == next_code and prev < 0):
                raise ValueError(f"gif: corrupt LZW stream (code {code})")
            if prev < 0:
                out[pos] = suffix[code]
                pos += 1
                prev = code
                continue
            # emit the string for `code`; KwKwK (code == next_code)
            # emits string(prev) + first_byte(string(prev))
            cur = prev if code == next_code else code
            stack.clear()
            c = int(cur)
            while c >= clear + 2:
                stack.append(suffix[c])
                c = prefix[c]
            stack.append(suffix[c])
            first = stack[-1]
            seq = bytes(stack[::-1])
            if code == next_code:
                seq += bytes((first,))
            n = min(len(seq), n_pixels - pos)
            out[pos : pos + n] = np.frombuffer(seq[:n], dtype=np.uint8)
            pos += n
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = first
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code
            if pos >= n_pixels:
                return out
    if pos < n_pixels:
        raise ValueError(f"gif: LZW stream short ({pos}/{n_pixels} pixels)")
    return out


def gif_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a (possibly animated) GIF to (frames, meta): frames is
    (n_frames, height, width, 3) uint8 RGB composited onto the logical
    screen with ALL four disposal methods (GIF89a §23): 0/1 keep the
    painted canvas, 2 restores the frame's rect to the background color
    (GCT[background index] when a global table exists, else black — the
    engine has no alpha channel to clear to), 3 restores the canvas to
    its pre-frame state. Transparent pixels leave the canvas untouched.
    Reserved disposal values (4–7) and a frame without a color table
    refuse loudly. Interlaced frames are de-interlaced (four-pass row
    order)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad magic")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(
            n, 3
        )
        pos += 3 * n
    bg_rgb = (
        gct[bg_index] if gct is not None and bg_index < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    try:
        frames, canvas = _gif_walk_blocks(data, pos, gct, canvas, h, w, bg_rgb)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"gif: truncated stream ({exc})") from exc
    if not frames:
        raise ValueError("gif: no image frames")
    return np.stack(frames), {
        "width": int(w), "height": int(h), "n_frames": len(frames),
    }


def _gif_walk_blocks(data, pos, gct, canvas, h, w, bg_rgb):
    frames = []
    transparent = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                flags = data[pos + 1]
                disposal = (flags >> 2) & 0x07
                if disposal >= 4:
                    raise ValueError(
                        f"gif: reserved disposal method {disposal}"
                    )
                transparent = data[pos + 4] if flags & 0x01 else None
            while True:  # skip/consume sub-blocks
                sz = data[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x} at {pos - 1}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            table = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("gif: frame has no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            sz = data[pos]
            pos += 1
            lzw.extend(data[pos : pos + sz])
            pos += sz
            if sz == 0:
                break
        idx = _gif_lzw_decode(min_code, bytes(lzw), fw * fh).reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: rows in 8/8, 8/4(+4), 4/2(+2), 2/1(+1)
            order = np.concatenate(
                [np.arange(0, fh, 8), np.arange(4, fh, 8),
                 np.arange(2, fh, 4), np.arange(1, fh, 2)]
            )
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        rgb = table[np.minimum(idx, len(table) - 1)]
        snapshot = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        # disposal happens AFTER the frame is shown: it sets the canvas
        # the NEXT frame composites onto
        if disposal == 2:  # restore the frame's rect to background
            canvas[top : top + fh, left : left + fw] = bg_rgb
        elif disposal == 3:  # restore the canvas to its pre-frame state
            canvas = snapshot
        transparent = None
        disposal = 0
    return frames, canvas


def gif_frame_meta(data: bytes) -> dict:
    """(width, height, n_frames) from the block structure WITHOUT LZW
    pixel decode — sub-blocks are length-skipped. The metadata fast
    path for feature extraction over large animations (counting frames
    in a 10k-frame GIF costs a block walk, not a full decode); unlike
    :func:`gif_decode` it accepts any disposal method, because it never
    composites."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad magic")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    try:
        while pos < len(data):
            block = data[pos]
            pos += 1
            if block == 0x3B:
                break
            if block == 0x21:
                pos += 1  # label
            elif block == 0x2C:
                fpacked = data[pos + 8]
                pos += 9
                if fpacked & 0x80:
                    pos += 3 * (2 << (fpacked & 0x07))
                pos += 1  # LZW min code size
                n_frames += 1
            else:
                raise ValueError(f"gif: unknown block 0x{block:02x}")
            while True:  # length-skip sub-blocks (both block kinds)
                sz = data[pos]
                pos += 1 + sz
                if sz == 0:
                    break
    except IndexError as exc:
        raise ValueError("gif: truncated stream") from exc
    if n_frames == 0:
        raise ValueError("gif: no image frames")
    return {"width": int(w), "height": int(h), "n_frames": n_frames}


def gif_encode(frames: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """Minimal GIF89a writer for (n, h, w) uint8 INDEX frames over a
    256-entry palette (default: identity grayscale) — full-size opaque
    frames with disposal 0. Fixture generator for the GIF decode path;
    see :func:`gif_encode_frames` for sub-rect/disposal/transparency
    control."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim == 2:
        f = f[None]
    n_frames, h, w = f.shape
    specs = [{"idx": frame} for frame in f]
    return gif_encode_frames(w, h, specs, palette=palette)


def gif_encode_frames(
    w: int,
    h: int,
    specs: list[dict],
    palette: np.ndarray | None = None,
    bg_index: int = 0,
) -> bytes:
    """GIF89a writer with per-frame placement, disposal and transparency:
    each spec is ``{"idx": 2-D uint8 index array, "left": int, "top":
    int, "disposal": 0..3, "transparent": int | None}`` (all but
    ``idx`` optional). Uses the classic 'uncompressed GIF' LZW trick —
    literal 8-bit codes with a clear code every 2^8−2 symbols so the
    dictionary never grows — which every conformant decoder (including
    :func:`gif_decode`) reads back exactly. The disposal-method fixture
    generator for the multimodal_gif_disposal oracle."""
    if palette is None:
        palette = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    if palette.shape != (256, 3):
        raise ValueError("gif_encode: palette must be (256, 3)")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, bg_index, 0)  # 256-entry GCT
    out += palette.astype(np.uint8).tobytes()
    for spec in specs:
        idx = np.asarray(spec["idx"], dtype=np.uint8)
        if idx.ndim != 2:
            raise ValueError("gif_encode_frames: each idx must be 2-D")
        fh, fw = idx.shape
        left = int(spec.get("left", 0))
        top = int(spec.get("top", 0))
        disposal = int(spec.get("disposal", 0))
        transparent = spec.get("transparent")
        if not 0 <= disposal <= 3:
            raise ValueError(f"gif_encode_frames: disposal must be 0..3, got {disposal}")
        if left + fw > w or top + fh > h:
            raise ValueError("gif_encode_frames: frame rect outside logical screen")
        gce_flags = (disposal << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes(
            (gce_flags, 0, 0, transparent if transparent is not None else 0, 0)
        )
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
        out.append(8)  # LZW min code size
        clear, bits = 256, 9
        codes = []
        for i, px in enumerate(idx.ravel()):
            if i % 254 == 0:
                codes.append(clear)
            codes.append(int(px))
        codes.append(clear + 1)  # end
        acc = nbits = 0
        stream = bytearray()
        for code in codes:
            acc |= code << nbits
            nbits += bits
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            stream.append(acc & 0xFF)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def _bmp_rle8_decode(data: bytes, offset: int, w: int, h: int) -> np.ndarray:
    """BI_RLE8 stream → (h, w) uint8 index plane in STORAGE order
    (bottom-up; the caller flips). Implements all four stream ops:
    encoded runs (count, value), end-of-line (0,0), end-of-bitmap
    (0,1), delta (0,2,dx,dy — skipped pixels keep index 0, the
    documented background), and absolute mode (0,n≥3: n literal bytes,
    padded to a word boundary). Overruns raise by name."""
    plane = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    pos = offset
    while pos + 1 < len(data):
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count > 0:
            if y >= h or x + count > w:
                raise ValueError(
                    f"bmp: RLE8 run of {count} overruns row {y} at x={x}"
                )
            plane[y, x : x + count] = val
            x += count
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return plane
        elif val == 2:  # delta
            if pos + 1 >= len(data):
                raise ValueError("bmp: RLE8 delta escape truncated")
            dx, dy = data[pos], data[pos + 1]
            pos += 2
            x += dx
            y += dy
            if x > w or y > h:
                raise ValueError(
                    f"bmp: RLE8 delta moves outside the bitmap (x={x}, y={y})"
                )
        else:  # absolute mode: val literal bytes, word-aligned
            n = val
            end = pos + n + (n & 1)
            if end > len(data):
                raise ValueError("bmp: RLE8 absolute run truncated")
            if y >= h or x + n > w:
                raise ValueError(
                    f"bmp: RLE8 absolute run of {n} overruns row {y} at x={x}"
                )
            plane[y, x : x + n] = np.frombuffer(
                data, dtype=np.uint8, count=n, offset=pos
            )
            x += n
            pos = end
    raise ValueError("bmp: RLE8 stream ended without an end-of-bitmap escape")


def bmp_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode an uncompressed (BI_RGB) 8/24/32-bit or RLE8-compressed
    (BI_RLE8) BMP to (array (h, w, c) uint8, meta). Rows are 4-byte
    padded and stored bottom-up unless height is negative (top-down;
    illegal for RLE8 per the format and refused); 24/32-bit pixels
    are BGR(A) on disk and returned as RGB(A); 8-bit pixels (both
    compressions) expand through the color table. Other variants
    (RLE4, bitfields) refuse loudly with the capability named — same
    contract as the PNG decoder."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("bmp: bad magic or truncated header")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    dib = struct.unpack_from("<I", data, 14)[0]
    if dib not in (40, 52, 56, 64, 108, 124):
        raise ValueError(f"bmp: unsupported DIB header size {dib} for pixel decode")
    w, h_raw, _planes, bpp, compression = struct.unpack_from("<iihHI", data, 18)
    if compression not in (0, 1):
        raise ValueError(
            "bmp: only BI_RGB (uncompressed) and BI_RLE8 supported, "
            f"got compression={compression}"
        )
    if bpp not in (8, 24, 32):
        raise ValueError(f"bmp: only 8/24/32-bit supported, got {bpp}")
    if w <= 0 or h_raw == 0:
        raise ValueError("bmp: non-positive dimensions")
    top_down = h_raw < 0
    h = abs(h_raw)
    if compression == 1:  # BI_RLE8
        if bpp != 8:
            raise ValueError(f"bmp: BI_RLE8 requires 8-bit pixels, got {bpp}")
        if top_down:
            raise ValueError("bmp: top-down RLE8 is illegal (height < 0)")
        channels = 1
        rows = _bmp_rle8_decode(data, data_offset, w, h)[::-1, :, None]
    else:
        channels = bpp // 8
        stride = (w * channels + 3) & ~3  # rows pad to 4 bytes
        need = data_offset + stride * h
        if len(data) < need:
            raise ValueError(f"bmp: pixel data truncated ({len(data)} < {need})")
        buf = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=data_offset
        )
        rows = buf.reshape(h, stride)[:, : w * channels].reshape(h, w, channels)
        if not top_down:
            rows = rows[::-1]
    if channels >= 3:  # BGR(A) -> RGB(A)
        rows = rows[:, :, [2, 1, 0] + ([3] if channels == 4 else [])]
    elif bpp == 8:
        # 8-bit pixels are PALETTE INDICES: expand through the color
        # table (BGRA quads between the DIB header and the pixel data).
        # An identity-grayscale palette (the bmp_encode default) keeps
        # the 1-channel gray return; any other palette expands to RGB —
        # returning raw indices as intensities would be silently wrong.
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + dib
        if pal_off + 4 * n_colors > data_offset:
            raise ValueError(
                f"bmp: palette ({n_colors} entries) overruns pixel data offset"
            )
        quads = np.frombuffer(
            data, dtype=np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)
        palette = quads[:, [2, 1, 0]]  # BGRA -> RGB
        idx = np.arange(n_colors, dtype=np.uint8)
        if not (
            n_colors == 256
            and (palette == idx[:, None]).all()
        ):
            if int(rows.max(initial=0)) >= n_colors:
                raise ValueError(
                    f"bmp: pixel index {int(rows.max())} outside the "
                    f"{n_colors}-entry palette"
                )
            rows = palette[rows[:, :, 0]]
            channels = 3
    return np.ascontiguousarray(rows), {
        "width": w, "height": h, "channels": channels,
    }


def bmp_encode(arr: np.ndarray) -> bytes:
    """Minimal BI_RGB BMP writer for (h, w) 8-bit gray (with the
    required 256-entry palette) or (h, w, 3/4) RGB(A) arrays — fixture
    generator for the BMP decode path (and a usable sink)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, channels = a.shape
    if channels not in (1, 3, 4):
        raise ValueError(f"bmp_encode: 1/3/4 channels only, got {channels}")
    bpp = channels * 8
    stride = (w * channels + 3) & ~3
    palette = b""
    if channels == 1:  # 8-bit needs a palette: identity grayscale
        palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    px = a[::-1]  # bottom-up
    if channels >= 3:  # RGB(A) -> BGR(A)
        px = px[:, :, [2, 1, 0] + ([3] if channels == 4 else [])]
    body = bytearray()
    pad = bytes(stride - w * channels)
    for y in range(h):
        body += px[y].tobytes() + pad
    data_offset = 14 + 40 + len(palette)
    dib = struct.pack(
        "<IiihHIIiiII", 40, w, h, 1, bpp, 0, len(body), 2835, 2835,
        256 if channels == 1 else 0, 0,
    )
    header = b"BM" + struct.pack(
        "<IHHI", data_offset + len(body), 0, 0, data_offset
    )
    return header + dib + palette + bytes(body)


def bmp_encode_rle8(
    indices: np.ndarray, palette: np.ndarray | None = None
) -> bytes:
    """BI_RLE8 BMP writer for an (h, w) uint8 index plane — fixture
    generator for the RLE decode path (and a usable sink). Emits
    maximal encoded runs (up to 255) with end-of-line/end-of-bitmap
    escapes; the decoder's absolute and delta ops are exercised by
    hand-built streams in the tests. ``palette`` is an optional
    (n≤256, 3) RGB table (identity grayscale when omitted, which
    bmp_decode returns as 1-channel gray)."""
    idx = np.asarray(indices, dtype=np.uint8)
    if idx.ndim != 2 or idx.shape[0] == 0 or idx.shape[1] == 0:
        raise ValueError(
            f"bmp_encode_rle8: expected (h, w) uint8, got {indices.shape}"
        )
    h, w = idx.shape
    if palette is None:
        pal_quads = b"".join(bytes((i, i, i, 0)) for i in range(256))
        n_colors = 256
    else:
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
            raise ValueError(
                f"bmp_encode_rle8: palette must be (1..256, 3), got {palette.shape}"
            )
        if int(idx.max()) >= pal.shape[0]:
            raise ValueError(
                f"bmp_encode_rle8: index {int(idx.max())} outside the "
                f"{pal.shape[0]}-entry palette"
            )
        n_colors = pal.shape[0]
        pal_quads = b"".join(
            bytes((int(b), int(g), int(r), 0)) for r, g, b in pal
        )
    body = bytearray()
    for row in idx[::-1]:  # storage order is bottom-up
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            body += bytes((run, int(row[x])))
            x += run
        body += b"\x00\x00"  # end of line
    body += b"\x00\x01"  # end of bitmap
    data_offset = 14 + 40 + len(pal_quads)
    dib = struct.pack(
        "<IiihHIIiiII", 40, w, h, 1, 8, 1, len(body), 2835, 2835,
        n_colors, 0,
    )
    header = b"BM" + struct.pack(
        "<IHHI", data_offset + len(body), 0, 0, data_offset
    )
    return header + dib + pal_quads + bytes(body)


# WAVE_FORMAT_EXTENSIBLE SubFormat GUID tail: every KSDATAFORMAT_SUBTYPE
# is <u16 format code><u16 zero> followed by these fixed 12 bytes
_WAV_KS_SUFFIX = b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def wav_info(data: bytes) -> dict:
    """RIFF/WAVE chunk walk → channels, sample_rate, bits_per_sample,
    n_samples (sample frames), duration_ms."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE magic")
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack_from("<4sI", data, pos)
        if cid == b"fmt " and clen >= 16:
            fmt = struct.unpack_from("<HHIIHH", data, pos + 8)
        elif cid == b"data":
            if pos + 8 + clen > len(data):
                raise ValueError(
                    f"wav: data chunk declares {clen} bytes but only "
                    f"{len(data) - pos - 8} are present (truncated file)"
                )
            data_size = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("wav: missing fmt or data chunk")
    _audio_fmt, channels, sample_rate, byte_rate, block_align, bits = fmt
    if channels == 0 or sample_rate == 0 or block_align == 0:
        raise ValueError("wav: zero channels/rate/block_align in fmt chunk")
    n_samples = data_size // block_align
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // sample_rate,
    }


def wav_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode WAV samples to (array (n_samples, channels), info dict
    from :func:`wav_info`). Integer PCM (format 1) at 8 bits returns
    the raw unsigned uint8 (offset-128 convention, scipy parity), at
    16 bits int16, at 24 bits int32 (sign-extended, values in ±2²³);
    IEEE float (format 3) at 32 bits returns float32.
    WAVE_FORMAT_EXTENSIBLE (0xFFFE) containers resolve through their
    KSDATAFORMAT SubFormat GUID to the same paths. Other format/width
    combinations refuse loudly with both named."""
    info = wav_info(data)
    bits = info["bits_per_sample"]
    pos = 12
    audio_fmt = None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack_from("<4sI", data, pos)
        if cid == b"fmt ":
            audio_fmt = struct.unpack_from("<H", data, pos + 8)[0]
            if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                # 16 base bytes + cbSize(2) + validBits(2) + mask(4)
                # + SubFormat GUID(16)
                if clen < 40 or pos + 48 > len(data):
                    raise ValueError(
                        "wav: extensible fmt chunk truncated (needs the "
                        "22-byte extension with the SubFormat GUID)"
                    )
                cb = struct.unpack_from("<H", data, pos + 24)[0]
                if cb < 22:
                    raise ValueError(
                        f"wav: extensible fmt cbSize {cb} < 22"
                    )
                valid_bits = struct.unpack_from("<H", data, pos + 26)[0]
                if valid_bits not in (0, bits):
                    # e.g. 20 valid bits in a 24-bit container: the
                    # samples are legal but the rail/feature semantics
                    # downstream assume full-width — refuse loudly
                    # rather than report wrong clipping rails
                    raise ValueError(
                        f"wav: extensible wValidBitsPerSample "
                        f"{valid_bits} != container {bits}-bit not "
                        "supported (full-width samples only)"
                    )
                guid = data[pos + 32 : pos + 48]
                if guid[2:4] != b"\x00\x00" or guid[4:] != _WAV_KS_SUFFIX:
                    raise ValueError(
                        f"wav: unknown SubFormat GUID {guid.hex()} "
                        "(KSDATAFORMAT PCM/float only)"
                    )
                audio_fmt = struct.unpack_from("<H", guid)[0]
            if (audio_fmt, bits) not in ((1, 8), (1, 16), (1, 24), (3, 32)):
                raise ValueError(
                    f"wav: format {audio_fmt} at {bits}-bit not supported "
                    "(PCM 8/16/24-bit or IEEE-float 32-bit)"
                )
        if cid == b"data":
            if audio_fmt is None:
                # the sample WIDTH drives the read below — guessing it
                # from a file whose data precedes its fmt would misread
                raise ValueError("wav: data chunk precedes fmt chunk")
            body = data[pos + 8 : pos + 8 + clen]
            if len(body) < clen:
                raise ValueError("wav: data chunk truncated")
            n = info["n_samples"] * info["channels"]
            if audio_fmt == 3:
                arr = np.frombuffer(body, dtype="<f4", count=n).astype(
                    np.float32
                )
            elif bits == 8:
                arr = np.frombuffer(body, dtype=np.uint8, count=n)
            elif bits == 24:
                # little-endian 3-byte frames -> sign-extended int32
                raw = np.frombuffer(
                    body, dtype=np.uint8, count=3 * n
                ).reshape(n, 3).astype(np.int32)
                arr = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
                arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
            else:
                arr = np.frombuffer(body, dtype="<i2", count=n)
            return arr.reshape(info["n_samples"], info["channels"]), info
        pos += 8 + clen + (clen & 1)
    raise ValueError("wav: missing data chunk")


def wav_encode(
    samples: np.ndarray,
    sample_rate: int = 16_000,
    bits: int | None = None,
    extensible: bool = False,
) -> bytes:
    """Minimal WAV writer for (n, channels) or (n,) arrays — fixture
    generator for the WAV parse path (and a usable sink). Dtype picks
    the format: uint8 → unsigned PCM8 (offset-128, the legacy format),
    int16 → PCM16, float32 → IEEE-float 32-bit (format 3), ``bits=24``
    with an int32 input (values in ±2²³) → packed PCM24.
    ``extensible=True`` wraps the same stream in a WAVE_FORMAT_EXTENSIBLE
    (0xFFFE) fmt chunk with the matching KSDATAFORMAT SubFormat GUID —
    the container real multichannel/24-bit files use."""
    a = np.asarray(samples)
    if a.dtype.kind == "f" and not (bits is None and a.dtype == np.float32):
        # float input is only meaningful as IEEE-float32 output; letting
        # it fall into either integer branch truncates normalized
        # [-1, 1] audio to all-zero PCM (the bits=24 branch included)
        raise ValueError(
            f"wav_encode: float samples must be float32 with bits=None "
            f"(IEEE-float WAV), got dtype {a.dtype} with bits={bits}"
        )
    if bits == 24:
        s = np.asarray(samples, dtype="<i4")
        if s.ndim == 1:
            s = s[:, None]
        if int(np.abs(s).max(initial=0)) >= 1 << 23:
            raise ValueError("wav_encode: 24-bit samples must be in ±2^23")
        audio_fmt, width = 1, 3
        le = (s & 0xFFFFFF).astype("<u4").view(np.uint8).reshape(-1, 4)
        body = le[:, :3].tobytes()
    elif a.dtype == np.float32:
        s = np.asarray(samples, dtype="<f4")
        if s.ndim == 1:
            s = s[:, None]
        audio_fmt, width = 3, 4
        body = s.tobytes()
    elif a.dtype == np.uint8:
        s = a
        if s.ndim == 1:
            s = s[:, None]
        audio_fmt, width = 1, 1
        body = s.tobytes()
    else:
        if a.dtype != np.int16:
            # mirror the float guard: any other integer dtype (int32
            # without bits=24, int64 from a plain python list, …) would
            # silently wrap through astype('<i2') and corrupt samples
            raise ValueError(
                f"wav_encode: integer samples must be uint8 (PCM8), "
                f"int16 (PCM16), or int32 with bits=24 (PCM24); got "
                f"dtype {a.dtype} with bits={bits}"
            )
        s = np.asarray(samples, dtype="<i2")
        if s.ndim == 1:
            s = s[:, None]
        audio_fmt, width = 1, 2
        body = s.tobytes()
    n, channels = s.shape
    block_align = channels * width
    if extensible:
        fmt = struct.pack(
            "<HHIIHH", 0xFFFE, channels, sample_rate,
            sample_rate * block_align, block_align, 8 * width,
        ) + struct.pack(
            "<HHI", 22, 8 * width, 0
        ) + struct.pack("<HH", audio_fmt, 0) + _WAV_KS_SUFFIX
    else:
        fmt = struct.pack(
            "<HHIIHH", audio_fmt, channels, sample_rate,
            sample_rate * block_align, block_align, 8 * width,
        )
    riff = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# --------------------------------------------------------------------------
# resampling


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample: out[y, x] = in[floor(y*h/out_h),
    floor(x*w/out_w)] — the floor index map (GDAL 'near', PIL NEAREST
    with exact floor semantics), chosen because a SQL oracle can
    reproduce it with integer arithmetic."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize_nearest: output dims must be positive")
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys[:, None], xs[None, :]]


def synth_image(seed: int, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic test image: sample(x, y, c) = (seed*7 + 3x + 5y +
    11c) mod 256. Shared between the Spark synthesis path and the DuckDB
    oracle (plans/ext_queries.py `multimodal_decode_png`) so decoded
    pixel sums verify value-for-value."""
    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    c = np.arange(channels, dtype=np.int64)
    vals = (
        seed * 7 + 3 * x[None, :, None] + 5 * y[:, None, None] + 11 * c[None, None, :]
    ) % 256
    return vals.astype(np.uint8)
