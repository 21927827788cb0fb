"""Pure-stdlib media codecs for the multimodal operators (EXT E4).

The multimodal brief ("image/audio/video as opaque binary columns with
typed metadata") needs at least one REAL codec behind
``extract_features`` — this module provides it without any external
image library (the container has none):

* **PNG** — full decode AND encode. zlib inflate/deflate, per-scanline
  unfilter/filter for all five filter types (None/Sub/Up/Average/Paeth,
  RFC 2083 §6), color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), bit depth 8, non-interlaced. CRC-32 verified per chunk on
  read, emitted on write. Same hardening posture as the GeoTIFF codec
  (sources/geotiff.py): unsupported variants (16-bit, palette,
  interlaced) refuse loudly with the exact capability named — the
  engine does not guess pixels.
* **JPEG / GIF / BMP** — header-only dimension parses (SOF scan,
  logical screen descriptor, DIB header). Dimensions are metadata; a
  full DCT decoder is out of scope and refusing to fake one is the
  point.
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
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


# --------------------------------------------------------------------------
# sniffing


def sniff(data: bytes) -> str | None:
    """Identify a payload by magic bytes: 'png'|'jpeg'|'gif'|'bmp'|'wav',
    or None for anything unrecognized (the caller's documented-fallback
    path). BMP and WAV require a second structural check beyond the
    2–4 byte magic so arbitrary text payloads can't false-positive."""
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


def png_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a PNG payload to (array, meta).

    Array shape is (height, width, channels) uint8; meta carries
    width/height/channels/color_type. Verifies every chunk CRC and the
    IHDR capability envelope; refuses (ValueError, capability named)
    bit depths other than 8, palette images, and Adam7 interlacing —
    loud beats wrong, per the repo contract.
    """
    if data[:8] != _PNG_MAGIC:
        raise ValueError("png: bad magic (not a PNG payload)")
    pos = 8
    ihdr = None
    idat = bytearray()
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
            pass  # only meaningful for color type 3, refused below
        pos += 12 + length
    if ihdr is None:
        raise ValueError("png: missing IHDR chunk")
    if not seen_iend:
        raise ValueError("png: missing IEND chunk (truncated file)")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"png: only bit depth 8 supported, got {depth}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"png: color type {color_type} not supported "
            "(palette images need a PLTE expansion this engine refuses to guess)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("png: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("png: Adam7 interlacing not supported")
    if width == 0 or height == 0:
        raise ValueError("png: zero-dimension image")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"png: decompressed size {len(raw)} != expected {(stride + 1) * height}"
        )
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        out[y] = _unfilter_scanline(int(buf[y, 0]), buf[y, 1:], prev, channels)
        prev = out[y]
    arr = out.reshape(height, width, channels)
    return arr, {
        "width": width,
        "height": height,
        "channels": channels,
        "color_type": color_type,
    }


def png_encode(arr: np.ndarray, level: int = 6, filter_cycle: bool = True) -> bytes:
    """Encode a uint8 array (h, w) or (h, w, c) with c in {1,2,3,4} to PNG.

    ``filter_cycle=True`` picks filter type ``y % 5`` per scanline so a
    round trip exercises every unfilter path (the catalog gate relies on
    this); False always uses filter 0.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _PNG_COLOR_TYPE:
        raise ValueError(f"png_encode: expected (h,w[,c<=4]) uint8, got {arr.shape}")
    height, width, channels = a.shape
    if height == 0 or width == 0:
        raise ValueError("png_encode: zero-dimension image")
    color_type = _PNG_COLOR_TYPE[channels]
    flat = a.reshape(height, width * channels)
    lines = bytearray()
    prev = np.zeros(width * channels, dtype=np.uint8)
    for y in range(height):
        ftype = (y % 5) if filter_cycle else 0
        lines.append(ftype)
        lines.extend(_filter_scanline(ftype, flat[y], prev, channels).tobytes())
        prev = flat[y]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + chunk(b"IEND", b"")
    )


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
    screen with disposal methods none/keep (0/1) — each frame paints
    over the previous canvas; transparent pixels leave it untouched.
    Disposal 2/3 (restore-background/previous) refuse loudly, as does
    a frame without a color table. Interlaced frames are de-interlaced
    (Adam-style four-pass row order)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad magic")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(
            n, 3
        )
        pos += 3 * n
    frames = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    try:
        frames, canvas = _gif_walk_blocks(data, pos, gct, canvas, h, w)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"gif: truncated stream ({exc})") from exc
    if not frames:
        raise ValueError("gif: no image frames")
    return np.stack(frames), {
        "width": int(w), "height": int(h), "n_frames": len(frames),
    }


def _gif_walk_blocks(data, pos, gct, canvas, h, w):
    frames = []
    transparent = None
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
                if disposal >= 2:
                    raise ValueError(
                        f"gif: disposal method {disposal} (restore) not supported"
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
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        transparent = None
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
    256-entry palette (default: identity grayscale). Uses the classic
    'uncompressed GIF' LZW trick — literal 8-bit codes with a clear
    code every 2^8−2 symbols so the dictionary never grows — which
    every conformant decoder (including :func:`gif_decode`) reads
    back exactly. Fixture generator for the GIF decode path."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim == 2:
        f = f[None]
    n_frames, h, w = f.shape
    if palette is None:
        palette = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    if palette.shape != (256, 3):
        raise ValueError("gif_encode: palette must be (256, 3)")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    out += palette.astype(np.uint8).tobytes()
    for frame in f:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: disposal 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW min code size
        clear, bits = 256, 9
        codes = []
        for i, px in enumerate(frame.ravel()):
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


def bmp_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode an uncompressed (BI_RGB) 8/24/32-bit BMP to
    (array (h, w, c) uint8, meta). Rows are 4-byte padded and stored
    bottom-up unless height is negative (top-down); 24/32-bit pixels
    are BGR(A) on disk and returned as RGB(A). Compressed variants
    (RLE, bitfields) refuse loudly with the capability named — same
    contract as the PNG decoder."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("bmp: bad magic or truncated header")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    dib = struct.unpack_from("<I", data, 14)[0]
    if dib not in (40, 52, 56, 64, 108, 124):
        raise ValueError(f"bmp: unsupported DIB header size {dib} for pixel decode")
    w, h_raw, _planes, bpp, compression = struct.unpack_from("<iihHI", data, 18)
    if compression != 0:
        raise ValueError(
            f"bmp: only BI_RGB (uncompressed) supported, got compression={compression}"
        )
    if bpp not in (8, 24, 32):
        raise ValueError(f"bmp: only 8/24/32-bit supported, got {bpp}")
    if w <= 0 or h_raw == 0:
        raise ValueError("bmp: non-positive dimensions")
    top_down = h_raw < 0
    h = abs(h_raw)
    channels = bpp // 8
    stride = (w * channels + 3) & ~3  # rows pad to 4 bytes
    need = data_offset + stride * h
    if len(data) < need:
        raise ValueError(f"bmp: pixel data truncated ({len(data)} < {need})")
    buf = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=data_offset)
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
    """Decode PCM16 WAV samples to (array (n_samples, channels) int16,
    info dict from :func:`wav_info`). Non-PCM or non-16-bit formats
    refuse loudly with the capability named."""
    info = wav_info(data)
    if info["bits_per_sample"] != 16:
        raise ValueError(
            f"wav: only 16-bit PCM decode supported, got {info['bits_per_sample']}-bit"
        )
    pos = 12
    while pos + 8 <= len(data):
        cid, clen = struct.unpack_from("<4sI", data, pos)
        if cid == b"fmt ":
            audio_fmt = struct.unpack_from("<H", data, pos + 8)[0]
            if audio_fmt != 1:
                raise ValueError(
                    f"wav: only PCM (format 1) decode supported, got format {audio_fmt}"
                )
        if cid == b"data":
            body = data[pos + 8 : pos + 8 + clen]
            if len(body) < clen:
                raise ValueError("wav: data chunk truncated")
            n = info["n_samples"] * info["channels"]
            arr = np.frombuffer(body, dtype="<i2", count=n)
            return arr.reshape(info["n_samples"], info["channels"]), info
        pos += 8 + clen + (clen & 1)
    raise ValueError("wav: missing data chunk")


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """Minimal PCM16 WAV writer for (n, channels) or (n,) int16 arrays —
    fixture generator for the WAV parse path (and a usable sink)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    block_align = channels * 2
    body = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
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
