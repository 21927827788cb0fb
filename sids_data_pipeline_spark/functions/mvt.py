"""Mapbox Vector Tile (MVT) codec — pure Python, no protobuf dependency.

Implements the public vector-tile-spec 2.1 wire format (the format
tippecanoe emits for the reference's tile pyramid, reference
``pipeline/processing/tiles.py:16-29``): a protobuf ``Tile`` message of
``Layer``s, each with interned keys/values, and features carrying
zigzag-delta-encoded geometry command streams. Only the subset the tile
sink needs is implemented — POLYGON/POINT geometries, string/double/int
property values — plus a decoder so tests round-trip real bytes instead
of trusting the encoder.

Wire-format constants (field numbers / wire types) follow the public
protobuf encoding rules and the vector-tile-spec 2.1 ``vector_tile.proto``.
"""

from __future__ import annotations

from typing import Iterable

# geometry command ids (spec §4.3.2)
MOVE_TO, LINE_TO, CLOSE_PATH = 1, 2, 7
GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 1, 2, 3
DEFAULT_EXTENT = 4096


# --- protobuf primitives -----------------------------------------------------


def _varint(n: int) -> bytes:
    """Unsigned LEB128."""
    if n < 0:
        n += 1 << 64  # protobuf encodes negative varints as 10-byte 2^64 complements
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _key(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _len_delimited(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _packed(field: int, values: Iterable[int]) -> bytes:
    body = b"".join(_varint(v) for v in values)
    return _len_delimited(field, body)


# --- value interning ---------------------------------------------------------


def _encode_value(v) -> bytes:
    """One ``Value`` message: string=1, double=3, int64=4, bool=7."""
    if isinstance(v, bool):
        return _key(7, 0) + _varint(1 if v else 0)
    if isinstance(v, str):
        return _len_delimited(1, v.encode("utf-8"))
    if isinstance(v, float):
        import struct

        return _key(3, 1) + struct.pack("<d", v)
    if isinstance(v, int):
        return _key(4, 0) + _varint(v)
    return _len_delimited(1, str(v).encode("utf-8"))


# --- geometry ----------------------------------------------------------------


def encode_geometry(rings: list[list[tuple[int, int]]], geom_type: int) -> list[int]:
    """Command stream for one feature (spec §4.3.5): cursor-relative
    zigzag deltas; polygon rings are implicitly closed (no repeated last
    vertex — ClosePath ends each ring)."""
    cmds: list[int] = []
    cx = cy = 0
    for ring in rings:
        pts = list(ring)
        if geom_type == GEOM_POLYGON and len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]
        # degenerate rings (clip/simplify collapse) are skipped: an empty
        # ring would IndexError, and a 1-2 point polygon ring would emit
        # a LINE_TO with count 0 — invalid per spec 4.3.5.2
        if not pts:
            continue
        if geom_type == GEOM_POLYGON and len(pts) < 3:
            continue
        if geom_type == GEOM_LINESTRING and len(pts) < 2:
            continue
        cmds.append(MOVE_TO | (1 << 3))
        x0, y0 = pts[0]
        cmds += [_zigzag(int(x0) - cx), _zigzag(int(y0) - cy)]
        cx, cy = int(x0), int(y0)
        if geom_type != GEOM_POINT:
            rest = pts[1:]
            cmds.append(LINE_TO | (len(rest) << 3))
            for x, y in rest:
                cmds += [_zigzag(int(x) - cx), _zigzag(int(y) - cy)]
                cx, cy = int(x), int(y)
        if geom_type == GEOM_POLYGON:
            cmds.append(CLOSE_PATH | (1 << 3))
    return cmds


# --- tile assembly -----------------------------------------------------------


def encode_tile(
    layer_name: str,
    features: list[dict],
    extent: int = DEFAULT_EXTENT,
) -> bytes:
    """One-layer MVT tile. Each feature dict:
    ``{"id": int, "type": GEOM_*, "rings": [[(x, y), ...]], "props": {...}}``
    with coordinates already in tile-local integer space [0, extent].
    Keys/values are interned per layer in first-seen order (deterministic
    for a deterministic feature order)."""
    keys: list[str] = []
    values: list = []
    kidx: dict[str, int] = {}
    vidx: dict = {}
    feats = []
    for f in features:
        tags: list[int] = []
        for k, v in f.get("props", {}).items():
            if k not in kidx:
                kidx[k] = len(keys)
                keys.append(k)
            vk = (type(v).__name__, v)
            if vk not in vidx:
                vidx[vk] = len(values)
                values.append(v)
            tags += [kidx[k], vidx[vk]]
        body = b""
        if f.get("id") is not None:
            body += _key(1, 0) + _varint(int(f["id"]))
        if tags:
            body += _packed(2, tags)
        body += _key(3, 0) + _varint(f.get("type", GEOM_POLYGON))
        body += _packed(4, encode_geometry(f["rings"], f.get("type", GEOM_POLYGON)))
        feats.append(body)
    layer = b"".join(
        [
            _key(15, 0) + _varint(2),  # version 2
            _len_delimited(1, layer_name.encode("utf-8")),
            *(_len_delimited(2, fb) for fb in feats),
            *(_len_delimited(3, k.encode("utf-8")) for k in keys),
            *(_len_delimited(4, _encode_value(v)) for v in values),
            _key(5, 0) + _varint(extent),
        ]
    )
    return _len_delimited(3, layer)


# --- decoder (for tests + read_tileset consumers) ----------------------------


def _read_varint(buf: bytes, off: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[off]
        off += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, off
        shift += 7


def _read_fields(buf: bytes):
    off = 0
    while off < len(buf):
        tag, off = _read_varint(buf, off)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:
            val, off = _read_varint(buf, off)
        elif wire == 1:
            val, off = buf[off : off + 8], off + 8
        elif wire == 2:
            ln, off = _read_varint(buf, off)
            val, off = buf[off : off + ln], off + ln
        else:  # pragma: no cover - wire types 3/4/5 unused by MVT
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _decode_value(buf: bytes):
    import struct

    for field, _wire, val in _read_fields(buf):
        if field == 1:
            return val.decode("utf-8")
        if field == 3:
            return struct.unpack("<d", val)[0]
        if field == 4:  # int64: varint carries the two's complement
            return val - (1 << 64) if val >= 1 << 63 else val
        if field == 5:
            return val
        if field == 6:
            return _unzigzag(val)
        if field == 7:
            return bool(val)
    return None


def decode_geometry(cmds: list[int]) -> list[list[tuple[int, int]]]:
    rings: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    cx = cy = i = 0
    while i < len(cmds):
        cmd, count = cmds[i] & 0x7, cmds[i] >> 3
        i += 1
        if cmd == MOVE_TO:
            if cur:
                rings.append(cur)
            cur = []
        for _ in range(count if cmd != CLOSE_PATH else 0):
            if cmd in (MOVE_TO, LINE_TO):
                cx += _unzigzag(cmds[i])
                cy += _unzigzag(cmds[i + 1])
                cur.append((cx, cy))
                i += 2
        if cmd == CLOSE_PATH and cur:
            cur.append(cur[0])
    if cur:
        rings.append(cur)
    return rings


def decode_tile(data: bytes) -> dict:
    """Parse an MVT tile back to
    ``{layer_name: {"extent": int, "features": [...]}}`` — the inverse of
    :func:`encode_tile`, used by tests to verify real bytes round-trip."""
    out: dict = {}
    for field, _wire, layer_buf in _read_fields(data):
        if field != 3:
            continue
        name, extent, version = "", DEFAULT_EXTENT, None
        keys: list[str] = []
        values: list = []
        raw_feats: list[bytes] = []
        for lf, _lw, lv in _read_fields(layer_buf):
            if lf == 1:
                name = lv.decode("utf-8")
            elif lf == 2:
                raw_feats.append(lv)
            elif lf == 3:
                keys.append(lv.decode("utf-8"))
            elif lf == 4:
                values.append(_decode_value(lv))
            elif lf == 5:
                extent = lv
            elif lf == 15:
                version = lv
        feats = []
        for fb in raw_feats:
            fid = None
            ftype = None
            tags: list[int] = []
            cmds: list[int] = []
            for ff, fw, fv in _read_fields(fb):
                if ff == 1:
                    fid = fv
                elif ff == 2:
                    if fw == 2:
                        o = 0
                        while o < len(fv):
                            t, o = _read_varint(fv, o)
                            tags.append(t)
                    else:
                        tags.append(fv)
                elif ff == 3:
                    ftype = fv
                elif ff == 4:
                    if fw == 2:
                        o = 0
                        while o < len(fv):
                            c, o = _read_varint(fv, o)
                            cmds.append(c)
                    else:
                        cmds.append(fv)
            props = {
                keys[tags[i]]: values[tags[i + 1]] for i in range(0, len(tags), 2)
            }
            feats.append(
                {
                    "id": fid,
                    "type": ftype,
                    "rings": decode_geometry(cmds),
                    "props": props,
                }
            )
        out[name] = {"extent": extent, "version": version, "features": feats}
    return out
