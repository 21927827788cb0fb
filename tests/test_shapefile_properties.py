"""Property-based tests (hypothesis) for the shapefile codec — all
driver-side (no SparkSession), mirroring the GeoPackage fuzz coverage:
write→read round-trips over random polygon soups, winding
canonicalisation idempotence, dBASE record-layout round-trips, and
adversarial truncation never escaping ValueError."""

from __future__ import annotations

import os
import struct
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from sids_data_pipeline_spark.functions import geo
from sids_data_pipeline_spark.sources.shapefile import (
    canonicalize_wkb_winding,
    read_dbf,
    read_shapefile,
    read_shp_geometries,
    write_shapefile,
)

coord = st.floats(
    min_value=-179.0, max_value=179.0, allow_nan=False, allow_infinity=False
)


@st.composite
def rect_rings(draw):
    """Non-degenerate axis-aligned rectangle (always a valid ring)."""
    x0 = draw(coord)
    y0 = draw(coord)
    w = draw(st.floats(min_value=1e-3, max_value=1.0))
    h = draw(st.floats(min_value=1e-3, max_value=1.0))
    return [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)]


@st.composite
def multipolygons(draw):
    """Disjoint polygons (each offset into its own x-band): a .shp
    record stores rings FLAT, so two overlapping exteriors sharing a
    hole location are inherently ambiguous under the winding rule —
    OGR's organizePolygons has the same limitation. The codec contract
    is round-trip fidelity for non-overlapping polygons."""
    npolys = draw(st.integers(min_value=1, max_value=3))
    polys = []
    for pi in range(npolys):
        outer = [(x + 400.0 * pi, y) for x, y in draw(rect_rings())]
        rings = [outer]
        if draw(st.booleans()):
            # hole strictly inside the rectangle
            (x0, y0), _, (x1, y1), _, _ = outer
            fx = draw(st.floats(min_value=0.2, max_value=0.4))
            gx = draw(st.floats(min_value=0.6, max_value=0.8))
            rings.append(
                [
                    (x0 + fx * (x1 - x0), y0 + fx * (y1 - y0)),
                    (x0 + gx * (x1 - x0), y0 + fx * (y1 - y0)),
                    (x0 + gx * (x1 - x0), y0 + gx * (y1 - y0)),
                    (x0 + fx * (x1 - x0), y0 + fx * (y1 - y0)),
                ]
            )
        polys.append(rings)
    return geo.multipolygon_wkb(polys)


@settings(max_examples=60, deadline=None)
@given(st.lists(multipolygons(), min_size=1, max_size=5))
def test_write_read_roundtrip_random_polygons(wkbs):
    d = tempfile.mkdtemp(prefix="shpfuzz")
    path = os.path.join(d, "f.shp")
    recs = [(i, f"n{i}", w) for i, w in enumerate(wkbs)]
    write_shapefile(recs, path)
    pdf = read_shapefile(path)
    assert len(pdf) == len(recs)
    for (fid, name, wkb), row in zip(recs, pdf.itertuples(index=False)):
        assert row.geometry == canonicalize_wkb_winding(wkb)
    os.remove(path)


@settings(max_examples=100, deadline=None)
@given(multipolygons())
def test_canonicalize_idempotent_and_structure_preserving(wkb):
    once = canonicalize_wkb_winding(wkb)
    assert canonicalize_wkb_winding(once) == once
    a, b = geo.parse_wkb(wkb), geo.parse_wkb(once)
    assert [len(p) for p in a] == [len(p) for p in b]
    # winding canonical: exterior CCW (positive), holes CW (negative)
    for poly in b:
        assert geo.ring_signed_area(poly[0]) >= 0
        for hole in poly[1:]:
            assert geo.ring_signed_area(hole) <= 0


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_random_bytes_never_escape_valueerror_shp(data):
    try:
        read_shp_geometries(data)
    except ValueError:
        pass  # the only acceptable failure mode


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_random_bytes_never_escape_valueerror_dbf(data):
    try:
        read_dbf(data)
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(multipolygons(), st.integers(101, 180))
def test_truncated_shp_never_escapes_valueerror(wkb, cut):
    d = tempfile.mkdtemp(prefix="shptrunc")
    path = os.path.join(d, "t.shp")
    write_shapefile([(0, "a", wkb)], path)
    with open(path, "rb") as fh:
        data = fh.read()
    truncated = data[: min(cut, len(data) - 1)]
    try:
        read_shp_geometries(truncated)
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=20,
        ).map(lambda s: s.replace("\x00", "").strip() or None),
        min_size=1,
        max_size=8,
    )
)
def test_dbf_text_field_roundtrip(values):
    flen = 40
    rlen = 1 + flen
    hlen = 32 + 32 + 1
    head = struct.pack("<B3BIHH20x", 0x03, 95, 7, 26, len(values), hlen, rlen)
    desc = (
        b"NAME\x00\x00\x00\x00\x00\x00\x00"
        + b"C"
        + b"\x00" * 4
        + bytes([flen, 0])
        + b"\x00" * 14
    )
    recs = b"".join(
        b" " + (v or "").encode("ascii")[:flen].ljust(flen, b" ")
        for v in values
    )
    names, rows, deleted = read_dbf(head + desc + b"\x0d" + recs + b"\x1a")
    assert names == ["NAME"]
    got = [r[0] for r in rows]
    want = [(v.strip() if v else None) or None for v in values]
    # the writer pads with spaces; the reader strips — compare stripped
    assert got == [(v[:flen].strip() or None) if v else None for v in values]
    assert deleted == [False] * len(values)
