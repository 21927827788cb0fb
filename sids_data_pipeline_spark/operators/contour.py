"""Iso-line extraction — gdal_contour parity (the last classic of the
reference stack's GDAL utility belt, after warp/addo/dem/clump/sieve/
proximity/rasterize/polygonize).

Marching squares over pixel-center cells, Spark-first:

1. **Cells** — every pixel explodes onto the (up to) four 2×2 cells it
   corners; one groupBy pivots the four corner values into a single
   row. One shuffle, integer cell key.
2. **Segments** — a ``mapInPandas`` kernel classifies each cell against
   each requested level (the 16-case marching-squares table, linear
   interpolation along crossed edges; the two ambiguous saddle cases
   disambiguate on the cell-center average, Bourke's standard rule).
   Fully distributed: no cell ever sees another cell.
3. **Polylines** — ``contour_lines`` chains segments per level into
   MultiLineString WKB (open chains walked from degree-1 endpoints
   first, then closed loops). Chaining state is the CONTOUR length, not
   the raster size; at estate scale, chain per (level, tile) and merge,
   or consume ``contour_segments`` directly (most renderers do).

Exactness: for a field that is LINEAR across a cell (gradients, plane
fits) the reconstruction is exact — the catalog oracle exploits this
with a closed-form line-in-box gate. Interpolated coordinates are
t = (L − v0)/(v1 − v0) on integer corners, so dyadic levels give exact
binary floats and hash-stable output."""

from __future__ import annotations

import struct
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SEG_SCHEMA = T.StructType(
    [
        T.StructField("level", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("x2", T.DoubleType()),
        T.StructField("y2", T.DoubleType()),
    ]
)


def _cells(pixels: DataFrame, val_col: str) -> DataFrame:
    """Pixel centers → one row per 2×2 cell with corner values v00
    (at the cell's x,y), v10, v01, v11. Cells missing any corner drop
    (gdal_contour's NODATA behavior)."""
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (0, 1)
                for dy in (0, 1)
            ]
        )
    ).alias("_o")
    tagged = pixels.select(
        F.col("x").cast("int"), F.col("y").cast("int"),
        F.col(val_col).cast("double").alias("_v"), offs
    ).select(
        (F.col("x") - F.col("_o.dx")).alias("cx"),
        (F.col("y") - F.col("_o.dy")).alias("cy"),
        F.col("_o.dx").alias("dx"),
        F.col("_o.dy").alias("dy"),
        "_v",
    )

    def corner(dx: int, dy: int):
        return F.max(
            F.when((F.col("dx") == dx) & (F.col("dy") == dy), F.col("_v"))
        ).alias(f"v{dx}{dy}")

    return (
        tagged.groupBy("cx", "cy")
        .agg(corner(0, 0), corner(1, 0), corner(0, 1), corner(1, 1))
        .filter(
            F.col("v00").isNotNull()
            & F.col("v10").isNotNull()
            & F.col("v01").isNotNull()
            & F.col("v11").isNotNull()
        )
    )


def contour_segments(
    pixels: DataFrame, levels: Sequence[float], val_col: str = "val"
) -> DataFrame:
    """Marching-squares segments for each level: (level, x1, y1, x2, y2)
    in pixel-center coordinates. Corners exactly AT a level are treated
    as below (standard tie rule — pick levels off the data lattice)."""
    lv = [float(v) for v in levels]
    if not lv:
        raise ValueError("levels must be non-empty")
    cells = _cells(pixels, val_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cx, cy, v00, v10, v01, v11 in pdf[
                ["cx", "cy", "v00", "v10", "v01", "v11"]
            ].itertuples(index=False, name=None):
                for L in lv:
                    rows.extend(
                        _cell_segments(
                            float(cx), float(cy), v00, v10, v01, v11, L
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SEG_SCHEMA.fields]
            )

    return cells.mapInPandas(gen, _SEG_SCHEMA)


def _cell_segments(cx, cy, v00, v10, v01, v11, L):
    """Segments of the iso-line at L inside one unit cell (corners at
    (cx,cy)..(cx+1,cy+1) carrying v00/v10/v01/v11)."""
    b00, b10, b01, b11 = (v >= L for v in (v00, v10, v01, v11))
    code = b00 | (b10 << 1) | (b11 << 2) | (b01 << 3)
    if code in (0, 15):
        return []

    def interp(va, vb):  # position of L on an edge from corner a to b
        return (L - va) / (vb - va)

    # edge midcrossings: bottom (y=cy), right (x=cx+1), top (y=cy+1),
    # left (x=cx)
    def bottom():
        return (cx + interp(v00, v10), cy)

    def right():
        return (cx + 1.0, cy + interp(v10, v11))

    def top():
        return (cx + interp(v01, v11), cy + 1.0)

    def left():
        return (cx, cy + interp(v00, v01))

    pairs = {
        1: [(left, bottom)], 14: [(left, bottom)],
        2: [(bottom, right)], 13: [(bottom, right)],
        3: [(left, right)], 12: [(left, right)],
        4: [(right, top)], 11: [(right, top)],
        6: [(bottom, top)], 9: [(bottom, top)],
        7: [(left, top)], 8: [(left, top)],
    }
    if code in pairs:
        segs = pairs[code]
    else:
        # ambiguous saddles 5 / 10: split on the center average (Bourke)
        center_high = (v00 + v10 + v01 + v11) / 4.0 >= L
        if code == 5:  # b00 & b11 high
            segs = (
                [(left, top), (bottom, right)]
                if center_high
                else [(left, bottom), (right, top)]
            )
        else:  # code == 10: b10 & b01 high
            segs = (
                [(left, bottom), (right, top)]
                if center_high
                else [(left, top), (bottom, right)]
            )
    out = []
    for a, b in segs:
        (x1, y1), (x2, y2) = a(), b()
        out.append((L, x1, y1, x2, y2))
    return out


def multilinestring_wkb(lines: Sequence[Sequence[tuple[float, float]]]) -> bytes:
    """Little-endian WKB MultiLineString."""
    out = [struct.pack("<BII", 1, 5, len(lines))]
    for line in lines:
        out.append(struct.pack("<BII", 1, 2, len(line)))
        for x, y in line:
            out.append(struct.pack("<dd", float(x), float(y)))
    return b"".join(out)


def contour_lines(
    pixels: DataFrame, levels: Sequence[float], val_col: str = "val"
) -> DataFrame:
    """Chained iso-lines: one (level, n_lines, geometry MultiLineString
    WKB) row per level. Chains open polylines first (from degree-1
    endpoints), then closed loops; deterministic start selection."""
    segs = contour_segments(pixels, levels, val_col)
    out_schema = T.StructType(
        [
            T.StructField("level", T.DoubleType()),
            T.StructField("n_lines", T.IntegerType()),
            T.StructField("geometry", T.BinaryType()),
        ]
    )

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64)
        n = pts.shape[0]

        def key(x, y):  # exact-float endpoints (dyadic levels) hash fine
            return (x, y)

        adj: dict = {}
        for i in range(n):
            adj.setdefault(key(pts[i, 0], pts[i, 1]), []).append((i, False))
            adj.setdefault(key(pts[i, 2], pts[i, 3]), []).append((i, True))
        used = np.zeros(n, dtype=bool)

        def walk(start_i, start_rev):
            line = []
            i, rev = start_i, start_rev
            while True:
                used[i] = True
                a = key(pts[i, 2], pts[i, 3]) if rev else key(pts[i, 0], pts[i, 1])
                b = key(pts[i, 0], pts[i, 1]) if rev else key(pts[i, 2], pts[i, 3])
                if not line:
                    line.append(a)
                line.append(b)
                # adj entries at b: (j, r) with r true when b is j's
                # (x2,y2) end — traversing AWAY from b is exactly rev=r
                nxt = [(j, r) for j, r in adj.get(b, ()) if not used[j]]
                if not nxt:
                    return line
                i, rev = min(nxt)

        lines = []
        # open chains first, each started AT a degree-1 endpoint
        for k in sorted(k for k, v in adj.items() if len(v) == 1):
            ((i, rev),) = adj[k]
            if not used[i]:
                lines.append(walk(i, rev))
        for i in np.lexsort((pts[:, 1], pts[:, 0])):  # remaining loops
            if not used[i]:
                lines.append(walk(int(i), False))
        level = float(pdf.iloc[0]["level"])
        return pd.DataFrame(
            [(level, len(lines), multilinestring_wkb(lines))],
            columns=["level", "n_lines", "geometry"],
        )

    return segs.groupBy("level").applyInPandas(chain, out_schema)
