#!/usr/bin/env python
"""Generate the golden WKB fixture parquet (src/test/resources/golden/
wkb_golden.parquet) with an INDEPENDENT pure-Python WKB writer: each row
carries (id, kind, le, wkb, wkt) where `wkt` is the expected decoded
text and `le` marks canonical little-endian rows whose bytes our writer
must reproduce exactly. Includes big-endian and mixed-endian payloads to
prove byte-order handling. Run once; output is committed."""
import struct
import pyarrow as pa
import pyarrow.parquet as pq


def hdr(tpe, le=True):
    return (b"\x01" + struct.pack("<I", tpe)) if le else (b"\x00" + struct.pack(">I", tpe))


def coords(pts, le=True):
    f = "<d" if le else ">d"
    return b"".join(struct.pack(f, v) for p in pts for v in p)


def wkb_point(x, y, le=True):
    return hdr(1, le) + coords([(x, y)], le)


def wkb_line(pts, le=True):
    f = "<I" if le else ">I"
    return hdr(2, le) + struct.pack(f, len(pts)) + coords(pts, le)


def wkb_polygon(rings, le=True):
    f = "<I" if le else ">I"
    out = hdr(3, le) + struct.pack(f, len(rings))
    for r in rings:
        out += struct.pack(f, len(r)) + coords(r, le)
    return out


def wkb_multipoint(pts, le=True, inner_le=None):
    f = "<I" if le else ">I"
    il = le if inner_le is None else inner_le
    return hdr(4, le) + struct.pack(f, len(pts)) + b"".join(
        wkb_point(x, y, il) for x, y in pts)


def wkb_multiline(lines, le=True):
    f = "<I" if le else ">I"
    return hdr(5, le) + struct.pack(f, len(lines)) + b"".join(
        wkb_line(l, le) for l in lines)


def wkb_multipolygon(polys, le=True):
    f = "<I" if le else ">I"
    return hdr(6, le) + struct.pack(f, len(polys)) + b"".join(
        wkb_polygon(p, le) for p in polys)


SQ = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
HOLE = [(2, 2), (2, 4), (4, 4), (4, 2), (2, 2)]
TRI = [(20, 20), (30, 20), (25, 28), (20, 20)]

rows = [
    (1, "point", True, wkb_point(3, 4), "POINT (3 4)"),
    (2, "point", True, wkb_point(-1.5, 2.25), "POINT (-1.5 2.25)"),
    (3, "multipoint", True, wkb_multipoint([(0, 0), (5, -3), (2, 2)]),
     "MULTIPOINT (0 0, 5 -3, 2 2)"),
    (4, "line", True, wkb_line([(0, 0), (10, 0), (10, 5)]),
     "LINESTRING (0 0, 10 0, 10 5)"),
    (5, "multiline", True, wkb_multiline([[(0, 0), (1, 1)], [(5, 5), (6, 7), (8, 8)]]),
     "MULTILINESTRING ((0 0, 1 1), (5 5, 6 7, 8 8))"),
    (6, "polygon", True, wkb_polygon([SQ, HOLE]),
     "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"),
    (7, "multipolygon", True, wkb_multipolygon([[SQ, HOLE], [TRI]]),
     "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2)), "
     "((20 20, 30 20, 25 28, 20 20)))"),
    # big-endian twins (decode-only: our writer emits little-endian)
    (8, "point", False, wkb_point(3, 4, le=False), "POINT (3 4)"),
    (9, "line", False, wkb_line([(0, 0), (10, 0), (10, 5)], le=False),
     "LINESTRING (0 0, 10 0, 10 5)"),
    (10, "polygon", False, wkb_polygon([SQ, HOLE], le=False),
     "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"),
    (11, "multipolygon", False, wkb_multipolygon([[SQ, HOLE], [TRI]], le=False),
     "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2)), "
     "((20 20, 30 20, 25 28, 20 20)))"),
    # mixed endianness: little-endian collection of big-endian points
    (12, "multipoint", False, wkb_multipoint([(0, 0), (5, -3), (2, 2)],
                                             le=True, inner_le=False),
     "MULTIPOINT (0 0, 5 -3, 2 2)"),
]

t = pa.table({
    "id": pa.array([r[0] for r in rows], pa.int64()),
    "kind": pa.array([r[1] for r in rows], pa.string()),
    "le": pa.array([r[2] for r in rows], pa.bool_()),
    "wkb": pa.array([r[3] for r in rows], pa.binary()),
    "wkt": pa.array([r[4] for r in rows], pa.string()),
})
pq.write_table(t, "src/test/resources/golden/wkb_golden.parquet")
print("wrote", len(rows), "rows")

# second fixture: a homogeneous WKB point dataset (the geopandas
# GeoParquet shape) for GeoParquet.readWkb
n = 40
t2 = pa.table({
    "pid": pa.array(list(range(n)), pa.int64()),
    "x": pa.array([float((i * 37) % 100) for i in range(n)], pa.float64()),
    "y": pa.array([float((i * 61) % 100) for i in range(n)], pa.float64()),
    "wkb": pa.array([wkb_point(float((i * 37) % 100), float((i * 61) % 100))
                     for i in range(n)], pa.binary()),
})
pq.write_table(t2, "src/test/resources/golden/wkb_points.parquet")
print("wrote wkb_points", n)
