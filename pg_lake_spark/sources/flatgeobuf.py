"""Dependency-free FlatGeobuf (.fgb) reader + writer.

Reference: GDAL's FlatGeobuf driver row in
docs/file-formats-reference.md (`.fgb | FlatGeoBuf`). FlatGeobuf is the
cloud-native vector format: 8 magic bytes, a size-prefixed FlatBuffers
``Header`` (name, geometry type, column schema, feature count, index
node size), an optional packed Hilbert R-tree, then size-prefixed
``Feature`` flatbuffers (geometry as flat xy/ends arrays + a per-column
properties blob).

No flatbuffers library exists in this environment, so this module
carries a minimal FlatBuffers codec for exactly the subset the format
uses — tables (vtable indirection, negative-soffset vtables), scalars,
strings, vectors of scalars and of tables — per the upstream wire
rules (little-endian, uoffsets forward from their storage position).
Geometries map to the engine's WKB column (Point/LineString/Polygon/
MultiPoint/MultiLineString/MultiPolygon; the FlatGeobuf GeometryType
enum shares WKB's numbering). Properties: Bool/Int/Long/Double/String.

The writer emits an index-free file (``index_node_size=0`` — spec-legal
and what streaming writers produce); the reader skips a packed Hilbert
R-tree when one is present (40-byte nodes, level sum formula).
Single-node parse like the other GDAL-funnel formats.
"""

from __future__ import annotations

import math
import os
import struct

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.functions.spatial import (
    WKB_LINESTRING,
    WKB_MULTILINESTRING,
    WKB_MULTIPOINT,
    WKB_MULTIPOLYGON,
    WKB_POINT,
    WKB_POLYGON,
    _pack,
    _parse,
)

MAGIC = b"fgb\x03fgb\x01"

_SUPPORTED_GEOM = {WKB_POINT, WKB_LINESTRING, WKB_POLYGON, WKB_MULTIPOINT,
                   WKB_MULTILINESTRING, WKB_MULTIPOLYGON}

# ColumnType enum (Header.fbs)
_CT_BOOL, _CT_INT, _CT_LONG, _CT_DOUBLE, _CT_STRING = 2, 5, 7, 10, 11
_CT_TO_DDL = {_CT_BOOL: "boolean", _CT_INT: "int", _CT_LONG: "bigint",
              _CT_DOUBLE: "double", _CT_STRING: "string"}
_DDL_TO_CT = {v: k for k, v in _CT_TO_DDL.items()}

# Header slots (Header.fbs field order)
_H_NAME, _H_ENVELOPE, _H_GTYPE = 0, 1, 2
_H_COLUMNS, _H_FEATURES_COUNT, _H_INDEX_NODE_SIZE = 7, 8, 9
# Feature slots: geometry, properties, columns
_F_GEOMETRY, _F_PROPERTIES = 0, 1
# Geometry slots: ends, xy, z, m, t, tm, type, parts
_G_ENDS, _G_XY, _G_TYPE = 0, 1, 6
# Column slots: name, type
_C_NAME, _C_TYPE = 0, 1


# ---------------------------------------------------------------------------
# minimal FlatBuffers reader
# ---------------------------------------------------------------------------

class _Tbl:
    __slots__ = ("buf", "pos", "vt", "vt_len")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        (soff,) = struct.unpack_from("<i", buf, pos)
        self.vt = pos - soff
        (self.vt_len,) = struct.unpack_from("<H", buf, self.vt)

    def _field(self, slot: int) -> int:
        voff_pos = self.vt + 4 + 2 * slot
        if voff_pos + 2 > self.vt + self.vt_len:
            return 0
        (voff,) = struct.unpack_from("<H", self.buf, voff_pos)
        return self.pos + voff if voff else 0

    def scalar(self, slot: int, fmt: str, default):
        p = self._field(slot)
        return struct.unpack_from("<" + fmt, self.buf, p)[0] if p else default

    def _indirect(self, slot: int) -> int:
        p = self._field(slot)
        if not p:
            return 0
        (u,) = struct.unpack_from("<I", self.buf, p)
        return p + u

    def string(self, slot: int) -> str | None:
        t = self._indirect(slot)
        if not t:
            return None
        (n,) = struct.unpack_from("<I", self.buf, t)
        return self.buf[t + 4 : t + 4 + n].decode("utf-8")

    def scalars(self, slot: int, fmt: str) -> list:
        t = self._indirect(slot)
        if not t:
            return []
        (n,) = struct.unpack_from("<I", self.buf, t)
        return list(struct.unpack_from(f"<{n}{fmt}", self.buf, t + 4))

    def tables(self, slot: int) -> list["_Tbl"]:
        t = self._indirect(slot)
        if not t:
            return []
        (n,) = struct.unpack_from("<I", self.buf, t)
        out = []
        for i in range(n):
            p = t + 4 + 4 * i
            (u,) = struct.unpack_from("<I", self.buf, p)
            out.append(_Tbl(self.buf, p + u))
        return out

    def table(self, slot: int) -> "_Tbl | None":
        t = self._indirect(slot)
        return _Tbl(self.buf, t) if t else None


# ---------------------------------------------------------------------------
# minimal FlatBuffers builder
#
# Layout invariant: every built table blob has the TABLE at offset 0
# ([soffset][inline fields]) with its vtable appended right after the
# inline part (negative soffset — legal wire form) and referenced
# children after that. Parents then reference a child blob by its start.
# ---------------------------------------------------------------------------

_SCALAR_FMT = {"u8": ("B", 1), "u16": ("H", 2), "u32": ("I", 4),
               "u64": ("Q", 8), "f64": ("d", 8), "i32": ("i", 4)}


def _pad8(b: bytearray) -> None:
    while len(b) % 8:
        b += b"\x00"


def _string_blob(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack("<I", len(raw)) + raw + b"\x00"


def _vector_blob(fmt: str, values) -> bytes:
    return struct.pack(f"<I{len(values)}{fmt}", len(values), *values)


def _build_table(fields: list) -> bytes:
    """fields: (slot, kind, value); kind ∈ scalar kinds | 'str' |
    'vec_f64' | 'vec_u32' | 'vec_u8' | 'tbl' | 'vec_tbl'. Returns a
    blob with the table at offset 0."""
    fields = sorted(fields, key=lambda f: f[0])
    max_slot = fields[-1][0] if fields else -1
    off = 4  # after soffset
    placed = []
    offsets: dict[int, int] = {}
    for slot, kind, value in fields:
        size = _SCALAR_FMT[kind][1] if kind in _SCALAR_FMT else 4
        if off % size:
            off += size - off % size
        offsets[slot] = off
        placed.append((slot, kind, value, off))
        off += size
    table_size = off
    vt_len = 4 + 2 * (max_slot + 1)
    vtable = struct.pack("<HH", vt_len, table_size) + b"".join(
        struct.pack("<H", offsets.get(s, 0)) for s in range(max_slot + 1)
    )
    blob = bytearray(b"\x00" * table_size)
    struct.pack_into("<i", blob, 0, -table_size)  # vtable sits right after
    blob += vtable
    pending: list[tuple[int, bytes]] = []
    for slot, kind, value, foff in placed:
        if kind in _SCALAR_FMT:
            struct.pack_into("<" + _SCALAR_FMT[kind][0], blob, foff, value)
            continue
        if kind == "str":
            child = _string_blob(value)
        elif kind == "vec_f64":
            child = _vector_blob("d", value)
        elif kind == "vec_u32":
            child = _vector_blob("I", value)
        elif kind == "vec_u8":
            child = struct.pack("<I", len(value)) + bytes(value)
        elif kind == "tbl":
            child = value
        elif kind == "vec_tbl":
            head = bytearray(struct.pack("<I", len(value)))
            head += b"\x00" * (4 * len(value))
            for i, sub in enumerate(value):
                _pad8(head)
                struct.pack_into("<I", head, 4 + 4 * i, len(head) - (4 + 4 * i))
                head += sub
            child = bytes(head)
        else:
            raise ValueError(kind)
        pending.append((foff, child))
    for foff, child in pending:
        _pad8(blob)
        struct.pack_into("<I", blob, foff, len(blob) - foff)
        blob += child
    return bytes(blob)


def _frame(table_blob: bytes) -> bytes:
    """Size-prefixed flatbuffer: [uint32 size][root uoffset][table...]."""
    body = struct.pack("<I", 4) + table_blob
    return struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# geometry ↔ flat arrays
# ---------------------------------------------------------------------------

def _geom_to_flat(gtype: int, coords) -> tuple[list[float], list[int]]:
    """WKB parse output → (xy flat list, ends). ends carry ring/part
    boundaries as cumulative coordinate counts (FlatGeobuf semantics)."""
    xy: list[float] = []
    ends: list[int] = []

    def put(pts):
        for x, y in pts:
            xy.extend((x, y))
        ends.append(len(xy) // 2)

    if gtype == WKB_POINT:
        xy.extend(coords[0])
    elif gtype == WKB_LINESTRING:
        put(coords)
        ends.clear()
    elif gtype == WKB_POLYGON:
        for ring in coords:
            put(ring)
        if len(coords) == 1:
            ends.clear()
    elif gtype == WKB_MULTIPOINT:
        for _kt, kc in coords:
            xy.extend(kc[0])
    elif gtype == WKB_MULTILINESTRING:
        for _kt, kc in coords:
            put(kc)
        if len(coords) == 1:
            ends.clear()
    elif gtype == WKB_MULTIPOLYGON:
        # FlatGeobuf writes multipolygons via nested parts; this
        # single-level writer flattens ring ends, which is only
        # faithful when every part is a solid (hole-free) polygon —
        # a holed part would decode as separate polygons, so refuse
        for _kt, kc in coords:
            if len(kc) > 1:
                raise ValueError(
                    "flatgeobuf writer: multipolygon parts with interior "
                    "rings are not supported (needs nested parts)"
                )
            put(kc[0])
    else:
        raise ValueError(f"unsupported geometry type {gtype}")
    return xy, ends


def _flat_to_geom(gtype: int, xy: list[float], ends: list[int]):
    pts = [(xy[2 * i], xy[2 * i + 1]) for i in range(len(xy) // 2)]
    if gtype == WKB_POINT:
        return gtype, [pts[0]]
    bounds = ends or [len(pts)]
    parts = []
    prev = 0
    for e in bounds:
        parts.append(pts[prev:e])
        prev = e
    if gtype == WKB_LINESTRING:
        return (gtype, parts[0]) if len(parts) == 1 else (
            WKB_MULTILINESTRING, [(WKB_LINESTRING, p) for p in parts]
        )
    if gtype == WKB_POLYGON:
        return gtype, parts
    if gtype == WKB_MULTIPOINT:
        return gtype, [(WKB_POINT, [p]) for p in pts]
    if gtype == WKB_MULTILINESTRING:
        return gtype, [(WKB_LINESTRING, p) for p in parts]
    if gtype == WKB_MULTIPOLYGON:
        return gtype, [(WKB_POLYGON, [p]) for p in parts]
    raise ValueError(f"unsupported geometry type {gtype}")


# ---------------------------------------------------------------------------
# properties codec ([uint16 column_index][value]*)
# ---------------------------------------------------------------------------

def _encode_props(schema: list[tuple[str, int]], row: dict) -> bytes:
    out = bytearray()
    for i, (name, ct) in enumerate(schema):
        v = row.get(name)
        if v is None:
            continue
        out += struct.pack("<H", i)
        if ct == _CT_BOOL:
            out += struct.pack("<B", 1 if v else 0)
        elif ct == _CT_INT:
            out += struct.pack("<i", int(v))
        elif ct == _CT_LONG:
            out += struct.pack("<q", int(v))
        elif ct == _CT_DOUBLE:
            out += struct.pack("<d", float(v))
        elif ct == _CT_STRING:
            raw = str(v).encode("utf-8")
            out += struct.pack("<I", len(raw)) + raw
        else:
            raise ValueError(f"unsupported column type {ct}")
    return bytes(out)


def _decode_props(schema: list[tuple[str, int]], blob: bytes) -> dict:
    out: dict = {}
    pos = 0
    while pos + 2 <= len(blob):
        (idx,) = struct.unpack_from("<H", blob, pos)
        pos += 2
        name, ct = schema[idx]
        if ct == _CT_BOOL:
            out[name] = bool(blob[pos]); pos += 1
        elif ct == _CT_INT:
            (out[name],) = struct.unpack_from("<i", blob, pos); pos += 4
        elif ct == _CT_LONG:
            (out[name],) = struct.unpack_from("<q", blob, pos); pos += 8
        elif ct == _CT_DOUBLE:
            (out[name],) = struct.unpack_from("<d", blob, pos); pos += 8
        elif ct == _CT_STRING:
            (n,) = struct.unpack_from("<I", blob, pos)
            out[name] = blob[pos + 4 : pos + 4 + n].decode("utf-8")
            pos += 4 + n
        else:
            raise ValueError(f"unsupported column type {ct}")
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _rtree_size(num_items: int, node_size: int) -> int:
    """Byte size of the packed Hilbert R-tree (40-byte nodes; level
    counts summed bottom-up, upstream packedrtree formula)."""
    if node_size < 2 or num_items == 0:
        return 0
    n = num_items
    total = n
    while n != 1:
        n = math.ceil(n / node_size)
        total += n
    return total * 40


def _infer_schema(rows: list[dict], geom_col: str) -> list[tuple[str, int]]:
    """Column schema from the UNION of keys across all rows, each
    typed by its first non-None value (a None in row 0 must not
    string-type the column; a key absent from row 0 must not vanish).
    Mixed types in one column raise."""
    order: list[str] = []
    types: dict[str, int | None] = {}
    for row in rows:
        for k, v in row.items():
            if k == geom_col:
                continue
            if k not in types:
                types[k] = None
                order.append(k)
            if v is None:
                continue
            if isinstance(v, bool):
                ct = _CT_BOOL
            elif isinstance(v, int):
                ct = _CT_LONG
            elif isinstance(v, float):
                ct = _CT_DOUBLE
            else:
                ct = _CT_STRING
            if types[k] is None:
                types[k] = ct
            elif types[k] != ct:
                raise ValueError(
                    f"mixed types in column {k!r}: "
                    f"{types[k]} vs {ct} — cast upstream"
                )
    # an all-None column still needs a slot; type it string
    return [(k, types[k] if types[k] is not None else _CT_STRING) for k in order]


def _feature_frame(
    schema: list[tuple[str, int]], row: dict, geom_col: str
) -> tuple[int | None, bytes]:
    """(gtype | None, size-prefixed feature frame) for one row.

    A NULL geometry is a legal FlatGeobuf feature (no geometry field —
    the reader side already maps it back to NULL); it previously
    crashed inside the WKB parser."""
    props = _encode_props(schema, row)
    if row.get(geom_col) is None:
        ffields = []
        if props:
            ffields.append((_F_PROPERTIES, "vec_u8", props))
        return None, _frame(_build_table(ffields))
    gtype, coords = _parse(row[geom_col])
    if gtype not in _SUPPORTED_GEOM:
        raise ValueError(f"unsupported geometry type {gtype}")
    xy, ends = _geom_to_flat(gtype, coords)
    gfields = [(_G_XY, "vec_f64", xy), (_G_TYPE, "u8", gtype)]
    if ends:
        gfields.insert(0, (_G_ENDS, "vec_u32", ends))
    geom_tbl = _build_table(gfields)
    ffields = [(_F_GEOMETRY, "tbl", geom_tbl)]
    if props:
        ffields.append((_F_PROPERTIES, "vec_u8", props))
    return gtype, _frame(_build_table(ffields))


def _header_bytes(name: str, gtype: int, schema: list[tuple[str, int]], nfeat: int) -> bytes:
    cols = [
        _build_table([(_C_NAME, "str", n), (_C_TYPE, "u8", ct)])
        for n, ct in schema
    ]
    header = _build_table([
        (_H_NAME, "str", name),
        (_H_GTYPE, "u8", gtype),
        (_H_COLUMNS, "vec_tbl", cols),
        (_H_FEATURES_COUNT, "u64", nfeat),
        (_H_INDEX_NODE_SIZE, "u16", 0),
    ])
    return MAGIC + _frame(header)


def write_flatgeobuf(path: str, rows: list[dict], *, geom_col: str = "geometry",
                     name: str = "layer") -> None:
    """Write rows (dicts with a WKB ``geom_col`` plus scalar
    properties) as an index-free .fgb."""
    if not rows:
        raise ValueError("flatgeobuf writer needs at least one feature")
    schema = _infer_schema(rows, geom_col)
    gtypes: set[int] = set()
    frames: list[bytes] = []
    for row in rows:
        gtype, frame = _feature_frame(schema, row, geom_col)
        if gtype is not None:  # NULL geometries don't vote on the header type
            gtypes.add(gtype)
        frames.append(frame)
    # mixed geometry types → header gtype Unknown (0), per FGB spec;
    # the per-feature geometry tables carry their own type.
    hdr_gtype = gtypes.pop() if len(gtypes) == 1 else 0
    with open(path, "wb") as fh:
        fh.write(_header_bytes(name, hdr_gtype, schema, len(frames)))
        for frame in frames:
            fh.write(frame)


#: Spark type name → FGB column type, for the DataFrame export path
_SPARK_TO_CT = {
    "boolean": _CT_BOOL, "int": _CT_INT, "integer": _CT_INT,
    "smallint": _CT_INT, "bigint": _CT_LONG, "long": _CT_LONG,
    "float": _CT_DOUBLE, "double": _CT_DOUBLE, "string": _CT_STRING,
    "date": _CT_STRING, "timestamp": _CT_STRING,
}


def write_flatgeobuf_df(df, path: str, *, geom_col: str = "geometry",
                        name: str = "layer") -> int:
    """Distributed .fgb export: feature frames are ENCODED executor-side
    (mapInPandas over each partition — the expensive WKB parse and
    flatbuffer build never touch the driver), then streamed to the
    single output object via ``toLocalIterator`` so driver memory is
    one partition's frames, not the dataset. The column schema comes
    from the DataFrame schema (exact — no row sniffing). Returns the
    feature count.

    Single-object output is inherent to the format (reference GDAL COPY
    TO writes one file per URL too); the driver does sequential IO only.
    """
    import pandas as pd

    schema = []
    for f in df.schema.fields:
        if f.name == geom_col:
            continue
        ct = _SPARK_TO_CT.get(f.dataType.simpleString())
        if ct is None:
            raise ValueError(
                f"column {f.name!r} type {f.dataType.simpleString()} has no "
                "FlatGeobuf mapping — cast or drop before COPY TO fgb"
            )
        schema.append((f.name, ct))
    str_cols = {n for n, ct in schema if ct == _CT_STRING}

    def encode(batches):
        for pdf in batches:
            out_g, out_f = [], []
            for row in pdf.to_dict("records"):
                wkb = row[geom_col]
                row[geom_col] = bytes(wkb) if wkb is not None else None
                for k in str_cols:  # dates/timestamps serialize as text
                    v = row[k]
                    if v is not None and not isinstance(v, str):
                        # pandas NaT must become null, not the literal
                        # string 'NaT' (the float-NaN loop below never
                        # sees it once stringified)
                        row[k] = None if pd.isna(v) else str(v)
                for k, v in row.items():
                    if v is not None and isinstance(v, float) and pd.isna(v):
                        row[k] = None
                g, frame = _feature_frame(schema, row, geom_col)
                out_g.append(g)
                out_f.append(frame)
            yield pd.DataFrame({"gtype": pd.array(out_g, dtype="Int32"),
                                "frame": out_f})

    frames = df.mapInPandas(encode, "gtype int, frame binary")
    import tempfile

    nfeat = 0
    gtypes: set[int] = set()
    with tempfile.NamedTemporaryFile(delete=False) as body:
        for r in frames.toLocalIterator():
            if r.gtype is not None:
                gtypes.add(r.gtype)
            body.write(bytes(r.frame))
            nfeat += 1
        body_path = body.name
    if nfeat == 0:
        os.remove(body_path)
        raise ValueError("flatgeobuf writer needs at least one feature")
    hdr_gtype = gtypes.pop() if len(gtypes) == 1 else 0
    with open(path, "wb") as out, open(body_path, "rb") as body_fh:
        out.write(_header_bytes(name, hdr_gtype, schema, nfeat))
        while True:
            chunk = body_fh.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    os.remove(body_path)
    return nfeat


def read_flatgeobuf(spark: SparkSession, path: str) -> DataFrame:
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:8] != MAGIC:
        raise ValueError(f"not a FlatGeobuf file: {path}")
    pos = 8
    (hsize,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    (root,) = struct.unpack_from("<I", buf, pos)
    header = _Tbl(buf, pos + root)
    hdr_gtype = header.scalar(_H_GTYPE, "B", 0)
    node_size = header.scalar(_H_INDEX_NODE_SIZE, "H", 16)
    nfeat = header.scalar(_H_FEATURES_COUNT, "Q", 0)
    schema = [
        (c.string(_C_NAME) or f"col{i}", c.scalar(_C_TYPE, "B", _CT_STRING))
        for i, c in enumerate(header.tables(_H_COLUMNS))
    ]
    pos += hsize
    pos += _rtree_size(nfeat, node_size)

    rows: list[tuple] = []
    while pos + 4 <= len(buf):
        (fsize,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        (froot,) = struct.unpack_from("<I", buf, pos)
        feat = _Tbl(buf, pos + froot)
        geom = feat.table(_F_GEOMETRY)
        wkb = None
        if geom is not None:
            gtype = geom.scalar(_G_TYPE, "B", 0) or hdr_gtype
            xy = geom.scalars(_G_XY, "d")
            ends = geom.scalars(_G_ENDS, "I")
            wkb = _pack(*_flat_to_geom(gtype, xy, ends))
        pblob = bytes(feat.scalars(_F_PROPERTIES, "B"))
        props = _decode_props(schema, pblob)
        rows.append(tuple(props.get(n) for n, _ in schema) + (wkb,))
        pos += fsize

    ddl = ", ".join(
        [f"`{n}` {_CT_TO_DDL.get(ct, 'string')}" for n, ct in schema]
        + ["geometry binary"]
    )
    return spark.createDataFrame(rows, ddl)
