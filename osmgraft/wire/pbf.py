"""K3: OSM PBF writer (inverse of sources/pbf.py's hand-rolled
protobuf reader; reference writer is the pw_/pstw_ module
osmconvert.c:4600-5910).

Emits the standard wire layout: OSMHeader blob (required_features
OsmSchema-V0.6 + DenseNodes), then one OSMData blob per
`block_objects` objects — each with its own string table and ONE
primitive group (dense nodes, ways, or relations), zlib-compressed.
Default granularity (100 nanodeg) means raw coordinate = our 1e-7
fixed-point integer directly.

Multi-blob output is deliberate: blobs are the parallelism unit of
sources/pbf.read_pbf, so files written here fan back out to
ceil(objects/block_objects) tasks on re-ingest.

tags=None tombstones are skipped (plain PBF carries no delete
semantics; that is .osc's job).
"""

from __future__ import annotations

import struct
import zlib


def _uv(out: bytearray, v: int) -> None:
    # Mask to 64 bits so negative values (legal object ids in OSM
    # editor extracts) emit the 10-byte two's-complement varint that
    # protobuf decoders expect, instead of looping forever on
    # Python's unbounded arithmetic right shift. int() first: rows
    # arriving through pandas carry numpy int64, which cannot hold
    # the unsigned mask.
    v = int(v) & ((1 << 64) - 1)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zig(v: int) -> int:
    return 2 * v if v >= 0 else -2 * v - 1


def _field_varint(out: bytearray, fno: int, v: int) -> None:
    _uv(out, (fno << 3) | 0)
    _uv(out, v)


def _field_bytes(out: bytearray, fno: int, b: bytes) -> None:
    _uv(out, (fno << 3) | 2)
    _uv(out, len(b))
    out += b


def _packed(values) -> bytes:
    out = bytearray()
    for v in values:
        _uv(out, v)
    return bytes(out)


def _packed_delta_zig(values) -> bytes:
    out = bytearray()
    prev = 0
    for v in values:
        _uv(out, _zig(v - prev))
        prev = v
    return bytes(out)


class _StrTab:
    """Per-block string table; index 0 is the empty string."""

    def __init__(self):
        self.idx = {"": 0}
        self.strings = [""]

    def get(self, s: str) -> int:
        i = self.idx.get(s)
        if i is None:
            i = len(self.strings)
            self.idx[s] = i
            self.strings.append(s)
        return i

    def encode(self) -> bytes:
        msg = bytearray()
        for s in self.strings:
            _field_bytes(msg, 1, s.encode("utf-8"))
        return bytes(msg)


def _blob(out: bytearray, btype: str, payload: bytes) -> None:
    blob = bytearray()
    _field_varint(blob, 2, len(payload))  # raw_size
    _field_bytes(blob, 3, zlib.compress(payload))
    header = bytearray()
    _field_bytes(header, 1, btype.encode())
    _field_varint(header, 3, len(blob))
    out += struct.pack(">I", len(header))
    out += header
    out += blob


def _block(group: bytes, tab: _StrTab) -> bytes:
    blk = bytearray()
    _field_bytes(blk, 1, tab.encode())
    _field_bytes(blk, 2, group)
    return bytes(blk)


def _chunks(rows: list, n: int):
    for i in range(0, len(rows), n):
        yield rows[i : i + n]


def _info_msg(row: dict, tab: "_StrTab") -> bytes | None:
    """Info submessage (version=1, timestamp=2, changeset=3,
    uid=4, user_sid=5); None when the row carries no metadata.
    version/timestamp/changeset are ALWAYS written (0 for absent):
    osmconvert zeroes the whole author block unless all three are
    present (hiscomplete&7, osmconvert.c:3913-3916); uid and
    user_sid likewise travel as a pair (hiscomplete&24)."""
    if not row.get("version"):
        return None
    msg = bytearray()
    _field_varint(msg, 1, int(row["version"]))
    _field_varint(msg, 2, int(row.get("timestamp") or 0))
    _field_varint(msg, 3, int(row.get("changeset") or 0))
    if row.get("uid") and row.get("user"):
        _field_varint(msg, 4, int(row["uid"]))
        _field_varint(msg, 5, tab.get(row["user"]))
    return bytes(msg)


def encode_pbf(
    nodes, ways, rels, block_objects: int = 8000
) -> bytes:
    """Row-dict lists (the readers' shape) -> one complete .pbf."""
    out = bytearray()
    hdr = bytearray()
    _field_bytes(hdr, 4, b"OsmSchema-V0.6")
    _field_bytes(hdr, 4, b"DenseNodes")
    _blob(out, "OSMHeader", bytes(hdr))
    out += encode_pbf_body(nodes, ways, rels, block_objects)
    return bytes(out)


def encode_pbf_body(
    nodes, ways, rels, block_objects: int = 8000
) -> bytes:
    """OSMData blobs only (no OSMHeader) — the executor-side unit
    of the parallel single-file sink: every blob carries its own
    string table and delta state, so independently-encoded blob
    runs concatenate into a valid file."""
    out = bytearray()
    live_nodes = [n for n in nodes if n.get("tags") is not None]
    for chunk in _chunks(live_nodes, block_objects):
        tab = _StrTab()
        kv = []
        for nd in chunk:
            for k, v in nd["tags"].items():
                kv.append(tab.get(k))
                kv.append(tab.get(v))
            kv.append(0)
        dense = bytearray()
        _field_bytes(
            dense, 1, _packed_delta_zig([n["id"] for n in chunk])
        )
        if any(n.get("version") for n in chunk):
            # DenseInfo (field 5): packed version + delta-zig
            # timestamp/changeset/uid/user_sid; date_granularity
            # stays the 1000ms default so raw = epoch seconds
            di = bytearray()
            _field_bytes(
                di, 1,
                _packed([n.get("version") or 0 for n in chunk]),
            )
            _field_bytes(
                di, 2, _packed_delta_zig(
                    [n.get("timestamp") or 0 for n in chunk]
                ),
            )
            _field_bytes(
                di, 3, _packed_delta_zig(
                    [n.get("changeset") or 0 for n in chunk]
                ),
            )
            _field_bytes(
                di, 4, _packed_delta_zig(
                    [n.get("uid") or 0 for n in chunk]
                ),
            )
            _field_bytes(
                di, 5, _packed_delta_zig(
                    [
                        tab.get(n["user"]) if n.get("user") else 0
                        for n in chunk
                    ]
                ),
            )
            _field_bytes(dense, 5, bytes(di))
        _field_bytes(
            dense, 8, _packed_delta_zig([n["lat_i"] for n in chunk])
        )
        _field_bytes(
            dense, 9, _packed_delta_zig([n["lon_i"] for n in chunk])
        )
        _field_bytes(dense, 10, _packed(kv))
        group = bytearray()
        _field_bytes(group, 2, bytes(dense))
        _blob(out, "OSMData", _block(bytes(group), tab))

    live_ways = [w for w in ways if w.get("tags") is not None]
    for chunk in _chunks(live_ways, block_objects):
        tab = _StrTab()
        group = bytearray()
        for wy in chunk:
            msg = bytearray()
            _field_varint(msg, 1, wy["id"])
            _field_bytes(
                msg, 2,
                _packed([tab.get(k) for k in wy["tags"]]),
            )
            _field_bytes(
                msg, 3,
                _packed([tab.get(v) for v in wy["tags"].values()]),
            )
            info = _info_msg(wy, tab)
            if info is not None:
                _field_bytes(msg, 4, info)
            _field_bytes(msg, 8, _packed_delta_zig(wy["refs"]))
            _field_bytes(group, 3, bytes(msg))
        _blob(out, "OSMData", _block(bytes(group), tab))

    _TYPE = {"node": 0, "way": 1, "relation": 2}
    live_rels = [r for r in rels if r.get("tags") is not None]
    for chunk in _chunks(live_rels, block_objects):
        tab = _StrTab()
        group = bytearray()
        for rl in chunk:
            msg = bytearray()
            _field_varint(msg, 1, rl["id"])
            _field_bytes(
                msg, 2,
                _packed([tab.get(k) for k in rl["tags"]]),
            )
            _field_bytes(
                msg, 3,
                _packed([tab.get(v) for v in rl["tags"].values()]),
            )
            info = _info_msg(rl, tab)
            if info is not None:
                _field_bytes(msg, 4, info)
            mem = rl["members"]
            _field_bytes(
                msg, 8,
                _packed([tab.get(m["role"]) for m in mem]),
            )
            _field_bytes(
                msg, 9,
                _packed_delta_zig([m["ref"] for m in mem]),
            )
            _field_bytes(
                msg, 10,
                _packed([_TYPE[m["mtype"]] for m in mem]),
            )
            _field_bytes(group, 4, bytes(msg))
        _blob(out, "OSMData", _block(bytes(group), tab))

    return bytes(out)
