"""K2: .o5m writer — the exact inverse of sources/o5m.py's decoder.

Format per the reference writer (osmconvert.c o5_ module
7487-8010 and wo_ dispatch 8183-8410): LEB128 uints; signed varints
with the sign in bit 0 of the FIRST byte; delta-coded ids, coords,
and per-TYPE relation refs; a 15000+4000-slot sliding string table
addressed by distance-back-from-cursor; datasets framed as
0x10/0x11/0x12 + uint32 body length.

File layout matches what osmconvert itself emits: 0xff reset,
0xe0 "o5m2" header, 0xff reset, datasets, 0xfe EOF.

This is NOT translated C code: the encoder is written against the
byte format documented in sources/o5m.py's decoder (which is
differentially tested against the binary) and verified by
(a) parse_o5m(encode_o5m(w)) == w round-trips and
(b) osmconvert reading our files byte-for-byte equal to reading
    its own (tests/test_wire_sinks.py).

Rows without author keys are written version-0 (the reader treats
version 0 as "no metadata" — osmconvert's --drop-version output);
rows carrying version/timestamp/changeset/uid/user emit the full
wo__author encoding (round 3): uvar version, delta timestamp, and
when the timestamp is nonzero the delta changeset plus the
(LEB128-uid, user) string pair.
"""

from __future__ import annotations

_TAB_M = 15000 + 4000   # reader-side tolerance (str__tabM)
_TAB_W = 15000          # writer-side window (stw__tabM / o5m spec)
_TAB_STR_M = 250

_TYPE_DIGIT = {"node": "0", "way": "1", "relation": "2"}


def _uv(out: bytearray, v: int) -> None:
    """LEB128 unsigned."""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _sv(out: bytearray, v: int) -> None:
    """Reference signed varint: sign bit is bit 0 of the FIRST byte
    (pbf_sint64 inverse): negative v stores magnitude -1-v."""
    if v >= 0:
        sig = 0
        mag = v
    else:
        sig = 1
        mag = -1 - v
    first = ((mag & 0x3F) << 1) | sig
    mag >>= 6
    if mag:
        out.append(first | 0x80)
        while True:
            b = mag & 0x7F
            mag >>= 7
            if mag:
                out.append(b | 0x80)
            else:
                out.append(b)
                return
    else:
        out.append(first)


class _StrTabW:
    """Writer side of the sliding string table: emit a back-
    reference when the string (pair) was stored within the last
    _TAB_M insertions, else emit inline and store (if short enough
    to be storable — same 250-byte rule the reader applies)."""

    __slots__ = ("pos", "count")

    def __init__(self):
        self.pos: dict[bytes, int] = {}
        self.count = 0

    def emit(self, out: bytearray, raw: bytes, storable: bool) -> None:
        # Back-reference only within the WRITER window (stw__tabM =
        # 15000, the o5m spec limit). The reader tolerates refs up
        # to 19000 (str__tabM), but emitting into that slack would
        # corrupt strings in spec-compliant third-party readers.
        c = self.pos.get(raw)
        if c is not None:
            ref = self.count - c
            if 1 <= ref <= min(self.count, _TAB_W):
                _uv(out, ref)
                return
        out.append(0)
        out += raw
        if storable:
            self.pos[raw] = self.count
            self.count += 1


def _emit_pair_raw(
    tab: _StrTabW, out: bytearray, rk: bytes, rv: bytes
) -> None:
    tab.emit(
        out, rk + b"\x00" + rv + b"\x00",
        len(rk) + len(rv) <= _TAB_STR_M,
    )


def _emit_pair(tab: _StrTabW, out: bytearray, k: str, v: str) -> None:
    _emit_pair_raw(tab, out, k.encode("utf-8"), v.encode("utf-8"))


def _leb(v: int) -> bytes:
    out = bytearray()
    _uv(out, v)
    return bytes(out)


def _author(
    tab: _StrTabW, body: bytearray, row: dict, st: list[int]
) -> None:
    """wo__author's o5m branch (osmconvert.c:8234-8262): uvar
    version; delta timestamp; when timestamp != 0, delta changeset
    + the (LEB128-uid, user) string pair — empty pair when the uid
    or user is absent. st = [o5_time, o5_cset] delta state."""
    ver = row.get("version") or 0
    if not ver:
        body.append(0x00)
        return
    _uv(body, int(ver))
    ts = row.get("timestamp") or 0
    _sv(body, int(ts) - st[0])
    st[0] = int(ts)
    if ts == 0:
        return
    cs = row.get("changeset") or 0
    _sv(body, int(cs) - st[1])
    st[1] = int(cs)
    uid = row.get("uid") or 0
    user = row.get("user") or ""
    if uid == 0 or not user:
        _emit_pair_raw(tab, body, b"", b"")
    else:
        _emit_pair_raw(
            tab, body, _leb(int(uid)), user.encode("utf-8")
        )


def _emit_single(tab: _StrTabW, out: bytearray, s: str) -> None:
    rs = s.encode("utf-8")
    tab.emit(out, rs + b"\x00", len(rs) <= _TAB_STR_M)


def encode_o5m(
    nodes,
    ways,
    rels,
    change: bool = False,
    file_timestamp: int | None = None,
    bbox: tuple[int, int, int, int] | None = None,
) -> bytes:
    """Row-dict lists (the readers' shape) -> one complete .o5m
    byte string (or .o5c when change=True — same framing, "o5c2"
    header, osmconvert.c:221-223). Rows must be ordered the way OSM
    files are (ids ascending within each type); tags=None rows
    become delete requests (tombstones), which in a changefile mean
    "remove this object" when applied to a base snapshot.

    file_timestamp (unix seconds) writes the 0xdc timestamp dataset
    and bbox (x1, y1, x2, y2 fixed-point) the 0xdb border box, in
    the reference's order (osmconvert.c:8357-8371) — this is what
    `osmconvert --out-timestamp` probes (K8) and what
    updateplan.plan_updates consumes as old_timestamp."""
    hdr = b"o5c2" if change else b"o5m2"
    # reference layout (oo__writeo5mheader): header record, then
    # 0xdc timestamp / 0xdb border WITHOUT an intervening reset,
    # then the 0xff reset, then objects — byte-checked against
    # `osmconvert --timestamp=` output
    out = bytearray(b"\xff\xe0\x04" + hdr)
    if file_timestamp is not None:
        body = bytearray()
        _sv(body, int(file_timestamp))
        out.append(0xDC)
        _uv(out, len(body))
        out.extend(body)
    if bbox is not None:
        body = bytearray()
        for v in bbox:
            _sv(body, int(v))
        out.append(0xDB)
        _uv(out, len(body))
        out.extend(body)
    out.append(0xFF)
    out += encode_o5m_body(nodes, ways, rels)
    out.append(0xFE)
    return bytes(out)


def encode_o5m_body(nodes, ways, rels) -> bytes:
    """The dataset stream only — no file header, no 0xfe EOF, and
    fresh delta/string-table state (the caller must ensure a 0xff
    reset precedes this chunk in the file; the header's trailing
    0xff covers the first chunk). This is the executor-side unit of
    the parallel single-file sink (wire/spark.py): o5m's 0xff reset
    makes independently-encoded chunks legal to concatenate."""
    out = bytearray()
    tab = _StrTabW()
    o5id = o5lat = o5lon = 0
    o5rid = [0, 0, 0]
    meta_st = [0, 0]  # o5_time, o5_cset author delta state

    def dataset(code: int, body: bytearray) -> None:
        out.append(code)
        _uv(out, len(body))
        out.extend(body)

    for nd in nodes:
        body = bytearray()
        _sv(body, nd["id"] - o5id)
        o5id = nd["id"]
        _author(tab, body, nd, meta_st)
        if nd.get("tags") is None:
            dataset(0x10, body)
            continue
        _sv(body, nd["lon_i"] - o5lon)
        o5lon = nd["lon_i"]
        _sv(body, nd["lat_i"] - o5lat)
        o5lat = nd["lat_i"]
        for k, v in nd["tags"].items():
            _emit_pair(tab, body, k, v)
        dataset(0x10, body)

    for wy in ways:
        body = bytearray()
        _sv(body, wy["id"] - o5id)
        o5id = wy["id"]
        _author(tab, body, wy, meta_st)
        if wy.get("tags") is None:
            dataset(0x11, body)
            continue
        refs = bytearray()
        for r in wy["refs"]:
            _sv(refs, r - o5rid[0])
            o5rid[0] = r
        _uv(body, len(refs))
        body += refs
        for k, v in wy["tags"].items():
            _emit_pair(tab, body, k, v)
        dataset(0x11, body)

    for rl in rels:
        body = bytearray()
        _sv(body, rl["id"] - o5id)
        o5id = rl["id"]
        _author(tab, body, rl, meta_st)
        if rl.get("tags") is None:
            dataset(0x12, body)
            continue
        mems = bytearray()
        for m in rl["members"]:
            t = 0 if m["mtype"] == "node" else (
                1 if m["mtype"] == "way" else 2
            )
            _sv(mems, m["ref"] - o5rid[t])
            o5rid[t] = m["ref"]
            _emit_single(
                tab, mems, _TYPE_DIGIT[m["mtype"]] + m["role"]
            )
        _uv(body, len(mems))
        body += mems
        for k, v in rl["tags"].items():
            _emit_pair(tab, body, k, v)
        dataset(0x12, body)

    return bytes(out)
