"""K1: .osm XML writer (inverse of sources/osmxml.py).

Mirrors the reference's XML emitter (osmconvert.c wo_xmltag /
wo_node 8183-8640): 7-decimal fixed-point coordinates, attribute
escaping of & < > " ' (F4, osmconvert.c:2355-2407), nodes then
ways then relations inside <osm>. Objects carry version="1" so
strict readers (and osmconvert's own parser) see a well-formed
planet dialect; our data model keeps no history.
"""

from __future__ import annotations

from ..geo.fixedpoint import format_fix7

_ESC = {
    "&": "&amp;",
    "<": "&lt;",
    ">": "&gt;",
    '"': "&quot;",
    "'": "&apos;",
}


def _esc(s: str) -> str:
    if not any(c in s for c in _ESC):
        return s
    return "".join(_ESC.get(c, c) for c in s)


def _tags(parts: list[str], tags: dict, indent: str) -> None:
    for k, v in tags.items():
        parts.append(
            f'{indent}<tag k="{_esc(k)}" v="{_esc(v)}"/>'
        )


def encode_osc(nodes, ways, rels) -> str:
    """osmChange XML (.osc) writer: live rows under <modify> (apply
    semantics treat modify as upsert, osmchange.c:1485-1659),
    tags=None tombstones under <delete> as id-only objects. The
    twin of sources/osmxml.read_osc_nodes.

    The reference requires object ids to ASCEND across the whole
    file (osmconvert.c:440-450), so <modify>/<delete> blocks are
    interleaved in id order (osmChange allows repeated blocks)
    rather than emitted as two monolithic sections."""
    parts = [
        "<?xml version='1.0' encoding='UTF-8'?>",
        '<osmChange version="0.6" generator="osmgraft">',
    ]

    def block(action: str, body: list[str]) -> None:
        parts.append(f"\t<{action}>")
        parts.extend(body)
        parts.append(f"\t</{action}>")

    for nd in nodes:
        if nd.get("tags") is None:
            block(
                "delete",
                [
                    f'\t\t<node id="{nd["id"]}" lat="0" lon="0"'
                    ' version="1"/>'
                ],
            )
            continue
        head = (
            f'\t\t<node id="{nd["id"]}"'
            f' lat="{format_fix7(nd["lat_i"])}"'
            f' lon="{format_fix7(nd["lon_i"])}"'
            ' version="1"'
        )
        if nd["tags"]:
            body = [head + ">"]
            _tags(body, nd["tags"], "\t\t\t")
            body.append("\t\t</node>")
        else:
            body = [head + "/>"]
        block("modify", body)
    for wy in ways:
        if wy.get("tags") is None:
            block(
                "delete",
                [f'\t\t<way id="{wy["id"]}" version="1"/>'],
            )
            continue
        body = [f'\t\t<way id="{wy["id"]}" version="1">']
        for r in wy["refs"]:
            body.append(f'\t\t\t<nd ref="{r}"/>')
        _tags(body, wy["tags"], "\t\t\t")
        body.append("\t\t</way>")
        block("modify", body)
    for rl in rels:
        if rl.get("tags") is None:
            block(
                "delete",
                [f'\t\t<relation id="{rl["id"]}" version="1"/>'],
            )
            continue
        body = [f'\t\t<relation id="{rl["id"]}" version="1">']
        for m in rl["members"]:
            body.append(
                f'\t\t\t<member type="{m["mtype"]}"'
                f' ref="{m["ref"]}" role="{_esc(m["role"])}"/>'
            )
        _tags(body, rl["tags"], "\t\t\t")
        body.append("\t\t</relation>")
        block("modify", body)
    parts.append("</osmChange>")
    parts.append("")
    return "\n".join(parts)


def encode_osm_xml(nodes, ways, rels) -> str:
    """Row-dict lists (the readers' shape) -> one .osm document.
    tags=None tombstones are skipped: plain .osm carries no delete
    semantics (that is .osc's job — streaming/changes.py)."""
    parts = [
        "<?xml version='1.0' encoding='UTF-8'?>",
        '<osm version="0.6" generator="osmgraft">',
    ]
    for nd in nodes:
        if nd.get("tags") is None:
            continue
        head = (
            f'\t<node id="{nd["id"]}"'
            f' lat="{format_fix7(nd["lat_i"])}"'
            f' lon="{format_fix7(nd["lon_i"])}"'
            ' version="1"'
        )
        if nd["tags"]:
            parts.append(head + ">")
            _tags(parts, nd["tags"], "\t\t")
            parts.append("\t</node>")
        else:
            parts.append(head + "/>")
    for wy in ways:
        if wy.get("tags") is None:
            continue
        parts.append(f'\t<way id="{wy["id"]}" version="1">')
        for r in wy["refs"]:
            parts.append(f'\t\t<nd ref="{r}"/>')
        _tags(parts, wy["tags"], "\t\t")
        parts.append("\t</way>")
    for rl in rels:
        if rl.get("tags") is None:
            continue
        parts.append(f'\t<relation id="{rl["id"]}" version="1">')
        for m in rl["members"]:
            parts.append(
                f'\t\t<member type="{m["mtype"]}" ref="{m["ref"]}"'
                f' role="{_esc(m["role"])}"/>'
            )
        _tags(parts, rl["tags"], "\t\t")
        parts.append("\t</relation>")
    parts.append("</osm>")
    parts.append("")
    return "\n".join(parts)
