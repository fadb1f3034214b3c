"""Differential-oracle helpers: run the compiled reference binaries
(gcc-built from /root/reference/src, binaries in /root/repo/.refbin,
gitignored) on tiny fixtures and parse their XML output.

If the binaries are missing (e.g. fresh checkout), tests that need
them are skipped — the checked-in golden fixtures still cover the
kernels.
"""

from __future__ import annotations

import re
import subprocess
from pathlib import Path

REFBIN = Path(__file__).resolve().parent.parent / ".refbin"

_NODE_RE = re.compile(
    r'<node id="(-?\d+)" lat="(-?[\d.]+)" lon="(-?[\d.]+)"([^/>]*)(?:/>|>)'
)
_TAG_RE = re.compile(r'<tag k="([^"]*)" v="([^"]*)"/>')


def have_refbin() -> bool:
    return (REFBIN / "osmconvert").exists()


def build_refbin() -> bool:
    """Compile the reference tools if gcc is available."""
    src = Path("/root/reference/src")
    if not src.exists():
        return False
    REFBIN.mkdir(exist_ok=True)
    for tool in (
        "osmconvert",
        "osmfilter",
        "osmassignpoly",
        "osmrelpoly",
        "osmgeobase",
        "osmposition",
        "osmchange",
        "pbftoosm",
    ):
        out = REFBIN / tool
        if out.exists():
            continue
        r = subprocess.run(
            ["gcc", str(src / f"{tool}.c"), "-O2", "-lz", "-lm",
             "-o", str(out)],
            capture_output=True,
        )
        if r.returncode != 0:
            return False
    return True


def write_osm_nodes(path: Path, nodes) -> None:
    """nodes: iterable of (id, lon_fix, lat_fix, {tags}) sorted by id."""
    from osmgraft.geo.fixedpoint import format_fix7

    lines = [
        "<?xml version='1.0' encoding='UTF-8'?>",
        '<osm version="0.6" generator="osmgraft-test">',
    ]
    for nid, lon, lat, tags in nodes:
        head = (
            f'\t<node id="{nid}" lat="{format_fix7(lat)}" '
            f'lon="{format_fix7(lon)}" version="1" '
            f'timestamp="2024-01-01T00:00:00Z" changeset="1" '
            f'uid="1" user="u"'
        )
        if tags:
            lines.append(head + ">")
            for k, v in tags.items():
                lines.append(f'\t\t<tag k="{k}" v="{v}"/>')
            lines.append("\t</node>")
        else:
            lines.append(head + "/>")
    lines.append("</osm>")
    path.write_text("\n".join(lines) + "\n")


def parse_osm_nodes(text: str):
    """-> dict id -> {'lat': str, 'lon': str, 'tags': dict}"""
    out = {}
    # node chunks: self-closing, or an open tag with child <tag>s
    for m in re.finditer(
        r"<node id=\"(-?\d+)\" lat=\"(-?[\d.]+)\" lon=\"(-?[\d.]+)\""
        r"[^>]*?(?:/>|>(.*?)</node>)",
        text,
        re.S,
    ):
        nid = int(m.group(1))
        tags = dict(_TAG_RE.findall(m.group(4) or ""))
        out[nid] = {"lat": m.group(2), "lon": m.group(3), "tags": tags}
    return out


def run(cmd, cwd=None) -> str:
    r = subprocess.run(cmd, capture_output=True, cwd=cwd)
    assert r.returncode == 0, (
        f"{cmd} failed rc={r.returncode}: {r.stderr.decode()[:500]}"
    )
    return r.stdout.decode()


def ref_border_filter(tmp: Path, nodes, poly_text: str) -> set[int]:
    """osmconvert -B=... -> set of surviving node ids."""
    write_osm_nodes(tmp / "in.osm", nodes)
    (tmp / "b.poly").write_text(poly_text)
    run([str(REFBIN / "osmconvert"), str(tmp / "in.osm"),
         f"-B={tmp / 'b.poly'}", f"-o={tmp / 'out.osm'}"])
    return set(parse_osm_nodes((tmp / "out.osm").read_text()))


def ref_bbox_filter(tmp: Path, nodes, box: str) -> set[int]:
    """osmconvert -b=x1,y1,x2,y2 -> surviving node ids."""
    write_osm_nodes(tmp / "in.osm", nodes)
    run([str(REFBIN / "osmconvert"), str(tmp / "in.osm"),
         f"-b={box}", f"-o={tmp / 'out.osm'}"])
    return set(parse_osm_nodes((tmp / "out.osm").read_text()))


_CMP_HARNESS = r"""
/* differential harness: feed (op, rhs, v) triples through the real
   fil_cpy + fil__cmp of the reference osmfilter.  Protocol on stdin:
   3 lines per case (op, rhs, v); prints 0/1 per case. */
#include <stdio.h>
#include <string.h>
#define main osmfilter_reference_main
#include "REFSRC"
#undef main
static void chomp(char *s) {
  size_t n = strlen(s);
  while (n && (s[n-1] == '\n' || s[n-1] == '\r')) s[--n] = 0;
}
int main(void) {
  char opl[256], rhs[2048], v[2048], dest[4096];
  while (fgets(opl, sizeof opl, stdin)) {
    if (!fgets(rhs, sizeof rhs, stdin)) break;
    if (!fgets(v, sizeof v, stdin)) break;
    chomp(opl); chomp(rhs); chomp(v);
    int op = 2;
    if (strcmp(opl, "=") == 0) op = 2;
    else if (strcmp(opl, "!=") == 0) op = 3;
    else if (strcmp(opl, "<") == 0) op = 4;
    else if (strcmp(opl, ">=") == 0) op = 5;
    else if (strcmp(opl, ">") == 0) op = 6;
    else if (strcmp(opl, "<=") == 0) op = 7;
    memset(dest, 0, sizeof dest);
    fil_cpy(dest, rhs, strlen(rhs), op);
    printf("%d\n", fil__cmp(v, dest) ? 1 : 0);
  }
  return 0;
}
"""


def build_cmp_harness() -> Path | None:
    """Compile the fil__cmp harness; None if unavailable."""
    src = Path("/root/reference/src/osmfilter.c")
    if not src.exists():
        return None
    REFBIN.mkdir(exist_ok=True)
    out = REFBIN / "filcmp_harness"
    if out.exists():
        return out
    csrc = REFBIN / "filcmp_harness.c"
    csrc.write_text(_CMP_HARNESS.replace("REFSRC", str(src)))
    r = subprocess.run(
        ["gcc", str(csrc), "-O2", "-lz", "-lm", "-o", str(out)],
        capture_output=True,
    )
    return out if r.returncode == 0 else None


def ref_fil_cmp_batch(cases) -> list[bool]:
    """cases: [(op, rhs, v)] -> reference fil_cpy+fil__cmp results."""
    h = build_cmp_harness()
    assert h is not None
    stdin = "".join(f"{op}\n{rhs}\n{v}\n" for op, rhs, v in cases)
    r = subprocess.run(
        [str(h)], input=stdin.encode(), capture_output=True
    )
    assert r.returncode == 0, r.stderr.decode()[:500]
    return [line == b"1" for line in r.stdout.split()]


def ref_filter_keep(tmp: Path, nodes, keep: str,
                    drop: str | None = None) -> set[int]:
    """osmfilter --keep=... [--drop=...] -> surviving node ids."""
    write_osm_nodes(tmp / "in.osm", nodes)
    run([str(REFBIN / "osmconvert"), str(tmp / "in.osm"),
         f"-o={tmp / 'in.o5m'}"])
    cmd = [str(REFBIN / "osmfilter"), str(tmp / "in.o5m"),
           f"--keep={keep}"]
    if drop is not None:
        cmd.append(f"--drop={drop}")
    cmd.append(f"-o={tmp / 'out.osm'}")
    run(cmd)
    return set(parse_osm_nodes((tmp / "out.osm").read_text()))


def ref_assignpoly(tmp: Path, nodes, poly_text: str):
    """osmassignpoly --use-admin-levels --keep-noregion
    -> dict id -> (region|None, subregion|None)."""
    write_osm_nodes(tmp / "in.osm", nodes)
    (tmp / "m.poly").write_text(poly_text)
    run([str(REFBIN / "osmconvert"), str(tmp / "in.osm"),
         f"-o={tmp / 'in.o5m'}"])
    run([str(REFBIN / "osmassignpoly"), str(tmp / "in.o5m"),
         f"-B={tmp / 'm.poly'}", "--use-admin-levels",
         "--keep-noregion", f"-o={tmp / 'out.o5m'}"])
    run([str(REFBIN / "osmconvert"), str(tmp / "out.o5m"),
         f"-o={tmp / 'out.osm'}"])
    parsed = parse_osm_nodes((tmp / "out.osm").read_text())
    return {
        nid: (
            rec["tags"].get("is_in_region"),
            rec["tags"].get("is_in_subregion"),
        )
        for nid, rec in parsed.items()
    }
