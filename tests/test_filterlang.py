"""Filter-language tests: comparator truth vectors vs the compiled
reference fil_cpy/fil__cmp, parser shape, scalar-evaluator semantics,
and end-to-end --keep differential vs the osmfilter binary."""

from __future__ import annotations

import itertools

import pytest

from osmgraft.filterlang import eval_filter, fil_cmp, parse
from osmgraft.filterlang.ast import Term, _split_term

from .refdiff import (
    build_cmp_harness,
    build_refbin,
    have_refbin,
    ref_fil_cmp_batch,
    ref_filter_keep,
)

need_ref = pytest.mark.skipif(
    not (have_refbin() or build_refbin()),
    reason="reference binaries unavailable",
)

# adversarial corpus: leading zeros, decimals, junk prefixes/suffixes,
# signs, empty fraction, multiple dots, wildcards
VALUES = [
    "0", "00", "7", "007", "7x", "x7", "abc", "-5", "-05", "-0",
    "0.5", ".5", "0.50", "1.5", "1.50", "15", "-1.5", "7.", "7.x",
    "12.34.56", "123456", "1000000", "-", "--5", "5-", "0.0",
    "000.000", "0x", "10000", "9999", "city", "town", "Cit", "ity",
    "*city*", "city*", "*city", "*", "a*b",
]
OPS = ["=", "!=", "<", "<=", ">", ">="]


def _term(op: str, rhs: str) -> Term:
    return _split_term("k" + op + rhs)


@need_ref
def test_cmp_differential_exhaustive():
    if build_cmp_harness() is None:
        pytest.skip("no gcc for harness")
    cases = [
        (op, rhs, v)
        for op, rhs, v in itertools.product(OPS, VALUES, VALUES)
        if rhs != ""
    ]
    ref = ref_fil_cmp_batch(cases)
    bad = []
    for (op, rhs, v), expect in zip(cases, ref):
        t = _term(op, rhs)
        got = fil_cmp(v, t)
        if got != expect:
            bad.append((op, rhs, v, expect, got))
    assert not bad, f"{len(bad)} mismatches, first 20: {bad[:20]}"


def test_parse_shapes():
    t = parse("place=city")
    assert isinstance(t, Term) and t.op == "=" and t.value == "city"
    assert not t.numeric
    t = parse("population>=10000")
    assert t.numeric and t.op == ">="
    tree = parse("place=city or ( place=town and population>=10000 )")
    from osmgraft.filterlang.ast import And, Or

    assert isinstance(tree, Or)
    assert isinstance(tree.children[1], And)
    # 'and' prefix => meetall => implicit AND connector
    tree = parse("and place=city population>=10000")
    assert isinstance(tree, And)
    # implicit connector defaults to OR
    tree = parse("place=city place=town")
    assert isinstance(tree, Or)
    # wildcard degrades ops to =/!= (op&1)
    t = parse("name=*burg")
    assert t.val_wc == (True, False) and t.op == "="
    t = parse("name<*burg")
    assert t.op == "="
    # key-only existence
    t = parse("highway")
    assert t.value is None
    t = parse("highway=")
    assert t.value is None
    # escaped space inside value
    t = parse(r"name=New\ York")
    assert t.value == "New York"


def test_eval_semantics():
    tree = parse("place=city or ( place=town and population>=10000 )")
    assert eval_filter({"place": "city"}, tree)
    assert not eval_filter({"place": "town"}, tree)
    assert eval_filter({"place": "town", "population": "10000"}, tree)
    assert eval_filter({"place": "town", "population": "010000"}, tree)
    assert not eval_filter({"place": "town", "population": "9999"}, tree)
    # numeric: leading zeros, decimals
    assert eval_filter({"population": "9999.5"}, parse("population>9999"))
    # != matches absent key (keep mode) ...
    assert eval_filter({}, parse("place!=city"))
    # ... but not in drop mode
    assert not eval_filter({}, parse("place!=city"), mode="drop")
    # numeric != does NOT match absent key
    assert not eval_filter({}, parse("population!=5"))
    # key wildcards
    assert eval_filter({"addr:city": "x"}, parse("addr:*"))
    assert not eval_filter({"addr": "x"}, parse("addr:*"))
    # continuation term reuses previous key, inherits absent-case
    tree = parse("place=city =town")
    assert eval_filter({"place": "town"}, tree)
    assert eval_filter({"place": "city"}, tree)
    assert not eval_filter({"place": "village"}, tree)
    assert not eval_filter({}, tree)


@need_ref
def test_keep_differential_vs_osmfilter(tmp_path):
    """End-to-end: synthesized tagged nodes -> osmfilter --keep vs
    our scalar evaluator (Spark backend covered in suite oracles)."""
    places = [None, "city", "town", "village", "hamlet"]
    pops = [None, "0", "500", "9999", "10000", "010000", "10000.5",
            "1000000", "-5", "x"]
    names = [None, "Hamburg", "Brandenburg", "Oldham", "x"]
    nodes = []
    tagsets = []
    nid = 0
    for p, po, na in itertools.product(places, pops, names):
        tags = {}
        if p is not None:
            tags["place"] = p
        if po is not None:
            tags["population"] = po
        if na is not None:
            tags["name"] = na
        nid += 1
        # spread points across the fixture world (coords irrelevant)
        nodes.append((nid, 100_000_000 + nid * 1000,
                      470_000_000 + nid * 1000, tags))
        tagsets.append((nid, tags))

    exprs = [
        "place=city",
        "place=city or ( place=town and population>=10000 )",
        "population>999999",
        "population<500",
        "place!=city",
        "name=*burg",
        "name=Ham* or name=Old*",
        "all place population>0",
        "place=city =town",
        "population!=500",
    ]
    for expr in exprs:
        tree = parse(expr)
        mine = {
            nid for nid, tags in tagsets if eval_filter(tags, tree)
        }
        d = tmp_path / f"e{exprs.index(expr)}"
        d.mkdir(exist_ok=True)
        ref = ref_filter_keep(d, nodes, expr)
        assert mine == ref, (
            f"{expr!r}: only-mine={sorted(mine - ref)[:10]} "
            f"only-ref={sorted(ref - mine)[:10]}"
        )
