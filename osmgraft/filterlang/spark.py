"""AST -> pyspark Column over a map<string,string> tags column.

Pure Catalyst expressions (higher-order map functions + regexp +
decimal casts) — the whole predicate stays inside whole-stage
codegen; no UDFs. Numeric comparisons use decimal(38,10) over the
parsed numeric prefix, exact for any OSM-realistic digit string
(reference semantics documented in scalar.py).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .ast import And, Or, Term

_DEC = "decimal(38,10)"
_PREFIX_RE = r"^([0-9]*\.?[0-9]*)"


def _mag(col: Column) -> Column:
    """Decimal value of the leading numeric prefix; '' / '.' -> 0."""
    p = F.regexp_extract(col, _PREFIX_RE, 1)
    return F.coalesce(p.try_cast(_DEC), F.lit(0).cast(_DEC))


def _scalar_mag(s: str) -> str:
    """Compile-time magnitude of the filter literal."""
    import re
    from decimal import Decimal

    p = re.match(_PREFIX_RE, s).group(1)
    if p in ("", "."):
        return "0"
    return str(Decimal(p if not p.endswith(".") else p[:-1]))


def _value_pred(v: Column, t: Term) -> Column:
    if t.value is None:
        return F.lit(True)
    rhs = t.value
    if t.val_wc != (False, False):
        ws, we = t.val_wc
        if ws and we:
            hit = v.contains(rhs)
        elif ws:
            hit = v.endswith(rhs)
        else:
            hit = v.startswith(rhs)
        return hit if t.op == "=" else ~hit
    if t.numeric:
        neg_l = rhs.startswith("-")
        body_l = rhs[1:] if neg_l else rhs
        lmag = F.lit(_scalar_mag(body_l)).cast(_DEC)
        if t.op in ("=", "!="):
            # positional equality (fil__cmp case 10/11), unrolled
            # against the compile-time literal — see numeq.py
            from .numeq import eq_clauses, render_spark

            stripped = F.regexp_replace(v, "^0+", "")
            eq = render_spark(stripped, eq_clauses(rhs))
            return eq if t.op == "=" else ~eq
        neg_v = v.startswith("-")
        vmag = _mag(
            F.when(neg_v, v.substr(F.lit(2), F.length(v))).otherwise(v)
        )
        # order key: (sign class, signed magnitude); '-0' < '0'
        if t.op == "<":
            return F.when(neg_v & ~F.lit(neg_l), F.lit(True)).otherwise(
                F.when(~neg_v & F.lit(neg_l), F.lit(False)).otherwise(
                    F.when(neg_v, vmag > lmag).otherwise(vmag < lmag)))
        if t.op == "<=":
            return F.when(neg_v & ~F.lit(neg_l), F.lit(True)).otherwise(
                F.when(~neg_v & F.lit(neg_l), F.lit(False)).otherwise(
                    F.when(neg_v, vmag >= lmag).otherwise(vmag <= lmag)))
        if t.op == ">":
            return F.when(neg_v & ~F.lit(neg_l), F.lit(False)).otherwise(
                F.when(~neg_v & F.lit(neg_l), F.lit(True)).otherwise(
                    F.when(neg_v, vmag < lmag).otherwise(vmag > lmag)))
        return F.when(neg_v & ~F.lit(neg_l), F.lit(False)).otherwise(
            F.when(~neg_v & F.lit(neg_l), F.lit(True)).otherwise(
                F.when(neg_v, vmag <= lmag).otherwise(vmag >= lmag)))
    # string comparison: Spark compares UTF8 strings byte-wise
    # unsigned, identical to the reference's unsigned-char loop
    if t.op == "=":
        return v == F.lit(rhs)
    if t.op == "!=":
        return v != F.lit(rhs)
    if t.op == "<":
        return v < F.lit(rhs)
    if t.op == "<=":
        return v <= F.lit(rhs)
    if t.op == ">":
        return v > F.lit(rhs)
    return v >= F.lit(rhs)


def _key_pred(k: Column, t: Term) -> Column:
    ws, we = t.key_wc
    if ws and we:
        return k.contains(t.key)
    if ws:
        return k.endswith(t.key)
    if we:
        return k.startswith(t.key)
    return k == F.lit(t.key)


def _absent_true(t: Term, mode: str) -> bool:
    head = t
    while getattr(head, "inherited", None) is not None:
        head = head.inherited
    return mode == "keep" and head.op == "!=" and not head.numeric


def _term_column(tags: Column, t: Term, mode: str) -> Column:
    if t.key_wc == (False, False):
        v = F.try_element_at(tags, F.lit(t.key))
        present = v.isNotNull()
        hit = present & _value_pred(v, t)
    else:
        entries = F.map_entries(tags)
        present = F.exists(entries, lambda e: _key_pred(e.key, t))
        hit = F.exists(
            entries,
            lambda e: _key_pred(e.key, t) & _value_pred(e.value, t),
        )
    if _absent_true(t, mode):
        return hit | ~present
    return hit


def keep_column(tags: Column, node, mode: str = "keep") -> Column:
    """Compile a parsed --keep/--drop tree to a boolean Column.

    mode='keep': string '!=' terms are true on absent keys
    (osmfilter.c:2795-2801); mode='drop': absent keys never match
    (fil_check1 osmfilter.c:2891-2909)."""
    if isinstance(node, Or):
        out = keep_column(tags, node.children[0], mode)
        for c in node.children[1:]:
            out = out | keep_column(tags, c, mode)
        return out
    if isinstance(node, And):
        out = keep_column(tags, node.children[0], mode)
        for c in node.children[1:]:
            out = out & keep_column(tags, c, mode)
        return out
    return _term_column(tags, node, mode)


def _tag_pair_pred(k: Column, v: Column, terms: list[Term]) -> Column:
    """OR over (key matches AND value matches) for a tag-filter pair
    list; default key is 'name' (fil_check2 osmfilter.c:2994)."""
    out = F.lit(False)
    for t in terms:
        out = out | (_key_pred(k, t) & _value_pred(v, t))
    return out


def tags_filter_column(
    tags: Column,
    keep: str | None = None,
    drop: str | None = None,
) -> Column:
    """--keep-tags / --drop-tags projection (SURVEY.md P5): returns a
    filtered map column. Replicates fil_check2 (osmfilter.c:2980-
    3021): a tag survives the keep list unless some pair fully
    matches (-> kept), or the LAST pair's key matches without a value
    match / meetall is set (-> dropped); then any full match in the
    drop list removes it."""
    def _pairs(arg: str) -> tuple[list[Term], bool, Term | None]:
        from .ast import _split_term

        s = arg.lstrip(" ")
        meetall = s.startswith("all ") or s.startswith("and ")
        if meetall:
            s = s[4:]
        terms: list[Term] = []
        last: Term | None = None
        for tok in s.split(" "):
            if not tok or tok in ("&&", "||", "AND", "OR", "and", "or"):
                continue
            t = _split_term(tok)
            if t.key is None:
                t.key = last.key if last else "name"
                t.key_wc = last.key_wc if last else (False, False)
            else:
                last = t
            t.inherited = None  # type: ignore[attr-defined]
            terms.append(t)
        return terms, meetall, terms[-1] if terms else None

    if keep is not None:
        terms, meetall, last = _pairs(keep)
        if meetall:
            keep_cond = lambda k, v: _tag_pair_pred(k, v, terms)  # noqa: E731
        else:
            # non-meetall quirk: a tag is dropped only when the LAST
            # pair's key matches it without any full pair match
            keep_cond = lambda k, v: _tag_pair_pred(  # noqa: E731
                k, v, terms
            ) | ~_key_pred(k, last)
    else:
        keep_cond = lambda k, v: F.lit(True)  # noqa: E731
    if drop is not None:
        dterms, _, _ = _pairs(drop)
        drop_cond = lambda k, v: ~_tag_pair_pred(k, v, dterms)  # noqa: E731
    else:
        drop_cond = lambda k, v: F.lit(True)  # noqa: E731
    return F.map_filter(tags, lambda k, v: keep_cond(k, v) & drop_cond(k, v))
