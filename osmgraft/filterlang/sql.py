"""AST -> ANSI/DuckDB boolean SQL for the driver's oracle checks.

The oracle represents tags as nullable VARCHAR columns (one per
known key); `accessor(key)` maps a tag key to its SQL expression.
Wildcard keys expand against the known-key list at compile time.
Semantics mirror spark.py / scalar.py exactly.
"""

from __future__ import annotations

import re
from decimal import Decimal

from .ast import And, Or, Term

_DEC = "DECIMAL(38,10)"
_PREFIX_RE = "^([0-9]*\\.?[0-9]*)"


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _mag_sql(expr: str) -> str:
    return (
        f"COALESCE(TRY_CAST(regexp_extract({expr}, '{_PREFIX_RE}', 1)"
        f" AS {_DEC}), 0)"
    )


def _scalar_mag(s: str) -> str:
    p = re.match(_PREFIX_RE, s)
    v = p.group(1) if p else ""
    if v in ("", "."):
        return "0"
    return str(Decimal(v if not v.endswith(".") else v[:-1]))


def _value_sql(vexpr: str, t: Term) -> str:
    if t.value is None:
        return "TRUE"
    rhs = t.value
    if t.val_wc != (False, False):
        ws, we = t.val_wc
        if ws and we:
            hit = f"contains({vexpr}, {_q(rhs)})"
        elif ws:
            hit = f"ends_with({vexpr}, {_q(rhs)})"
        else:
            hit = f"starts_with({vexpr}, {_q(rhs)})"
        return hit if t.op == "=" else f"(NOT {hit})"
    if t.numeric:
        if t.op in ("=", "!="):
            from .numeq import eq_clauses, render_sql

            stripped = f"regexp_replace({vexpr}, '^0+', '')"
            eq = render_sql(stripped, eq_clauses(rhs))
            return eq if t.op == "=" else f"(NOT {eq})"
        neg_l = rhs.startswith("-")
        lmag = _scalar_mag(rhs[1:] if neg_l else rhs)
        neg_v = f"starts_with({vexpr}, '-')"
        vmag = _mag_sql(
            f"CASE WHEN {neg_v} THEN substr({vexpr}, 2) ELSE {vexpr} END"
        )
        if t.op in ("<", "<="):
            o = t.op
            if neg_l:
                # v < -L  <=>  v negative and mag(v) >(=) L
                inv = ">" if o == "<" else ">="
                return f"({neg_v} AND {vmag} {inv} {lmag})"
            return f"({neg_v} OR {vmag} {o} {lmag})"
        o = t.op
        if neg_l:
            inv = "<" if o == ">" else "<="
            return f"((NOT {neg_v}) OR {vmag} {inv} {lmag})"
        return f"((NOT {neg_v}) AND {vmag} {o} {lmag})"
    op = {"=": "=", "!=": "<>", "<": "<", "<=": "<=",
          ">": ">", ">=": ">="}[t.op]
    return f"({vexpr} {op} {_q(rhs)})"


def _keys_for(t: Term, known_keys: list[str]) -> list[str]:
    ws, we = t.key_wc
    if (ws, we) == (False, False):
        # a literal key outside the known universe can never match
        # (e.g. 'p*e' — mid-string '*' is a literal char)
        return [t.key] if t.key in known_keys else []
    if ws and we:
        return [k for k in known_keys if t.key in k]
    if ws:
        return [k for k in known_keys if k.endswith(t.key)]
    return [k for k in known_keys if k.startswith(t.key)]


def _absent_true(t: Term, mode: str) -> bool:
    head = t
    while getattr(head, "inherited", None) is not None:
        head = head.inherited
    return mode == "keep" and head.op == "!=" and not head.numeric


def _term_sql(t: Term, accessor, known_keys: list[str], mode: str) -> str:
    keys = _keys_for(t, known_keys)
    if not keys:
        return "TRUE" if _absent_true(t, mode) else "FALSE"
    hits = []
    presents = []
    for k in keys:
        v = accessor(k)
        presents.append(f"{v} IS NOT NULL")
        hits.append(f"({v} IS NOT NULL AND {_value_sql(v, t)})")
    hit = "(" + " OR ".join(hits) + ")"
    if _absent_true(t, mode):
        present = "(" + " OR ".join(presents) + ")"
        return f"({hit} OR NOT {present})"
    return hit


def keep_sql(node, accessor, known_keys: list[str],
             mode: str = "keep") -> str:
    """Compile a parsed filter tree to a SQL boolean expression.

    accessor: key -> SQL expression for that tag's value (NULL when
    the tag is absent). known_keys: universe for wildcard keys."""
    if isinstance(node, Or):
        return (
            "("
            + " OR ".join(
                keep_sql(c, accessor, known_keys, mode)
                for c in node.children
            )
            + ")"
        )
    if isinstance(node, And):
        return (
            "("
            + " AND ".join(
                keep_sql(c, accessor, known_keys, mode)
                for c in node.children
            )
            + ")"
        )
    return _term_sql(node, accessor, known_keys, mode)
