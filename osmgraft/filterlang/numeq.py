"""Compile-time specialization of the positional numeric equality
(fil__cmp case 10/11 — see scalar._num_eq) against a constant RHS.

Because the filter literal is known at compile time, the stop
position of the digit-comparison loop can be unrolled into a small
disjunction of string predicates over V = value-with-leading-zeros-
stripped. Both the Spark Column and DuckDB SQL backends render the
same clause spec, so they stay exactly equivalent to the scalar
evaluator (and, transitively, to the reference binary).

Primitive predicates over V (0-based positions):
  ("startswith", s)        V[:len(s)] == s
  ("char_eq", p, c)        V[p] == c
  ("char_nondigit", p)     p >= len(V) or V[p] not a digit
  ("char_not", p, c)       p >= len(V) or V[p] != c (c non-digit)
  ("zf", p)                V[p:] is zeros-then-(nondigit|end)
A clause is an AND of primitives; the predicate is an OR of clauses.
"""

from __future__ import annotations


def _zf_const(s: str) -> bool:
    s = s.lstrip("0")
    return not (s and s[0].isdigit())


def _digit_run(s: str) -> str:
    i = 0
    while i < len(s) and s[i].isdigit():
        i += 1
    return s[:i]


def eq_clauses(rhs: str) -> list[list[tuple]]:
    """Clause spec for `v ==numeric rhs` (true-cases only)."""
    r = rhs.lstrip("0")
    int_r = _digit_run(r)
    after = r[len(int_r) :]
    rdot = after.startswith(".")
    clauses: list[list[tuple]] = []

    # stop inside R's integer run: only true when V hits '.' there
    # and its fraction is all zeros (the other side is ignored)
    for d in range(len(int_r)):
        clauses.append(
            [
                ("startswith", int_r[:d]),
                ("char_eq", d, "."),
                ("zf", d + 1),
            ]
        )

    d = len(int_r)
    base = [("startswith", int_r)]
    if rdot:
        rf = after[1:]
        rfrun = _digit_run(rf)
        # V also has '.': positional fraction comparison
        for e in range(len(rfrun)):
            if _zf_const(rf[e:]):
                clauses.append(
                    base
                    + [
                        ("char_eq", d, "."),
                        ("startswith", int_r + "." + rfrun[:e]),
                        ("char_nondigit", d + 1 + e),
                    ]
                )
        clauses.append(
            base
            + [
                ("char_eq", d, "."),
                ("startswith", int_r + "." + rfrun),
                ("zf", d + 1 + len(rfrun)),
            ]
        )
        # V diverges before the dot: R's fraction decides alone
        if _zf_const(rf):
            clauses.append(base + [("char_not", d, ".")])
    else:
        # R has no fraction; R's next char is junk-or-end (non-digit)
        clauses.append(base + [("char_eq", d, "."), ("zf", d + 1)])
        clauses.append(
            base + [("char_nondigit", d), ("char_not", d, ".")]
        )
    return clauses


def render_sql(vexpr: str, clauses: list[list[tuple]]) -> str:
    """Render against DuckDB SQL. vexpr must already be the
    zero-stripped value expression."""

    def prim(p: tuple) -> str:
        kind = p[0]
        if kind == "startswith":
            if p[1] == "":
                return "TRUE"
            return f"starts_with({vexpr}, '{p[1]}')"
        if kind == "char_eq":
            return f"substr({vexpr}, {p[1] + 1}, 1) = '{p[2]}'"
        if kind == "char_nondigit":
            return (
                f"NOT regexp_matches("
                f"substr({vexpr}, {p[1] + 1}, 1), '^[0-9]$')"
            )
        if kind == "char_not":
            return f"substr({vexpr}, {p[1] + 1}, 1) <> '{p[2]}'"
        # zf
        return (
            f"regexp_matches(substr({vexpr}, {p[1] + 1}),"
            f" '^0*([^0-9]|$)')"
        )

    ors = [
        "(" + " AND ".join(prim(p) for p in cl) + ")" for cl in clauses
    ]
    return "(" + " OR ".join(ors) + ")" if ors else "FALSE"


def render_spark(vcol, clauses: list[list[tuple]]):
    """Render against a pyspark Column (zero-stripped value)."""
    from pyspark.sql import functions as F

    def prim(p: tuple):
        kind = p[0]
        if kind == "startswith":
            if p[1] == "":
                return F.lit(True)
            return vcol.startswith(p[1])
        ch = F.substring(vcol, p[1] + 1, 1)
        if kind == "char_eq":
            return ch == F.lit(p[2])
        if kind == "char_nondigit":
            return ~ch.rlike("^[0-9]$")
        if kind == "char_not":
            return ch != F.lit(p[2])
        # zf — substring to end of string
        rest = vcol.substr(F.lit(p[1] + 1), F.length(vcol))
        return rest.rlike("^0*([^0-9]|$)")

    out = F.lit(False)
    for cl in clauses:
        c = F.lit(True)
        for p in cl:
            c = c & prim(p)
        out = out | c
    return out
