"""Reference-exact scalar evaluation of the filter language.

fil_cmp replicates the observable behavior of fil__cmp
(osmfilter.c:1944-2320) — derived from the algorithm, implemented
clean-room, and differentially tested against a compiled shim of the
real function (tests/test_filterlang.py).

Closed-form numeric semantics (cases 10-15):
  Let body(s)   = s minus one leading '-', neg(s) = s startswith '-'
  Let mag(s)    = Decimal value of the leading /[0-9]*(\\.[0-9]*)?/
                  prefix of body(s) ('' and '.' count as 0); any
                  trailing garbage is ignored
  Let magns(s)  = same but on s itself (no sign skip), so any value
                  starting with a non-digit has magns == 0
  =  : magns(v) == magns(rhs)          (sign chars are ordinary
  != : magns(v) != magns(rhs)           non-digits for equality)
  <, <=, >, >= : standard order on the key
                  (0 if neg else 1,  -mag if neg else mag)
       note '-0' sorts strictly below '0' (sign classes compare
       first), matching the reference's early '-' branches.
String semantics: byte-wise compare incl. the terminating NUL
(python bytes compare is identical); wildcards => endswith /
startswith / contains of the '*'-stripped pattern.
"""

from __future__ import annotations

import re
from decimal import Decimal

from .ast import And, Or, Term

_NUMPREFIX = re.compile(r"^([0-9]*\.?[0-9]*)")


def _zf(s: str) -> bool:
    """zeros-then-nondigit: after stripping '0's, s is exhausted or
    starts with a non-digit."""
    s = s.lstrip("0")
    return not (s and s[0].isdigit())


def _num_eq(v: str, r: str) -> bool:
    """Positional numeric equality (fil__cmp case 10, osmfilter.c:
    2048-2086). NOT magnitude equality: when one side's digit run
    ends at '.' while the sides have diverged, the OTHER side is
    ignored and the result depends only on that side's fraction
    being zeros ('0.0' ==num '7' is true). Replicated exactly."""
    a = v.lstrip("0")
    b = r.lstrip("0")
    i = 0
    while (
        i < len(a) and i < len(b) and a[i] == b[i] and a[i].isdigit()
    ):
        i += 1
    ca = a[i] if i < len(a) else ""
    cb = b[i] if i < len(b) else ""
    if ca == ".":
        if cb == ".":
            x, y = a[i + 1 :], b[i + 1 :]
            j = 0
            while (
                j < len(x)
                and j < len(y)
                and x[j] == y[j]
                and x[j].isdigit()
            ):
                j += 1
            cx = x[j] if j < len(x) else ""
            cy = y[j] if j < len(y) else ""
            if not (cx and cx.isdigit()):
                return _zf(y[j:])
            if not (cy and cy.isdigit()):
                return _zf(x[j:])
            return False
        return _zf(a[i + 1 :])
    if cb == ".":
        return _zf(b[i + 1 :])
    return not (ca and ca.isdigit()) and not (cb and cb.isdigit())


def _mag(s: str) -> Decimal:
    p = _NUMPREFIX.match(s).group(1)
    if p in ("", "."):
        return Decimal(0)
    return Decimal(p if not p.endswith(".") else p[:-1])


def _ordkey(s: str) -> tuple[int, Decimal]:
    if s.startswith("-"):
        return (0, -_mag(s[1:]))
    return (1, _mag(s))


def fil_cmp(v: str, t: Term) -> bool:
    """Does tag value v satisfy the term's op/value? (key matching
    and absent-key handling live in eval_filter)."""
    if t.value is None:  # key-existence test
        return True
    rhs = t.value
    if t.val_wc != (False, False):
        ws, we = t.val_wc
        if ws and we:
            hit = rhs in v
        elif ws:
            hit = v.endswith(rhs)
        else:
            hit = v.startswith(rhs)
        return hit if t.op == "=" else not hit
    if t.numeric:
        if t.op == "=":
            return _num_eq(v, rhs)
        if t.op == "!=":
            return not _num_eq(v, rhs)
        a, b = _ordkey(v), _ordkey(rhs)
        if t.op == "<":
            return a < b
        if t.op == "<=":
            return a <= b
        if t.op == ">":
            return a > b
        return a >= b
    av, ar = v.encode(), rhs.encode()
    if t.op == "=":
        return av == ar
    if t.op == "!=":
        return av != ar
    if t.op == "<":
        return av < ar
    if t.op == "<=":
        return av <= ar
    if t.op == ">":
        return av > ar
    return av >= ar


def key_matches(k: str, t: Term) -> bool:
    ws, we = t.key_wc
    if ws and we:
        return t.key in k
    if ws:
        return k.endswith(t.key)
    if we:
        return k.startswith(t.key)
    return k == t.key


def _absent_true(t: Term, mode: str) -> bool:
    """Keep-filter: a string '!=' term is true when the key is absent
    (fil_check0 osmfilter.c:2795-2801, ops 1 and 3 only — numeric !=
    excluded). Drop-filter: absent key is always false (fil_check1)."""
    head = t
    while getattr(head, "inherited", None) is not None:
        head = head.inherited  # chain absent-case = head's
    return mode == "keep" and head.op == "!=" and not head.numeric


def eval_term(tags: dict[str, str], t: Term, mode: str = "keep") -> bool:
    """Evaluate one term against a tag map (unique keys)."""
    matched = [(k, v) for k, v in tags.items() if key_matches(k, t)]
    if not matched:
        return _absent_true(t, mode)
    return any(fil_cmp(v, t) for _, v in matched)


def eval_filter(tags: dict[str, str], node, mode: str = "keep") -> bool:
    """Evaluate a parsed filter tree against a tag map."""
    if isinstance(node, Or):
        return any(eval_filter(tags, c, mode) for c in node.children)
    if isinstance(node, And):
        return all(eval_filter(tags, c, mode) for c in node.children)
    return eval_term(tags, node, mode)
