"""Parser: osmfilter --keep/--drop argument -> boolean AST.

Mirrors fil_parse (osmfilter.c:2481-2646) + fil_cpy (2377-2436):
  - tokens split on unescaped spaces
  - '&&'/'AND'/'and' -> AND, '||'/'OR'/'or' -> OR, default connector
    is OR ('all '/'and ' prefix switches the default to AND)
  - '(' / ')' are standalone tokens
  - term 'key', 'key=', 'key=value', 'key!=v', 'key<v', 'key>=v', ...
    '=value' (empty key) continues the previous term's key
  - '*' wildcard at start/end of key or value (start only when the
    pattern is >=2 chars, osmfilter.c:2410-2418); with wildcards the
    operator degrades to op&1, i.e. =/!= semantics only (2431)
  - a value whose first char (after an optional '-') is a digit
    selects NUMERIC comparison, unless the value has wildcards
    (osmfilter.c:2423-2427)
  - '\\' escapes the following character

The boolean evaluator in the reference (fil_check0 2753-2868) is a
short-circuit jump machine over the flat pair list; its outcome for
well-formed expressions equals the standard formula with AND binding
tighter than OR and brackets grouping, which is what this AST
represents.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Term:
    key: str | None  # None => continuation: reuse previous term's key
    op: str  # '=', '!=', '<', '>=', '>', '<='; '=' with value None
    #          means key-existence test
    value: str | None
    key_wc: tuple[bool, bool] = (False, False)  # (*start, end*)
    val_wc: tuple[bool, bool] = (False, False)
    numeric: bool = False


@dataclass
class And:
    children: list = field(default_factory=list)


@dataclass
class Or:
    children: list = field(default_factory=list)


_CONNECTORS = {
    "&&": "and",
    "AND": "and",
    "and": "and",
    "||": "or",
    "OR": "or",
    "or": "or",
}


def _tokenize(arg: str) -> list[str]:
    """Split on unescaped spaces (escape char kept for later)."""
    toks: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(arg):
        c = arg[i]
        if c == "\\" and i + 1 < len(arg):
            cur.append(c)
            cur.append(arg[i + 1])
            i += 2
            continue
        if c == " ":
            if cur:
                toks.append("".join(cur))
                cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        toks.append("".join(cur))
    return toks


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out and "".join(out) or ""


def _wildcards(s: str) -> tuple[str, tuple[bool, bool]]:
    """Strip '*' at start/end per fil_cpy osmfilter.c:2410-2418."""
    start = end = False
    if len(s) >= 2 and s[0] == "*":
        start = True
        s = s[1:]
    if (len(s) >= 2 and s.endswith("*") and not s[-2] == "\\") or s == "*":
        end = True
        s = s[:-1]
    return s, (start, end)


def _is_numeric_value(v: str) -> bool:
    """fil_cpy osmfilter.c:2422-2427: numeric comparison is selected
    when the first char after an optional '-' is a digit."""
    w = v[1:] if v.startswith("-") else v
    return bool(w) and w[0].isdigit()


def _split_term(tok: str) -> Term:
    """Split a token at the first unescaped comparison operator."""
    # find operator position (osmfilter.c:2570-2575)
    i = 0
    pos = None
    while i < len(tok):
        c = tok[i]
        if c == "\\":
            i += 2
            continue
        if c in "=<>" or (c == "!" and i + 1 < len(tok) and tok[i + 1] == "="):
            pos = i
            break
        i += 1
    # operator in last position(s) => no value (osmfilter.c:2576)
    if pos is not None and pos >= len(tok) - 1:
        key = tok[:pos] if tok[pos] == "=" else tok
        key, kwc = _wildcards(_unescape(key))
        return Term(key=key, op="=", value=None, key_wc=kwc)
    if pos is None:
        key = tok
        if key.endswith("="):
            key = key[:-1]
        key, kwc = _wildcards(_unescape(key))
        return Term(key=key, op="=", value=None, key_wc=kwc)

    rawkey = tok[:pos]
    if tok[pos] == "=":
        op, skip = "=", 1
    elif tok[pos] == "!":
        op, skip = "!=", 2
    elif tok[pos] == "<":
        op, skip = ("<=", 2) if tok[pos + 1 : pos + 2] == "=" else ("<", 1)
    else:
        op, skip = (">=", 2) if tok[pos + 1 : pos + 2] == "=" else (">", 1)
    rawval = tok[pos + skip :]

    key: str | None
    kwc = (False, False)
    if rawkey == "":
        key = None  # continuation term
    else:
        key, kwc = _wildcards(_unescape(rawkey))

    val, vwc = _wildcards(_unescape(rawval))
    if vwc != (False, False):
        # wildcard degrades the operator to op&1 (osmfilter.c:2431):
        # even ops -> '=', odd ops -> '!='
        op = "=" if op in ("=", "<", ">") else "!="
        return Term(key=key, op=op, value=val, key_wc=kwc, val_wc=vwc)
    return Term(
        key=key,
        op=op,
        value=val,
        key_wc=kwc,
        numeric=_is_numeric_value(val),
    )


def parse(arg: str):
    """Parse a --keep/--drop argument into an Or/And/Term tree."""
    s = arg.lstrip(" ")
    default_and = False
    if s.startswith("all ") or s.startswith("and "):
        default_and = True
        s = s[4:]
    toks = _tokenize(s)

    # first pass: sequence of ('term', Term) / ('and'|'or') / '(' / ')'
    seq: list = []
    for t in toks:
        if t in _CONNECTORS:
            seq.append(_CONNECTORS[t])
        elif t == "(":
            seq.append("(")
        elif t == ")":
            seq.append(")")
        else:
            if seq and (isinstance(seq[-1], Term) or seq[-1] == ")"):
                seq.append("and" if default_and else "or")
            seq.append(_split_term(t))

    pos = 0

    def parse_or():
        nonlocal pos
        children = [parse_and()]
        while pos < len(seq) and seq[pos] == "or":
            pos += 1
            children.append(parse_and())
        return children[0] if len(children) == 1 else Or(children)

    def parse_and():
        nonlocal pos
        children = [parse_atom()]
        while pos < len(seq) and seq[pos] == "and":
            pos += 1
            children.append(parse_atom())
        return children[0] if len(children) == 1 else And(children)

    def parse_atom():
        nonlocal pos
        if pos >= len(seq):
            raise ValueError(f"dangling operator in filter: {arg!r}")
        if seq[pos] == "(":
            pos += 1
            node = parse_or()
            if pos < len(seq) and seq[pos] == ")":
                pos += 1
            return node
        node = seq[pos]
        if not isinstance(node, Term):
            raise ValueError(f"unexpected token in filter: {arg!r}")
        pos += 1
        return node

    tree = parse_or()
    if pos != len(seq):
        raise ValueError(f"unbalanced brackets in filter: {arg!r}")
    _bind_continuations(tree, [None])
    return tree


def _bind_continuations(node, last_key_box: list) -> None:
    """Resolve continuation terms ('=v2') to the previous term's key,
    in token order (fil_check0 reuses the previous matched value;
    with unique map keys that equals re-looking-up the same key,
    except that an absent key makes the continuation inherit the
    previous term's result — backends handle that via `inherited`)."""
    if isinstance(node, (And, Or)):
        for c in node.children:
            _bind_continuations(c, last_key_box)
        return
    t: Term = node
    if t.key is None:
        if last_key_box[0] is None:
            raise ValueError("continuation term with no previous key")
        t.key = last_key_box[0].key
        t.key_wc = last_key_box[0].key_wc
        t.inherited = last_key_box[0]  # type: ignore[attr-defined]
    else:
        t.inherited = None  # type: ignore[attr-defined]
        last_key_box[0] = t
