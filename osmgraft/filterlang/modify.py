"""--modify-tags support (SURVEY.md P6): parse the reference's
TAG_MODIFICATION_LIST grammar and apply it as pure Catalyst
expressions, with a generated SQL oracle twin.

Grammar (modi_parse osmfilter.c:3542-3674):

    RULE      := MATCH ('to' | 'add')? DEST
    MATCH     := KEY[OP VALUE] | OP VALUE        (value-only rule)
    DEST      := NEWKEY[=NEWVAL] | =NEWVAL
    rules separated by spaces; first matching rule wins per tag
    (modi_check osmfilter.c:3682-3720); 'add' keeps the original
    tag and appends the new one; an empty NEWKEY/NEWVAL reuses the
    source key/value.

Comparison semantics (wildcards, digit-string numeric compare) are
shared with --keep via the Term machinery (ast/spark/sql modules).

Known deviation: a key-only match in the reference compares the
value against an empty double-wildcard pattern, which matches any
NON-EMPTY value (modi__cmp op=0 wc=3 with empty needle); OSM tag
values are never empty, so we treat it as always-true.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, functions as F

from .ast import Term, _split_term, _tokenize, _unescape
from .spark import _key_pred, _value_pred
from .sql import _keys_for, _q, _value_sql


@dataclass
class ModifyRule:
    match: Term  # match.key None => any key (value-only rule)
    new_key: str | None  # None => keep source key
    new_val: str | None  # None => keep source value
    add: bool


def parse_modify(arg: str) -> list[ModifyRule]:
    toks = _tokenize(arg)
    rules: list[ModifyRule] = []
    i = 0
    while i < len(toks):
        match = _split_term(toks[i])
        match.inherited = None  # type: ignore[attr-defined]
        i += 1
        add = False
        if i < len(toks) and toks[i] in ("to", "add"):
            add = toks[i] == "add"
            i += 1
        if i >= len(toks):
            raise ValueError(f"modify rule missing destination: {arg!r}")
        dest = toks[i]
        i += 1
        dk, _, dv = dest.partition("=")
        new_key = _unescape(dk) or None
        new_val = _unescape(dv) or None
        rules.append(
            ModifyRule(match=match, new_key=new_key, new_val=new_val,
                       add=add)
        )
    return rules


# ----------------------------------------------------------------
# Spark application
# ----------------------------------------------------------------


def _match_pred(k: Column, v: Column, t: Term) -> Column:
    if t.key is None:
        return _value_pred(v, t)
    return _key_pred(k, t) & _value_pred(v, t)


def modify_entries(tags: Column, rules: list[ModifyRule]) -> Column:
    """map<string,string> -> array<struct<key,val>> with the rules
    applied per tag (first match wins). Stays an entry ARRAY because
    renames may collide with existing keys — the caller decides how
    to canonicalize (the reference emits an ordered tag list too)."""

    def per_entry(e: Column) -> Column:
        k, v = e.key, e.value
        keep = F.array(F.struct(k.alias("key"), v.alias("val")))
        expr = keep
        for rule in reversed(rules):
            nk = F.lit(rule.new_key) if rule.new_key else k
            nv = F.lit(rule.new_val) if rule.new_val else v
            new = F.struct(nk.alias("key"), nv.alias("val"))
            arr = (
                F.array(F.struct(k.alias("key"), v.alias("val")), new)
                if rule.add
                else F.array(new)
            )
            expr = F.when(_match_pred(k, v, rule.match), arr).otherwise(
                expr
            )
        return expr

    return F.flatten(F.transform(F.map_entries(tags), per_entry))


def modify_tags_str(tags: Column, rules: list[ModifyRule]) -> Column:
    """Canonical sorted 'k=v;...' string of the modified entry list
    (comparable across engines)."""
    ents = modify_entries(tags, rules)
    return F.array_join(
        F.array_sort(
            F.transform(
                ents, lambda e: F.concat(e.key, F.lit("="), e.val)
            )
        ),
        ";",
    )


# ----------------------------------------------------------------
# SQL oracle twin (tags as one nullable VARCHAR column per key)
# ----------------------------------------------------------------


def modify_sql_tags_str(
    rules: list[ModifyRule], accessor, known_keys: list[str]
) -> str:
    """Generate the DuckDB expression producing the same canonical
    sorted 'k=v;...' string over per-key columns."""
    per_key_lists = []
    for k in known_keys:
        v = accessor(k)
        branches = []
        for rule in rules:
            t = rule.match
            if t.key is not None and k not in _keys_for(t, known_keys):
                continue
            cond = _value_sql(v, t) if t.value is not None else "TRUE"
            nk = _q(rule.new_key) if rule.new_key else _q(k)
            nv = _q(rule.new_val) if rule.new_val else v
            new_entry = f"({nk} || '=' || {nv})"
            old_entry = f"({_q(k)} || '=' || {v})"
            lst = (
                f"[{old_entry}, {new_entry}]"
                if rule.add
                else f"[{new_entry}]"
            )
            branches.append(f"WHEN {cond} THEN {lst}")
        default = f"[{_q(k)} || '=' || {v}]"
        if branches:
            body = " ".join(branches)
            lst = f"(CASE {body} ELSE {default} END)"
        else:
            lst = default
        per_key_lists.append(
            f"(CASE WHEN {v} IS NULL THEN [] ELSE {lst} END)"
        )
    flat = "flatten([" + ", ".join(per_key_lists) + "])"
    # COALESCE: DuckDB's list_sort/array_to_string of an all-empty
    # flatten yields NULL where Spark's array_join yields ''
    return f"COALESCE(array_to_string(list_sort({flat}), ';'), '')"
