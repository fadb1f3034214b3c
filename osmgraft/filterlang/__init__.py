"""osmfilter predicate language (SURVEY.md P3/P4/P5, F8/F9).

One grammar, three backends sharing one AST:
  - scalar.py  exact reference-semantics evaluator (truth vectors,
               differential tests vs the compiled osmfilter binary)
  - spark.py   AST -> pyspark Column over a map<string,string> tags
               column (pure Catalyst, whole-stage codegen)
  - sql.py     AST -> ANSI/DuckDB boolean SQL (the oracle backend)

Grammar (fil_parse osmfilter.c:2481-2646):
  expr    := term (connector term)*         connectors space-padded
  term    := key [op value] | '=' value     (continuation: reuse key)
  op      := = | != | < | > | <= | >=
  connector := and|AND|&& (binds tighter) | or|OR|'||' | implicit
  brackets:  '(' ')' space-padded tokens
  'all '/'and ' prefix => implicit connector is AND (meetall)
  wildcards: '*' at start/end of key or value
  '\\' escapes the next character
Comparison semantics (fil__cmp osmfilter.c:1944-2320) are documented
in scalar.py.
"""

from .ast import And, Or, Term, parse
from .scalar import eval_filter, fil_cmp
from .spark import keep_column, tags_filter_column
from .sql import keep_sql

__all__ = [
    "And",
    "Or",
    "Term",
    "parse",
    "eval_filter",
    "fil_cmp",
    "keep_column",
    "tags_filter_column",
    "keep_sql",
]
