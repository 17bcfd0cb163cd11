"""Translator for the reference's SQL dialect → Spark SQL.

The reference grammar (src/qp/parser/parser.cup:53-255,
src/qp/parser/scaner.lex) differs from ANSI in exactly these ways:

  * WHERE conjuncts are COMMA-separated (no AND keyword)
  * `GROUPBY` / `ORDERBY` are single keywords
  * ORDER BY direction is one global trailing `DESC` flag
  * literals are double-quoted strings, coerced per column type at
    eval time (src/qp/operators/Select.java:140-141)
  * column refs are mandatorily qualified `TABLE.col`
  * aggregates MAX/MIN/SUM/COUNT/AVG parse in the project list
    (they abort at execution in the reference; they run here)

Translation is a deliberate string transform, not a parser port —
Catalyst is the real parser/analyzer/optimizer; this shim only
normalizes surface syntax so the reference's own testcase files run
verbatim on the Spark engine. Aggregate projections get deterministic
aliases `<fn>_<col>` so results are oracle-comparable.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_CLAUSE_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+(?P<from>.*?)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+GROUPBY\s+(?P<groupby>.*?))?"
    r"(?:\s+ORDERBY\s+(?P<orderby>.*?))?"
    r"\s*(?P<desc>DESC)?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_AGG_RE = re.compile(r"\b(MAX|MIN|SUM|COUNT|AVG)\s*\(\s*([A-Za-z_][\w.]*)\s*\)", re.IGNORECASE)

def _convert_literal(m: re.Match) -> str:
    # Every literal stays a QUOTED STRING: the reference coerces the
    # string per COLUMN type at eval time (Select.java:140-141), and
    # SQL engines do the same for a string literal compared against a
    # typed column — so 'phone = "0123"' keeps string equality on a
    # string column while 'price < "1500"' still compares numerically
    # on a numeric one. Emitting numeric-LOOKING literals bare would
    # instead coerce the string COLUMN to a number (0123 == '123'
    # would match), silently flipping semantics on literal shape.
    return "'" + m.group(1).replace("'", "''") + "'"


def _split_top_level_commas(s: str) -> list[str]:
    """Split on commas at paren depth 0, OUTSIDE single-quoted
    literals — a comma or paren inside a converted literal
    ('Smith, John') is content, not a conjunct separator. A doubled
    '' inside a literal is the SQL escape (two quote chars, state
    flips twice and stays inside — correct)."""
    parts, depth, cur, in_str = [], 0, [], False
    for ch in s:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        if ch == "," and depth == 0 and not in_str:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _mask_quoted(sql: str) -> tuple[str, list[str]]:
    """Replace double-quoted literal spans with length-stable
    placeholders so clause-keyword matching can't fire INSIDE a
    literal (a value like "MAIN ORDERBY ST" would otherwise split the
    query mid-string). Placeholders use \\x00<idx>\\x00 — characters
    the reference grammar admits nowhere else."""
    stash: list[str] = []

    def keep(m: re.Match) -> str:
        stash.append(m.group(0))
        return f"\x00{len(stash) - 1}\x00"

    return re.sub(r'"[^"]*"', keep, sql), stash


def _unmask(text: str, stash: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: stash[int(m.group(1))], text)


def translate(ref_sql: str) -> str:
    """Reference-dialect query text → equivalent Spark SQL."""
    sql = ref_sql.strip().rstrip(";")
    sql, stash = _mask_quoted(sql)
    m = _CLAUSE_RE.match(sql)
    if not m:
        raise ValueError(f"not a reference-dialect query: {ref_sql!r}")
    select = _unmask(m.group("select").strip(), stash)
    select = _AGG_RE.sub(
        lambda a: f"{a.group(1).upper()}({a.group(2)}) AS "
        f"{a.group(1).lower()}_{a.group(2).split('.')[-1].lower()}",
        select,
    )
    out = [f"SELECT {select}", f"FROM {_unmask(m.group('from').strip(), stash)}"]
    if m.group("where"):
        where = re.sub(
            r'"([^"]*)"', _convert_literal, _unmask(m.group("where"), stash)
        )
        out.append("WHERE " + " AND ".join(_split_top_level_commas(where)))
    if m.group("groupby"):
        out.append("GROUP BY " + _unmask(m.group("groupby").strip(), stash))
    if m.group("orderby"):
        keys = _split_top_level_commas(_unmask(m.group("orderby"), stash))
        direction = " DESC" if m.group("desc") else ""
        out.append("ORDER BY " + ", ".join(k + direction for k in keys))
    return "\n".join(out)


def run_reference_sql(spark: SparkSession, ref_sql: str) -> DataFrame:
    """Translate and execute a reference-dialect query (FROM-list
    tables must be registered as temp views, e.g. via
    catalog.register_tables)."""
    return spark.sql(translate(ref_sql))
