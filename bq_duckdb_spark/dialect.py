"""BigQuery-SQL → Spark-SQL dialect shim + SQL text analysis.

Two jobs (SURVEY.md §4.2, §2.10):

1. ``transpile(sql)`` — rewrite the BigQuery-isms Spark SQL doesn't accept
   verbatim (REGEXP_CONTAINS, SAFE_CAST, DATE_ADD(d, INTERVAL n DAY),
   UNNEST, array/struct literals, qualified ``project.dataset.table``
   names). Everything else passes straight through to ``spark.sql`` where
   Catalyst parses/optimizes it.

2. ``extract_cte_names(sql)`` / ``extract_dependencies(sql, known)`` — the
   DAG dependency-inference semantics of the reference
   (extract_cte_names: src/session/pipeline.rs:616-688;
   extract_dependencies + is_table_referenced: pipeline.rs:595-614,690-723),
   re-implemented: word-boundary matching, CTE-name exclusion,
   case-insensitive, sorted output.

No sqlglot in this environment — the shim is a hand-written scanner that
respects string literals and balanced parens.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# low-level SQL text scanning helpers (quote/paren aware)
# ---------------------------------------------------------------------------


def _skip_string(sql: str, i: int) -> int:
    """Given sql[i] is a quote char, return index just past the literal."""
    q = sql[i]
    j = i + 1
    while j < len(sql):
        if sql[j] == "\\":
            j += 2
            continue
        if sql[j] == q:
            # '' escape inside '-quoted strings
            if q == "'" and j + 1 < len(sql) and sql[j + 1] == "'":
                j += 2
                continue
            return j + 1
        j += 1
    return j


def _find_matching_paren(sql: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at open_idx (string-aware)."""
    depth = 0
    i = open_idx
    while i < len(sql):
        c = sql[i]
        if c in "'\"`":
            i = _skip_string(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"Unbalanced parentheses in SQL starting at {open_idx}")


def _split_top_level_args(s: str) -> list[str]:
    """Split a function-argument string on top-level commas."""
    args, depth, cur, i = [], 0, [], 0
    while i < len(s):
        c = s[i]
        if c in "'\"`":
            j = _skip_string(s, i)
            cur.append(s[i:j])
            i = j
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if c == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        args.append("".join(cur).strip())
    return args


def _rewrite_calls(sql: str, func: str, rewriter) -> str:
    """Rewrite every ``func( … )`` call (case-insensitive, balanced parens).

    ``rewriter(args: list[str]) -> str | None`` — None keeps the original.
    """
    pat = re.compile(rf"\b{func}\s*\(", re.IGNORECASE)
    out = []
    i = 0
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        open_idx = sql.index("(", m.start())
        try:
            close_idx = _find_matching_paren(sql, open_idx)
        except ValueError:
            out.append(sql[i:])
            break
        inner = sql[open_idx + 1 : close_idx]
        # recurse into nested calls first
        inner_rewritten = _rewrite_calls(inner, func, rewriter)
        replacement = rewriter(_split_top_level_args(inner_rewritten))
        if replacement is None:
            replacement = sql[m.start() : open_idx + 1] + inner_rewritten + ")"
        out.append(sql[i : m.start()])
        out.append(replacement)
        i = close_idx + 1
    return "".join(out)


# ---------------------------------------------------------------------------
# individual transforms
# ---------------------------------------------------------------------------

_INTERVAL_RE = re.compile(r"^INTERVAL\s+(.+?)\s+(\w+)$", re.IGNORECASE)


def _date_add_sub(sign: str):
    def rw(args: list[str]):
        # BigQuery: DATE_ADD(date_expr, INTERVAL n unit)
        if len(args) != 2:
            return None
        m = _INTERVAL_RE.match(args[1].strip())
        if not m:
            # Spark's own 2-arg date_add(date, days) — leave as is.
            return None
        n, unit = m.group(1), m.group(2).upper()
        return f"({args[0]} {sign} INTERVAL {n} {unit})"

    return rw


def _date_diff(args: list[str]):
    # BigQuery: DATE_DIFF(end, start, unit); Spark: datediff(end, start) for
    # DAY, otherwise timestampdiff(unit, start, end).
    if len(args) != 3:
        return None
    end, start, unit = args[0], args[1], args[2].strip().upper()
    if unit == "DAY":
        return f"datediff({end}, {start})"
    return f"timestampdiff({unit}, {start}, {end})"


def _ts_diff(args: list[str]):
    # TIMESTAMP_DIFF / DATETIME_DIFF(end, start, unit): always
    # timestampdiff — datediff on timestamps counts date-boundary
    # crossings, not whole elapsed units, so it is NOT a DAY shortcut here.
    if len(args) != 3:
        return None
    end, start, unit = args[0], args[1], args[2].strip().upper()
    return f"timestampdiff({unit}, {start}, {end})"


_DATE_PARTS = {
    "MICROSECOND", "MILLISECOND", "SECOND", "MINUTE", "HOUR", "DAY", "WEEK",
    "ISOWEEK", "MONTH", "QUARTER", "YEAR", "ISOYEAR",
}


def _trunc(cast_to: str | None):
    """BigQuery DATE_TRUNC(expr, part) → Spark date_trunc('part', expr).
    Spark's own form (part string first) passes through untouched.

    Week-family parts diverge and are emulated:
    - BigQuery WEEK starts Sunday; Spark 'WEEK' truncates to Monday →
      dayofweek arithmetic back to the most recent Sunday.
    - ISOWEEK (Monday start) is exactly Spark 'WEEK'.
    - ISOYEAR (Monday of the ISO week containing Jan 4) has no Spark
      unit (date_trunc would return NULL) → built from YEAROFWEEK.
    """

    def rw(args: list[str]):
        if len(args) != 2:
            return None
        part = args[1].strip().strip("'\"").upper()
        first = args[0].strip().strip("'\"").upper()
        if part not in _DATE_PARTS or first in _DATE_PARTS:
            return None  # not the BigQuery arg order
        x = args[0]
        if part == "WEEK":
            # most recent Sunday (dayofweek: 1=Sunday..7=Saturday)
            inner = f"CAST(date_sub(CAST({x} AS DATE), dayofweek({x}) - 1) AS TIMESTAMP)"
        elif part == "ISOWEEK":
            inner = f"date_trunc('WEEK', {x})"
        elif part == "ISOYEAR":
            inner = (
                f"date_trunc('WEEK', make_date(extract(YEAROFWEEK FROM {x}), 1, 4))"
            )
        else:
            inner = f"date_trunc('{part}', {x})"
        return f"CAST({inner} AS {cast_to})" if cast_to else inner

    return rw


_SQL_KEYWORDS = {
    "WITH", "WHERE", "GROUP", "ORDER", "LIMIT", "JOIN", "ON", "CROSS",
    "LEFT", "RIGHT", "INNER", "FULL", "UNION", "HAVING", "QUALIFY",
    "LATERAL", "AS",
}


def _unnest_from(sql: str) -> str:
    """Rewrite ``FROM UNNEST(expr) [AS] alias [WITH OFFSET [AS] o]``
    → ``FROM (SELECT explode/posexplode(expr) …)`` and correlated
    ``, UNNEST(expr) …`` → `` LATERAL VIEW (pos)explode(…)``.
    ``WITH OFFSET`` maps to posexplode's position output (0-based, same
    as BigQuery's offset).
    """
    pat = re.compile(r"(\bFROM\s+|,\s*|\bJOIN\s+)UNNEST\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        open_idx = sql.index("(", m.end() - 1)
        close_idx = _find_matching_paren(sql, open_idx)
        expr = sql[open_idx + 1 : close_idx]
        rest = sql[close_idx + 1 :]
        am = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", rest)
        # a bare keyword after UNNEST() is the next clause, not an alias
        if am and am.group(1).upper() in _SQL_KEYWORDS and not re.match(
            r"\s*AS\s", rest, re.IGNORECASE
        ):
            am = None
        alias = am.group(1) if am else "f0"
        rest_after = rest[am.end() :] if am else rest
        om = re.match(
            r"\s*WITH\s+OFFSET(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?",
            rest_after,
            re.IGNORECASE,
        )
        off = (om.group(1) or "offset") if om else None
        if om:
            rest_after = rest_after[om.end() :]
        lead = m.group(1)
        correlated = lead.strip().rstrip(",") == "" or lead.strip() == ","
        if correlated:
            # table, UNNEST(col) alias → LATERAL VIEW
            repl = (
                f" LATERAL VIEW posexplode({expr}) AS {off}, {alias} "
                if off
                else f" LATERAL VIEW explode({expr}) AS {alias} "
            )
        else:
            repl = (
                f"{lead}(SELECT posexplode({expr}) AS ({off}, {alias})) "
                if off
                else f"{lead}(SELECT explode({expr}) AS {alias}) "
            )
        sql = sql[: m.start()] + repl + rest_after


_ARRAY_LITERAL_SAFE_PREV = re.compile(r"[\w\)\]'\"`]$")


def _bracket_literals(sql: str) -> str:
    """BigQuery array literal ``[1, 2, 3]`` → ``array(1, 2, 3)``.

    A ``[`` directly following an identifier/``)``/``]`` is subscript
    indexing and is left alone.
    """
    out = []
    i = 0
    while i < len(sql):
        c = sql[i]
        if c in "'\"`":
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        if c == "[":
            # subscript indexing only when the bracket directly follows an
            # identifier/)/'] with no whitespace (arr[0]); otherwise literal
            prev = "".join(out)
            if not _ARRAY_LITERAL_SAFE_PREV.search(prev):
                # find matching ]
                depth, j = 0, i
                while j < len(sql):
                    if sql[j] in "'\"`":
                        j = _skip_string(sql, j)
                        continue
                    if sql[j] == "[":
                        depth += 1
                    elif sql[j] == "]":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                inner = _bracket_literals(sql[i + 1 : j])
                out.append(f"array({inner})")
                i = j + 1
                continue
        out.append(c)
        i += 1
    return "".join(out)


_STRUCT_BRACE_RE = re.compile(r"\{\s*'")


def _brace_struct_literals(sql: str) -> str:
    """DuckDB-style struct literal ``{'k': v, …}`` (accepted by the
    reference engine, src/utils.rs:13-19) → ``named_struct('k', v, …)``."""
    while True:
        m = _STRUCT_BRACE_RE.search(sql)
        if not m:
            return sql
        # find matching }
        depth, j = 0, m.start()
        while j < len(sql):
            if sql[j] in "'\"`":
                j = _skip_string(sql, j)
                continue
            if sql[j] == "{":
                depth += 1
            elif sql[j] == "}":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        inner = sql[m.start() + 1 : j]
        pairs = _split_top_level_args(inner)
        fields = []
        for p in pairs:
            k, _, v = p.partition(":")
            fields.append(f"{k.strip()}, {v.strip()}")
        sql = sql[: m.start()] + "named_struct(" + ", ".join(fields) + ")" + sql[j + 1 :]


_IDX_FUNC_RE = re.compile(
    r"\s*(SAFE_OFFSET|SAFE_ORDINAL|OFFSET|ORDINAL)\s*\(", re.IGNORECASE
)


def _operand_start(sql: str, lb: int) -> int:
    """Start index of the primary expression ending just before ``lb``
    (an identifier chain with balanced call/index groups, e.g.
    ``f(x).arr`` in ``f(x).arr[SAFE_OFFSET(0)]``)."""
    i = lb - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    while i >= 0:
        c = sql[i]
        if c in ")]":
            depth = 1
            i -= 1
            while i >= 0 and depth:
                cc = sql[i]
                if cc in "'\"`":  # backward over a quoted literal
                    j = i - 1
                    while j >= 0 and sql[j] != cc:
                        j -= 1
                    i = j
                elif cc in ")]":
                    depth += 1
                elif cc in "([":
                    depth -= 1
                i -= 1
            continue
        if c.isalnum() or c in "_.`":
            i -= 1
            continue
        break
    return i + 1


def _rewrite_array_indexing(sql: str) -> str:
    """BigQuery array element access → Spark:

    - ``arr[OFFSET(i)]``  → ``arr[(i)]`` (0-based; ANSI mode errors out
      of range, exactly BigQuery's OFFSET behavior)
    - ``arr[ORDINAL(i)]`` → ``arr[(i) - 1]`` (1-based)
    - ``arr[SAFE_OFFSET(i)]``/``[SAFE_ORDINAL(i)]`` →
      ``try_element_at(arr, …)`` (NULL out of range)
    """
    i = 0
    while i < len(sql):
        c = sql[i]
        if c in "'\"`":
            i = _skip_string(sql, i)
            continue
        if c != "[":
            i += 1
            continue
        m = _IDX_FUNC_RE.match(sql, i + 1)
        if not m:
            i += 1
            continue
        open_idx = sql.index("(", m.end() - 1)
        try:
            close_idx = _find_matching_paren(sql, open_idx)
        except ValueError:
            i += 1
            continue
        j = close_idx + 1
        while j < len(sql) and sql[j].isspace():
            j += 1
        if j >= len(sql) or sql[j] != "]":
            i += 1
            continue
        func = m.group(1).upper()
        inner = sql[open_idx + 1 : close_idx]
        start = i
        if func == "OFFSET":
            repl = f"[({inner})]"
        elif func == "ORDINAL":
            repl = f"[({inner}) - 1]"
        else:
            start = _operand_start(sql, i)
            operand = sql[start:i].strip()
            plus = " + 1" if func == "SAFE_OFFSET" else ""
            repl = f"try_element_at({operand}, ({inner}){plus})"
        sql = sql[:start] + repl + sql[j + 1 :]
        i = start  # rescan: the index expression may nest more accesses
    return sql


_SIMPLE_FUNC_RENAMES = {
    "REGEXP_CONTAINS": "regexp_like",
    "SAFE_CAST": "try_cast",
    "SAFE_DIVIDE": "try_divide",
    "IFNULL": "coalesce",
    "STARTS_WITH": "startswith",
    "ENDS_WITH": "endswith",
    "BYTE_LENGTH": "octet_length",
    "CHARACTER_LENGTH": "length",
    "ARRAY_LENGTH": "size",
    "STRING_AGG": "string_agg",  # Spark 4 has string_agg natively
    # BigQuery SPLIT takes a LITERAL delimiter; Spark's split() takes a
    # regex ('a.b' → ['','','']). BQ_SPLIT (functions/bigquery.py)
    # regex-quotes the delimiter. The builtin name can't be overridden.
    "SPLIT": "BQ_SPLIT",
    "ARRAY_CONCAT": "concat",
    "ARRAY_TO_STRING": "array_join",
    "ARRAY_REVERSE": "reverse",
    "COUNTIF": "count_if",
    "LOGICAL_AND": "bool_and",
    "LOGICAL_OR": "bool_or",
    # NET.* URL functions (functions/bigquery.py supplies the bodies;
    # the dot cannot appear in a Spark function name)
    "NET.HOST": "NET_HOST",
    "NET.REG_DOMAIN": "NET_REG_DOMAIN",
    # BigQuery FORMAT is C-style %-formatting — exactly format_string
    "FORMAT": "format_string",
    # SAFE_ arithmetic returns NULL instead of erroring on overflow —
    # exactly Spark's try_ family
    "SAFE_ADD": "try_add",
    "SAFE_SUBTRACT": "try_subtract",
    "SAFE_MULTIPLY": "try_multiply",
    # JSON scalar accessors: BigQuery names → Spark's get_json_object
    # (same $.path syntax; both return the UNQUOTED scalar as STRING).
    # JSON_EXTRACT / JSON_QUERY return JSON-encoded text (string scalars
    # keep their quotes) — rewritten via variant in transpile(), not here.
    "JSON_EXTRACT_SCALAR": "get_json_object",
    "JSON_VALUE": "get_json_object",
    "TO_JSON_STRING": "to_json",
}


def _json_as_text(args: list[str]):
    """BigQuery JSON_EXTRACT / JSON_QUERY return JSON-encoded text:
    string scalars keep their quotes ('"b"'), JSON null is the text
    'null'. Spark's get_json_object unquotes scalars, so re-encode via
    variant: to_json(variant_get(...)) renders exactly the JSON text
    (objects/arrays unchanged, absent paths → SQL NULL)."""
    if len(args) != 2:
        return None
    return f"to_json(variant_get(try_parse_json({args[0]}), {args[1]}))"


_CAPTURE_GROUP_RE = re.compile(r"(?<!\\)\((?!\?)")


def _pattern_has_group(pattern_literal: str) -> bool:
    """Does a regex string literal contain a capturing group?"""
    return bool(_CAPTURE_GROUP_RE.search(pattern_literal))


def _regexp_extract(args: list[str]):
    """BigQuery REGEXP_EXTRACT(s, p): returns the first capture group
    (or the whole match for groupless patterns) and NULL when nothing
    matches — Spark's regexp_extract returns '' on no-match and errors
    on groupless patterns. Literal patterns are introspected at
    transpile time; non-literals assume one capture group."""
    if len(args) != 2:
        return None  # 3-arg (position/occurrence) form: pass through
    s, p = args[0], args[1].strip()
    is_literal = p.startswith("'") and p.endswith("'")
    if is_literal and not _pattern_has_group(p[1:-1]):
        return f"regexp_substr({s}, {p})"
    return f"CASE WHEN {s} RLIKE {p} THEN regexp_extract({s}, {p}, 1) ELSE NULL END"


def _regexp_extract_all(args: list[str]):
    """BigQuery REGEXP_EXTRACT_ALL: array of group matches, or of whole
    matches for groupless patterns (wrapped in a group for Spark)."""
    if len(args) != 2:
        return None
    s, p = args[0], args[1].strip()
    is_literal = p.startswith("'") and p.endswith("'")
    if is_literal and not _pattern_has_group(p[1:-1]):
        inner = p[1:-1]
        return f"regexp_extract_all({s}, '({inner})', 1)"
    return f"regexp_extract_all({s}, {p}, 1)"


def _empty_like(expr: str) -> str:
    """An EMPTY array carrying ``expr``'s element type (slice of a
    one-element sequence) — the CASE-branch partner for the empty-range
    guards below, where a bare ``array()`` would type as array<string>."""
    return f"slice(sequence(({expr}), ({expr})), 1, 0)"


def _generate_array(args: list[str]):
    """GENERATE_ARRAY(a, b[, step]) → guarded sequence.

    BigQuery returns an EMPTY array when the range is empty (a > b with
    the default/positive step, a < b with a negative step); Spark's
    ``sequence(a, b)`` instead flips to a DESCENDING sequence when
    a > b, and errors on a step whose sign opposes the direction — a
    silent wrong-answer divergence the round-8 dialect fuzzer caught
    (GENERATE_ARRAY(1, 0): BQ [], bare sequence [1, 0]).

    DOCUMENTED LIMIT (round-9 advice): the start/step expressions are
    textually duplicated into the CASE guard and _empty_like, so each
    argument evaluates up to 4x — and for a NON-DETERMINISTIC argument
    (rand(), a volatile UDF) the guard and the sequence could disagree.
    Deterministic literal/column/scalar-expression arguments — every
    shape BigQuery queries put there, and everything the dialect fuzzer
    generates — are unaffected. Binding the arguments once would need a
    LATERAL subquery per call site, which this string-level rewriter
    cannot place for arbitrary clause positions (SELECT list, WHERE,
    UNNEST); accepted as out of scope until a real query needs it."""
    if len(args) == 2:
        a, b = args
        return (
            f"CASE WHEN ({a}) > ({b}) THEN {_empty_like(a)} "
            f"ELSE sequence({a}, {b}) END"
        )
    if len(args) == 3:
        a, b, s = args
        return (
            f"CASE WHEN (({s}) > 0 AND ({a}) > ({b})) "
            f"OR (({s}) < 0 AND ({a}) < ({b})) THEN {_empty_like(a)} "
            f"ELSE sequence({a}, {b}, {s}) END"
        )
    return None


def _generate_date_array(args: list[str]):
    """GENERATE_DATE_ARRAY(start, end[, INTERVAL n unit]) →
    sequence(start, end, interval) (inclusive endpoints, same as
    BigQuery), with the same empty-range guard as _generate_array:
    BigQuery yields [] when the interval sign cannot reach end from
    start; bare Spark sequence would error."""
    if len(args) == 2:
        a, b = args
        return (
            f"CASE WHEN ({a}) > ({b}) THEN {_empty_like(a)} "
            f"ELSE sequence({a}, {b}, interval 1 day) END"
        )
    if len(args) == 3:
        m = _INTERVAL_RE.match(args[2].strip())
        if m:
            a, b = args[0], args[1]
            n, unit = m.group(1), m.group(2)
            try:
                positive = int(n) > 0
            except ValueError:  # non-literal interval count: keep as-is
                return None
            guard = f"({a}) > ({b})" if positive else f"({a}) < ({b})"
            return (
                f"CASE WHEN {guard} THEN {_empty_like(a)} "
                f"ELSE sequence({a}, {b}, interval {n} {unit}) END"
            )
    return None


_ARRAY_AGG_ORDER_RE = re.compile(
    r"^(.+?)\s+ORDER\s+BY\s+(.+?)(\s+DESC|\s+ASC)?$", re.IGNORECASE | re.DOTALL
)


def _array_agg(args: list[str]):
    """BigQuery ``ARRAY_AGG(e ORDER BY k [DESC])`` → sorted collect:
    Spark's array_agg has no ORDER BY clause. Same-expression orderings
    become ``array_sort(collect_list(e))``; distinct keys sort a
    (key, value) struct and project the value back out. Plain
    ARRAY_AGG stays native (Spark's own array_agg)."""
    if len(args) != 1:
        return None
    m = _ARRAY_AGG_ORDER_RE.match(args[0].strip())
    if not m:
        return None
    expr, key, direction = m.group(1).strip(), m.group(2).strip(), m.group(3)
    desc = bool(direction and direction.strip().upper() == "DESC")
    distinct = bool(re.match(r"DISTINCT\s", expr, re.IGNORECASE))
    if distinct:
        # BigQuery requires the ORDER BY expression to appear in the
        # argument list when DISTINCT is present — so key == expr here
        expr = re.sub(r"^DISTINCT\s+", "", expr, flags=re.IGNORECASE)
        base = f"array_sort(collect_set({expr}))"
    elif key == expr:
        base = f"array_sort(collect_list({expr}))"
    else:
        base = (
            f"transform(array_sort(collect_list(named_struct"
            f"('k', {key}, 'v', {expr}))), s -> s.v)"
        )
    return f"reverse({base})" if desc else base


def _find_top_level_keyword(sql: str, keyword: str, start: int = 0) -> int:
    """Index of ``keyword`` at paren-depth 0 outside strings, or -1."""
    pat = re.compile(rf"\b{keyword}\b", re.IGNORECASE)
    depth, i = 0, start
    while i < len(sql):
        c = sql[i]
        if c in "'\"`":
            i = _skip_string(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(sql, i)
            if m:
                return i
        i += 1
    return -1


def _rewrite_qualify(sql: str) -> str:
    """BigQuery ``QUALIFY <pred>`` (filter on window-function output) →
    wrap the query and filter in an outer WHERE:

    ``SELECT … QUALIFY p [ORDER BY …] [LIMIT …]``
    → ``SELECT * FROM ( SELECT … ) WHERE p [ORDER BY …] [LIMIT …]``

    Works whenever the predicate references select-list aliases (the
    idiomatic ``QUALIFY rn = 1`` pattern). Spark has no QUALIFY clause.
    """
    q_idx = _find_top_level_keyword(sql, "QUALIFY")
    if q_idx < 0:
        return sql
    head = sql[:q_idx].rstrip()
    rest = sql[q_idx + len("QUALIFY") :]
    # trailing ORDER BY / LIMIT stay outside the wrap
    tail_idx = len(rest)
    for kw in ("ORDER", "LIMIT"):
        k = _find_top_level_keyword(rest, kw)
        if 0 <= k < tail_idx:
            tail_idx = k
    pred, tail = rest[:tail_idx].strip(), rest[tail_idx:]
    return f"SELECT * FROM ( {head} ) WHERE {pred} {tail}".rstrip()


def _apply_outside_strings(sql: str, fn) -> str:
    """Apply ``fn`` to the code segments of ``sql``, leaving '-quoted
    string literals untouched (table names inside literals must never be
    rewritten)."""
    out, seg_start, i = [], 0, 0
    while i < len(sql):
        if sql[i] == "'":
            out.append(fn(sql[seg_start:i]))
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = seg_start = j
        else:
            i += 1
    out.append(fn(sql[seg_start:]))
    return "".join(out)


# BigQuery type names → Spark SQL type names, applied in `AS <type>` cast
# position (CAST/SAFE_CAST) and column-type DDL position.
_TYPE_RENAMES = {
    "INT64": "BIGINT",
    "INTEGER": "BIGINT",
    "FLOAT64": "DOUBLE",
    "BOOL": "BOOLEAN",
    "BYTES": "BINARY",
    "NUMERIC": "DECIMAL(38,9)",
    "BIGNUMERIC": "DECIMAL(38,18)",
    "DATETIME": "TIMESTAMP_NTZ",
}


def _rename_cast_types(sql: str) -> str:
    def sub(m):
        return f"{m.group(1)}{_TYPE_RENAMES[m.group(2).upper()]}"

    pat = re.compile(
        r"(\bAS\s+)(" + "|".join(_TYPE_RENAMES) + r")\b(?!\s*\()", re.IGNORECASE
    )
    return pat.sub(sub, sql)


def transpile(sql: str, table_mapping: dict[str, str] | None = None) -> str:
    """BigQuery SQL → Spark SQL.

    ``table_mapping`` maps qualified/registered names (e.g.
    ``proj.ds.tbl``) to the engine's mangled view names; replacement is
    case-insensitive, longest-name-first, word-boundary, and also covers
    the backticked form ``\\`proj.ds.tbl\\```.
    """
    # BigQuery accepts #-to-end-of-line comments; Spark doesn't
    out = _apply_outside_strings(sql, lambda seg: re.sub(r"#[^\n]*", "", seg))
    if table_mapping:

        def _map_code(segment: str) -> str:
            for name in sorted(table_mapping, key=len, reverse=True):
                target = table_mapping[name]
                escaped = re.escape(name)
                segment = re.sub(rf"`{escaped}`", target, segment, flags=re.IGNORECASE)
                segment = re.sub(
                    rf"(?<![\w.`]){escaped}(?![\w.`])", target, segment, flags=re.IGNORECASE
                )
            return segment

        out = _apply_outside_strings(out, _map_code)
    def _rename_code(segment: str) -> str:
        # outside string literals only: common-word names (SPLIT, FORMAT,
        # ARRAY_CONCAT, ...) must never corrupt literal data like "SPLIT("
        for src, dst in _SIMPLE_FUNC_RENAMES.items():
            # re.escape: dotted names like NET.HOST must not wildcard
            segment = re.sub(
                rf"\b{re.escape(src)}\s*\(", f"{dst}(", segment, flags=re.IGNORECASE
            )
        # BigQuery TABLESAMPLE SYSTEM (n PERCENT) → Spark TABLESAMPLE (n PERCENT)
        return re.sub(
            r"\bTABLESAMPLE\s+SYSTEM\s*\(", "TABLESAMPLE (", segment, flags=re.IGNORECASE
        )

    out = _apply_outside_strings(out, _rename_code)
    out = _rewrite_calls(out, "ARRAY_AGG", _array_agg)
    out = _rewrite_calls(out, "GENERATE_ARRAY", _generate_array)
    out = _rewrite_calls(out, "GENERATE_DATE_ARRAY", _generate_date_array)
    out = _rewrite_calls(out, "GENERATE_TIMESTAMP_ARRAY", _generate_date_array)
    out = _rewrite_calls(out, "JSON_EXTRACT", _json_as_text)
    out = _rewrite_calls(out, "JSON_QUERY", _json_as_text)
    out = _rewrite_calls(out, "REGEXP_EXTRACT_ALL", _regexp_extract_all)
    out = _rewrite_calls(out, "REGEXP_EXTRACT", _regexp_extract)
    out = _rewrite_calls(out, "DATE_ADD", _date_add_sub("+"))
    out = _rewrite_calls(out, "DATE_SUB", _date_add_sub("-"))
    out = _rewrite_calls(out, "TIMESTAMP_ADD", _date_add_sub("+"))
    out = _rewrite_calls(out, "TIMESTAMP_SUB", _date_add_sub("-"))
    out = _rewrite_calls(out, "DATETIME_ADD", _date_add_sub("+"))
    out = _rewrite_calls(out, "DATETIME_SUB", _date_add_sub("-"))
    out = _rewrite_calls(out, "DATE_DIFF", _date_diff)
    out = _rewrite_calls(out, "TIMESTAMP_DIFF", _ts_diff)
    out = _rewrite_calls(out, "DATETIME_DIFF", _ts_diff)
    out = _rewrite_calls(out, "DATE_TRUNC", _trunc("DATE"))
    out = _rewrite_calls(out, "TIMESTAMP_TRUNC", _trunc(None))
    out = _rewrite_calls(out, "DATETIME_TRUNC", _trunc(None))
    out = _unnest_from(out)
    out = _rewrite_array_indexing(out)
    out = _bracket_literals(out)
    out = _brace_struct_literals(out)
    out = _rename_cast_types(out)
    out = _rewrite_qualify(out)
    return out


# ---------------------------------------------------------------------------
# CTE-name extraction (reference pipeline.rs:616-688 semantics)
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"[A-Za-z_][\w.]*")


def extract_cte_names(sql: str) -> list[str]:
    """Names bound by a leading ``WITH [RECURSIVE] name AS (…) [, name2 AS
    (…)]*`` — paren-depth tracked, stops at the top-level SELECT / INSERT /
    UPDATE / DELETE (reference unit tests pipeline.rs:2239-2260:
    recursive keyword, nested parens, multiple CTEs)."""
    names: list[str] = []
    m = re.match(r"\s*WITH\s+", sql, re.IGNORECASE)
    if not m:
        return names
    i = m.end()
    m2 = re.match(r"RECURSIVE\s+", sql[i:], re.IGNORECASE)
    if m2:
        i += m2.end()
    while i < len(sql):
        wm = _WORD_RE.match(sql, i)
        if not wm:
            break
        word = wm.group(0)
        if word.upper() in ("SELECT", "INSERT", "UPDATE", "DELETE"):
            break
        name = word
        i = wm.end()
        am = re.match(r"\s*AS\s*\(", sql[i:], re.IGNORECASE)
        if not am:
            break
        open_idx = i + am.end() - 1
        try:
            close_idx = _find_matching_paren(sql, open_idx)
        except ValueError:
            break
        names.append(name)
        i = close_idx + 1
        cm = re.match(r"\s*,\s*", sql[i:])
        if cm:
            i += cm.end()
        else:
            # skip whitespace then expect the main statement
            i += len(sql[i:]) - len(sql[i:].lstrip())
    return names


# ---------------------------------------------------------------------------
# dependency inference (reference pipeline.rs:595-614, 690-723 semantics)
# ---------------------------------------------------------------------------

_REF_CONTEXT_RE_TMPL = r"(?:\bFROM\b|\bJOIN\b|\bINTO\b|,)[\s(]*(?:[A-Za-z_][\w.]*[\s(]*,[\s(]*)*{name}(?![\w.])"


def is_table_referenced(sql: str, table: str) -> bool:
    """Word-boundary, case-insensitive check that ``table`` appears in a
    FROM / JOIN / comma-list position (so ``users`` does not match
    ``user``, and select-list columns alone don't count)."""
    escaped = re.escape(table)
    # strip string literals so table names inside quotes don't count
    stripped = re.sub(r"'(?:[^'\\]|\\.)*'", "''", sql)
    pat = re.compile(
        rf"(?:\bFROM\b|\bJOIN\b|\bINTO\b|,)\s*\(*\s*`?{escaped}`?(?![\w.])",
        re.IGNORECASE,
    )
    if pat.search(stripped):
        return True
    # comma-separated FROM lists: FROM a, b — handled by the comma branch
    return False


def extract_dependencies(sql: str, known_tables: list[str]) -> list[str]:
    """Return the sorted list of known table names referenced by ``sql``,
    excluding names bound as CTEs in the same statement (reference
    pipeline.rs:595-614; CTE-exclusion tests pipeline.rs:2118-2171)."""
    ctes = {c.lower() for c in extract_cte_names(sql)}
    deps = []
    for t in known_tables:
        if t.lower() in ctes:
            continue
        if is_table_referenced(sql, t):
            deps.append(t)
    return sorted(set(deps), key=str.lower)
