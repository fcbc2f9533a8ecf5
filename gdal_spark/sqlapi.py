"""ExecuteSQL surface: OGR SQL strings → Spark DataFrames.

Mirrors ``GDALDataset::ExecuteSQL(sql, dialect="OGRSQL")``
(gcore/gdaldataset.cpp:6872 dispatch; parser ogr/swq_parser.y; executor
ogr/ogrsf_frmts/generic/ogr_gensql.cpp). GDAL parses into a `swq_select`
IR and pull-executes row-at-a-time; here the translation target is a
Spark SQL string — Catalyst is the analyzer/optimizer/executor — with
OGR's dialect quirks rewritten first:

- special fields: ``FID`` (stable row id, ogr/ogr_p.h:164),
  ``OGR_GEOM_AREA`` and ``OGR_GEOM_WKT`` are materialized as columns
  before translation;
- ``HSTORE_GET_VALUE(x, 'k')`` (swq_op_general.cpp:169) →
  ``str_to_map(x, ',', '=>')['k']``;
- ``SELECT DISTINCT col`` is OGR's DISTINCT_LIST mode
  (ogr_gensql.cpp:637): the result is the *sorted* distinct value list,
  so an ORDER BY is appended when absent;
- every ``JOIN … ON secondary.f = expr`` takes the FIRST matching
  secondary row per key (1:1 — ogr_gensql.cpp:1493-1523): each secondary
  view is pre-deduplicated to its first row per key in FID order.
  Chained joins follow swq_parser.y:1088-1094 (any number of
  ``[LEFT] JOIN`` clauses);
- aggregates without GROUP BY are OGR's SUMMARY_RECORD mode — Spark's
  global aggregation already returns the single summary row;
- ``GROUP BY`` / ``HAVING`` and ``IN (SELECT …)`` subqueries are the
  SQLite-dialect surface (OGR SQL proper has neither; ExecuteSQL with
  dialect=SQLITE hands the statement to a full planner,
  ogr/ogrsf_frmts/sqlite/ogrsqliteexecutesql.cpp:788 — here that planner
  is Catalyst). Layer names resolve inside subqueries because layers
  register as temp views under their own names;
- ``LIKE`` stays case-sensitive (swq_op_general.cpp:1102 default),
  matching Spark.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# RFC 21 CAST target types (swq_parser.y field_type rules) → Spark types.
# OGR maps NUMERIC to OFTReal and CHARACTER to OFTString regardless of the
# declared width/precision (ogr_gensql.cpp field-defn synthesis), so the
# width argument is dropped rather than becoming a DECIMAL/CHAR type —
# emitting DecimalType would also break the string-hash correctness gate.
_CAST_TYPES = [
    (re.compile(r"\bas\s+character\b\s*(\(\s*\d+\s*\))?", re.I),
     "as string"),
    (re.compile(r"\bas\s+numeric\b\s*(\(\s*\d+\s*,\s*\d+\s*\))?", re.I),
     "as double"),
    (re.compile(r"\bas\s+integer64\b", re.I), "as bigint"),
    (re.compile(r"\bas\s+integer\b", re.I), "as int"),
    (re.compile(r"\bas\s+real\b", re.I), "as double"),
]


def _outside_strings(sql: str, fn) -> str:
    """Apply ``fn`` to the segments of ``sql`` outside single-quoted
    string literals (literals pass through untouched, so a LIKE pattern
    containing ``--`` or ``FID`` is never rewritten)."""
    parts = re.split(r"('(?:[^']|'')*')", sql)
    return "".join(p if p.startswith("'") else fn(p) for p in parts)


def _escape_literal_backslashes(sql: str) -> str:
    """OGR string literals have no escape character (a backslash is one
    literal char, ogr_sql_test.py::test_ogr_sql_43); Spark's parser
    treats ``\\`` as an escape by default — double them inside literals,
    exactly once per statement."""
    parts = re.split(r"('(?:[^']|'')*')", sql)
    return "".join(p.replace("\\", "\\\\") if p.startswith("'") else p
                   for p in parts)


def _rewrite_code(out: str) -> str:
    # OGR quotes identifiers with double quotes (rfc28 quoting tests);
    # Spark uses backticks (double quotes open string literals)
    out = re.sub(r'"([^"]*)"', r"`\1`", out)
    out = re.sub(r"\bOGR_GEOM_AREA\b", "ogr_geom_area", out, flags=re.I)
    out = re.sub(r"\bOGR_GEOM_WKT\b", "ogr_geom_wkt", out, flags=re.I)
    out = re.sub(r"\bOGR_GEOMETRY\b", "ogr_geometry", out, flags=re.I)
    out = re.sub(r"\bOGR_STYLE\b", "ogr_style", out, flags=re.I)
    out = re.sub(r"\bFID\b", "fid", out)
    # OGR SQL has no comments: '3--1' is 3 minus negative 1
    # (autotest ogr_sql_rfc28.py::test_ogr_rfc28_16), but '--' opens a
    # line comment in Spark SQL — split the minuses
    out = out.replace("--", "- -")
    # OGR integer / integer is integer division (swq type promotion,
    # rfc28_17: 5/2 = 2) — typed by the expression-tree rewriter
    # (_int_div_rewrite, which handles literal, column and chained
    # operands uniformly; a pair regex here would pre-group `a/7/3`
    # as a/(7 div 3) and break left associativity).
    # OGR floating literals are SWQ_FLOAT (double); Spark parses bare
    # decimal literals as DECIMAL(p,s) — pin them to double with an e0
    # exponent (ogr_sql_49: '1/1.' is double 1.0, not Decimal)
    out = re.sub(r"(?<![\w.])(\d+\.\d+)(?![\w.eE])", r"\1e0", out)
    out = re.sub(r"(?<![\w.])(\d+)\.(?![\d\w.eE])", r"\1.0e0", out)
    for pat, repl in _CAST_TYPES:
        out = pat.sub(repl, out)
    return out


def _sanitize_like_escape(m: re.Match) -> str:
    """OGR's LIKE ESCAPE drops the escape char and takes the next char
    literally whatever it is (swq LIKE evaluator); Spark/ANSI reject an
    escape not followed by a wildcard or itself. Rewrite the literal
    pattern: keep valid escape pairs, unwrap invalid ones. A doubled
    quote ('') in the raw pattern text is ONE literal quote char — scan
    it as a unit so an escape followed by a quote unwraps to '' (not a
    bare quote that would terminate the literal)."""
    pat, esc = m.group(1), m.group(2)
    out = []
    kept_escape = False
    i = 0
    while i < len(pat):
        ch = pat[i]
        if ch == "'" and i + 1 < len(pat) and pat[i + 1] == "'":
            out.append("''")
            i += 2
            continue
        if ch == esc and i + 1 < len(pat):
            if pat[i + 1] == "'" and i + 2 < len(pat) \
                    and pat[i + 2] == "'":
                out.append("''")  # escaped literal quote: unwrap to ''
                i += 3
                continue
            nxt = pat[i + 1]
            if nxt in ("%", "_", esc):
                out.append(ch)
                out.append(nxt)
                kept_escape = True
            else:
                out.append(nxt)
            i += 2
        else:
            out.append(ch)
            i += 1
    new = "".join(out)
    return (f"LIKE '{new}' ESCAPE '{esc}'" if kept_escape
            else f"LIKE '{new}'")


# ---------------------------------------------------------------------------
# swq arithmetic expression typing (ogr/swq_op_general.cpp
# SWQGeneralChecker + evaluator :637-718): every arithmetic node is
# SWQ_INTEGER iff BOTH operands are integer-typed, so `a/b/c` over int
# columns is chained integer division and `a/b*c/d` groups left-assoc
# as ((a/b)*c)/d before typing. A single-level pair regex cannot
# express that (and mis-groups mixed chains), so the rewrite is a
# tokenizer + precedence parser over the already-string-stripped SQL
# fragment: int/int divisions become Spark `div`, everything else is
# re-emitted verbatim (token-normalized whitespace). Unknown constructs
# (function calls, subqueries, non-arithmetic tokens) type as non-int,
# which conservatively keeps float semantics.
# ---------------------------------------------------------------------------

_SQL_TOKEN = re.compile(
    r"""`[^`]*`
      | \d+\.\d*(?:[eE][+-]?\d+)?   # 1.5, 1.5e0
      | \.\d+(?:[eE][+-]?\d+)?      # .5
      | \d+[eE][+-]?\d+             # 1e0
      | \d+
      | [A-Za-z_][\w$]*(?:\.[A-Za-z_][\w$]*)*
      | <=|>=|<>|!=|\|\|
      | \S
    """, re.X)

_INT_CAST_TYPES = {"integer", "int", "bigint", "smallint", "tinyint"}
_INT = "int"
_OTHER = "other"  # float / string / unknown — anything that blocks `div`


class _ArithTyper:
    """Pratt-style permissive parser: parses arithmetic islands inside
    an arbitrary SQL token stream, types them bottom-up with swq's
    promotion rule, and re-emits every token it cannot parse."""

    def __init__(self, toks: list[str], int_names: set[str]):
        self.toks = toks
        self.i = 0
        self.int_names = int_names

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def _ident_type(self, tok: str) -> str:
        return _INT if tok.strip("`").lower() in self.int_names else _OTHER

    def _consume_parens(self, parts: list[str]) -> tuple[str, bool]:
        """Opaquely consume to the matching ')' (subquery, IN-list,
        boolean group, or an unbalanced fragment from string-literal
        splitting); inner arithmetic was already rewritten by the
        recursive parse that preceded the bailout. Returns (text,
        closed) — when the fragment ends before the ')' (the literal
        split the expression), the caller must NOT synthesize one."""
        depth = 1
        while self.peek() is not None:
            t = self.peek()
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
                if depth == 0:
                    self.take()
                    return " ".join(parts), True
            parts.append(self.take())
        return " ".join(parts), False

    def primary(self) -> tuple[str, str] | None:
        t = self.peek()
        if t is None:
            return None
        if t == "(":
            self.take()
            if (self.peek() or "").lower() == "select":
                body, closed = self._consume_parens([])
                return "(" + body + (")" if closed else ""), _OTHER
            inner = self.expr()
            if inner is not None and self.peek() == ")":
                self.take()
                return "(" + inner[0] + ")", inner[1]
            # not a pure arithmetic group — finish it opaquely, but keep
            # any rewrites the inner parse already produced
            parts = [inner[0]] if inner is not None else []
            body, closed = self._consume_parens(parts)
            return "(" + body + (")" if closed else ""), _OTHER
        if re.fullmatch(r"\d+", t):
            self.take()
            return t, _INT
        if re.fullmatch(r"[\d.].*", t):  # any other numeric literal
            self.take()
            return t, _OTHER
        if re.fullmatch(r"`[^`]*`|[A-Za-z_][\w$]*(?:\.[A-Za-z_][\w$]*)*",
                        t):
            self.take()
            if self.peek() == "(":
                self.take()
                return self._call(t)
            return t, self._ident_type(t)
        return None

    def _call(self, fname: str) -> tuple[str, str]:
        """Function call: parse each argument as an expression (so
        divisions inside args are typed and rewritten), join on commas;
        CAST(... AS int-type) types integer, other calls type other."""
        parts: list[str] = []
        while self.peek() is not None and self.peek() != ")":
            a = self.expr()
            if a is not None:
                parts.append(a[0])
            elif self.peek() != ")":
                parts.append(self.take())
        closed = self.peek() == ")"
        if closed:
            self.take()
        text = fname + "(" + " ".join(parts) + (")" if closed else "")
        if not closed:
            # fragment cut by a string literal — re-emit only what
            # exists; typing is unknowable
            return text, _OTHER
        if fname.lower() == "cast":
            tail = [p.lower() for p in parts[-2:]]
            is_int = any(w.rstrip(")") in _INT_CAST_TYPES
                         for p in tail for w in p.split())
            return text, _INT if is_int else _OTHER
        return text, _OTHER

    def unary(self) -> tuple[str, str] | None:
        signs = []
        while self.peek() in ("-", "+"):
            signs.append(self.take())
        p = self.primary()
        if p is None:
            return (" ".join(signs), _OTHER) if signs else None
        return ("".join(s + " " for s in signs) + p[0], p[1])

    def muldiv(self) -> tuple[str, str] | None:
        left = self.unary()
        if left is None:
            return None
        while True:
            op = self.peek()
            is_div_kw = op is not None and op.lower() == "div"
            if op not in ("*", "/", "%") and not is_div_kw:
                return left
            self.take()
            right = self.unary()
            if right is None:
                return left[0] + " " + op, _OTHER
            both_int = left[1] == _INT and right[1] == _INT
            if op == "/" and both_int:
                left = (f"({left[0]} div {right[0]})", _INT)
            elif is_div_kw:
                # produced by the literal/literal pre-rewrite — integral
                left = (f"{left[0]} div {right[0]}", _INT)
            else:
                left = (f"{left[0]} {op} {right[0]}",
                        _INT if both_int else _OTHER)

    def expr(self) -> tuple[str, str] | None:
        left = self.muldiv()
        if left is None:
            return None
        while self.peek() in ("+", "-"):
            op = self.take()
            right = self.muldiv()
            if right is None:
                return left[0] + " " + op, _OTHER
            left = (f"{left[0]} {op} {right[0]}",
                    _INT if left[1] == _INT and right[1] == _INT
                    else _OTHER)
        return left


_STR_PLUS_OPERAND = (
    r"CONCAT\((?:[^()']|'(?:[^']|'')*'|\([^()]*\))*\)"
    r"|'(?:[^']|'')*'"
    r"|`[^`]*`"
    r"|[A-Za-z_][\w$]*(?:\.[A-Za-z_][\w$]*)*"
)
_STR_PLUS = re.compile(
    rf"(?<![\w$.'])({_STR_PLUS_OPERAND})\s*\+\s*({_STR_PLUS_OPERAND})")


def _str_plus_rewrite(text: str, str_names: set[str]) -> str:
    """OGR's '+' concatenates when either operand is a string
    (swq_op_general.cpp SWQGeneralChecker: SWQ_ADD with a string arg
    evaluates as concatenation — rfc28_3 `'x'+PRFEDEA`); Spark's +
    would instead try numeric casts. Rewrite ``a + b`` → CONCAT(a, b)
    when either simple operand (string literal, identifier typing
    string, or an already-rewritten CONCAT(...)) is a string;
    left-assoc chains fold via the fixpoint loop. Parenthesized or
    function-call operands are out of scope for this text pass — they
    stay numeric, as swq types them unless they evaluate to string."""

    def is_str(tok: str) -> bool:
        return (tok.startswith("'")
                or tok.upper().startswith("CONCAT(")
                or tok.strip("`").lower() in str_names)

    def repl(m: re.Match) -> str:
        a, b = m.group(1), m.group(2)
        if is_str(a) or is_str(b):
            return f"CONCAT({a}, {b})"
        return m.group(0)

    while True:
        new = _STR_PLUS.sub(repl, text)
        if new == text:
            return new
        text = new


def _int_div_rewrite(text: str, int_names: set[str]) -> str:
    """Schema-aware OGR integer-division typing (swq type promotion,
    rfc28_17 / ogr_sql_test.py::test_ogr_sql_49): full expression-tree
    typing, so int÷int divides integrally at every level of a chain
    (``a/b/c``, ``a/b*c/d`` group left-assoc exactly as swq parses
    them) and any float operand anywhere promotes that node to float.
    ``int_names`` holds int-typed column names (qualified always; bare
    only when the type is consistent across every registered scope)."""
    lead = text[:len(text) - len(text.lstrip())]
    trail = text[len(text.rstrip()):]
    toks = _SQL_TOKEN.findall(text)
    p = _ArithTyper(toks, int_names)
    out: list[str] = []
    while p.peek() is not None:
        e = p.expr()
        if e is not None:
            out.append(e[0])
        else:
            out.append(p.take())
    return lead + " ".join(out) + trail


def _rewrite_expressions(sql: str) -> str:
    out = re.sub(r"\bHSTORE_GET_VALUE\s*\(([^,]+),\s*('[^']*')\s*\)",
                 r"str_to_map(\1, ',', '=>')[\2]", sql, flags=re.I)
    # OGR datetime literals use slashes ('2010/04/01 00:00:00',
    # ogr-core field parsing); Spark coerces only ISO forms
    out = re.sub(r"'(\d{4})/(\d{2})/(\d{2})", r"'\1-\2-\3", out)
    out = re.sub(r"\blike\s+'((?:[^']|'')*)'\s+escape\s+'(.)'",
                 _sanitize_like_escape, out, flags=re.I)
    out = _escape_literal_backslashes(out)
    return _outside_strings(out, _rewrite_code)


_AGG_ITEM = re.compile(
    r"^(?P<fn>min|max|avg|sum|count|stddev_pop|stddev_samp)\s*"
    r"\(\s*(?:distinct\s+)?(?P<arg>(?:\w+\.)?[\w*]+)\s*\)$", re.I)


def _split_select_items(cols: str) -> list[str]:
    items, depth, last, i = [], 0, 0, 0
    while i < len(cols):
        c = cols[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "'":
            i += 1
            while i < len(cols) and cols[i] != "'":
                i += 1
        elif c == "," and depth == 0:
            items.append(cols[last:i])
            last = i + 1
        i += 1
    items.append(cols[last:])
    return items


_BARE_COL = re.compile(r"^(?:\w+\.)?\w+$")
_CAST_ITEM = re.compile(
    r"^cast\s*\(\s*((?:\w+\.)?\w+)\s+as\s+[\w() ,]+\)$", re.I)
_FN_ITEM = re.compile(r"^(\w+)\s*\((.*)\)$", re.S)

# words that can legally end an unaliased expression
_NON_ALIAS_WORDS = {"null", "true", "false", "end"}


def _has_alias(s: str) -> bool:
    """Does the select item carry an explicit or implicit alias? Only
    the text AFTER the last top-level ')' / "'" counts (an `as type`
    inside CAST(...) is not an alias), and a trailing word preceded by
    an operator is an operand, not an alias."""
    depth = 0
    i = 0
    tail_start = 0
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                tail_start = i + 1
        elif c == "'":
            i += 1
            while i < len(s) and s[i] != "'":
                i += 1
            if depth == 0:
                tail_start = i + 1
        i += 1
    tail = s[tail_start:]
    m = re.search(r"\s+(as\s+)?([\w`\"]+)\s*$", tail, re.I)
    if m is None:
        return False
    if not m.group(1):
        word = m.group(2).strip('`"').lower()
        if word in _NON_ALIAS_WORDS:
            return False
        prev = tail[:m.start()].rstrip()
        if not prev:
            # word directly follows the last top-level ')' / "'" (an
            # implicit alias) unless there was no such boundary at all
            return tail_start > 0
        if prev[-1] in "+-*/%<>=,|&(":
            return False
    return True


def _name_select_items(cols: str, star_widths: dict[str, int] | None = None,
                       total_star: int = 0) -> str:
    """OGR's output-column naming for unaliased select items
    (ogr_gensql.cpp field-defn synthesis; asserted across
    ogr_sql_test.py::test_ogr_sql_5/6/17 and ogr_sql_rfc28.py 12/14/15):
    aggregates and scalar functions become ``fn_firstcolarg``
    (``count_*`` for COUNT(*)), CAST keeps the underlying column name,
    and literals / arithmetic become ``FIELD_N`` where N is the 1-based
    OUTPUT-column position counting post-``*``-expansion fields
    (ogr_gensql.cpp:199 numbers by ``GetFieldCount() + 1``, not by
    select-list item). ``total_star`` is the field count a bare ``*``
    contributes; ``star_widths`` maps table/alias → field count for
    ``t.*`` items. Names are pinned lowercase (OGR's own field lookup
    is case-insensitive, so the case is unobservable there)."""
    out = []
    pos = 0  # output-field position so far (post-* expansion)
    for item in _split_select_items(cols):
        s = item.strip()
        if not s:
            out.append(item)
            continue
        if s.startswith("*"):
            out.append(item)
            ex = re.match(r"\*\s+except\s*\((.*)\)\s*$", s, re.I | re.S)
            n_except = len(_split_select_items(ex.group(1))) if ex else 0
            pos += max(0, total_star - n_except)
            continue
        if s.endswith(".*"):
            out.append(item)
            t = s[:-2].strip().strip("`\"'")
            pos += (star_widths or {}).get(t, 1)
            continue
        pos += 1
        # a bare NUMBER is a literal (gets FIELD_N), not a column ref
        if (_BARE_COL.match(s) and not re.match(r"^\d", s)) \
                or _has_alias(s):
            out.append(item)
            continue
        m = _AGG_ITEM.match(s)
        if m is not None:
            arg = m.group("arg").split(".")[-1]
            out.append(f"{s} as `{m.group('fn').lower()}_{arg}`")
            continue
        m = _CAST_ITEM.match(s)
        if m is not None:
            out.append(f"{s} as `{m.group(1).split('.')[-1].lower()}`")
            continue
        m = _FN_ITEM.match(s)
        if m is not None:
            first = _split_select_items(m.group(2))[0].strip()
            if _BARE_COL.match(first):
                out.append(f"{s} as "
                           f"`{m.group(1).lower()}_"
                           f"{first.split('.')[-1].lower()}`")
                continue
        out.append(f"{s} as field_{pos}")
    return ", ".join(out)


# keywords that terminate the previous clause at paren-depth 0
_KEYWORDS = ("left join", "join", "where", "group by", "having",
             "order by", "limit", "offset")


def _split_clauses(sql: str) -> list[tuple[str, str]]:
    """[(keyword, clause_text)] with 'select' first; splits only at
    depth-0 keyword occurrences (subqueries stay intact)."""
    low = sql.lower()
    marks = [(0, "select")]
    depth = 0
    i = 0
    while i < len(sql):
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "'":
            i += 1
            while i < len(sql) and sql[i] != "'":
                i += 1
        elif depth == 0:
            def _wordch(ch: str) -> bool:
                return ch.isalnum() or ch == "_"
            for kw in _KEYWORDS:
                if low.startswith(kw, i) \
                        and (i == 0 or not _wordch(low[i - 1])) \
                        and not (kw == "join" and low[:i].rstrip().endswith("left")):
                    end = i + len(kw)
                    if end >= len(low) or not _wordch(low[end]):
                        marks.append((i, kw))
                        i = end
                        break
            else:
                i += 1
                continue
            continue
        i += 1
    out = []
    for k, (pos, kw) in enumerate(marks):
        end = marks[k + 1][0] if k + 1 < len(marks) else len(sql)
        body = sql[pos:end]
        body = body[len(kw):].strip() if kw != "select" else body
        out.append((kw, body))
    return out


def _split_union_all(sql: str) -> list[str]:
    parts = []
    depth = 0
    last = 0
    low = sql.lower()
    i = 0
    while i < len(sql):
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "'":
            i += 1
            while i < len(sql) and sql[i] != "'":
                i += 1
        elif depth == 0 and low.startswith("union all", i):
            parts.append(sql[last:i])
            i += len("union all")
            last = i
            continue
        i += 1
    parts.append(sql[last:])
    return parts


def _prepare_layer(df: DataFrame, name: str, fid_order: str | None,
                   area_col: str | None,
                   geom_col: str | None = None,
                   style_col: str | None = None) -> DataFrame:
    if "fid" not in df.columns and fid_order is not None:
        from gdal_spark.ogrsql import with_fid

        df = with_fid(df, fid_order)
    if area_col is not None and "ogr_geom_area" not in df.columns:
        df = df.withColumn("ogr_geom_area", F.col(area_col))
    if geom_col is not None:
        # geometry-backed special fields (ogr/ogr_p.h:164-171): OGR_GEOMETRY
        # is the uppercase type name, OGR_GEOM_WKT the WKT form, and
        # OGR_GEOM_AREA the planar area, all derived from the WKB column
        # through the Arrow-batched ST kernels
        from gdal_spark.stfuncs import (_st_area, _st_astext,
                                        _st_geometrytype)

        g = F.col(geom_col)
        if "ogr_geometry" not in df.columns:
            df = df.withColumn(
                "ogr_geometry", F.pandas_udf(_st_geometrytype, "string")(g))
        if "ogr_geom_wkt" not in df.columns:
            df = df.withColumn(
                "ogr_geom_wkt", F.pandas_udf(_st_astext, "string")(g))
        if "ogr_geom_area" not in df.columns:
            df = df.withColumn(
                "ogr_geom_area", F.pandas_udf(_st_area, "double")(g))
    if style_col is not None and "ogr_style" not in df.columns:
        # OGR_STYLE carries the per-feature style string when the driver
        # provides one (autotest ogr_sql_test.py::test_ogr_sql_14)
        df = df.withColumn("ogr_style", F.col(style_col))
    return df


# ---------------------------------------------------------------------------
# ALTER TABLE DDL (GDALDataset::ExecuteSQL routes these before the swq
# parser: gcore/gdaldataset.cpp ProcessSQLAlterTableAddColumn /
# RenameColumn / AlterColumn / DropColumn; autotest ogr_sql_test.py
# test_ogr_sql_33). The COLUMN keyword is optional; identifiers may be
# double-quoted; NUMERIC(w,p) -> real, CHARACTER(n) -> string,
# INTEGER[(n)] -> int, FLOAT -> real, DATE/TIME/TIMESTAMP pass through.
# ---------------------------------------------------------------------------

_ALTER_RE = re.compile(
    r'^\s*ALTER\s+TABLE\s+(?P<layer>"[^"]+"|\w+)\s+'
    r"(?P<verb>ADD|RENAME|ALTER|DROP)\s+(?:COLUMN\s+)?(?P<rest>.*)$",
    re.I | re.S)

_DDL_TYPES = {
    "NUMERIC": "double", "FLOAT": "double", "REAL": "double",
    "CHARACTER": "string", "VARCHAR": "string", "STRING": "string",
    "INTEGER": "int", "BIGINT": "bigint", "SMALLINT": "int",
    "DATE": "date", "TIME": "string", "TIMESTAMP": "timestamp",
    "BOOLEAN": "boolean",
}


def _unq(tok: str) -> str:
    tok = tok.strip()
    return tok[1:-1] if tok.startswith('"') and tok.endswith('"') else tok


def _ddl_spark_type(typ: str) -> str:
    m = re.match(r"\s*(\w+)\s*(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?\s*$", typ)
    if not m or m.group(1).upper() not in _DDL_TYPES:
        raise ValueError(f"unsupported ALTER TABLE type: {typ!r}")
    return _DDL_TYPES[m.group(1).upper()]


def execute_ddl(sql: str, layers: dict[str, DataFrame]) -> None:
    """Apply an ALTER TABLE statement to the layer registry in place
    (mirrors GDAL: ExecuteSQL returns no result layer for DDL)."""
    m = _ALTER_RE.match(sql.strip().rstrip(";"))
    if not m:
        raise ValueError(f"unsupported DDL: {sql!r}")
    layer = _unq(m.group("layer"))
    if layer not in layers:
        raise KeyError(f"no such layer: {layer}")
    df = layers[layer]
    verb = m.group("verb").upper()
    rest = m.group("rest").strip()
    if verb == "ADD":
        mm = re.match(r'("[^"]+"|\w+)\s+(.+)$', rest)
        name, typ = _unq(mm.group(1)), mm.group(2)
        layers[layer] = df.withColumn(
            name, F.lit(None).cast(_ddl_spark_type(typ)))
    elif verb == "RENAME":
        mm = re.match(r'("[^"]+"|\w+)\s+TO\s+("[^"]+"|\w+)\s*$',
                      rest, re.I)
        layers[layer] = df.withColumnRenamed(_unq(mm.group(1)),
                                             _unq(mm.group(2)))
    elif verb == "ALTER":
        mm = re.match(r'("[^"]+"|\w+)\s+TYPE\s+(.+)$', rest, re.I)
        name = _unq(mm.group(1))
        layers[layer] = df.withColumn(
            name, F.col(name).cast(_ddl_spark_type(mm.group(2))))
    elif verb == "DROP":
        layers[layer] = df.drop(_unq(rest))


def execute_sql(spark: SparkSession, sql: str, layers: dict[str, DataFrame],
                fid_order: dict[str, str] | None = None,
                area_cols: dict[str, str] | None = None,
                geom_cols: dict[str, str] | None = None,
                style_cols: dict[str, str] | None = None) -> DataFrame:
    """Run an OGR SQL statement over the given layers.

    layers: layer name → DataFrame. fid_order[layer] names the column
    defining FID/iteration order (GDAL FIDs are the stable row ids of
    the layer); area_cols[layer] names the planar-area column backing
    OGR_GEOM_AREA; geom_cols[layer] names a WKB column from which the
    OGR_GEOMETRY / OGR_GEOM_WKT / OGR_GEOM_AREA special fields derive;
    style_cols[layer] backs OGR_STYLE.
    """
    if _ALTER_RE.match(sql.strip()):
        execute_ddl(sql, layers)
        return None
    fid_order = fid_order or {}
    area_cols = area_cols or {}
    geom_cols = geom_cols or {}
    style_cols = style_cols or {}
    for name, df in layers.items():
        _prepare_layer(df, name, fid_order.get(name), area_cols.get(name),
                       geom_cols.get(name), style_cols.get(name)) \
            .createOrReplaceTempView(name)

    sql = _rewrite_layer_functions(sql, geom_cols, spark)
    selects = _split_union_all(sql.strip().rstrip(";"))
    frames = [_execute_one(spark, s, layers, fid_order) for s in selects]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


_LAYER_FN = re.compile(
    r"\bogr_layer_(?P<fn>FeatureCount|Extent)\s*\(\s*'(?P<layer>\w+)'\s*\)",
    re.I)


def _mask_literals(text: str) -> str:
    """Blank out string-literal interiors only (keep parens), preserving
    offsets, honoring '' escapes — so token rewrites can locate matches
    outside literals and apply them by offset on the original text."""
    out = list(text)
    i = 0
    while i < len(text):
        if text[i] == "'":
            i += 1
            while i < len(text):
                if text[i] == "'":
                    if i + 1 < len(text) and text[i + 1] == "'":
                        out[i] = " "
                        out[i + 1] = " "
                        i += 2
                        continue
                    break
                out[i] = " "
                i += 1
        i += 1
    return "".join(out)


def _rewrite_layer_functions(sql: str, geom_cols: dict,
                             spark: SparkSession) -> str:
    """The SQLite-dialect layer-level scalar functions
    (ogr/ogrsf_frmts/sqlite/ogrsqlitevirtualogr.cpp —
    ogr_layer_FeatureCount :2097, ogr_layer_Extent :1990).
    FeatureCount becomes an uncorrelated scalar subquery; Extent is
    evaluated EAGERLY on the layer and inlined as an envelope-polygon
    WKB literal — exactly the reference's shape (OGR2SQLITE_ogr_layer_
    Extent calls poLayer->GetExtent() at evaluation time; a Spark
    scalar subquery additionally cannot host the pandas-UDF bbox
    kernels)."""

    def repl(m: re.Match) -> str:
        layer = m.group("layer")
        if m.group("fn").lower() == "featurecount":
            return f"(select count(*) from {layer})"
        g = geom_cols.get(layer)
        if g is None:
            raise ValueError(
                f"ogr_layer_Extent: layer {layer!r} has no geometry "
                f"column (pass geom_cols)")
        row = spark.sql(
            f"select min(st_xmin({g})) as x0, min(st_ymin({g})) as y0,"
            f" max(st_xmax({g})) as x1, max(st_ymax({g})) as y1"
            f" from {layer}").collect()[0]
        from gdal_spark import wkb as W

        ring = [[row["x0"], row["y0"]], [row["x1"], row["y0"]],
                [row["x1"], row["y1"]], [row["x0"], row["y1"]],
                [row["x0"], row["y0"]]]
        return f"unhex('{bytes(W.dumps_polygon([ring])).hex()}')"

    # only rewrite occurrences OUTSIDE string literals: a match whose
    # start offset was blanked by the literal mask is literal text
    # (e.g. a description column mentioning the function name)
    lit_mask = _mask_literals(sql)
    matches = [m for m in _LAYER_FN.finditer(sql)
               if lit_mask[m.start()] == sql[m.start()]]
    if not matches:
        return sql
    from gdal_spark.stfuncs import register_st_functions

    register_st_functions(spark)
    parts, pos = [], 0
    for m in matches:
        parts.append(sql[pos:m.start()])
        parts.append(repl(m))
        pos = m.end()
    parts.append(sql[pos:])
    return "".join(parts)


_HEAD_PREFIX = re.compile(r"^\s*select\s+(?P<distinct>distinct\s+)?",
                          re.I | re.S)
_HEAD_TABLE = re.compile(
    r"^\s*(?P<table>[\w.`\"']+)(?:\s+(?P<talias>\w+))?\s*$", re.I | re.S)


def _mask_depth0(text: str) -> str:
    """Replace every character inside parentheses or string literals
    with a space, preserving offsets — so keyword scans (FROM) only see
    depth-0 text and subqueries in the select list stay opaque."""
    out = list(text)
    depth = 0
    i = 0
    while i < len(text):
        c = text[i]
        if c == "(":
            depth += 1
            out[i] = " "
        elif c == ")":
            depth -= 1
            out[i] = " "
        elif c == "'":
            out[i] = " "
            i += 1
            while i < len(text):
                if text[i] == "'":
                    # SQL-escaped quote ('') stays inside the literal
                    if i + 1 < len(text) and text[i + 1] == "'":
                        out[i] = " "
                        out[i + 1] = " "
                        i += 2
                        continue
                    break
                out[i] = " "
                i += 1
            if i < len(text):
                out[i] = " "
        elif depth > 0:
            out[i] = " "
        i += 1
    return "".join(out)


def _match_select_head(text: str) -> dict | None:
    """Parse ``select [distinct] <items> from <table> [alias]`` with the
    FROM located at paren depth 0 (a ``from`` inside a scalar subquery
    in the select list must not split the head)."""
    pre = _HEAD_PREFIX.match(text)
    if pre is None:
        return None
    masked = _mask_depth0(text)
    fm = re.search(r"\bfrom\b", masked, re.I)
    if fm is None or fm.start() < pre.end():
        return None
    tbl = _HEAD_TABLE.match(text[fm.end():])
    if tbl is None:
        return None
    return {"distinct": pre.group("distinct"),
            "cols": text[pre.end():fm.start()].strip(),
            "table": tbl.group("table"), "talias": tbl.group("talias")}
_JOIN_CLAUSE = re.compile(
    r"^(?P<jtable>[\w.`\"']+)(?:\s+(?!on\b)(?P<jalias>\w+))?\s+"
    r"on\s+(?P<cond>.*)$",
    re.I | re.S,
)


def _execute_one(spark: SparkSession, sql: str, layers: dict,
                 fid_order: dict) -> DataFrame:
    sql = _rewrite_expressions(sql)
    clauses = _split_clauses(sql.strip())
    g = _match_select_head(clauses[0][1])
    if g is None:
        raise ValueError(f"unsupported OGR SQL: {sql!r}")
    table = g["table"].strip("'\"`")
    if table not in layers:
        raise KeyError(f"unknown layer {table!r}")

    items = [s for s in _split_select_items(g["cols"]) if s.strip()]
    if g["distinct"]:
        # swq_select.cpp:1049 / :333 — OGR rejects multi-column DISTINCT
        # and DISTINCT mixed with aggregation
        if len(items) > 1:
            raise ValueError(
                "SELECT DISTINCT not supported on multiple columns.")
        if _AGG_ITEM.match(items[0].strip()):
            raise ValueError(
                "SELECT DISTINCT and COUNT(DISTINCT...) not supported "
                "together" if re.match(r"count", items[0].strip(), re.I)
                else "Field list implies mixture of regular recordset "
                     "mode, summary mode or distinct field list mode.")

    # table/alias → attribute-field width, for OGR's post-*-expansion
    # FIELD_N numbering and for schema-aware integer-division typing
    star_widths: dict[str, int] = {}
    int_names: set[str] = set()
    str_names: set[str] = set()
    _bare_int: set[str] = set()
    _bare_other: set[str] = set()

    def _register_scope(lname: str, alias: str | None) -> None:
        cols = spark.table(lname).columns
        for nm in {lname, alias or lname}:
            star_widths[nm] = len(cols)
        for c, dt in spark.table(lname).dtypes:
            if dt in ("int", "bigint", "smallint", "tinyint"):
                for nm in {lname, alias or lname}:
                    int_names.add(f"{nm}.{c}".lower())
                _bare_int.add(c.lower())
            else:
                _bare_other.add(c.lower())
            if dt == "string":
                str_names.add(c.lower())
                for nm in {lname, alias or lname}:
                    str_names.add(f"{nm}.{c}".lower())

    _register_scope(table, g["talias"])
    for kw, body in clauses[1:]:
        if kw in ("join", "left join"):
            jm = _JOIN_CLAUSE.match(body)
            if jm is not None:
                jt = jm.group("jtable").strip("'\"`")
                if jt in layers:
                    _register_scope(jt, jm.group("jalias"))
    # a bare (unqualified) name types int only when it is int-typed in
    # EVERY registered scope that has it — a name int in one joined
    # layer but float in another must not trigger integer division
    int_names |= _bare_int - _bare_other

    def _typed(text: str) -> str:
        text = _str_plus_rewrite(text, str_names)
        return _outside_strings(
            text, lambda seg: _int_div_rewrite(seg, int_names))

    named = _name_select_items(_typed(g["cols"]), star_widths,
                               star_widths.get(table, 0))
    parts = [f"select {g['distinct'] or ''}{named}",
             f"from {table} {g['talias'] or table}"]
    tail: dict[str, str] = {}
    n_dedup = 0
    for kw, body in clauses[1:]:
        if kw in ("join", "left join"):
            jm = _JOIN_CLAUSE.match(body)
            if jm is None:
                raise ValueError(f"unsupported JOIN clause: {body!r}")
            jtable = jm.group("jtable").strip("'\"`")
            if jtable not in layers:
                raise KeyError(f"unknown layer {jtable!r}")
            cond = jm.group("cond").strip()
            jalias = jm.group("jalias") or jtable
            jview = jtable
            # first-match semantics: dedupe the secondary to its first
            # row per join key in FID order (ogr_gensql.cpp:1520)
            key = _secondary_key(cond, jtable, jm.group("jalias"))
            order = fid_order.get(jtable)
            if key is not None and order is not None:
                n_dedup += 1
                jview = (
                    f"(select * from (select *, row_number() over"
                    f" (partition by {key} order by {order}) as _rn"
                    f" from {jtable}) _d{n_dedup} where _rn = 1)"
                )
            parts.append(f"{kw} {jview} {jalias} on {_typed(cond)}")
        else:
            tail[kw] = body
    if "where" in tail:
        parts.append(f"where {_typed(tail['where'])}")
    if "group by" in tail:
        parts.append(f"group by {_typed(tail['group by'])}")
    if "having" in tail:
        parts.append(f"having {_typed(tail['having'])}")
    order_by = tail.get("order by")
    if order_by is not None:
        order_by = _typed(order_by)
    cols = g["cols"]
    if g["distinct"] and not order_by and "," not in cols \
            and "(" not in cols:
        order_by = cols.strip()  # DISTINCT_LIST mode: sorted values
    if order_by:
        parts.append(f"order by {order_by}")
    if "limit" in tail:
        parts.append(f"limit {tail['limit']}")
    if "offset" in tail:
        parts.append(f"offset {tail['offset']}")

    body = "\n".join(parts)
    try:
        return spark.sql(body)
    except Exception as e:  # surface the translated SQL for debugging
        raise ValueError(f"translated SQL failed:\n{body}") from e


def _secondary_key(cond: str, jtable: str, jalias: str | None) -> str | None:
    """Extract the secondary join column from `sec.f = expr` (OGR
    restricts ON to this shape — swq_parser.y:1088)."""
    names = [jtable]
    if jalias:
        names.append(jalias)
    for side in re.split(r"=", cond):
        side = side.strip()
        mm = re.match(r"^(\w+)\.(\w+)$", side)
        if mm and mm.group(1) in names:
            return mm.group(2)
    return None
