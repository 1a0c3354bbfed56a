"""DuckDB-dialect shim for the pass-through SQL tier.

The reference product forwards user SQL to DuckDB untouched
(``/root/reference/src/duckdb.ts:46-49``), so DuckDB-dialect conveniences
"just work" there.  ``Engine.run`` hands the same text to Spark SQL; this
module closes the dialect gap for the constructs a DuckDB-habituated user
hits first:

- ``GROUP BY ALL`` / ``ORDER BY ALL`` — **native** in Spark 4.x, no
  rewrite needed (pinned by tests so a regression would surface).
- ``SELECT * EXCLUDE (col, ...)`` — rewritten to Spark's native
  ``* EXCEPT (col, ...)``.
- ``QUALIFY <pred>`` — Spark has no QUALIFY; the predicate is appended
  to the select list as a ``__qualify`` column (window functions are
  legal there, and Spark's lateral column aliases let the predicate
  reference select-list aliases like DuckDB does), the query is wrapped,
  and the outer query filters on it and drops it with ``* EXCEPT``.
- ``strftime(ts, '%Y-%m-%d')`` — rewritten to
  ``date_format(ts, 'yyyy-MM-dd')`` with a C-to-Java pattern translation
  (letter literals quoted per Spark datetime-pattern rules).
- ``ASOF [LEFT] JOIN`` — rewritten to an equi-join against a LEAD/LAG
  validity window (strictly scoped; unsupported forms raise
  ``AsofRewriteError`` rather than risk wrong results).
- ``USING SAMPLE`` → ``TABLESAMPLE``; DuckDB-spelled function names
  (``string_split``, ``list_*``, ``list``, ``regexp_matches``,
  ``epoch_ms``/``epoch_us``, ``arg_min/arg_max``, vector-math macros) →
  their Spark equivalents.
- ``FROM``-first statements (``FROM t`` / ``FROM t SELECT ...``, per
  set-operation branch) and ``SELECT DISTINCT ON (keys) ...`` (ranked-
  window rewrite with hidden order columns).
- Bracket syntax: ``[..]`` list literals, ``[expr FOR x IN l IF p]``
  comprehensions, 1-based indexing ``l[i]`` / slicing ``l[a:b]`` on
  identifier and call bases (Spark subscripts are 0-based, so indexes
  are ALWAYS rewritten to ``try_element_at`` — leaving them would be
  silently off by one); ``struct_pack(a := 1)`` → ``named_struct``.
- Function chaining ``expr.fn(args)`` → ``fn(expr, args)`` (leftmost-
  first, subscript-aware; runs before the bracket pass so ``[i]`` stays
  glued to its base).  DuckDB's polymorphic ``len`` keeps its string
  reading in the primary text and falls back to ``size`` (array/map)
  when analysis fails.
- ``INSERT INTO t BY NAME <query>`` (name-matched column list, NULL
  fill — ``workbench/set_ops.py``); ``USING SAMPLE`` method forms
  (``reservoir(100 ROWS)``, ``10% (system, seed)``) with DuckDB's
  per-method unit defaults; bare ``VARCHAR`` → ``STRING``.
- Operator/literal pack: ``$$...$$`` dollar strings, ``1_000_000``
  underscores, ``//`` → ``div``, ``^``/``**`` → ``power`` (Spark's ``^``
  is XOR — a silent wrong answer otherwise), ``^@`` → ``startswith``,
  ``[NOT] SIMILAR TO`` → anchored RLIKE, ``{'k': v}`` struct / ``MAP
  {...}`` literals, and FROM-position ``generate_series``/``range``
  table functions with DuckDB's column names and bound/empty/error
  behavior (each semantic pinned by an empirical probe; see the pack's
  section comment).
- **Literal backslashes doubled** (innermost pass): DuckDB reads
  ``'\\d+'`` raw, Spark C-unescapes it to ``d+`` — without the pass
  every user regex silently diverges.
- JSON: ``->`` / ``->>`` operators (lambda-arrow-aware via a HOF-call
  guard), ``::JSON`` casts, ``json_extract``/``json_extract_string``/
  ``json_value`` (path ``$``-normalization), ``json_valid``,
  ``json_keys``; aggregates: ordered ``string_agg``/``listagg`` →
  ``WITHIN GROUP``, ``quantile_disc``, sample-corrected ``skewness``/
  ``kurtosis`` (verified bias formulas); regex: DuckDB group-0
  defaults, ``'g'``/``'i'`` option strings, ``regexp_full_match``,
  ``regexp_split_to_array``, ``regexp_escape``; ``struct_extract``.
- Parity-sweep renames/macros (each probed on both engines): string
  predicates (``starts_with``/``ends_with``/``strpos``), hashes
  (``sha256``/``to_base``/``to_hex``/``from_hex``), date idioms
  (``dayname``/``monthname``/``isodow``/``yearweek``/``week``,
  boundary-crossing ``date_diff`` vs full-unit ``date_sub``,
  interval ``date_add``), ``log`` → ``log10`` (DuckDB's reading — the
  ln reading would be silently wrong), 2-arg ``trim``/``ltrim``/
  ``rtrim``, numeric ``trunc``/``isfinite``/``isinf``, and the list
  family (``list_sum``/``list_avg``/``list_aggregate``/``list_reduce``/
  ``list_prepend``/``list_any_value``/``list_count``/
  ``list_reverse_sort``/``list_position``/``list_zip``, scalar
  ``range``/``generate_series`` lists).
- ``read_parquet('f')`` / ``read_csv`` / ``read_json`` single-argument
  table functions → path literals (B4 machinery resolves them);
  ``DESCRIBE SELECT/FROM`` → ``DESCRIBE QUERY``; the ``UNPIVOT src ON
  cols INTO NAME n VALUE v`` statement form → Spark's relational
  UNPIVOT.  (``COPY ... TO`` executes in ``workbench/copy_to.py``;
  PIVOT/SUMMARIZE/COLUMNS dispatch schema-aware in ``Engine.sql``.)

Every rewrite is lexer-aware (single/double/backtick quotes, ``--`` and
``/* */`` comments — the A6 lexer's rules) so occurrences inside strings,
identifiers, or comments are never touched, mirroring how
``statements.rewrite_path_tables`` treats path literals.

- Text normalization pack (r8, mutation-fuzz driven): comments are
  STRIPPED once at the ``Engine.sql`` funnel (``strip_comments`` —
  string- and dollar-quote-aware), because the operand-matching passes
  tolerate only whitespace between tokens (a comment after ``^`` left it
  as Spark XOR: silent wrong answer); double-quoted identifiers are
  DuckDB/Postgres identifiers, never strings —
  ``spark.sql.ansi.doubleQuotedIdentifiers`` handles resolution, and
  lowercase simple ones normalize to bare text
  (``_unquote_function_names``) so every operand regex still fires;
  named-window references case-fold to the defined spelling
  (``_rewrite_named_window_case`` — Spark matches ``OVER w`` to
  ``WINDOW W AS`` by exact text, DuckDB folds case).

- Division/NULL pack (r8, probed): ``/`` → ``try_divide`` with the
  dividend cast to DOUBLE (DuckDB always divides as DOUBLE and returns
  NULL on zero), ``%`` → ``try_mod``, ``//`` chains → atomic per-stage
  ``typeof`` dispatch (truncate only while every chain leaf is integral,
  plain division otherwise — DuckDB's static-type polymorphism);
  ``concat`` → ``concat_ws('', ...)`` (DuckDB concat SKIPS NULLs).

Scope notes: one top-level QUALIFY per statement (QUALIFY inside a
subquery/CTE body is at paren depth > 0 and handled when that text is a
statement of its own — which is how the workbench runs nested text);
unknown ``%`` codes in strftime raise a clear error instead of silently
producing a wrong Java pattern.

KNOWN INTENTIONAL DIFFERENCES (each pinned in
``tests/test_dialect_residuals.py`` so a change in behavior surfaces;
this list is the triage ground truth for fuzz_dialect.py divergences):

1. RESOLVED (r8): a top-level trailing ``ORDER BY ALL`` is handled
   engine-side (``Engine._order_by_all_tail`` — the schema IS available
   there) with DuckDB's NULLS LAST default in both directions; only an
   ORDER BY ALL buried in a subquery still takes Spark's null order.
2. Integer ``//`` results beyond 2^53 round through the double path
   (the zero-guard routes integer division via ``try_divide``).
3. A ``//`` whose integral static type crosses a subquery/alias
   boundary is seen as DOUBLE by the outer ``//`` and divides plainly;
   same-expression composition dispatches correctly — the integrality
   condition recurses through CASE branches, the pass's own emitted
   dispatch shape, and top-level ``+ - * div`` arithmetic (wave-13 fuzz
   seed 20313), so only cross-query-block nesting retains the residual.  The list-aggregate
   macros (``list_sum``/``list_avg``) are in this class: their
   ``aggregate`` expansion is DOUBLE-typed, so DuckDB's integral
   ``list_sum(ints) // n`` truncation becomes plain division (fuzz r8
   seed 529).
4. ``INTERVAL / n`` is rejected (the DOUBLE dividend cast fails
   analysis) where DuckDB scales the interval — error over silently
   NULL rows.
5. ``concat`` with LIST arguments joins elements (Spark ``concat_ws``)
   where DuckDB stringifies the list (``'[1, 2]'``).
6. ``SUM`` over BIGINT that overflows int64 raises (ANSI) where DuckDB
   promotes to HUGEINT.
7. ROWS-unit ``USING SAMPLE`` draws from a different RNG stream than
   DuckDB's reservoir (row count honored, membership differs; seeded
   ``REPEATABLE`` cannot match cross-engine); an aliased table ref
   defeats the positional wrap and surfaces Spark's parse error rather
   than silently sampling a prefix.
8. Unsupported ``ASOF JOIN`` shapes raise ``AsofRewriteError`` rather
   than risk wrong results.
9. DuckDB's unsigned 64-bit results wrap on negation — ``-
   list_unique([1, 1])`` is 18446744073709551615 (UBIGINT arithmetic);
   Spark has no unsigned type, so counts stay signed and negate to -2
   (fuzz r8 seed 259).
10. ``hash(x)`` returns Spark's 32-bit Murmur3, not DuckDB's 64-bit
   internal hash — both are opaque; matching would require porting
   DuckDB's private mix function.  ``strip_accents`` folds the curated
   Latin-1 accent set via translate; characters outside it pass
   through where DuckDB's full-Unicode NFD strip would fold them.
   ``signbit(-0.0)`` is false (Spark normalizes negative zero before
   the string-render probe); all non-zero signs and NaN agree.
11. Global-replace of a ZERO-WIDTH-capable pattern differs at empty
   matches adjacent to a previous match: Java (Spark) replaces them,
   RE2 (DuckDB) skips them — ``regexp_replace('xy', 'x*', '_', 'g')``
   is '__y_' here, '_y_' there (fuzz r8 seed 12654).  Non-empty
   matches and the unflagged first-only form agree.
12. A ``//`` embedded directly in a string context (``'x' || a // b``,
   or ``array_to_string`` over a lambda containing ``//`` — fuzz r8
   seed 31255) renders '7.0' where DuckDB prints '7' — the dispatch
   surfaces DOUBLE in both branches; at the result boundary the cell
   formatter renders whole doubles like DuckDB's INTEGER, so only
   mid-query stringification shows the difference.
13. ``levenshtein``/``jaccard``/``hamming`` count CODEPOINTS (Spark
   builtins / set macros) where DuckDB counts UTF-8 BYTES —
   ``levenshtein('café', 'cafe')`` is 1 here, 2 there; identical for
   ASCII.  (``hamming`` errors in DuckDB on unequal byte lengths even
   when codepoint lengths match.)  The separately registered
   ``damerau_levenshtein`` / ``jaro*`` UDFs ARE byte-exact.
14. Named macro arguments bind case-INSENSITIVELY here; DuckDB binds
   them by the exact definition spelling and SILENTLY IGNORES a
   mismatched-case named argument, keeping the default (probed:
   ``CREATE MACRO m(a, b := 1) ...; m(5, B := 3)`` uses b = 1 in DuckDB,
   b = 3 here).  Honoring the user's argument beats replicating a
   silent drop.  Macro NAMES and body identifier references fold case
   in both engines.
15. A comma-join ``LATERAL (SELECT agg(..) FROM .. WHERE <correlated>)``
   whose correlated input is EMPTY for some outer row: the ungrouped
   aggregate yields one NULL row, so the outer row survives here (SQL
   standard / Postgres semantics); DuckDB DROPS the outer row — its
   decorrelation rewrites the aggregate into a grouped join, the
   classic "COUNT bug" (probed: ``(VALUES (1),(20)) t(x), LATERAL
   (SELECT max(y) FROM (VALUES (10)) s(y) WHERE y < t.x)`` returns one
   row there, two here).  Keeping the standard behavior beats
   replicating a decorrelation artifact.
16. ``count(date_trunc(part, nullable_ts))`` (and any count over a
   function OF date_trunc) counts correctly here; the bundled DuckDB
   1.0.0 counts EVERY row — its optimizer folds the count(expr) to
   count(*) even though the per-row values render NULL (probed:
   the values are NULL, count says 120/120 where 100 rows are
   non-NULL).  A DuckDB-side bug we do not replicate; no catalog
   oracle uses the pattern (grepped).
"""

from __future__ import annotations

import contextvars
import re

# ── shared lexing ────────────────────────────────────────────────────────


def _code_mask(sql: str) -> list[bool]:
    """True for characters that are plain SQL code — outside single-quoted
    strings, double-quoted / backtick-quoted identifiers, and comments.
    Quote/comment delimiter characters themselves count as non-code."""
    n = len(sql)
    mask = [True] * n
    i = 0
    state = None  # None | 'sq' | 'dq' | 'bq' | 'line' | 'block'
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if state == "line":
            mask[i] = False
            if ch == "\n":
                state = None
                mask[i] = True
        elif state == "block":
            mask[i] = False
            if ch == "*" and nxt == "/":
                mask[i + 1] = False
                i += 1
                state = None
        elif state == "sq":
            mask[i] = False
            if ch == "'" and nxt == "'":
                mask[i + 1] = False
                i += 1
            elif ch == "'":
                state = None
        elif state == "dq":
            mask[i] = False
            if ch == '"' and nxt == '"':
                mask[i + 1] = False
                i += 1
            elif ch == '"':
                state = None
        elif state == "bq":
            mask[i] = False
            if ch == "`" and nxt == "`":
                mask[i + 1] = False
                i += 1
            elif ch == "`":
                state = None
        elif ch == "-" and nxt == "-":
            mask[i] = mask[i + 1] = False
            state = "line"
            i += 1
        elif ch == "/" and nxt == "*":
            mask[i] = mask[i + 1] = False
            state = "block"
            i += 1
        elif ch == "'":
            mask[i] = False
            state = "sq"
        elif ch == '"':
            mask[i] = False
            state = "dq"
        elif ch == "`":
            mask[i] = False
            state = "bq"
        i += 1
    return mask


def _comment_mask(sql: str) -> list[bool]:
    """True only for characters inside comments (delimiters included) —
    distinguishes trailing-comment junk from string-literal characters,
    which `_code_mask` lumps together as non-code.  Needed where a pass
    must skip comments but keep literals as part of an expression
    (ADVICE r7: ``ORDER BY a -- note`` must not get NULLS LAST inserted
    inside the comment)."""
    n = len(sql)
    cmask = [False] * n
    i = 0
    state = None  # None | 'sq' | 'dq' | 'bq' | 'line' | 'block'
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if state == "line":
            if ch == "\n":
                state = None
            else:
                cmask[i] = True
        elif state == "block":
            cmask[i] = True
            if ch == "*" and nxt == "/":
                cmask[i + 1] = True
                i += 1
                state = None
        elif state in ("sq", "dq", "bq"):
            q = {"sq": "'", "dq": '"', "bq": "`"}[state]
            if ch == q and nxt == q:
                i += 1
            elif ch == q:
                state = None
        elif ch == "-" and nxt == "-":
            cmask[i] = cmask[i + 1] = True
            state = "line"
            i += 1
        elif ch == "/" and nxt == "*":
            cmask[i] = cmask[i + 1] = True
            state = "block"
            i += 1
        elif ch == "'":
            state = "sq"
        elif ch == '"':
            state = "dq"
        elif ch == "`":
            state = "bq"
        i += 1
    return cmask


_DOLLAR_TAG = re.compile(r"\$([A-Za-z_][A-Za-z_0-9]*)?\$")


def strip_comments(sql: str) -> str:
    """Replace every SQL comment with a single space (string-aware,
    including dollar-quoted strings, which `_comment_mask` predates).

    Comments are semantically neutral in both DuckDB and Spark, but the
    ~30 regex rewrite passes tolerate only whitespace between tokens —
    the r8 mutation fuzzer showed a comment between ``^`` and its operand
    (or inside ``ORDER BY``, ``* EXCLUDE``, ``->>``, ``%``, ``//``, QUALIFY
    predicates, …) either mangles the rewrite into a parse error or, worse,
    silently skips it (``^`` left as Spark XOR).  Stripping once at the
    engine funnel fixes the entire class instead of hardening every pass."""
    if "--" not in sql and "/*" not in sql:
        return sql
    out: list[str] = []
    i, n = 0, len(sql)
    state: str | None = None  # None | sq | dq | bq | line | block
    dollar_tag: str | None = None
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if state == "line":
            if ch == "\n":
                state = None
                out.append(ch)
            i += 1
            continue
        if state == "block":
            if ch == "*" and nxt == "/":
                state = None
                i += 2
            else:
                i += 1
            continue
        if state == "dollar":
            out.append(ch)
            if ch == "$" and sql.startswith(dollar_tag, i):
                out.append(sql[i + 1 : i + len(dollar_tag)])
                i += len(dollar_tag)
                state, dollar_tag = None, None
            else:
                i += 1
            continue
        if state in ("sq", "dq", "bq"):
            q = {"sq": "'", "dq": '"', "bq": "`"}[state]
            out.append(ch)
            if ch == q and nxt == q:
                out.append(nxt)
                i += 2
                continue
            if ch == q:
                state = None
            i += 1
            continue
        if ch == "-" and nxt == "-":
            out.append(" ")
            state = "line"
            i += 2
            continue
        if ch == "/" and nxt == "*":
            out.append(" ")
            state = "block"
            i += 2
            continue
        if ch == "$":
            m = _DOLLAR_TAG.match(sql, i)
            if m:
                state, dollar_tag = "dollar", m.group(0)
                out.append(m.group(0))
                i = m.end()
                continue
        if ch == "'":
            state = "sq"
        elif ch == '"':
            state = "dq"
        elif ch == "`":
            state = "bq"
        out.append(ch)
        i += 1
    return "".join(out)


# Words whose bare spelling changes the parse — quoted identifiers with
# these contents must STAY quoted (Spark's ansi.doubleQuotedIdentifiers
# resolves them; they're the rare corner the operand-regex passes may
# miss, but unquoting them would be outright wrong).
_RESERVED_BARE = frozenset(
    """select from where group order by having union all distinct as on
    using join inner left right full cross natural and or not in is null
    true false case when then else end cast try_cast between like ilike
    similar exists limit offset window qualify over partition rows range
    filter lateral with values except intersect replace exclude unnest
    interval asc desc nulls first last sample tablesample pivot unpivot
    describe summarize copy insert update delete create drop table view
    macro to for if any some escape glob collate asof positional anti
    semi div mod xor struct map array row grouping sets cube rollup
    current_date current_timestamp current_time localtime localtimestamp
    """.split()
)


def _unquote_function_names(sql: str) -> str:
    """Normalize double-quoted identifiers whose content is a simple
    lowercase word (``"n_name"`` → ``n_name``, ``"list_filter"(...)`` →
    ``list_filter(...)``).

    DuckDB folds unquoted identifiers to lowercase, so the bare lowercase
    spelling resolves identically to the quoted one in BOTH engines —
    and bare text is what the ~30 operand-matching rewrite passes (//
    typeof dispatch, ``~`` regex operators, * REPLACE's ``AS <column>``,
    function renames/macros) are written against; r8 mutation fuzzing
    showed each of them failing on a quoted operand.  Identifiers that
    NEED their quotes (uppercase, spaces, reserved words) stay quoted and
    resolve via spark.sql.ansi.doubleQuotedIdentifiers."""
    if '"' not in sql:
        return sql
    out: list[str] = []
    i, n = 0, len(sql)
    state: str | None = None  # None | sq | bq | dollar
    dollar_tag: str | None = None
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if state == "dollar":
            # inside a $tag$...$tag$ string: copy verbatim (quotes in the
            # body are DATA — unquoting them silently corrupts literals)
            out.append(ch)
            if ch == "$" and sql.startswith(dollar_tag, i):
                out.append(sql[i + 1 : i + len(dollar_tag)])
                i += len(dollar_tag)
                state, dollar_tag = None, None
            else:
                i += 1
            continue
        if state == "sq":
            out.append(ch)
            if ch == "'" and nxt == "'":
                out.append(nxt)
                i += 2
                continue
            if ch == "'":
                state = None
            i += 1
            continue
        if state == "bq":
            out.append(ch)
            if ch == "`" and nxt == "`":
                out.append(nxt)
                i += 2
                continue
            if ch == "`":
                state = None
            i += 1
            continue
        if ch == "'":
            state = "sq"
            out.append(ch)
            i += 1
            continue
        if ch == "`":
            state = "bq"
            out.append(ch)
            i += 1
            continue
        if ch == "$":
            m = _DOLLAR_TAG.match(sql, i)
            if m:
                state, dollar_tag = "dollar", m.group(0)
                out.append(m.group(0))
                i = m.end()
                continue
        if ch == '"':
            m = re.match(r'"([a-z_][a-z0-9_]*)"', sql[i:])
            if m and m.group(1) not in _RESERVED_BARE:
                out.append(m.group(1))
                i = i + m.end()
                continue
            # a quoted identifier that needs its quotes (uppercase, spaces,
            # "" escapes, reserved words): copy it verbatim
            j = i + 1
            while j < n:
                if sql[j] == '"' and j + 1 < n and sql[j + 1] == '"':
                    j += 2
                    continue
                if sql[j] == '"':
                    j += 1
                    break
                j += 1
            out.append(sql[i:j])
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _depths(sql: str, mask: list[bool]) -> list[int]:
    """Paren depth at each position (code parens only)."""
    depths = []
    d = 0
    for i, ch in enumerate(sql):
        if mask[i] and ch == ")":
            d -= 1
        depths.append(d)
        if mask[i] and ch == "(":
            d += 1
    return depths


def _keyword_matches(sql: str, mask: list[bool], pattern: str) -> list[re.Match]:
    """Regex matches lying entirely in code regions."""
    return [
        m
        for m in re.finditer(pattern, sql, re.IGNORECASE)
        if all(mask[i] for i in range(m.start(), m.end()))
    ]


# ── DuckDB dynamic INTERVAL (expr) UNIT ─────────────────────────────────

_DYN_INTERVAL = re.compile(r"\bINTERVAL\s*\(", re.IGNORECASE)
_DYN_INTERVAL_UNIT = re.compile(
    r"\s*(YEAR|QUARTER|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND|MILLISECOND|"
    r"MICROSECOND)S?\b",
    re.IGNORECASE,
)


def _rewrite_dynamic_interval(sql: str) -> str:
    """DuckDB's column-valued interval ``INTERVAL (expr) DAY`` →
    ``((expr) * INTERVAL '1' DAY)`` (Spark's INTERVAL quantity must be a
    literal; multiplication takes the dynamic path).  Fixed-literal
    ``INTERVAL 2 DAY`` needs no rewrite (valid in both engines)."""
    if "interval" not in sql.lower():
        return sql
    while True:
        mask = _code_mask(sql)
        hit = None
        for m in _DYN_INTERVAL.finditer(sql):
            if all(mask[i] for i in range(m.start(), m.end())):
                hit = m
                break
        if hit is None:
            return sql
        open_p = hit.end() - 1
        depth = 0
        close = None
        for i in range(open_p, len(sql)):
            if mask[i] and sql[i] == "(":
                depth += 1
            elif mask[i] and sql[i] == ")":
                depth -= 1
                if depth == 0:
                    close = i
                    break
        if close is None:
            return sql
        um = _DYN_INTERVAL_UNIT.match(sql, close + 1)
        if um is None:
            return sql
        expr = sql[open_p + 1 : close]
        unit = um.group(1).upper()
        sql = (
            sql[: hit.start()]
            + f"(({expr}) * INTERVAL '1' {unit})"
            + sql[um.end() :]
        )


# ── SELECT * EXCLUDE → SELECT * EXCEPT ───────────────────────────────────

_IDENT = r'(?:`(?:[^`]|``)+`|"(?:[^"]|"")+"|[A-Za-z_][\w$]*)'


# ── named-window reference case (r8 mutation fuzz) ──────────────────────
#
# DuckDB resolves ``OVER w`` against ``WINDOW W AS (...)`` case-
# insensitively (unquoted identifiers fold); Spark matches the reference
# to the definition by EXACT text and raises MISSING_WINDOW_SPECIFICATION
# on a case mismatch.  Canonicalize every unquoted ``OVER <name>``
# reference to the defined spelling.

_WINDOW_DEF = re.compile(
    r"\bWINDOW\s+([A-Za-z_][\w$]*)\s+AS\s*\(", re.IGNORECASE
)
_WINDOW_DEF_CONT = re.compile(r"\s*,\s*([A-Za-z_][\w$]*)\s+AS\s*\(")
_OVER_REF = re.compile(r"\bOVER\s+([A-Za-z_][\w$]*)", re.IGNORECASE)


def _rewrite_named_window_case(sql: str) -> str:
    if "window" not in sql.lower() or "over" not in sql.lower():
        return sql
    mask = _code_mask(sql)
    depths = _depths(sql, mask)
    defined: dict[str, str] = {}
    for m in _keyword_matches(sql, mask, _WINDOW_DEF.pattern):
        defined[m.group(1).lower()] = m.group(1)
        # continuation definitions: WINDOW w1 AS (...), w2 AS (...)
        close = m.end() - 1  # the '('
        d0 = depths[close]  # _depths records the same value on the matching ')'
        j = close + 1
        while j < len(sql):
            if mask[j] and sql[j] == ")" and depths[j] == d0:
                c = _WINDOW_DEF_CONT.match(sql, j + 1)
                if c is None:
                    break
                defined[c.group(1).lower()] = c.group(1)
                j = sql.find("(", c.end() - 1)
                if j < 0:
                    break
                j += 1
                continue
            j += 1
    if not defined:
        return sql
    out = sql
    for m in reversed(_keyword_matches(sql, mask, _OVER_REF.pattern)):
        name = m.group(1)
        want = defined.get(name.lower())
        if want is not None and want != name:
            out = out[: m.start(1)] + want + out[m.end(1) :]
    return out


def _rewrite_exclude(sql: str) -> str:
    mask = _code_mask(sql)
    out = sql
    # right-to-left so earlier offsets stay valid
    for m in reversed(_keyword_matches(sql, mask, r"\bEXCLUDE\b")):
        # must follow a star (possibly alias.*), else it's an identifier
        j = m.start() - 1
        while j >= 0 and sql[j].isspace():
            j -= 1
        if j < 0 or sql[j] != "*":
            continue
        k = m.end()
        while k < len(sql) and sql[k].isspace():
            k += 1
        if k < len(sql) and sql[k] == "(":
            out = out[: m.start()] + "EXCEPT" + out[m.end() :]
        else:
            # bare single column: EXCLUDE col → EXCEPT (col)
            im = re.match(_IDENT, sql[k:])
            if not im:
                continue
            col = im.group(0)
            out = (
                out[: m.start()]
                + f"EXCEPT ({col})"
                + out[k + im.end() :]
            )
    return out


# ── strftime → date_format ───────────────────────────────────────────────

_STRF_TO_JAVA = {
    "Y": "yyyy",
    "y": "yy",
    "m": "MM",
    "d": "dd",
    "H": "HH",
    "I": "hh",
    "M": "mm",
    "S": "ss",
    "f": "SSSSSS",
    "g": "SSS",
    "p": "a",
    "j": "DDD",
    "a": "EEE",
    "A": "EEEE",
    "b": "MMM",
    "B": "MMMM",
}


def strftime_format_to_java(fmt: str) -> str:
    """C-style strftime pattern → Spark datetime pattern.  Literal runs
    containing letters (or quotes) are single-quoted per Java rules."""
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if not lit:
            return
        text = "".join(lit)
        if re.search(r"[A-Za-z']", text):
            out.append("'" + text.replace("'", "''") + "'")
        else:
            out.append(text)
        lit.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            code = fmt[i + 1] if i + 1 < len(fmt) else ""
            if code == "%":
                lit.append("%")
            elif code in _STRF_TO_JAVA:
                flush()
                out.append(_STRF_TO_JAVA[code])
            else:
                raise ValueError(
                    f"strftime code %{code or '<end>'} has no Spark "
                    f"date_format equivalent (supported: "
                    f"{', '.join('%' + c for c in sorted(_STRF_TO_JAVA))}, %%)"
                )
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    return "".join(out)


def _split_call_args(sql: str, mask: list[bool], open_paren: int) -> tuple[list[str], int] | None:
    """Top-level comma-split of a call's arguments; returns (args, close_idx)."""
    depth = 0
    args: list[str] = []
    start = open_paren + 1
    for i in range(open_paren, len(sql)):
        if not mask[i]:
            continue
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args.append(sql[start:i])
                return args, i
        elif ch == "," and depth == 1:
            args.append(sql[start:i])
            start = i + 1
    return None


_SQ_LITERAL = re.compile(r"^\s*'((?:[^']|'')*)'\s*$")


def _rewrite_strftime(sql: str) -> str:
    mask = _code_mask(sql)
    out = sql
    for m in reversed(_keyword_matches(sql, mask, r"\bstrftime\s*\(")):
        open_paren = m.end() - 1
        parsed = _split_call_args(sql, mask, open_paren)
        if parsed is None:
            continue
        args, close = parsed
        if len(args) != 2:
            continue
        # DuckDB: strftime(timestamp, format); tolerate the swapped order
        fmt_idx = next(
            (i for i, a in enumerate(args) if _SQ_LITERAL.match(a)), None
        )
        if fmt_idx is None:
            continue
        ts_expr = args[1 - fmt_idx].strip()
        fmt = _SQ_LITERAL.match(args[fmt_idx]).group(1).replace("''", "'")
        java = strftime_format_to_java(fmt)
        sql_lit = "'" + java.replace("'", "''") + "'"
        out = out[: m.start()] + f"date_format({ts_expr}, {sql_lit})" + out[close + 1 :]
    return out


def _rewrite_strptime(sql: str) -> str:
    """DuckDB ``strptime(str, '%Y-%m-%d')`` → Spark
    ``to_timestamp(str, 'yyyy-MM-dd')`` via the same %-code table as
    strftime (unknown codes raise, never silently mis-parse)."""
    mask = _code_mask(sql)
    out = sql
    for m in reversed(_keyword_matches(sql, mask, r"\bstrptime\s*\(")):
        open_paren = m.end() - 1
        parsed = _split_call_args(sql, mask, open_paren)
        if parsed is None:
            continue
        args, close = parsed
        if len(args) != 2:
            continue
        fmt_m = _SQ_LITERAL.match(args[1])
        if fmt_m is None:
            continue
        fmt = fmt_m.group(1).replace("''", "'")
        java = strftime_format_to_java(fmt)
        sql_lit = "'" + java.replace("'", "''") + "'"
        out = (
            out[: m.start()]
            + f"to_timestamp({args[0].strip()}, {sql_lit})"
            + out[close + 1 :]
        )
    return out


# ── QUALIFY ──────────────────────────────────────────────────────────────

_QUALIFY_TAIL = r"\b(?:ORDER\s+BY|LIMIT|OFFSET)\b"


def _qualify_parts(sql: str) -> tuple[str, str, str, str] | None:
    """Split ``<head> FROM <body> QUALIFY <pred> <tail>`` at top level.
    Returns (head, body, pred, tail) or None when no top-level QUALIFY."""
    mask = _code_mask(sql)
    depths = _depths(sql, mask)
    quals = [
        m
        for m in _keyword_matches(sql, mask, r"\bQUALIFY\b")
        if depths[m.start()] == 0
    ]
    if not quals:
        return None
    m = quals[-1]
    froms = [
        f
        for f in _keyword_matches(sql, mask, r"\bFROM\b")
        if depths[f.start()] == 0 and f.start() < m.start()
    ]
    if not froms:
        return None
    from_pos = froms[-1].start()
    # predicate runs to the first top-level ORDER BY / LIMIT / OFFSET
    tails = [
        t
        for t in _keyword_matches(sql, mask, _QUALIFY_TAIL)
        if depths[t.start()] == 0 and t.start() > m.end()
    ]
    pred_end = tails[0].start() if tails else len(sql)
    return (
        sql[:from_pos].rstrip(),
        sql[from_pos : m.start()].rstrip(),
        sql[m.end() : pred_end].strip(),
        sql[pred_end:].strip(),
    )


def _rewrite_qualify(sql: str) -> str:
    """Primary QUALIFY rewrite: evaluate the predicate one layer OUT —
    the original query becomes a subquery, so select-list aliases are
    real columns the predicate's window functions may reference (Spark
    forbids lateral alias references inside window expressions).  DuckDB
    additionally lets the predicate reference non-projected base columns;
    that variant needs the predicate INSIDE the original select list —
    ``_rewrite_qualify_inject`` — which Engine.sql retries on analysis
    failure."""
    parts = _qualify_parts(sql)
    if parts is None:
        return sql
    head, body, pred, tail = parts
    rewritten = (
        f"SELECT * EXCEPT (__qualify) FROM ("
        f"SELECT *, ({pred}) AS __qualify FROM ({head} {body}) __qualify_inner"
        f") __qualify_sub WHERE __qualify"
    )
    if tail:
        rewritten += " " + tail
    return rewritten


def _rewrite_qualify_inject(sql: str) -> str:
    """Fallback QUALIFY rewrite: append the predicate to the original
    select list (base columns visible to its windows; lateral aliases NOT
    usable inside window frames — the complementary coverage)."""
    parts = _qualify_parts(sql)
    if parts is None:
        return sql
    head, body, pred, tail = parts
    rewritten = (
        f"SELECT * EXCEPT (__qualify) FROM ("
        f"{head}, ({pred}) AS __qualify {body}) __qualify_sub WHERE __qualify"
    )
    if tail:
        rewritten += " " + tail
    return rewritten


# ── ASOF JOIN → equi-join against a LEAD/LAG validity window ────────────
#
# DuckDB: ``FROM a ASOF [LEFT] JOIN b ON a.k = b.k AND a.ts >= b.ts`` —
# each left row matches the single right row with the LARGEST b.ts not
# exceeding a.ts (backward; ``<=``/``<`` are the forward mirror).  Spark
# has no ASOF syntax.  The rewrite wraps the right side in a subquery
# that adds the NEXT (or PREVIOUS) timestamp per key via LEAD/LAG, so
# "the closest match" becomes a plain range predicate::
#
#   JOIN (SELECT *, LEAD(ts) OVER (PARTITION BY k ORDER BY ts)
#           AS __asof_nxt FROM b_tbl) b
#     ON a.k = b.k AND a.ts >= b.ts
#    AND (a.ts < b.__asof_nxt OR b.__asof_nxt IS NULL)
#
# — the same single-shuffle formulation as the catalog's DataFrame as-of
# operator.  STRICTLY SCOPED: one top-level ASOF JOIN per statement, a
# named/quoted right table (no subquery), every ON term either
# ``<expr> = <expr>`` or the ONE inequality, and the right side of each
# term a simple ``alias.col``.  Anything else raises AsofRewriteError
# naming what's unsupported — never a silent wrong-results rewrite.

_ASOF_HELPER = "__asof_nxt"


class AsofRewriteError(ValueError):
    """An ASOF JOIN form this shim deliberately does not rewrite."""


_ASOF_KW = re.compile(r"\bASOF\s+(LEFT\s+)?JOIN\b", re.IGNORECASE)
_ASOF_RTABLE = re.compile(
    rf"\s*('(?:[^']|'')+'|{_IDENT})(?:\s+AS)?(?:\s+({_IDENT}))?\s+ON\b",
    re.IGNORECASE,
)
_ASOF_CLAUSE_END = re.compile(
    r"\b(WHERE|GROUP|ORDER|LIMIT|OFFSET|HAVING|QUALIFY|WINDOW|UNION|INTERSECT|EXCEPT"
    r"|JOIN|LEFT|RIGHT|FULL|INNER|CROSS|ASOF)\b",
    re.IGNORECASE,
)
_ASOF_INEQ = re.compile(r"(<=|>=|<|>)")


def _split_top_and(text: str) -> list[str]:
    mask = _code_mask(text)
    depths = _depths(text, mask)
    parts, last = [], 0
    for m in re.finditer(r"\bAND\b", text, re.IGNORECASE):
        if all(mask[i] for i in range(m.start(), m.end())) and depths[m.start()] == 0:
            parts.append(text[last : m.start()])
            last = m.end()
    parts.append(text[last:])
    return parts


def _rewrite_asof_join(sql: str) -> str:
    mask = _code_mask(sql)
    depths = _depths(sql, mask)
    hits = [
        m for m in _keyword_matches(sql, mask, _ASOF_KW.pattern) if depths[m.start()] == 0
    ]
    if not hits:
        return sql
    if len(hits) > 1:
        raise AsofRewriteError("multiple ASOF JOINs in one statement are not supported")
    m = hits[0]
    is_left = bool(m.group(1))

    tm = _ASOF_RTABLE.match(sql, m.end())
    if not tm:
        raise AsofRewriteError(
            "ASOF JOIN right side must be a named table or quoted path "
            "(subqueries are not supported)"
        )
    rtable = tm.group(1)
    ralias = tm.group(2) or (rtable if not rtable.startswith("'") else None)
    if ralias is None:
        raise AsofRewriteError("a quoted-path ASOF JOIN right side needs an alias")

    on_start = tm.end()
    end_m = next(
        (
            e
            for e in _keyword_matches(sql[on_start:], _code_mask(sql[on_start:]), _ASOF_CLAUSE_END.pattern)
            if _depths(sql[on_start:], _code_mask(sql[on_start:]))[e.start()] == 0
        ),
        None,
    )
    on_end = on_start + end_m.start() if end_m else len(sql)
    on_text = sql[on_start:on_end]

    qual = re.escape(ralias)
    rcol = re.compile(rf"^\s*{qual}\.({_IDENT})\s*$", re.IGNORECASE)
    eqs: list[tuple[str, str]] = []  # (other-side expr, b column)
    ineq = None  # (a_expr, op, b_col)
    for term in _split_top_and(on_text):
        tmask = _code_mask(term)
        ops = [
            o
            for o in re.finditer(r"(<=|>=|=|<|>)", term)
            if all(tmask[i] for i in range(o.start(), o.end()))
            and _depths(term, tmask)[o.start()] == 0
        ]
        if len(ops) != 1:
            raise AsofRewriteError(f"unsupported ASOF ON term: {term.strip()!r}")
        o = ops[0]
        lhs, op, rhs = term[: o.start()], o.group(1), term[o.end() :]
        lm, rm = rcol.match(lhs), rcol.match(rhs)
        if op == "=":
            if rm and not lm:
                eqs.append((lhs.strip(), rm.group(1)))
            elif lm and not rm:
                eqs.append((rhs.strip(), lm.group(1)))
            else:
                raise AsofRewriteError(
                    f"ASOF equality needs exactly one side as {ralias}.<col>: {term.strip()!r}"
                )
        else:
            if ineq is not None:
                raise AsofRewriteError("ASOF JOIN supports exactly one inequality")
            if rm and not lm:
                ineq = (lhs.strip(), op, rm.group(1))
            elif lm and not rm:
                flip = {">=": "<=", "<=": ">=", ">": "<", "<": ">"}
                ineq = (rhs.strip(), flip[op], lm.group(1))
            else:
                raise AsofRewriteError(
                    f"ASOF inequality needs exactly one side as {ralias}.<col>: {term.strip()!r}"
                )
    if ineq is None:
        raise AsofRewriteError("ASOF JOIN requires one inequality in ON")
    a_expr, op, b_ts = ineq

    backward = op in (">=", ">")  # match the largest b_ts at-or-before a
    helper_fn = "LEAD" if backward else "LAG"
    part = (
        f"PARTITION BY {', '.join(c for _, c in eqs)} " if eqs else ""
    )
    sub = (
        f"(SELECT *, {helper_fn}({b_ts}) OVER ({part}ORDER BY {b_ts}) "
        f"AS {_ASOF_HELPER} FROM {rtable}) {ralias}"
    )
    bound = {
        ">=": f"(({a_expr}) < {ralias}.{_ASOF_HELPER} OR {ralias}.{_ASOF_HELPER} IS NULL)",
        ">": f"(({a_expr}) <= {ralias}.{_ASOF_HELPER} OR {ralias}.{_ASOF_HELPER} IS NULL)",
        "<=": f"(({a_expr}) > {ralias}.{_ASOF_HELPER} OR {ralias}.{_ASOF_HELPER} IS NULL)",
        "<": f"(({a_expr}) >= {ralias}.{_ASOF_HELPER} OR {ralias}.{_ASOF_HELPER} IS NULL)",
    }[op]
    on_terms = [f"{other} = {ralias}.{c}" for other, c in eqs]
    on_terms.append(f"({a_expr}) {op} {ralias}.{b_ts}")
    on_terms.append(bound)
    join_kw = "LEFT JOIN" if is_left else "JOIN"
    rewritten = (
        sql[: m.start()] + f"{join_kw} {sub} ON " + " AND ".join(on_terms) + sql[on_end:]
    )

    # The helper column leaks through star projections (bare ``*`` or
    # ``ralias.*``) — wrap once and drop it.  Explicit select lists never
    # see it, and a ``*`` used as multiplication is preceded by an operand.
    smask = _code_mask(rewritten)
    from_m = next(
        (
            f
            for f in _keyword_matches(rewritten, smask, r"\bFROM\b")
            if _depths(rewritten, smask)[f.start()] == 0
        ),
        None,
    )
    leaks = False
    if from_m:
        select_list = rewritten[: from_m.start()]
        for i, ch in enumerate(select_list):
            if ch != "*" or not smask[i]:
                continue
            prev = select_list[:i].rstrip()
            if prev.upper().endswith("SELECT") or prev.endswith(","):
                leaks = True  # bare *
            elif prev.endswith("."):
                q = re.search(rf"({_IDENT})\.$", prev)
                if q and q.group(1).lower() == ralias.lower():
                    leaks = True
    if leaks:
        rewritten = f"SELECT * EXCEPT ({_ASOF_HELPER}) FROM ({rewritten}) __asof_q"
    return rewritten


# ── DuckDB function names Spark spells differently ──────────────────────
#
# Conservative, unambiguous 1:1 renames only (same argument order and
# semantics).  Deliberately NOT mapped: ``len`` (DuckDB uses it for both
# strings and lists; Spark splits that into length/size and the right
# target depends on the argument type), ``epoch`` (fractional-seconds
# semantics differ), ``list_aggregate`` (higher-order shim required).

_FN_MAP = {
    "string_split": "split",
    "str_split": "split",
    "string_split_regex": "split",
    "list_append": "array_append",
    # (list_prepend is a MACRO — DuckDB takes (elem, list), Spark
    # array_prepend takes (list, elem); a plain rename swaps the args)
    "list_value": "array",
    "list": "collect_list",
    "regexp_matches": "rlike",
    "epoch_ms": "unix_millis",
    "epoch_us": "unix_micros",
    "list_transform": "transform",
    "list_filter": "filter",
    # round 6: remaining unambiguous 1:1 list_*/array_* renames (same
    # argument order).  round 7: DuckDB list_extract returns NULL on
    # out-of-bounds/zero index; Spark element_at THROWS under ANSI mode
    # (the session default on Spark 4) — try_element_at is the 1-based,
    # negative-from-end, NULL-on-out-of-bounds equivalent.
    "list_extract": "try_element_at",
    "array_extract": "try_element_at",
    "list_element": "try_element_at",
    "list_reverse": "reverse",
    "list_min": "array_min",
    "list_max": "array_max",
    "list_intersect": "array_intersect",
    "list_has_any": "arrays_overlap",
    "array_has_any": "arrays_overlap",
    "list_pack": "array",
    # aggregates (string_agg/listagg/median are Spark-native already).
    # arg_min/arg_max are macros below: DuckDB skips rows whose ARGUMENT
    # is NULL, Spark min_by/max_by does not; the *_null variants map
    # straight through.
    "arg_min_null": "min_by",
    "arg_max_null": "max_by",
    "quantile_cont": "percentile",
    "str_split_regex": "split",
    # lists/strings
    "array_length": "size",
    "strlen": "octet_length",
    # round-7 parity sweep (tests/test_dialect.py::test_parity_sweep_*):
    # every entry pinned by an engine-vs-DuckDB differential
    "starts_with": "startswith",
    "ends_with": "endswith",
    "suffix": "endswith",
    "prefix": "startswith",
    "editdist3": "levenshtein",
    "iff": "if",
    "list_apply": "transform",
    "array_apply": "transform",
    "row": "struct",
    "ord": "ascii",  # DuckDB ord = unicode codepoint; Spark ascii matches
                     # (the unicode→ascii rename below is single-pass, so
                     # ord must map to the FINAL name)
    "strpos": "instr",
    "string_to_array": "split",
    "from_hex": "unhex",
    "unicode": "ascii",
    "to_hex": "hex",
    "today": "current_date",
    "week": "weekofyear",
    "list_position": "array_position",
    "list_indexof": "array_position",
    "array_indexof": "array_position",
    "list_zip": "arrays_zip",
    # wave-2 sweep
    "json_keys": "json_object_keys",
    "regexp_split_to_array": "split",
    "favg": "avg",
    "fsum": "sum",
    "kahan_sum": "sum",
    "sumkahan": "sum",
}

_FN_CALL = re.compile(
    r"\b(" + "|".join(_FN_MAP) + r")\s*\(", re.IGNORECASE
)


def _rewrite_function_names(sql: str) -> str:
    """Rename DuckDB-spelled function calls to their Spark equivalents.
    Only bare identifiers immediately followed by ``(`` are touched —
    qualified names (``schema.fn``) and quoted identifiers are left
    alone, and the code mask skips strings/comments."""
    mask = _code_mask(sql)
    repls: list[tuple[int, int, str]] = []
    for m in _FN_CALL.finditer(sql):
        s, e = m.start(1), m.end(1)
        if not all(mask[s:e]):
            continue
        prev = sql[s - 1] if s > 0 else ""
        if prev in ".@:":  # qualified / parameter reference
            continue
        repls.append((s, e, _FN_MAP[m.group(1).lower()]))
    for s, e, new in reversed(repls):
        sql = sql[:s] + new + sql[e:]
    return sql


# ── DuckDB list/array macros with no 1:1 Spark rename ───────────────────
#
# These expand into Spark expressions (argument text is spliced verbatim,
# so arbitrary sub-expressions work; an argument referenced twice is
# re-evaluated, which is semantically safe for the deterministic
# expressions involved).  The vector-math trio mirrors DuckDB's
# list_cosine_similarity / list_inner_product / list_distance family —
# the idioms an embeddings user hits first — built on zip_with/aggregate
# so they stay JVM-side.

_D = "CAST(0 AS DOUBLE)"


def _vec_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), "
        f"{_D}, (s, v) -> s + v)"
    )


def _vec_norm2(a: str) -> str:
    return f"aggregate({a}, {_D}, (s, v) -> s + CAST(v AS DOUBLE) * v)"


def _macro_cosine(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    a, b = (x.strip() for x in args)
    return (
        f"({_vec_dot(a, b)} / (sqrt({_vec_norm2(a)}) * sqrt({_vec_norm2(b)})))"
    )


def _macro_cosine_distance(args: list[str]) -> str | None:
    inner = _macro_cosine(args)
    return None if inner is None else f"(1 - {inner})"


def _macro_inner_product(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    a, b = (x.strip() for x in args)
    return _vec_dot(a, b)


def _macro_distance(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    a, b = (x.strip() for x in args)
    return (
        f"sqrt(aggregate(zip_with({a}, {b}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        f"{_D}, (s, v) -> s + v))"
    )


def _macro_list_unique(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    return f"size(array_distinct({args[0].strip()}))"


def _macro_list_has_all(args: list[str]) -> str | None:
    # list_has_all(l, sub): every element of sub present in l
    if len(args) != 2:
        return None
    l, sub = (x.strip() for x in args)
    return f"(size(array_except({sub}, {l})) = 0)"


_UINT = re.compile(r"^\s*(\d+)\s*$")

_NAMED_ARG = re.compile(r"^\s*([A-Za-z_][\w$]*)\s*:=\s*(.+)$", re.DOTALL)


def _macro_struct_pack(args: list[str]) -> str | None:
    # struct_pack(a := 1, b := x) → named_struct('a', 1, 'b', x)
    if not args:
        return None
    parts = []
    for a in args:
        m = _NAMED_ARG.match(a)
        if not m:
            return None
        parts.append(f"'{m.group(1)}', {m.group(2).strip()}")
    return "named_struct(" + ", ".join(parts) + ")"


def _macro_list_slice(args: list[str]) -> str | None:
    # DuckDB list_slice(l, begin, end): 1-based, INCLUSIVE end; Spark
    # slice(l, start, length).  Only rewritten for non-negative integer
    # literal bounds — DuckDB's negative-index/clamping rules diverge from
    # Spark's there, and a wrong answer is worse than Spark's own error.
    if len(args) != 3:
        return None
    ma, mb = _UINT.match(args[1]), _UINT.match(args[2])
    if not ma or not mb:
        return None
    a, b = int(ma.group(1)), int(mb.group(1))
    return f"slice({args[0].strip()}, {a}, {max(b - a + 1, 0)})"


def _list_nn(a: str) -> str:
    return f"filter(({a}), __x -> __x IS NOT NULL)"


def _list_sum_expr(a: str) -> str:
    # DOUBLE accumulator (an element-typed zero breaks on DECIMAL lists —
    # decimal addition widens the type per step and the lambda fails
    # analysis); display parity holds because the reference's JS
    # formatter prints 6.0 as 6 exactly like format_cell.  NULL elements
    # ignored (probed: list_sum([1, NULL, 2]) = 3); empty/NULL list →
    # NULL (probed).
    nn = _list_nn(a)
    return (
        f"IF(size({nn}) = 0, CAST(NULL AS DOUBLE), "
        f"aggregate({nn}, CAST(0 AS DOUBLE), (__acc, __x) -> __acc + __x))"
    )


def _macro_list_sum(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    return _list_sum_expr(args[0].strip())


def _macro_list_avg(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    a = args[0].strip()
    return f"({_list_sum_expr(a)} / size({_list_nn(a)}))"


def _macro_list_aggregate(args: list[str]) -> str | None:
    # literal aggregate names only — DuckDB dispatches dynamically, but
    # the common calls are literals and a wrong answer beats nothing
    if len(args) != 2:
        return None
    a = args[0].strip()
    name = re.fullmatch(r"\s*'(\w+)'\s*", args[1])
    if not name:
        return None
    fn = name.group(1).lower()
    if fn == "sum":
        return _list_sum_expr(a)
    if fn in ("avg", "mean"):
        return _macro_list_avg([a])
    if fn == "min":
        return f"array_min({a})"
    if fn == "max":
        return f"array_max({a})"
    if fn == "count":
        return f"size({_list_nn(a)})"
    return None


def _macro_list_reduce(args: list[str]) -> str | None:
    # DuckDB seeds with the first element and folds the rest (errors on
    # empty input; here an empty list yields NULL instead — documented)
    if len(args) != 2:
        return None
    a, lam = args[0].strip(), args[1].strip()
    return (
        f"aggregate(slice(({a}), 2, greatest(size(({a})) - 1, 0)), "
        f"try_element_at(({a}), 1), {lam})"
    )


# ── round-7 parity-sweep macros (each behavior probed on both engines) ──

_DATE_UNITS = frozenset(
    "year quarter month week day hour minute second".split()
)


def _unit_literal(arg: str) -> str | None:
    m = re.fullmatch(r"\s*'(\w+)'\s*", arg)
    if m and m.group(1).lower().rstrip("s") in _DATE_UNITS:
        return m.group(1).lower().rstrip("s")
    return None


def _macro_sha256(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    return f"sha2(({args[0].strip()}), 256)"


def _macro_to_base(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    return f"conv(({args[0].strip()}), 10, ({args[1].strip()}))"


def _macro_log10_single(args: list[str]) -> str | None:
    # DuckDB log(x) = log10; Spark log(x) = ln — silent wrong answer.
    # Two-arg log(base, x) agrees and passes through.
    if len(args) != 1:
        return None
    return f"log10({args[0].strip()})"


def _macro_trim2(args: list[str]) -> str | None:
    # DuckDB trim(s, chars) ≡ Spark btrim(s, chars) (same order)
    if len(args) != 2:
        return None
    return f"btrim(({args[0].strip()}), ({args[1].strip()}))"


def _trim_side(side: str):
    # DuckDB ltrim/rtrim(s, chars) — Spark's 2-arg spelling has the args
    # swapped, and emitting ltrim(...) from the ltrim macro would
    # re-match itself; the TRIM(LEADING/TRAILING x FROM s) form is
    # equivalent and stable under re-scanning.
    def macro(args: list[str]) -> str | None:
        if len(args) != 2:
            return None
        return f"TRIM({side} ({args[1].strip()}) FROM ({args[0].strip()}))"

    return macro


def _macro_dayname(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    return f"date_format(({args[0].strip()}), 'EEEE')"


def _macro_monthname(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    return f"date_format(({args[0].strip()}), 'MMMM')"


def _macro_isodow(args: list[str]) -> str | None:
    # DuckDB isodow: Monday=1..Sunday=7; Spark weekday: Monday=0
    if len(args) != 1:
        return None
    return f"(weekday(({args[0].strip()})) + 1)"


def _macro_yearweek(args: list[str]) -> str | None:
    # ISO week-year * 100 + ISO week (probed: yearweek('2021-01-01') =
    # 202053)
    if len(args) != 1:
        return None
    a = args[0].strip()
    return f"(extract(YEAROFWEEK FROM ({a})) * 100 + weekofyear(({a})))"


def _macro_date_diff(args: list[str]) -> str | None:
    # DuckDB date_diff counts UNIT BOUNDARIES crossed (probed:
    # date_diff('month', Jan 31, Feb 1) = 1) — truncate both ends, then
    # full-unit count.  Two-arg datediff is Spark-native and passes.
    if len(args) != 3:
        return None
    unit = _unit_literal(args[0])
    if unit is None:
        return None
    a, b = args[1].strip(), args[2].strip()
    u = unit.upper()
    return (
        f"timestampdiff({u}, date_trunc('{u}', ({a})), "
        f"date_trunc('{u}', ({b})))"
    )


def _macro_date_sub3(args: list[str]) -> str | None:
    # DuckDB date_sub counts FULL units (probed: date_sub('month',
    # Jan 31, Feb 1) = 0) = plain timestampdiff.  Two-arg date_sub is
    # Spark-native.
    if len(args) != 3:
        return None
    unit = _unit_literal(args[0])
    if unit is None:
        return None
    return (
        f"timestampdiff({unit.upper()}, ({args[1].strip()}), "
        f"({args[2].strip()}))"
    )



def _macro_trunc1(args: list[str]) -> str | None:
    # DuckDB single-arg trunc = toward zero; Spark trunc is date-only
    if len(args) != 1:
        return None
    a = args[0].strip()
    return f"IF(({a}) >= 0, floor(({a})), ceil(({a})))"


def _macro_isfinite(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    a = f"CAST(({args[0].strip()}) AS DOUBLE)"
    return f"(NOT isnan({a}) AND abs({a}) <> CAST('Infinity' AS DOUBLE))"


def _macro_isinf(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    a = f"CAST(({args[0].strip()}) AS DOUBLE)"
    return f"(abs({a}) = CAST('Infinity' AS DOUBLE))"


def _macro_list_prepend(args: list[str]) -> str | None:
    # DuckDB (elem, list) → Spark array_prepend(list, elem)
    if len(args) != 2:
        return None
    return f"array_prepend(({args[1].strip()}), ({args[0].strip()}))"


_DEC_LITERAL = re.compile(r"^[+-]?\d+\.\d+$")


def _macro_least_greatest_double(name):
    """DuckDB types least/greatest with ANY decimal argument as DOUBLE
    (probed: typeof(least(2.5, 1.5)) = DOUBLE, all-int = BIGINT), while
    Spark keeps DECIMAL — downstream typeof dispatch (int-cast rounding,
    //) then diverges (fuzz r8 seed 6749: (least(2.5, 3))::INT is 2 via
    half-even DOUBLE in DuckDB, was 3 via half-away DECIMAL here).
    Casting each top-level decimal-LITERAL argument to DOUBLE makes
    Spark's common type DOUBLE whenever the literal is what made
    DuckDB's; decimal COLUMNS without a literal stay a documented
    residual (#3 class).  Returns None when no literal matches, which
    also ends the fixpoint re-match."""

    def macro(args: list[str]) -> str | None:
        if len(args) < 2 or not any(
            _DEC_LITERAL.match(a.strip()) for a in args
        ):
            return None
        out = [
            f"CAST({a.strip()} AS DOUBLE)"
            if _DEC_LITERAL.match(a.strip())
            else a.strip()
            for a in args
        ]
        return f"{name}({', '.join(out)})"

    return macro


_IGNORE_NULLS_TAIL = re.compile(
    r"^(.*?)\s+(IGNORE|RESPECT)\s+NULLS\s*$", re.IGNORECASE | re.DOTALL
)


def _macro_ignore_nulls_inside(name):
    """DuckDB writes ``first_value(x IGNORE NULLS)`` INSIDE the call;
    Spark puts the modifier after it: ``first_value(x) IGNORE NULLS``
    (probed both).  Strips the tail from the last argument and re-emits
    it post-call; re-match finds no tail and stops the fixpoint."""

    def macro(args: list[str]) -> str | None:
        if not args:
            return None
        m = _IGNORE_NULLS_TAIL.match(args[-1].strip())
        if m is None:
            return None
        new_args = [a.strip() for a in args[:-1]] + [m.group(1).strip()]
        return f"{name}({', '.join(new_args)}) {m.group(2).upper()} NULLS"

    return macro


def _macro_product(args: list[str]) -> str | None:
    """DuckDB ``product(x)`` (DOUBLE aggregate).  Spark has no product
    aggregate; composed from sign/zero bookkeeping + exp(sum(ln)) —
    within the comparator's 1e-9 tolerance of DuckDB's sequential
    multiply for non-extreme magnitudes.  Also strips a DuckDB in-call
    ``ORDER BY`` first (product is order-insensitive up to fp rounding;
    r8 shipped this as a SECOND ``"product"`` dict key which silently
    shadowed the expansion — r9 fix, pinned by the duplicate-key test)."""
    if len(args) != 1:
        return None
    stripped = _strip_order_arg(args[0])
    x = (args[0] if stripped is None else stripped).strip()
    return (
        f"(CASE WHEN count(({x})) = 0 THEN CAST(NULL AS DOUBLE) "
        f"WHEN min(abs(({x}))) = 0 THEN 0.0d "
        f"ELSE (CASE WHEN pmod(sum(CASE WHEN ({x}) < 0 THEN 1 ELSE 0 END), 2) = 1 "
        f"THEN -1.0d ELSE 1.0d END) * exp(sum(ln(abs(CAST(({x}) AS DOUBLE))))) END)"
    )


def _one_arg(args):
    return args[0].strip() if len(args) == 1 else None


def _macro_century(args):
    a = _one_arg(args)
    # probed: century(2000-12-31) = 20, century(2001-01-01) = 21
    return None if a is None else f"CAST(ceil(year(({a})) / 100.0) AS BIGINT)"


def _macro_decade(args):
    a = _one_arg(args)
    return None if a is None else f"CAST(floor(year(({a})) / 10.0) AS BIGINT)"


def _macro_era(args):
    a = _one_arg(args)
    return None if a is None else f"(CASE WHEN year(({a})) > 0 THEN 1 ELSE 0 END)"


def _macro_yearweek(args):
    # probed: yearweek(1995-01-01) = 199452 (ISO year * 100 + ISO week)
    a = _one_arg(args)
    if a is None:
        return None
    return f"(extract(YEAROFWEEK FROM ({a})) * 100 + weekofyear(({a})))"


def _macro_julian(args):
    # probed: julian(1995-06-17) = 2449886.0, 12:30 adds 0.5208 —
    # i.e. unix days + 2440588 plus the time fraction
    a = _one_arg(args)
    if a is None:
        return None
    return (
        f"(CAST(unix_micros(CAST(({a}) AS TIMESTAMP)) AS DOUBLE) "
        f"/ 86400000000.0 + 2440588)"
    )


def _macro_to_interval(days_mult=None, slot=None):
    """DuckDB to_days/to_hours/… → Spark make_dt_interval, which the
    Python client renders as the same timedelta (probed: to_years(2) is
    720 days — DuckDB approximates years/months as 360/30 days when
    converting to timedelta)."""

    def macro(args):
        a = _one_arg(args)
        if a is None:
            return None
        if days_mult is not None:
            return f"make_dt_interval(({a}) * {days_mult})"
        z = ["0"] * slot + [f"({a})"]
        return f"make_dt_interval({', '.join(z)})"

    return macro


def _macro_jaccard(args):
    # probed: character-SET jaccard — jaccard('aab', 'ab') = 1.0
    if len(args) != 2:
        return None
    a, b = args[0].strip(), args[1].strip()
    sa = f"array_distinct(split(({a}), ''))"
    sb = f"array_distinct(split(({b}), ''))"
    return (
        f"(CAST(size(array_intersect({sa}, {sb})) AS DOUBLE) "
        f"/ size(array_union({sa}, {sb})))"
    )


def _macro_hamming(args):
    # positions that differ; DuckDB errors on unequal lengths — NULL here
    if len(args) != 2:
        return None
    a, b = args[0].strip(), args[1].strip()
    return (
        f"(CASE WHEN length(({a})) = length(({b})) THEN "
        f"size(filter(zip_with(split(({a}), ''), split(({b}), ''), "
        f"(x, y) -> x <> y), v -> v)) ELSE NULL END)"
    )


def _macro_parse_path(args):
    # probed: parse_path('/a/b/c.txt') = ['/', 'a', 'b', 'c.txt'];
    # relative paths have no leading '/' element
    a = _one_arg(args)
    if a is None:
        return None
    rest = f"filter(split(({a}), '/'), x -> x <> '')"
    return (
        f"(CASE WHEN substr(({a}), 1, 1) = '/' "
        f"THEN flatten(array(array('/'), {rest})) ELSE {rest} END)"
    )


def _macro_parse_dirname(args):
    # probed: FIRST path component ('/' for absolute, 'a' for 'a/b/c')
    if len(args) not in (1, 2):
        return None
    a = args[0].strip()
    return (
        f"(CASE WHEN substr(({a}), 1, 1) = '/' THEN '/' "
        f"ELSE try_element_at(filter(split(({a}), '/'), x -> x <> ''), 1) END)"
    )


def _macro_parse_filename(args):
    # probed: last component; optional trim_extension arg
    if len(args) not in (1, 2):
        return None
    a = args[0].strip()
    base = f"try_element_at(filter(split(({a}), '/'), x -> x <> ''), -1)"
    trim = args[1].strip().lower() if len(args) == 2 else "false"
    if trim in ("true", "1"):
        # 4-arg position form: exempt from the first-only rewrite
        return f"regexp_replace({base}, '\\\\.[^.]*$', '', 1)"
    if trim in ("false", "0"):
        return base
    return None


_ACCENTS_FROM = (
    "\u00c0\u00c1\u00c2\u00c3\u00c4\u00c5\u00e0\u00e1\u00e2\u00e3\u00e4\u00e5"
    "\u00c8\u00c9\u00ca\u00cb\u00e8\u00e9\u00ea\u00eb"
    "\u00cc\u00cd\u00ce\u00cf\u00ec\u00ed\u00ee\u00ef"
    "\u00d2\u00d3\u00d4\u00d5\u00d6\u00f2\u00f3\u00f4\u00f5\u00f6"
    "\u00d9\u00da\u00db\u00dc\u00f9\u00fa\u00fb\u00fc"
    "\u00dd\u00fd\u00ff\u00d1\u00f1\u00c7\u00e7"
)
_ACCENTS_TO = "AAAAAAaaaaaaEEEEeeeeIIIIiiiiOOOOOoooooUUUUuuuuYyyNnCc"


def _macro_strip_accents(args):
    """Latin-1 accent folding via translate (probed: 'AEIou N c' for
    mixed input).  DuckDB does full Unicode NFD stripping; characters
    outside the curated Latin-1 map pass through unchanged here —
    a documented partial-coverage residual."""
    a = _one_arg(args)
    if a is None:
        return None
    return f"translate(({a}), '{_ACCENTS_FROM}', '{_ACCENTS_TO}')"


def _macro_date_add_interval(args):
    # DuckDB date_add(date, INTERVAL) returns a TIMESTAMP (probed);
    # Spark's 2-arg date_add is (date, int_days) — only the INTERVAL
    # form is rewritten
    if len(args) != 2:
        return None
    if not re.search(r"\bINTERVAL\b", args[1], re.IGNORECASE):
        return None
    return f"(CAST(({args[0].strip()}) AS TIMESTAMP) + ({args[1].strip()}))"


def _macro_struct_insert(args):
    """``struct_insert({'a': 1}, b := 2)`` extends a struct — textual
    splice when the base is a (brace-rewritten) named_struct literal;
    column bases would need the schema and are left to error."""
    if len(args) < 2:
        return None
    base = args[0].strip()
    if not re.fullmatch(r"named_struct\s*\(.*\)", base, re.IGNORECASE | re.DOTALL):
        return None
    inner = base[base.index("(") + 1 : -1].strip()
    parts = [inner] if inner else []
    for kw in args[1:]:
        m = re.fullmatch(r"\s*([A-Za-z_]\w*)\s*:=\s*(.+)\s*", kw, re.DOTALL)
        if m is None:
            return None
        parts.append(f"'{m.group(1)}', {m.group(2).strip()}")
    return f"named_struct({', '.join(parts)})"


def _macro_list_bool(fn_name):
    # list_bool_or/list_bool_and skip NULL elements; empty/all-NULL → NULL
    def macro(args):
        a = _one_arg(args)
        if a is None:
            return None
        agg = "array_max" if fn_name == "or" else "array_min"
        return f"{agg}(filter(({a}), x -> x IS NOT NULL))"

    return macro


def _macro_list_grade_up(args):
    # probed: list_grade_up([3,1,2]) = [2,3,1] — the sorting permutation;
    # struct sort orders by value then original index (stable ties)
    a = _one_arg(args)
    if a is None:
        return None
    return (
        f"transform(array_sort(zip_with(({a}), sequence(1, size(({a}))), "
        f"(v, i) -> named_struct('v', v, 'i', i))), s -> s.i)"
    )


def _macro_list_select(args):
    # elements at the given 1-based indexes, in index order
    if len(args) != 2:
        return None
    l, idx = args[0].strip(), args[1].strip()
    return f"transform(({idx}), __k -> try_element_at(({l}), __k))"


def _macro_list_where(args):
    # elements whose mask entry is true (NULL mask drops the element)
    if len(args) != 2:
        return None
    l, msk = args[0].strip(), args[1].strip()
    return (
        f"transform(filter(sequence(1, size(({l}))), "
        f"__k -> try_element_at(({msk}), __k)), "
        f"__k -> try_element_at(({l}), __k))"
    )


def _macro_list_sort(args: list[str]) -> str | None:
    """DuckDB ``list_sort`` places NULLs LAST in both directions (probed:
    ``list_sort([NULL, 2, -1, -1])`` → [-1, -1, 2, NULL]; 'DESC' →
    [2, NULL]); Spark ``sort_array`` ascending puts NULLs FIRST (fuzz r8
    seed 6698), while ``array_sort`` ascending and ``sort_array(_,
    false)`` descending both match.  Direction forms beyond a literal
    ASC/DESC are left untouched so Spark's error names them."""
    a = args[0].strip()
    if len(args) == 1:
        return f"array_sort(({a}))"
    if len(args) == 2:
        d = args[1].strip().strip("'").lower()
        if d == "desc":
            return f"sort_array(({a}), false)"
        if d == "asc":
            return f"array_sort(({a}))"
    return None


def _macro_array_sort_direction(args: list[str]) -> str | None:
    # Spark's own 1-arg array_sort already sorts NULLS LAST — rewriting
    # it would re-trigger this macro every fixpoint pass (trap 27); only
    # DuckDB's 2-arg direction form needs translating.
    if len(args) == 2:
        return _macro_list_sort(args)
    return None


def _macro_list_reverse_sort(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    return f"sort_array(({args[0].strip()}), false)"


def _macro_list_any_value(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    return f"try_element_at({_list_nn(args[0].strip())}, 1)"


def _macro_list_count(args: list[str]) -> str | None:
    # probed: list_count([1, NULL, 2]) = 2 — non-NULL elements
    if len(args) != 1:
        return None
    return f"size({_list_nn(args[0].strip())})"


def _macro_scalar_series(fn: str):
    # scalar-position range()/generate_series() return a LIST in DuckDB;
    # FROM-position calls were already consumed by the series-TVF pass,
    # so anything left is scalar
    def macro(args: list[str]) -> str | None:
        return _series_body(fn, [a.strip() for a in args])

    return macro


# ── wave-2 sweep macros: aggregates, JSON, regex, structs ───────────────


def _macro_string_agg_ordered(args: list[str]) -> str | None:
    # DuckDB string_agg(x, sep ORDER BY k) — Spark spells the ordered
    # form listagg(x, sep) WITHIN GROUP (ORDER BY k); the plain 2-arg
    # string_agg is Spark-native and passes through (macro → None).
    # A DISTINCT prefix carries over (Spark listagg accepts it — probed
    # r8; parenthesizing '(DISTINCT x)' would break the parse).
    if len(args) != 2:
        return None
    m = re.search(r"\bORDER\s+BY\b", args[1], re.IGNORECASE)
    if not m:
        return None
    sep = args[1][: m.start()].strip()
    order = args[1][m.end() :].strip()
    val = args[0].strip()
    dm = re.match(r"DISTINCT\s+(.+)$", val, re.IGNORECASE | re.DOTALL)
    val = f"DISTINCT ({dm.group(1)})" if dm else f"({val})"
    return (
        f"listagg({val}, ({sep})) "
        f"WITHIN GROUP (ORDER BY {order})"
    )


def _strip_order_arg(arg: str) -> str | None:
    """If ``arg`` carries a top-level in-aggregate ``ORDER BY`` clause,
    return the argument with the clause removed; else None."""
    mask = _code_mask(arg)
    depths = _depths(arg, mask)
    for m in re.finditer(r"\bORDER\s+BY\b", arg, re.IGNORECASE):
        # only a TOP-LEVEL code ORDER BY is the in-aggregate clause —
        # one inside a string literal or a nested subquery is not
        if not all(mask[i] for i in range(m.start(), m.end())):
            continue
        if depths[m.start()] != 0:
            continue
        head = arg[: m.start()].strip()
        if head:
            return head
    return None


def _strip_agg_order(fn: str):
    """DuckDB permits ``ORDER BY`` inside ANY aggregate call and ignores
    it for order-insensitive aggregates (count/sum/min/max/...); Spark
    rejects the clause — strip it (r8 probe:
    ``count(DISTINCT s ORDER BY s)``)."""

    def macro(args: list[str]) -> str | None:
        if len(args) != 1:
            return None
        head = _strip_order_arg(args[0])
        return None if head is None else f"{fn}({head})"

    return macro


def _macro_avg_double(args: list[str]) -> str | None:
    """DuckDB ``avg`` ALWAYS returns DOUBLE (probed: typeof(avg(decimal))
    = DOUBLE) while Spark's decimal ``avg`` keeps decimal(p+4, s+4) —
    rounding the result at scale+4, a visible ~1e-5 divergence (fuzz seed
    1223).  Cast the ARGUMENT to DOUBLE so the whole accumulation runs in
    double like DuckDB's.  Self-guarded against re-expansion (trap: a
    macro whose output contains its own name must detect itself)."""
    if len(args) != 1:
        return None
    a = args[0].strip()
    om = _AGG_ORDER_KEY.match(a)
    if om and om.group(1).strip():
        # in-aggregate ORDER BY is a no-op for avg (DuckDB ignores it)
        a = om.group(1).strip()
    up = a.upper()
    if up.startswith("CAST(") and up.rstrip().endswith("AS DOUBLE)"):
        return None
    if up.startswith("DISTINCT "):
        return f"avg(DISTINCT CAST({a[9:]} AS DOUBLE))"
    return f"avg(CAST({a} AS DOUBLE))"


def _macro_quantile_disc(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    return (
        f"percentile_disc(({args[1].strip()})) "
        f"WITHIN GROUP (ORDER BY ({args[0].strip()}))"
    )


_SAMPLE_MOMENT = re.compile(r"\b(skewness|kurtosis)\s*\(", re.IGNORECASE)


def _rewrite_sample_moments(sql: str) -> str:
    """DuckDB reports SAMPLE skewness/kurtosis; Spark the population
    forms.  One right-to-left pass (NOT the fixpoint macro table — the
    corrections contain the same function name and would re-expand):
    g1·√(n(n−1))/(n−2) and G2 = (n−1)/((n−2)(n−3))·((n+1)·g2+6), both
    verified numerically on {1,2,9,3} against the two engines.  A call
    followed by OVER keeps Spark's population reading (the correction
    needs count() in the same aggregation context)."""
    if not _SAMPLE_MOMENT.search(sql):
        return sql
    mask = _code_mask(sql)
    repls: list[tuple[int, int, str]] = []
    for m in _SAMPLE_MOMENT.finditer(sql):
        if not all(mask[i] for i in range(m.start(), m.end())):
            continue
        prev = sql[m.start() - 1] if m.start() > 0 else ""
        if prev in ".@:":
            continue
        parsed = _split_call_args(sql, mask, m.end() - 1)
        if parsed is None or len(parsed[0]) != 1:
            continue
        args, close = parsed
        after = sql[close + 1 :].lstrip()
        if re.match(r"OVER\b", after, re.IGNORECASE):
            continue
        fn = m.group(1).lower()
        out = (
            _macro_skewness(args) if fn == "skewness" else _macro_kurtosis(args)
        )
        if out is not None:
            repls.append((m.start(), close + 1, out))
    for s_, e_, rep in reversed(repls):
        sql = sql[:s_] + rep + sql[e_:]
    return sql


def _macro_skewness(args: list[str]) -> str | None:
    # DuckDB reports SAMPLE skewness; Spark the population g1.  The
    # correction g1·√(n(n−1))/(n−2) was verified numerically against
    # both engines (0.9794 → 1.6964 on {1,2,9,3}).
    if len(args) != 1:
        return None
    a = args[0].strip()
    return (
        f"(skewness(({a})) * sqrt(count(({a})) * (count(({a})) - 1.0)) "
        f"/ (count(({a})) - 2.0))"
    )


def _macro_kurtosis(args: list[str]) -> str | None:
    # DuckDB: sample excess kurtosis G2 = (n−1)/((n−2)(n−3)) ·
    # ((n+1)·g2 + 6) over Spark's population excess g2 (verified:
    # −0.7981 → 3.0144 on {1,2,9,3}).
    if len(args) != 1:
        return None
    a = args[0].strip()
    n = f"count(({a}))"
    return (
        f"(({n} - 1.0) / (({n} - 2.0) * ({n} - 3.0)) "
        f"* (({n} + 1.0) * kurtosis(({a})) + 6.0))"
    )


def _macro_struct_extract(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    nm = re.fullmatch(r"\s*'(\w+)'\s*", args[1])
    if not nm:
        return None
    return f"(({args[0].strip()}).`{nm.group(1)}`)"


def _json_path_literal(arg: str) -> str | None:
    p = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", arg)
    if p is None:
        return None
    path = p.group(1)
    if not path.startswith("$") and re.fullmatch(r"\w+", path):
        path = "$." + path
    return path


def _macro_json_extract(args: list[str]) -> str | None:
    # → get_json_object.  Documented divergence: DuckDB json_extract
    # keeps JSON quoting on string values ('"x"'); get_json_object
    # unquotes — the ->>/json_extract_string reading, which is what
    # downstream string processing wants.
    if len(args) != 2:
        return None
    path = _json_path_literal(args[1])
    if path is not None:
        return f"get_json_object(({args[0].strip()}), '{path}')"
    return f"get_json_object(({args[0].strip()}), ({args[1].strip()}))"


def _macro_json_valid(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    return f"(get_json_object(({args[0].strip()}), '$') IS NOT NULL)"


def _pattern_group_index(pat_literal: str, name: str) -> int | None:
    """1-based index of capturing group ``name`` in a literal pattern
    (both ``(?P<name>`` and ``(?<name>`` spellings)."""
    idx = 0
    i = 0
    n = len(pat_literal)
    while i < n:
        c = pat_literal[i]
        if c == "\\":
            i += 2
            continue
        if c == "(":
            nxt = pat_literal[i + 1 : i + 2]
            if nxt != "?":
                idx += 1
            else:
                m = re.match(r"\(\?P?<([A-Za-z_]\w*)>", pat_literal[i:])
                if m:
                    idx += 1
                    if m.group(1) == name:
                        return idx
        i += 1
    return None


def _java_named_groups(pat: str) -> str:
    # Java regex uses (?<name>...); DuckDB accepts Python's (?P<name>...)
    return pat.replace("(?P<", "(?<")


def _macro_regexp_extract2(args: list[str]) -> str | None:
    # DuckDB's 2-arg default is group 0 (whole match); Spark's is
    # group 1 — make group 0 explicit.  A 3rd-arg group NAME resolves to
    # its index in a literal pattern; a LIST of names returns a struct
    # of the named groups (probed: regexp_extract(s, p, ['a','b']) →
    # {'a': ..., 'b': ...}).
    if len(args) == 2:
        return (
            f"regexp_extract(({args[0].strip()}), ({args[1].strip()}), 0)"
        )
    if len(args) != 3:
        return None
    sarg, parg, g = args[0].strip(), args[1].strip(), args[2].strip()
    pl = re.fullmatch(r"'((?:[^']|'')*)'", parg)
    nm = re.fullmatch(r"'([A-Za-z_]\w*)'", g)
    if nm and pl:
        idx = _pattern_group_index(pl.group(1), nm.group(1))
        if idx is None:
            return None
        return (
            f"regexp_extract(({sarg}), '{_java_named_groups(pl.group(1))}', {idx})"
        )
    # the bracket pass has already turned ['a', 'b'] into array('a', 'b');
    # list names label the pattern's capture groups POSITIONALLY (probed:
    # group 1 → first name)
    lst = re.fullmatch(r"(?:\[[^\]]*\]|array\s*\([^)]*\))", g, re.IGNORECASE)
    if lst and pl:
        names = re.findall(r"'([A-Za-z_]\w*)'", g)
        if not names:
            return None
        jp = _java_named_groups(pl.group(1))
        parts = [
            f"'{name}', regexp_extract(({sarg}), '{jp}', {i})"
            for i, name in enumerate(names, start=1)
        ]
        return f"named_struct({', '.join(parts)})"
    return None


def _macro_regexp_matches_flags(args: list[str]) -> str | None:
    # 3-arg regexp_matches: inline literal flags into the pattern
    if len(args) != 3:
        return None
    fl = re.fullmatch(r"\s*'([a-z]*)'\s*", args[2])
    if not fl:
        return None
    # m/n/p (newline-sensitive) are the RE2/Java default — no-ops (r9 probe)
    flags = set(fl.group(1)) - {"c", "g", "m", "n", "p"}
    if not flags <= {"i", "s"}:
        return None
    p = _inline_regex_flags(args[1].strip(), flags)
    if p is None:
        return None
    return f"rlike(({args[0].strip()}), {p})"


def _macro_even(args):
    # probed: rounds AWAY from zero to the next even (2.5→4, -3→-4,
    # 2→2); always DOUBLE
    a = _one_arg(args)
    if a is None:
        return None
    return (
        f"(CASE WHEN ({a}) < 0 THEN -2.0d * ceil(abs(CAST(({a}) AS DOUBLE)) / 2.0) "
        f"ELSE 2.0d * ceil(CAST(({a}) AS DOUBLE) / 2.0) END)"
    )


def _macro_gcd(args):
    # Spark has no gcd: largest k in 1..min(|a|,|b|) dividing both via a
    # sequence scan — fine for the value ranges dialect queries use;
    # gcd(0, x) = |x| (probed)
    if len(args) != 2:
        return None
    a, b = args[0].strip(), args[1].strip()
    scan = (
        f"array_max(filter(sequence(1, greatest(least(abs(({a})), abs(({b}))), 1)), "
        f"k -> abs(({a})) % k = 0 AND abs(({b})) % k = 0))"
    )
    return (
        f"(CASE WHEN ({a}) = 0 THEN abs(({b})) "
        f"WHEN ({b}) = 0 THEN abs(({a})) ELSE {scan} END)"
    )


def _macro_lcm(args):
    if len(args) != 2:
        return None
    a, b = args[0].strip(), args[1].strip()
    g = _macro_gcd(args)
    # token-free division (no DIV/'/'): the divmod pass would otherwise
    # rewrite an emitted DIV into the DOUBLE-surfaced dispatch, where
    # DuckDB types lcm BIGINT; the division is exact by construction
    # NULL propagates BEFORE the zero rule (probed: lcm(0, NULL) is
    # NULL, not 0 — fuzz r8 seed 31308)
    return (
        f"(CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN CAST(NULL AS BIGINT) "
        f"WHEN ({a}) = 0 OR ({b}) = 0 THEN 0 "
        f"ELSE CAST(try_divide(abs(({a}) * ({b})), {g}) AS BIGINT) END)"
    )


def _macro_xor(args):
    if len(args) != 2:
        return None
    return f"(({args[0].strip()}) ^ ({args[1].strip()}))"


def _macro_signbit(args):
    # -0.0 renders with a leading '-' in Spark's string cast; NaN and
    # positives don't (probed DuckDB: signbit(-0.0) true, nan false)
    a = _one_arg(args)
    if a is None:
        return None
    return f"startswith(CAST(CAST(({a}) AS DOUBLE) AS STRING), '-')"


# Lanczos g=7 n=9 approximation of the gamma function — ~1e-13 relative,
# well inside the 1e-9 comparator tolerance.
_LANCZOS = [
    "0.99999999999980993", "676.5203681218851", "-1259.1392167224028",
    "771.32342877765313", "-176.61502916214059", "12.507343278686905",
    "-0.13857109526572012", "9.9843695780195716e-6", "1.5056327351493116e-7",
]


def _lanczos_ag(z: str) -> str:
    terms = [_LANCZOS[0]] + [
        f"{c} / ({z} + {i - 1})" for i, c in enumerate(_LANCZOS[1:], start=1)
    ]
    return "(" + " + ".join(terms) + ")"


def _lngamma_pos(z: str) -> str:
    # valid for z >= 0.5: lnGamma = .5 ln(2pi) + (z-.5) ln t - t + ln Ag,
    # t = z + 6.5
    t = f"(({z}) + 6.5)"
    return (
        f"(0.9189385332046727d + (({z}) - 0.5) * ln({t}) - {t} "
        f"+ ln({_lanczos_ag(f'({z})')}))"
    )


def _macro_lgamma(args):
    a = _one_arg(args)
    if a is None:
        return None
    z = f"CAST(({a}) AS DOUBLE)"
    refl = (
        f"(1.1447298858494002d - ln(abs(sin(3.141592653589793d * {z}))) "
        f"- {_lngamma_pos(f'(1.0d - {z})')})"
    )
    return (
        f"(CASE WHEN {z} >= 0.5 THEN {_lngamma_pos(z)} ELSE {refl} END)"
    )


def _macro_gamma(args):
    a = _one_arg(args)
    if a is None:
        return None
    z = f"CAST(({a}) AS DOUBLE)"
    pos = f"exp({_lngamma_pos(z)})"
    refl = (
        f"(3.141592653589793d / (sin(3.141592653589793d * {z}) "
        f"* exp({_lngamma_pos(f'(1.0d - {z})')})))"
    )
    # integer inputs: DuckDB's tgamma is exact ((n-1)!) while the
    # Lanczos exp path drifts in the last ulps — factorial fits BIGINT
    # through gamma(21) = 20!
    exact = f"CAST(factorial(CAST({z} AS INT) - 1) AS DOUBLE)"
    return (
        f"(CASE WHEN {z} = floor({z}) AND {z} >= 1.0d AND {z} <= 21.0d "
        f"THEN {exact} WHEN {z} >= 0.5 THEN {pos} ELSE {refl} END)"
    )


def _macro_arg_minmax(which: str):
    # DuckDB arg_min/arg_max SKIP rows whose ARGUMENT is NULL (probed:
    # arg_min(x, y) over {(1,5), (NULL,1)} is 1); Spark min_by/max_by
    # return the argument at the extremal key even when NULL.  The
    # FILTER form restores DuckDB's reading — and composes with windows
    # through the window-FILTER rewrite pass.
    def m(args):
        if len(args) != 2:
            return None
        a, v = args[0].strip(), args[1].strip()
        return f"({which}(({a}), ({v})) FILTER (WHERE ({a}) IS NOT NULL))"

    return m


def _macro_fdiv(args):
    # DuckDB fdiv = floor division, always DOUBLE, NULL on zero divisor
    if len(args) != 2:
        return None
    x, y = args[0].strip(), args[1].strip()
    return f"floor(try_divide(CAST(({x}) AS DOUBLE), ({y})))"


def _macro_fmod(args):
    # DuckDB fmod(x, y) = x - y*floor(x/y) (probed: fmod(-7.5, 2) = 0.5)
    if len(args) != 2:
        return None
    x, y = args[0].strip(), args[1].strip()
    return (
        f"(CAST(({x}) AS DOUBLE) - ({y}) * "
        f"floor(try_divide(CAST(({x}) AS DOUBLE), ({y}))))"
    )


def _macro_kahan_sum(args):
    # DuckDB kahan_sum returns DOUBLE (compensated); Spark double sum
    # is within the 1e-9 comparator everywhere the engine is used
    a = _one_arg(args)
    return None if a is None else f"sum(CAST(({a}) AS DOUBLE))"


def _macro_current_schema(args):
    return "'main'" if args in ([], [""]) or not any(a.strip() for a in args) else None


def _macro_current_database(args):
    return "'memory'" if not any(a.strip() for a in args) else None


def _macro_list_resize(args):
    # DuckDB list_resize(l, n[, fill]): truncate to n or right-pad with
    # fill (default NULL).  try_element_at(l, size+1) manufactures a
    # correctly-typed NULL without knowing the element type.
    if len(args) not in (2, 3):
        return None
    l, n = args[0].strip(), args[1].strip()
    fill = (
        args[2].strip()
        if len(args) == 3
        else f"try_element_at(({l}), CAST(size(({l})) + 1 AS INT))"
    )
    # flatten(array(..)) not concat(..): the skip-NULLs concat pass
    # would stringify the arrays (trap 31 / fixed bug #8)
    return (
        f"(CASE WHEN ({n}) <= size(({l})) "
        f"THEN slice(({l}), 1, greatest(({n}), 0)) "
        f"ELSE flatten(array(({l}), "
        f"array_repeat({fill}, ({n}) - size(({l}))))) END)"
    )


def _format_bytes_scaled(v: str, k: int, unit: str, base: int = 1024) -> str:
    # one decimal, TRUNCATED toward zero (probed: 1945 → '1.8 KiB').
    # Token-free arithmetic: emitted ``div``/``/``/plain BIGINT casts
    # would be re-rewritten by the divmod / int-cast passes (trap 31);
    # CAST(try_divide(..) AS BIGINT) is the exempted truncating shape.
    t = (
        f"CAST(try_divide(CAST(({v}) AS DOUBLE) * 10.0d, "
        f"{float(base ** k)!r}d) AS BIGINT)"
    )
    ip = f"CAST(try_divide({t}, 10) AS BIGINT)"
    fr = f"try_mod(abs({t}), 10)"
    return (
        f"concat(CAST({ip} AS STRING), '.', "
        f"CAST({fr} AS STRING), ' {unit}')"
    )


def _macro_format_bytes(args):
    # DuckDB format_bytes: binary units, '1 byte' singular, one decimal
    # truncated, capped at PiB (probed: 2^60 → '1024.0 PiB')
    v = _one_arg(args)
    if v is None:
        return None
    ladder = []
    units = ["KiB", "MiB", "GiB", "TiB"]
    for i, unit in enumerate(units, start=1):
        ladder.append(
            f"WHEN abs(({v})) < {1024 ** (i + 1)} "
            f"THEN {_format_bytes_scaled(v, i, unit)}"
        )
    return (
        f"(CASE WHEN ({v}) IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN ({v}) = 1 THEN '1 byte' "
        f"WHEN abs(({v})) < 1024 THEN concat(CAST(({v}) AS STRING), ' bytes') "
        + " ".join(ladder)
        + f" ELSE {_format_bytes_scaled(v, 5, 'PiB')} END)"
    )


def _macro_format_decimal_bytes(args):
    # formatReadableDecimalSize: same scheme at base 1000 with kB..PB
    # (probed: 1990000 → '1.9 MB' — truncated, lowercase k)
    v = _one_arg(args)
    if v is None:
        return None
    ladder = []
    for i, unit in enumerate(["kB", "MB", "GB", "TB"], start=1):
        ladder.append(
            f"WHEN abs(({v})) < {1000 ** (i + 1)} "
            f"THEN {_format_bytes_scaled(v, i, unit, base=1000)}"
        )
    return (
        f"(CASE WHEN ({v}) IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN ({v}) = 1 THEN '1 byte' "
        f"WHEN abs(({v})) < 1000 THEN concat(CAST(({v}) AS STRING), ' bytes') "
        + " ".join(ladder)
        + f" ELSE {_format_bytes_scaled(v, 5, 'PB', base=1000)} END)"
    )


def _histogram_sql(x: str) -> str:
    """RLE fold over the sorted value list → DuckDB's key-ordered MAP.
    The accumulator's list fields are typed from the input itself
    (``slice(L, 1, 0)``) so no element-type spelling is needed; fold
    lambdas touch only the accumulator and element, keeping aggregates
    out of lambda bodies (Spark rejects those)."""
    L = f"array_sort(collect_list(({x})))"
    acc0 = (
        f"named_struct('ks', slice({L}, 1, 0), "
        f"'cs', CAST(array() AS ARRAY<BIGINT>), "
        f"'pv', try_element_at({L}, 1), 'ct', CAST(0 AS BIGINT))"
    )
    # flatten(array(..)), never concat(..): the skip-NULLs concat pass
    # would stringify the arrays (trap 31 / fixed bug #8)
    step = (
        "(a, e) -> CASE "
        "WHEN a.ct > 0 AND a.pv = e THEN "
        "named_struct('ks', a.ks, 'cs', a.cs, 'pv', a.pv, 'ct', a.ct + 1) "
        "WHEN a.ct > 0 THEN "
        "named_struct('ks', flatten(array(a.ks, array(a.pv))), "
        "'cs', flatten(array(a.cs, array(a.ct))), "
        "'pv', e, 'ct', CAST(1 AS BIGINT)) "
        "ELSE named_struct('ks', a.ks, 'cs', a.cs, 'pv', e, "
        "'ct', CAST(1 AS BIGINT)) END"
    )
    fin = (
        "a -> map_from_arrays(flatten(array(a.ks, array(a.pv))), "
        "flatten(array(a.cs, array(a.ct))))"
    )
    return (
        f"(CASE WHEN size({L}) = 0 THEN NULL "
        f"ELSE aggregate({L}, {acc0}, {step}, {fin}) END)"
    )


def _macro_histogram(args):
    a = _one_arg(args)
    return None if a is None else _histogram_sql(a)


def _macro_entropy(args):
    # Shannon entropy (log2) over value frequencies, NULLs ignored,
    # 0.0 when no non-NULL rows (probed)
    a = _one_arg(args)
    if a is None:
        return None
    hist = _histogram_sql(a)
    n = f"size(collect_list(({a})))"
    return (
        f"(CASE WHEN {n} = 0 THEN 0.0d ELSE "
        f"aggregate(map_values({hist}), CAST(0 AS DOUBLE), "
        f"(acc, c) -> acc + try_divide(CAST(c AS DOUBLE), {n}) "
        f"* log2(try_divide(CAST({n} AS DOUBLE), c))) END)"
    )


def _macro_epoch_ns(args):
    # DuckDB epoch_ns → BIGINT nanoseconds (probed); Spark has only
    # unix_micros — timestamps carry microsecond precision, so *1000
    # is exact
    a = _one_arg(args)
    return None if a is None else f"(unix_micros(({a})) * CAST(1000 AS BIGINT))"


def _macro_encode1(args):
    a = _one_arg(args)
    return None if a is None else f"encode(({a}), 'UTF-8')"


def _macro_decode1(args):
    a = _one_arg(args)
    return None if a is None else f"decode(({a}), 'UTF-8')"


def _macro_regexp_extract_all2(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    return (
        f"regexp_extract_all(({args[0].strip()}), ({args[1].strip()}), 0)"
    )


def _conv_backrefs(rep: str) -> str:
    """DuckDB replacement backrefs are ``\\1``; Java/Spark's are ``$1``.
    At macro time the literal has already been backslash-doubled by the
    raw-string pass, so ``\\\\N`` becomes ``$N`` (literal reps only).
    A pre-existing ``$`` in the replacement is LITERAL in RE2 but a
    group ref (or error) for Java — escape it first."""
    m = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", rep)
    if not m:
        return rep.strip()
    body = m.group(1).replace("$", "\\\\$")
    body = re.sub(r"\\\\(\d)", r"$\1", body)
    return f"'{body}'"


def _replace_first_emit(s: str, p: str, r: str) -> str:
    """DuckDB's UNFLAGGED regexp_replace replaces only the FIRST match
    (probed: ``regexp_replace('xaxa', 'a', 'B')`` → 'xBxa'); Spark
    always replaces all.  Splice around the first match:

    - the match POSITION comes from ``regexp_instr`` — r8 used
      ``locate(match_text, s)``, i.e. the first LITERAL occurrence of
      the matched text, which is provably the match position for
      context-free patterns but WRONG for position-dependent ones
      (``regexp_replace('banana','a$','X')`` gave 'bXnana' instead of
      DuckDB's 'bananX' — r9 ADVICE, fixed);
    - the replacement is REBUILT from the literal's segments with each
      ``\\N`` backref as ``regexp_extract(s, p, N)`` (first-match group
      N, exactly the groups of the match being spliced) instead of
      re-running an ``\\A(?:p)\\z``-anchored replace on the isolated
      match text — that re-match loses the match's context and fails
      for boundary/anchor patterns (``\\b[.]`` never re-matches '.').
      Spark's regexp_extract returns '' for a non-participating group,
      same as RE2's rewrite rules.  A non-literal replacement value is
      spliced as literal text (RE2 would honor ``\\N`` inside the VALUE;
      Java would not either — unsupported corner on both paths);
    - guarded with RLIKE so a no-match input passes through, and the
      zero-width first match splices correctly
      (``regexp_replace('xy','x*','_')`` → '_y' — fuzz r8 seed 27582,
      still pinned).

    DuckDB is RE2: lookarounds are invalid there (its regexp_replace
    silently returns the input on an invalid pattern — probed), so the
    position-dependent frontier this has to honor is anchors and ``\\b``
    only, which regexp_instr + group-extract handle exactly."""
    pos = f"regexp_instr(({s}), ({p}))"
    mt = f"regexp_extract(({s}), ({p}), 0)"
    lit = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", r)
    pieces: list[str] = []
    if lit:
        body, last = lit.group(1), 0
        for m in re.finditer(r"\\\\(\d)", body):
            if m.start() > last:
                pieces.append(f"'{body[last:m.start()]}'")
            pieces.append(f"regexp_extract(({s}), ({p}), {m.group(1)})")
            last = m.end()
        if last < len(body):
            pieces.append(f"'{body[last:]}'")
    else:
        pieces.append(f"({r})")
    rep = ", ".join(pieces) if pieces else "''"
    return (
        f"(CASE WHEN ({s}) RLIKE ({p}) THEN "
        f"concat_ws('', substr(({s}), 1, {pos} - 1), {rep}, "
        f"substr(({s}), {pos} + length({mt}))) "
        f"ELSE ({s}) END)"
    )


def _inline_regex_flags(p: str, flags: set) -> str | None:
    inline = "".join(sorted(flags))
    if not inline:
        return p
    pl = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", p)
    if not pl:
        return None
    return f"'(?{inline}){pl.group(1)}'"


def _macro_regexp_replace_flags(args: list[str]) -> str | None:
    # DuckDB: 3-arg replaces FIRST match only; 'g' flag = global; other
    # flags inline into a literal pattern.  Spark's native 4-arg
    # position form (numeric 4th arg) passes through untouched — it is
    # also what the first-only splice emits, ending the fixpoint.
    if len(args) == 3:
        s, p, r = (a.strip() for a in args)
        return _replace_first_emit(s, p, r)
    if len(args) != 4:
        return None
    fl = re.fullmatch(r"\s*'([a-z]*)'\s*", args[3])
    if not fl:
        return None
    # 'c' = case-sensitive (the default); 'm'/'n'/'p' = newline-sensitive
    # matching, which for anchors and '.' IS the RE2/Java default (probed
    # r9: '^c' with 'm' does NOT match after a newline in DuckDB — it is
    # NOT Java's (?m) line-anchor mode, which r8 wrongly inlined)
    flags = set(fl.group(1)) - {"c", "m", "n", "p"}
    if not flags <= {"g", "i", "s"}:
        return None
    s, p, r = args[0].strip(), args[1].strip(), args[2].strip()
    p = _inline_regex_flags(p, flags - {"g"})
    if p is None:
        return None
    if "g" in flags:
        return f"regexp_replace(({s}), {p}, {_conv_backrefs(r)}, 1)"
    return _replace_first_emit(s, p, r)


def _macro_regexp_full_match(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    return (
        f"rlike(({args[0].strip()}), "
        f"concat('^(?:', ({args[1].strip()}), ')$'))"
    )


def _macro_regexp_escape(args: list[str]) -> str | None:
    if len(args) != 1:
        return None
    lit = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", args[0])
    if not lit:
        return None
    import re as _re

    escaped = _re.escape(lit.group(1).replace("''", "'"))
    return "'" + escaped.replace("\\", "\\\\").replace("'", "''") + "'"


# time_bucket / epoch (probed: buckets align to origin 2000-01-03
# 00:00:00 — a Monday, so week buckets start Mondays; floor semantics
# hold pre-origin; month buckets use calendar months from 2000-01-01;
# epoch() returns FRACTIONAL seconds)

_TB_ORIGIN_US = 946857600000000  # 2000-01-03 00:00:00 UTC in microseconds
_INTERVAL_LIT = re.compile(
    r"^\s*INTERVAL\s+(?:'(\d+)\s*(\w+?)s?'|(\d+)\s+(\w+?)S?)\s*$",
    re.IGNORECASE,
)
_UNIT_US = {
    "millisecond": 1000,
    "ms": 1000,
    "second": 1000000,
    "sec": 1000000,
    "minute": 60000000,
    "min": 60000000,
    "hour": 3600000000,
    "day": 86400000000,
    "week": 604800000000,
}


def _macro_time_bucket(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    m = _INTERVAL_LIT.match(args[0])
    if not m:
        return None
    n = int(m.group(1) or m.group(3))
    unit = (m.group(2) or m.group(4)).lower()
    ts = args[1].strip()
    if unit in ("month", "mon", "year", "yr"):
        k = n * (12 if unit in ("year", "yr") else 1)
        msince = f"((year(({ts})) - 2000) * 12 + month(({ts})) - 1)"
        return (
            f"add_months(TIMESTAMP '2000-01-01 00:00:00', "
            f"CAST(({msince} DIV {k}) * {k} - "
            f"(CASE WHEN {msince} < 0 AND pmod({msince}, {k}) != 0 "
            f"THEN {k} ELSE 0 END) AS INT))"
        )
    if unit not in _UNIT_US:
        return None
    width = n * _UNIT_US[unit]
    delta = f"(unix_micros(CAST(({ts}) AS TIMESTAMP)) - {_TB_ORIGIN_US})"
    return (
        f"timestamp_micros({delta} - pmod({delta}, {width}) "
        f"+ {_TB_ORIGIN_US})"
    )


def _macro_epoch(args: list[str]) -> str | None:
    # DuckDB epoch() keeps the fraction (probed: 1577836801.5) — the
    # playbook trap that bit round 5's oracles, now handled in the shim
    if len(args) != 1:
        return None
    return (
        f"(CAST(unix_micros(CAST(({args[0].strip()}) AS TIMESTAMP)) "
        f"AS DOUBLE) / 1000000)"
    )


_EPOCH_FROM = re.compile(r"^\s*EPOCH\s+FROM\s+(.+)$", re.IGNORECASE | re.DOTALL)


def _macro_extract_epoch(args: list[str]) -> str | None:
    # only EXTRACT(EPOCH FROM x) — every other field is Spark-native
    if len(args) != 1:
        return None
    m = _EPOCH_FROM.match(args[0])
    if not m:
        return None
    return _macro_epoch([m.group(1)])


_AGG_ORDER_KEY = re.compile(
    r"^(.*?)\bORDER\s+BY\s+(.+?)\s*(DESC|ASC)?\s*(?:NULLS\s+(FIRST|LAST))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _macro_array_agg_ordered(args: list[str]) -> str | None:
    # DuckDB array_agg(x ORDER BY k [DESC]) — Spark collect_list has no
    # in-call ORDER BY; sort structs of (key, value) post-collect.
    # Single sort key; NULLS FIRST is unsupported (array_sort puts nulls
    # last, which matches DuckDB's in-aggregate default).
    if len(args) != 1:
        return None
    m = _AGG_ORDER_KEY.match(args[0])
    if not m or not m.group(1).strip():
        return None
    if (m.group(4) or "").upper() == "FIRST":
        return None
    val, key = m.group(1).strip(), m.group(2).strip()
    desc = (m.group(3) or "").upper() == "DESC"
    sorted_ = (
        f"array_sort(collect_list(named_struct('k', ({key}), 'v', ({val}))))"
    )
    if desc:
        sorted_ = f"reverse({sorted_})"
    return f"transform({sorted_}, __s -> __s.v)"


def _ordered_first_last(fn: str):
    # first(x ORDER BY k) / last(x ORDER BY k) → min_by/max_by
    def macro(args: list[str]) -> str | None:
        if len(args) != 1:
            return None
        m = _AGG_ORDER_KEY.match(args[0])
        if not m or not m.group(1).strip():
            return None
        val, key = m.group(1).strip(), m.group(2).strip()
        desc = (m.group(3) or "").upper() == "DESC"
        pick = {("first", False): "min_by", ("first", True): "max_by",
                ("last", False): "max_by", ("last", True): "min_by"}[(fn, desc)]
        return f"{pick}(({val}), ({key}))"

    return macro


def _macro_map_extract(args: list[str]) -> str | None:
    # DuckDB map_extract returns a LIST: [v] on hit, [] on miss
    if len(args) != 2:
        return None
    m, k = args[0].strip(), args[1].strip()
    return (
        f"filter(array(try_element_at(({m}), ({k}))), "
        f"__x -> __x IS NOT NULL)"
    )


_FORMAT_BRACES = re.compile(r"\{\}")


def _macro_format(args: list[str]) -> str | None:
    # DuckDB fmt-style '{}' placeholders → format_string '%s'; only the
    # plain positional form (no {0} / {name} / % in the literal)
    if len(args) < 1:
        return None
    lit = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", args[0])
    if not lit or "%" in lit.group(1) or re.search(r"\{[^}]", lit.group(1)):
        return None
    fmt = _FORMAT_BRACES.sub("%s", lit.group(1))
    rest = "".join(f", ({a.strip()})" for a in args[1:])
    return f"format_string('{fmt}'{rest})"


def _macro_array_to_string(args) -> str | None:
    """DuckDB ``array_to_string(l, sep)`` skips NULL elements but returns
    NULL — not '' — when the list is NULL, empty, or all-NULL (probed:
    ``array_to_string([], ',')`` and ``array_to_string([NULL], ',')`` are
    both NULL; fuzz r8 seeds 89/104/111).  Spark ``array_join`` returns
    '' for those, so the emptiness guard wraps it."""
    if len(args) != 2:
        return None
    l, sep = args[0].strip(), args[1].strip()
    return (
        f"(CASE WHEN size(filter(({l}), x -> x IS NOT NULL)) > 0 "
        f"THEN array_join(({l}), ({sep})) ELSE NULL END)"
    )


def _macro_list_distinct(args) -> str | None:
    """DuckDB ``list_distinct`` DROPS NULL elements (probed:
    ``list_distinct([9, 2, NULL])`` → [2, 9]); Spark ``array_distinct``
    keeps one NULL (fuzz r8 seed 1045).  ``array_union(f, f)`` is the
    token-free dedup — emitting ``array_distinct`` would re-trigger this
    macro every fixpoint pass until the cap (trap 27).  A literal NULL
    argument fails filter() analysis, so it short-circuits."""
    if len(args) != 1:
        return None
    l = args[0].strip()
    if l.upper() == "NULL":
        return "NULL"
    f = f"filter(({l}), x -> x IS NOT NULL)"
    return f"array_union({f}, {f})"


def _macro_list_contains(args) -> str | None:
    """DuckDB ``list_contains`` is NULL only for a NULL list or NULL
    needle; a not-found probe returns false even when the list holds NULL
    elements (probed: ``list_contains([0, NULL], 99)`` → false).  Spark
    ``array_contains`` returns NULL there (SQL three-valued membership;
    fuzz r8 seed 190), so the not-found case is coalesced to false."""
    if len(args) != 2:
        return None
    l, x = args[0].strip(), args[1].strip()
    if l.upper() == "NULL" or x.upper() == "NULL":
        # a literal NULL argument fails array_contains analysis
        # (NULL_TYPE) even inside a dead CASE branch
        return "CAST(NULL AS BOOLEAN)"
    return (
        f"(CASE WHEN ({l}) IS NULL OR ({x}) IS NULL THEN NULL "
        f"ELSE coalesce(array_contains(({l}), ({x})), false) END)"
    )


def _macro_list_concat(args) -> str | None:
    """DuckDB ``list_concat(a, b)`` (strictly 2-arg, probed) SKIPS a NULL
    side (``list_concat([1], NULL)`` → [1]; NULL, NULL → NULL) and keeps
    the LIST type — it must NOT fold into the string ``concat`` rename,
    whose skip-NULL rewrite (``concat_ws``) silently stringifies arrays
    (fuzz r8).  ``flatten(array(a, b))`` is the token-free Spark array
    concat (trap 31: the output can't contain ``concat`` or the
    skip-NULLs pass re-captures it)."""
    if len(args) != 2:
        return None
    a, b = args[0].strip(), args[1].strip()
    if a.upper() == "NULL" and b.upper() == "NULL":
        return "NULL"  # untyped: flatten(array(NULL, NULL)) fails analysis
    return (
        f"(CASE WHEN ({a}) IS NULL THEN ({b}) WHEN ({b}) IS NULL THEN ({a}) "
        f"ELSE flatten(array(({a}), ({b}))) END)"
    )


_FN_MACROS = {
    "array_cosine_similarity": _macro_cosine,
    "list_cosine_similarity": _macro_cosine,
    "array_cosine_distance": _macro_cosine_distance,
    "list_cosine_distance": _macro_cosine_distance,
    "array_inner_product": _macro_inner_product,
    "list_inner_product": _macro_inner_product,
    "array_dot_product": _macro_inner_product,
    "list_dot_product": _macro_inner_product,
    "array_distance": _macro_distance,
    "list_distance": _macro_distance,
    "list_unique": _macro_list_unique,
    "array_unique": _macro_list_unique,
    "list_has_all": _macro_list_has_all,
    "array_has_all": _macro_list_has_all,
    "list_slice": _macro_list_slice,
    "array_slice": _macro_list_slice,
    "list_sum": _macro_list_sum,
    "array_sum": _macro_list_sum,
    "list_avg": _macro_list_avg,
    "array_avg": _macro_list_avg,
    "list_aggregate": _macro_list_aggregate,
    "array_aggregate": _macro_list_aggregate,
    "list_aggr": _macro_list_aggregate,
    "list_reduce": _macro_list_reduce,
    "array_reduce": _macro_list_reduce,
    "sha256": _macro_sha256,
    "to_base": _macro_to_base,
    "log": _macro_log10_single,
    "trim": _macro_trim2,
    "ltrim": _trim_side("LEADING"),
    "rtrim": _trim_side("TRAILING"),
    "dayname": _macro_dayname,
    "monthname": _macro_monthname,
    "isodow": _macro_isodow,
    "yearweek": _macro_yearweek,
    "date_diff": _macro_date_diff,
    "datediff": _macro_date_diff,
    "date_sub": _macro_date_sub3,
    "trunc": _macro_trunc1,
    "isfinite": _macro_isfinite,
    "isinf": _macro_isinf,
    "list_prepend": _macro_list_prepend,
    "least": _macro_least_greatest_double("least"),
    "greatest": _macro_least_greatest_double("greatest"),
    "first_value": _macro_ignore_nulls_inside("first_value"),
    "last_value": _macro_ignore_nulls_inside("last_value"),
    "nth_value": _macro_ignore_nulls_inside("nth_value"),
    "lag": _macro_ignore_nulls_inside("lag"),
    "lead": _macro_ignore_nulls_inside("lead"),
    "product": _macro_product,
    "century": _macro_century,
    "decade": _macro_decade,
    "era": _macro_era,
    "julian": _macro_julian,
    "to_days": _macro_to_interval(slot=0),
    "to_hours": _macro_to_interval(slot=1),
    "to_minutes": _macro_to_interval(slot=2),
    "to_seconds": _macro_to_interval(slot=3),
    "to_weeks": _macro_to_interval(days_mult=7),
    "to_months": _macro_to_interval(days_mult=30),
    "to_years": _macro_to_interval(days_mult=360),
    "jaccard": _macro_jaccard,
    "hamming": _macro_hamming,
    "mismatches": _macro_hamming,
    "parse_path": _macro_parse_path,
    "parse_dirname": _macro_parse_dirname,
    "parse_filename": _macro_parse_filename,
    "strip_accents": _macro_strip_accents,
    "date_add": _macro_date_add_interval,
    "dateadd": _macro_date_add_interval,
    "datesub": _macro_date_sub3,
    "datetrunc": lambda args: f"date_trunc({', '.join(a.strip() for a in args)})" if len(args) == 2 else None,
    "regexp_matches": _macro_regexp_matches_flags,
    "even": _macro_even,
    "gcd": _macro_gcd,
    "greatest_common_divisor": _macro_gcd,
    "lcm": _macro_lcm,
    "least_common_multiple": _macro_lcm,
    "xor": _macro_xor,
    "signbit": _macro_signbit,
    "gamma": _macro_gamma,
    "lgamma": _macro_lgamma,
    "epoch_ns": _macro_epoch_ns,
    "arg_min": _macro_arg_minmax("min_by"),
    "arg_max": _macro_arg_minmax("max_by"),
    "fdiv": _macro_fdiv,
    "fmod": _macro_fmod,
    "kahan_sum": _macro_kahan_sum,
    "fsum": _macro_kahan_sum,
    "sumkahan": _macro_kahan_sum,
    "current_schema": _macro_current_schema,
    "current_database": _macro_current_database,
    "list_resize": _macro_list_resize,
    "array_resize": _macro_list_resize,
    "format_bytes": _macro_format_bytes,
    "formatreadablesize": _macro_format_bytes,
    "formatreadabledecimalsize": _macro_format_decimal_bytes,
    "histogram": _macro_histogram,
    "entropy": _macro_entropy,
    "encode": _macro_encode1,
    "decode": _macro_decode1,
    "element_at": _macro_map_extract,
    "struct_insert": _macro_struct_insert,
    "list_bool_or": _macro_list_bool("or"),
    "list_bool_and": _macro_list_bool("and"),
    "list_grade_up": _macro_list_grade_up,
    "array_grade_up": _macro_list_grade_up,
    "list_select": _macro_list_select,
    "array_select": _macro_list_select,
    "list_where": _macro_list_where,
    "array_where": _macro_list_where,
    "list_sort": _macro_list_sort,
    "array_sort": _macro_array_sort_direction,
    "list_reverse_sort": _macro_list_reverse_sort,
    "array_reverse_sort": _macro_list_reverse_sort,
    "list_any_value": _macro_list_any_value,
    "list_count": _macro_list_count,
    "range": _macro_scalar_series("range"),
    "generate_series": _macro_scalar_series("generate_series"),
    "format": _macro_format,
    "string_agg": _macro_string_agg_ordered,
    "listagg": _macro_string_agg_ordered,
    "group_concat": _macro_string_agg_ordered,
    "avg": _macro_avg_double,
    "mean": _macro_avg_double,
    "count": _strip_agg_order("count"),
    "sum": _strip_agg_order("sum"),
    "min": _strip_agg_order("min"),
    "max": _strip_agg_order("max"),
    "stddev": _strip_agg_order("stddev"),
    "stddev_samp": _strip_agg_order("stddev_samp"),
    "stddev_pop": _strip_agg_order("stddev_pop"),
    "var_samp": _strip_agg_order("var_samp"),
    "var_pop": _strip_agg_order("var_pop"),
    "variance": _strip_agg_order("variance"),
    "bool_and": _strip_agg_order("bool_and"),
    "bool_or": _strip_agg_order("bool_or"),
    "bit_and": _strip_agg_order("bit_and"),
    "bit_or": _strip_agg_order("bit_or"),
    "bit_xor": _strip_agg_order("bit_xor"),
    "median": _strip_agg_order("median"),
    "quantile_disc": _macro_quantile_disc,
    "struct_extract": _macro_struct_extract,
    "json_extract": _macro_json_extract,
    "json_extract_string": _macro_json_extract,
    "json_extract_path": _macro_json_extract,
    "json_extract_path_text": _macro_json_extract,
    "json_value": _macro_json_extract,
    "json_valid": _macro_json_valid,
    "regexp_extract": _macro_regexp_extract2,
    "regexp_extract_all": _macro_regexp_extract_all2,
    "regexp_replace": _macro_regexp_replace_flags,
    "regexp_full_match": _macro_regexp_full_match,
    "regexp_escape": _macro_regexp_escape,
    "time_bucket": _macro_time_bucket,
    "array_agg": _macro_array_agg_ordered,
    "list": _macro_array_agg_ordered,
    "collect_list": _macro_array_agg_ordered,
    "first": _ordered_first_last("first"),
    "last": _ordered_first_last("last"),
    "map_extract": _macro_map_extract,
    "unnest": lambda args: f"explode(({args[0].strip()}))" if len(args) == 1 else None,
    "array_to_string": _macro_array_to_string,
    "list_distinct": _macro_list_distinct,
    "array_distinct": _macro_list_distinct,
    "list_contains": _macro_list_contains,
    "list_has": _macro_list_contains,
    "list_concat": _macro_list_concat,
    "list_cat": _macro_list_concat,
    "array_concat": _macro_list_concat,
    "epoch": _macro_epoch,
    "extract": _macro_extract_epoch,
    "struct_pack": _macro_struct_pack,
}

_MACRO_CALL = re.compile(
    r"\b(" + "|".join(_FN_MACROS) + r")\s*\(", re.IGNORECASE
)



def _rewrite_fn_macros(sql: str) -> str:
    """Expand DuckDB list/array macros into Spark expressions.  Iterates
    because an expansion may contain another macro's argument text; each
    pass re-lexes.  Unrewritable forms (wrong arity, non-literal slice
    bounds) are left untouched so Spark's error names the construct."""
    for _ in range(64):  # one macro spliced per pass; cap is a safety net
        mask = _code_mask(sql)
        changed = False
        for m in reversed(list(_MACRO_CALL.finditer(sql))):
            s, e = m.start(1), m.end(1)
            if not all(mask[s:e]):
                continue
            prev = sql[s - 1] if s > 0 else ""
            if prev in ".@:":
                continue
            parsed = _split_call_args(sql, mask, m.end() - 1)
            if parsed is None:
                continue
            args, close = parsed
            out = _FN_MACROS[m.group(1).lower()](args)
            if out is None:
                continue
            sql = sql[:s] + out + sql[close + 1 :]
            changed = True
            break  # offsets shifted; re-lex
        if not changed:
            return sql
    return sql


# ── DuckDB read_* table functions → path literals ───────────────────────
#
# ``FROM read_parquet('f.parquet')`` (and read_csv/read_json/…) is the
# other idiom DuckDB users reach for besides the bare path literal.  A
# single-string-argument call collapses to the quoted path itself, which
# the engine's B4 path-literal machinery then resolves (registered view
# or format.`abs path`).  Calls with extra arguments (options, globs as
# lists) are left untouched so Spark's error names the construct.

_READ_FN = re.compile(
    r"\b(read_parquet|parquet_scan|read_csv_auto|read_csv|read_json_auto"
    r"|read_json|read_ndjson_auto|read_ndjson)\s*\(",
    re.IGNORECASE,
)
_READ_ARG = re.compile(r"\s*('(?:[^']|'')+')\s*\)")


def _rewrite_read_functions(sql: str) -> str:
    mask = _code_mask(sql)
    repls: list[tuple[int, int, str]] = []
    for m in _READ_FN.finditer(sql):
        if not all(mask[m.start() : m.start(1) + len(m.group(1))]):
            continue
        prev = sql[m.start() - 1] if m.start() > 0 else ""
        if prev in ".@:":
            continue
        am = _READ_ARG.match(sql, m.end())
        if not am:
            continue  # options/globs — leave for Spark to name
        repls.append((m.start(), am.end(), am.group(1)))
    for s, e, lit in reversed(repls):
        sql = sql[:s] + lit + sql[e:]
    return sql


# ── DuckDB DESCRIBE SELECT → Spark DESCRIBE QUERY ───────────────────────

_DESCRIBE_SELECT = re.compile(
    r"^(\s*DESCRIBE\s+)(?=(?:SELECT|WITH|VALUES)\b)", re.IGNORECASE
)
_DESCRIBE_FROM = re.compile(r"^(\s*DESCRIBE\s+)(?=FROM\b)", re.IGNORECASE)


def _rewrite_describe(sql: str) -> str:
    """DuckDB ``DESCRIBE SELECT …`` → Spark ``DESCRIBE QUERY SELECT …``
    (Spark needs the QUERY keyword for statement-describe; bare
    ``DESCRIBE t`` is shared syntax and passes through).  The FROM-first
    body form ``DESCRIBE FROM t`` reorders the body first."""
    m = _DESCRIBE_FROM.match(sql)
    if m:
        return m.group(1) + "QUERY " + _rewrite_from_first(sql[m.end() :])
    return _DESCRIBE_SELECT.sub(lambda g: g.group(1) + "QUERY ", sql, count=1)


# ── DuckDB PRAGMA statements ────────────────────────────────────────────
#
# The introspection pragmas map onto Spark statements; engine-tuning
# pragmas (threads, memory_limit, …) are DuckDB-process controls with no
# Spark meaning — a clear error beats silently pretending to apply them.

_PRAGMA = re.compile(r"^\s*PRAGMA\s+([A-Za-z_]\w*)\s*(.*?);?\s*$", re.IGNORECASE | re.DOTALL)


def _rewrite_pragma(sql: str) -> str:
    m = _PRAGMA.match(sql)
    if not m:
        return sql
    name, arg = m.group(1).lower(), m.group(2).strip()
    if name == "show_tables":
        return "SHOW TABLES"
    if name == "version":
        return "SELECT version() AS library_version"
    if name == "table_info":
        tgt = arg.strip("()").strip().strip("'\"")
        return f"DESCRIBE {tgt}"
    if name == "database_size":
        return "SHOW TABLES"  # closest introspection Spark offers
    raise ValueError(
        f"PRAGMA {name} is a DuckDB engine control with no Spark equivalent "
        "(supported here: show_tables, table_info('t'), version)"
    )


# ── DuckDB UNPIVOT statements ───────────────────────────────────────────
#
# ``UNPIVOT tbl ON a, b, c INTO NAME n VALUE v`` → Spark's relational
# form ``SELECT * FROM tbl UNPIVOT (v FOR n IN (a, b, c))``.  Column
# aliases (``jan AS january``) pass through — both dialects accept them
# in the IN list.  Only the statement form is rewritten (text begins
# with UNPIVOT); the SQL-standard subquery form is shared syntax.

_UNPIVOT_STMT = re.compile(
    rf"^\s*UNPIVOT\s+(?P<src>\((?:[^()]|\([^()]*\))*\)|'(?:[^']|'')+'|{_IDENT})"
    rf"\s+ON\s+(?P<cols>.+?)\s+INTO\s+NAME\s+(?P<name>{_IDENT})"
    rf"\s+VALUE\s+(?P<value>{_IDENT})(?P<tail>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _unpivot_label(entry: str) -> str:
    """DuckDB's UNPIVOT NAME column holds the CATALOG spelling of each
    source column, while Spark labels with the identifier text as
    written — ``ON C_ACCTBAL`` must still produce 'c_acctbal' (r8
    statement-fuzz seed 3400).  Bare identifiers get an explicit
    lowercase label (every source in this ecosystem stores lowercase
    columns); quoted ones keep their exact content; anything already
    aliased or non-trivial passes through."""
    e = entry.strip()
    if re.fullmatch(r"[A-Za-z_]\w*", e):
        return f"{e} AS `{e.lower()}`"
    q = re.fullmatch(r'"((?:[^"]|"")+)"', e)
    if q:
        inner = q.group(1).replace('""', '"')
        return f"{e} AS `{inner}`"
    return e


def _rewrite_unpivot(sql: str) -> str:
    m = _UNPIVOT_STMT.match(sql.strip().rstrip(";"))
    if not m:
        return sql
    src = m.group("src")
    tail = m.group("tail").strip()
    cols_text = m.group("cols").strip()
    cmask = _code_mask(cols_text)
    depths = _depths(cols_text, cmask)
    parts: list[str] = []
    start = 0
    for i, ch in enumerate(cols_text):
        if cmask[i] and ch == "," and depths[i] == 0:
            parts.append(cols_text[start:i])
            start = i + 1
    parts.append(cols_text[start:])
    labeled = ", ".join(_unpivot_label(p) for p in parts)
    return (
        f"SELECT * FROM {src} UNPIVOT ({m.group('value')} "
        f"FOR {m.group('name')} IN ({labeled}))"
        + (f" {tail}" if tail else "")
    )


# ── DuckDB FROM-first statements ────────────────────────────────────────


def _rewrite_from_first(sql: str) -> str:
    """DuckDB allows ``FROM t`` (implicit SELECT *) and ``FROM t SELECT
    cols`` (FROM-first).  Spark wants SELECT first; reorder at top level.
    Only statements that BEGIN with FROM are touched.

    Set operations are handled per-branch: ``FROM t UNION SELECT 1``
    must become ``SELECT * FROM t UNION SELECT 1`` — naively taking the
    statement's first top-level SELECT would steal the set-op branch's
    SELECT and emit invalid SQL.  Cut at the first top-level
    UNION/INTERSECT/EXCEPT, reorder only the leading branch, and recurse
    into the remainder (whose branch may itself be FROM-first)."""
    if not re.match(r"^\s*FROM\b", sql, re.IGNORECASE):
        return sql
    body = sql.strip().rstrip(";")
    mask = _code_mask(body)
    setop = [
        m
        for m in _keyword_matches(
            body, mask, r"\b(?:UNION|INTERSECT|EXCEPT)\b"
        )
        if _paren_depth_at(body, mask, m.start()) == 0
    ]
    if setop:
        cut = setop[0].start()
        head = body[:cut].strip()
        rest = body[cut:].strip()
        kw = re.match(
            r"(?:UNION|INTERSECT|EXCEPT)(?:\s+(?:ALL|DISTINCT))?\s*",
            rest,
            re.IGNORECASE,
        )
        return (
            f"{_rewrite_from_first(head)} {rest[: kw.end()].strip()} "
            f"{_rewrite_from_first(rest[kw.end():])}"
        )
    sel = [
        m
        for m in _keyword_matches(body, mask, r"\bSELECT\b")
        if _paren_depth_at(body, mask, m.start()) == 0
    ]
    if not sel:
        return f"SELECT * {body}"
    m = sel[0]
    pre = body[: m.start()].strip()  # FROM <src> [WHERE ...]
    rest = body[m.end() :].strip()  # <select list> [GROUP BY/ORDER BY/...]
    rmask = _code_mask(rest)
    tail = [
        t
        for t in _keyword_matches(
            rest,
            rmask,
            r"\b(?:WHERE|GROUP\s+BY|HAVING|QUALIFY|WINDOW|ORDER\s+BY|LIMIT|OFFSET|UNION|INTERSECT|EXCEPT)\b",
        )
        if _paren_depth_at(rest, rmask, t.start()) == 0
    ]
    if tail:
        cut = tail[0].start()
        return f"SELECT {rest[:cut].strip()} {pre} {rest[cut:].strip()}"
    return f"SELECT {rest} {pre}"


def _paren_depth_at(sql: str, mask: list[bool], pos: int) -> int:
    depth = 0
    for i in range(pos):
        if not mask[i]:
            continue
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
    return depth


# ── DISTINCT ON → ranked window ─────────────────────────────────────────

_DISTINCT_ON = re.compile(r"^\s*SELECT\s+DISTINCT\s+ON\s*\(", re.IGNORECASE)


def _top_level_split(text: str, mask: list[bool], sep: str = ",") -> list[str]:
    parts: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(text):
        if not mask[i]:
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p for p in parts if p.strip()]


def _rewrite_distinct_on(sql: str) -> str:
    """Postgres/DuckDB ``SELECT DISTINCT ON (keys) list FROM ... [ORDER BY
    o]`` → one row per key group (the first under the ORDER BY; arbitrary
    but deterministic — the keys themselves — when no ORDER BY is given),
    expressed as a row_number window + filter.  Order expressions are
    projected as hidden ``__don_o<i>`` columns so the outer ORDER BY works
    even when they aren't in the select list, then dropped with
    ``* EXCEPT``."""
    m = _DISTINCT_ON.match(sql)
    if m is None:
        return sql
    body = sql.strip().rstrip(";")
    mask = _code_mask(body)
    parsed = _split_call_args(body, mask, m.end() - 1)
    if parsed is None:
        return sql
    keys, close = parsed
    keys = [k.strip() for k in keys]

    def top_kw(pattern, start=0):
        for k in _keyword_matches(body, mask, pattern):
            if k.start() >= start and _paren_depth_at(body, mask, k.start()) == 0:
                return k
        return None

    fm = top_kw(r"\bFROM\b", close)
    if fm is None:
        return sql
    select_list = body[close + 1 : fm.start()].strip()
    ob = top_kw(r"\bORDER\s+BY\b", fm.end())
    lim = top_kw(r"\bLIMIT\b|\bOFFSET\b", fm.end())
    src_end = min(x.start() for x in (ob, lim) if x is not None) if (ob or lim) else len(body)
    src = body[fm.start() : src_end].strip()
    tail_limit = body[lim.start() :].strip() if lim is not None else ""

    if ob is not None:
        ob_end = lim.start() if lim is not None and lim.start() > ob.end() else len(body)
        items = [
            i.strip()
            for i in _top_level_split(
                body[ob.end() : ob_end], _code_mask(body[ob.end() : ob_end])
            )
        ]
    else:
        items = list(keys)

    dir_re = re.compile(
        r"\s+(ASC|DESC)?\s*(NULLS\s+(?:FIRST|LAST))?\s*$", re.IGNORECASE
    )
    hidden, win_items, outer_items = [], [], []
    for i, item in enumerate(items):
        dm = dir_re.search(item)
        expr = item[: dm.start()].strip() if dm and dm.group(0).strip() else item
        suffix = item[len(expr) :].strip()
        hidden.append(f"{expr} AS __don_o{i}")
        win_items.append(item)
        outer_items.append(f"__don_o{i} {suffix}".strip())

    inner = (
        f"SELECT {select_list}, {', '.join(hidden)}, "
        f"row_number() OVER (PARTITION BY {', '.join(keys)} "
        f"ORDER BY {', '.join(win_items)}) AS __don_rn {src}"
    )
    excl = ", ".join([f"__don_o{i}" for i in range(len(items))] + ["__don_rn"])
    out = f"SELECT * EXCEPT ({excl}) FROM ({inner}) __don WHERE __don_rn = 1"
    if ob is not None:
        out += f" ORDER BY {', '.join(outer_items)}"
    if tail_limit:
        out += f" {tail_limit}"
    return out


# ── DuckDB bracket syntax: [literals], [comprehensions], indexing ───────
#
# DuckDB:  [1, 2]            list literal        → array(1, 2)
#          [x*2 FOR x IN l]  comprehension       → transform(l, x -> x*2)
#          [... FOR x IN l IF p]                 → transform(filter(l, x -> p), ...)
#          l[i] / t.l[i]     1-based index       → try_element_at(l, i)
#          l[a:b]            1-based incl. slice → list_slice / slice(...)
# Spark's own bracket subscript is 0-based, so leaving an index untouched
# would be SILENTLY off by one — identifier-based indexes are always
# rewritten.  Bases that end in ')' (function results, parenthesized
# exprs) are extended back through the call; other bases are left alone.

_BRACKET_NONLITERAL_KEYWORDS = frozenset(
    # an identifier-looking token before '[' that actually starts a
    # literal position, not an indexable base
    "select where and or not then else when end in as on by all distinct "
    "union intersect except having limit offset case if between like "
    "ilike is null true false order group values using array".split()
)

# before a '(...)[i]' base, 'if'/'array' are genuine function names and
# belong to the base; true statement keywords never do
_BRACKET_NEVER_CALL_KEYWORDS = _BRACKET_NONLITERAL_KEYWORDS - {"if", "array"}

_IDX_CHAIN_END = re.compile(rf"({_IDENT}(?:\s*\.\s*{_IDENT})*)\s*$")


def _bracket_close(sql: str, mask: list[bool], i: int) -> int | None:
    depth = 0
    for k in range(i, len(sql)):
        if not mask[k]:
            continue
        if sql[k] == "[":
            depth += 1
        elif sql[k] == "]":
            depth -= 1
            if depth == 0:
                return k
    return None


def _split_top_colon(text: str) -> list[str] | None:
    """Split on a single top-level ':' (slice form); None if not a slice."""
    mask = _code_mask(text)
    depths = _depths(text, mask)
    cuts = [
        i
        for i, ch in enumerate(text)
        if ch == ":" and mask[i] and depths[i] == 0
        # '::' casts are not slice separators
        and not (i + 1 < len(text) and text[i + 1] == ":")
        and not (i > 0 and text[i - 1] == ":")
    ]
    if len(cuts) != 1:
        return None
    return [text[: cuts[0]], text[cuts[0] + 1 :]]


def _rewrite_comprehension(inner: str) -> str | None:
    mask = _code_mask(inner)
    depths = _depths(inner, mask)
    fors = [
        m
        for m in _keyword_matches(inner, mask, r"\bFOR\b")
        if depths[m.start()] == 0
    ]
    if len(fors) != 1:
        return None
    expr = inner[: fors[0].start()].strip()
    rest = inner[fors[0].end() :]
    rm = re.match(rf"\s*({_IDENT})\s+IN\b", rest, re.IGNORECASE)
    if not rm:
        return None
    var = rm.group(1)
    src = rest[rm.end() :]
    smask = _code_mask(src)
    sdepths = _depths(src, smask)
    ifs = [
        m
        for m in _keyword_matches(src, smask, r"\bIF\b")
        if sdepths[m.start()] == 0
    ]
    if ifs:
        cond = src[ifs[0].end() :].strip()
        src = src[: ifs[0].start()].strip()
        return f"transform(filter({src}, {var} -> {cond}), {var} -> {expr})"
    return f"transform({src.strip()}, {var} -> {expr})"


# Flipped by the fallback pipeline: DuckDB subscripts are polymorphic
# (lists AND strings) but Spark's element_at/slice are array-only, so the
# primary text emits the array reading and a retry-on-AnalysisException
# variant re-renders every subscript with DuckDB's string semantics
# (probed: 'abc'[0] = '', 'abc'[-5] = '', 'abcdef'[-3:-1] = 'def',
# 'abcdef'[4:2] = '', bounds clamp — Spark substr alone matches none of
# the 0/clamp cases).
_STRING_SUBSCRIPTS: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "_STRING_SUBSCRIPTS", default=False
)

# In string mode, a base that is textually a list literal / list-producing
# call keeps the array reading — so one query can mix string and array
# subscripts as long as the array bases are recognizable (fuzz r8 seed 72).
# Both DuckDB and already-rewritten Spark spellings appear here because
# nested bracket groups are walked (and rewritten) before their outer base
# is classified.
_ARRAYISH_BASE = re.compile(
    # names must RETURN a list — array_to_string/list_sum/list_position
    # etc. return scalars and their subscripts must take the string path
    # (fuzz r8 seeds 598/605)
    r"^\(*\s*(\["
    r"|array\s*\("
    r"|array_(distinct|intersect|union|except|remove|compact|repeat|sort"
    r"|slice|reverse|concat|cat|prepend|append|filter|transform)\s*\("
    r"|list_(value|pack|sort|reverse_sort|reverse|distinct|concat|cat"
    r"|slice|transform|filter|prepend|append|intersect|zip|select"
    r"|grade_up|resize|where)\s*\("
    r"|range\s*\(|sequence\s*\(|flatten\s*\(|string_split\s*\("
    r"|str_split\s*\(|string_to_array\s*\(|split\s*\("
    r"|regexp_split_to_array\s*\(|map_keys\s*\(|map_values\s*\("
    r"|collect_list\s*\(|collect_set\s*\(|transform\s*\(|filter\s*\("
    r"|slice\s*\(|sort_array\s*\(|generate_series\s*\()",
    re.IGNORECASE,
)


def _str_slice(base: str, a: str, b: str | None) -> str:
    lo = (
        f"(CASE WHEN ({a}) < 0 THEN greatest(length({base}) + ({a}) + 1, 1) "
        f"ELSE greatest(({a}), 1) END)"
    )
    if b is None:
        return f"substr(({base}), {lo})"
    hi = (
        f"(CASE WHEN ({b}) < 0 THEN length({base}) + ({b}) + 1 "
        f"ELSE least(({b}), length({base})) END)"
    )
    return f"substr(({base}), {lo}, greatest({hi} - {lo} + 1, 0))"


def _rewrite_brackets(sql: str) -> str:
    mask = _code_mask(sql)

    def emit_slice(base: str, inner: str) -> str:
        parts = _split_top_colon(inner)
        a = parts[0].strip() or "1"
        b = parts[1].strip()
        if _STRING_SUBSCRIPTS.get() and not _ARRAYISH_BASE.match(base.strip()):
            return _str_slice(base, a, b or None)
        if not b:
            return (
                f"slice({base}, {a}, "
                f"greatest(size({base}) - ({a}) + 1, 0))"
            )
        # literal bounds expand via the list_slice macro pass that follows
        return f"list_slice({base}, {a}, {b})"

    def walk(start: int, end: int) -> str:
        out: list[str] = []
        i = start
        while i < end:
            ch = sql[i]
            if ch != "[" or not mask[i]:
                out.append(ch)
                i += 1
                continue
            j = _bracket_close(sql, mask, i)
            if j is None or j >= end:
                out.append(ch)
                i += 1
                continue
            inner = walk(i + 1, j)
            i = j + 1
            prefix = "".join(out)
            stripped = prefix.rstrip()
            prev = stripped[-1] if stripped else ""
            im = _IDX_CHAIN_END.search(stripped)
            base = None
            if im and im.group(1).lower() not in _BRACKET_NONLITERAL_KEYWORDS:
                base = im.group(1)
                cut = im.start(1)
            elif prev == ")":
                # extend back over the balanced (...) and a call name
                depth = 0
                k = len(stripped) - 1
                while k >= 0:
                    if stripped[k] == ")":
                        depth += 1
                    elif stripped[k] == "(":
                        depth -= 1
                        if depth == 0:
                            break
                    k -= 1
                if depth == 0:
                    nm = _IDX_CHAIN_END.search(stripped[:k])
                    if nm and nm.group(1).lower() not in _BRACKET_NEVER_CALL_KEYWORDS:
                        cut = nm.start(1)
                    else:
                        cut = k
                    base = stripped[cut:]
            if base is not None:
                out = [stripped[:cut]]
                if _split_top_colon(inner) is not None:
                    out.append(emit_slice(base, inner))
                elif _STRING_SUBSCRIPTS.get() and not _ARRAYISH_BASE.match(base.strip()):
                    out.append(
                        f"(CASE WHEN ({inner}) = 0 THEN '' "
                        f"ELSE substr(({base}), ({inner}), 1) END)"
                    )
                else:
                    out.append(f"try_element_at({base}, {inner})")
                continue
            comp = _rewrite_comprehension(inner)
            out.append(comp if comp is not None else f"array({inner})")
        return "".join(out)

    if "[" not in sql:
        return sql
    return walk(0, len(sql))

# method-first: USING SAMPLE reservoir(100 ROWS) / bernoulli(10%);
# size-first:   USING SAMPLE 10% (system[, seed]);
# plain:        USING SAMPLE 10% / 100 ROWS / bare 100 (rows)
# Ordered alternation — method/size-first must win over the plain prefix.
_USING_SAMPLE = re.compile(
    r"\bUSING\s+SAMPLE\s+(?:"
    r"(?P<method>reservoir|bernoulli|system)\s*\(\s*(?P<mnum>\d+(?:\.\d+)?)\s*"
    r"(?P<munit>%|PERCENT\b|ROWS\b)?\s*\)"
    r"|(?P<snum>\d+(?:\.\d+)?)\s*(?P<sunit>%|PERCENT\b|ROWS\b)?\s*"
    r"\(\s*(?:reservoir|bernoulli|system)\s*(?:,\s*(?P<seed>\d+))?\s*\)"
    r"|(?P<num>\d+(?:\.\d+)?)\s*(?P<unit>%|PERCENT\b|ROWS\b)?"
    r")",
    re.IGNORECASE,
)


def _table_ref_before(sql: str, mask: list[bool], pos: int):
    """Span ``(start, end)`` of the table reference immediately before
    ``pos`` — a (dotted) identifier, a quoted literal/identifier, or a
    parenthesized subquery / table function — but only when the token
    before IT is ``FROM`` / ``JOIN`` / a comma (an intervening alias
    means the positional wrap would capture the wrong text → None)."""
    j = pos - 1
    while j >= 0 and sql[j].isspace():
        j -= 1
    if j < 0:
        return None
    if mask[j] and sql[j] == ")":
        depth = 0
        k = j
        while k >= 0:
            if mask[k] and sql[k] == ")":
                depth += 1
            elif mask[k] and sql[k] == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        if k < 0:
            return None
        # attached table-function name, e.g. range(10)
        k2 = k - 1
        while k2 >= 0 and (sql[k2].isalnum() or sql[k2] in "_$."):
            k2 -= 1
        start = k2 + 1
    elif not mask[j]:
        k = j
        while k >= 0 and not mask[k]:
            k -= 1
        start = k + 1
    elif sql[j].isalnum() or sql[j] in "_$":
        k = j
        while k >= 0 and (sql[k].isalnum() or sql[k] in "_$."):
            k -= 1
        start = k + 1
    else:
        return None
    p = start - 1
    while p >= 0 and sql[p].isspace():
        p -= 1
    if p < 0:
        return None
    if sql[p] == ",":
        return (start, j + 1)
    e = p + 1
    while p >= 0 and (sql[p].isalpha() or sql[p] == "_"):
        p -= 1
    if sql[p + 1 : e].upper() in ("FROM", "JOIN"):
        return (start, j + 1)
    return None


def _rewrite_using_sample(sql: str) -> str:
    """DuckDB ``USING SAMPLE`` → Spark.  PERCENT forms map to Spark
    ``TABLESAMPLE (p PERCENT)`` (both are per-row Bernoulli-style
    sampling).  ROWS-unit forms are RANDOM reservoir samples in DuckDB
    (probed: two runs of ``USING SAMPLE 5`` on 10k rows return different
    rows) while Spark's ``TABLESAMPLE (n ROWS)`` is a deterministic
    first-n prefix — a silent wrong answer (ADVICE r7).  ROWS forms are
    therefore wrapped as ``(SELECT * FROM <ref> ORDER BY rand([seed])
    LIMIT n)``, which Spark plans as TakeOrderedAndProject (top-k, no
    full sort).  When the preceding table reference can't be identified
    positionally (e.g. an intervening alias), the clause is left
    untranslated so Spark's parse error surfaces instead of silently
    changing sampling semantics.  A trailing DuckDB ``REPEATABLE (seed)``
    clause survives in place on PERCENT forms (Spark spells it
    identically); a seed inside the size-first form (``10% (system,
    377)``) becomes ``REPEATABLE (377)`` / ``rand(377)``."""
    mask = _code_mask(sql)
    repls: list[tuple[int, int, str]] = []
    for m in _USING_SAMPLE.finditer(sql):
        if not all(mask[m.start() : m.end()]):
            continue
        seed = None
        if m.group("method"):
            num = m.group("mnum")
            unit = (m.group("munit") or "").upper().rstrip()
            if not unit:
                unit = (
                    "%" if m.group("method").lower() in ("bernoulli", "system")
                    else "ROWS"
                )
            kind = "PERCENT" if unit in ("%", "PERCENT") else "ROWS"
        elif m.group("snum"):
            num = m.group("snum")
            unit = (m.group("sunit") or "").upper().rstrip()
            kind = "PERCENT" if unit in ("%", "PERCENT") else "ROWS"
            seed = m.group("seed")
        else:
            num = m.group("num")
            unit = (m.group("unit") or "").upper().rstrip()
            kind = "PERCENT" if unit in ("%", "PERCENT") else "ROWS"
        if kind == "PERCENT":
            rep = f"TABLESAMPLE ({num} PERCENT)"
            if seed:
                rep += f" REPEATABLE ({seed})"
            repls.append((m.start(), m.end(), rep))
            continue
        # ROWS: random in DuckDB — wrap the table ref in a rand() top-k.
        if "." in num:
            continue  # fractional ROWS — let the engine error
        ref = _table_ref_before(sql, mask, m.start())
        if ref is None:
            continue  # can't wrap safely — leave for Spark to reject
        rs, re_ = ref
        ref_text = sql[rs:re_]
        alias = ""
        if re.fullmatch(r"[A-Za-z_][\w$]*(\.[A-Za-z_][\w$]*)*", ref_text):
            alias = " AS " + ref_text.rsplit(".", 1)[-1]
        rnd = f"rand({seed})" if seed else "rand()"
        rep = (
            f"(SELECT * FROM {ref_text} ORDER BY {rnd} LIMIT {num}){alias}"
        )
        repls.append((rs, m.end(), rep))
    for s, e, new in reversed(repls):
        sql = sql[:s] + new + sql[e:]
    return sql


# ── operator & literal dialect pack (round 7) ────────────────────────────
#
# DuckDB operator spellings whose Spark readings are missing or — worse —
# silently different:
#   - ``$$...$$`` / ``$tag$...$tag$`` dollar-quoted strings → standard
#     single-quoted literals (rewritten FIRST, before any mask-based pass,
#     because the shared lexer doesn't know $-quoting).
#   - ``1_000_000`` digit-group underscores → stripped (Spark rejects).
#   - ``a // b`` → ``a div b`` here; the outermost division pass then
#     turns every ``div`` chain into the zero-guarded typeof-dispatched
#     form (truncate for integral leaves, plain division otherwise —
#     DuckDB's actual polymorphism, probed: 7.5 // 2 = 3.75).
#   - ``a ^ b`` / ``a ** b`` → ``power(a, b)``.  In Spark ``^`` is bitwise
#     XOR — ``2 ^ 3`` = 1 vs DuckDB's 8.0, a silent wrong answer for a
#     DuckDB-habituated user.  DuckDB semantics pinned empirically:
#     left-associative (2^3^2 = 64), tighter than ``*`` (2*3^2 = 18),
#     unary minus binds tighter still (-2^2 = 4).  DuckDB spells XOR as
#     the ``xor()`` function, which passes through untouched.
#   - ``a ^@ b`` → ``startswith(a, b)``.
#   - ``x [NOT] SIMILAR TO p`` → anchored RLIKE (DuckDB: full-match regex).
#   - ``{'k': v, ...}`` struct literals → ``named_struct``; ``MAP {k: v}``
#     → ``map(...)``.
#   - FROM-position ``generate_series(...)`` / ``range(...)`` table
#     functions → exploded ``sequence`` subqueries with DuckDB's exact
#     column names, inclusive/exclusive bounds, empty-range and
#     wrong-direction-error behavior (all pinned by probes: range(0) = [],
#     range(-1) errors, generate_series(5,1) errors, range end exclusive).


def _rewrite_dollar_strings(sql: str) -> str:
    """``$$it's$$`` / ``$tag$...$tag$`` → ``'it''s'`` (own mini-lexer:
    the shared mask doesn't know $-quoting, and a quote INSIDE a dollar
    string must not flip the mask's string state)."""
    if "$" not in sql:
        return sql
    out: list[str] = []
    i, n = 0, len(sql)
    state: str | None = None
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if state == "line":
            out.append(ch)
            if ch == "\n":
                state = None
            i += 1
        elif state == "block":
            out.append(ch)
            if ch == "*" and nxt == "/":
                out.append(nxt)
                i += 1
                state = None
            i += 1
        elif state in ("sq", "dq", "bq"):
            q = {"sq": "'", "dq": '"', "bq": "`"}[state]
            out.append(ch)
            if ch == q and nxt == q:
                out.append(nxt)
                i += 1
            elif ch == q:
                state = None
            i += 1
        elif ch == "-" and nxt == "-":
            out.append(ch)
            out.append(nxt)
            state = "line"
            i += 2
        elif ch == "/" and nxt == "*":
            out.append(ch)
            out.append(nxt)
            state = "block"
            i += 2
        elif ch in "'\"`":
            out.append(ch)
            state = {"'": "sq", '"': "dq", "`": "bq"}[ch]
            i += 1
        elif ch == "$":
            m = re.match(r"\$([A-Za-z_]\w*)?\$", sql[i:])
            j = sql.find(m.group(0), i + len(m.group(0))) if m else -1
            if m and j != -1:
                content = sql[i + len(m.group(0)) : j]
                out.append("'" + content.replace("'", "''") + "'")
                i = j + len(m.group(0))
            else:
                out.append(ch)
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _rewrite_literal_backslashes(sql: str) -> str:
    """Double every backslash inside single-quoted literals.

    DuckDB reads standard-SQL strings RAW (``'\\d+'`` is backslash-d-plus)
    while Spark C-unescapes them (``'\\d+'`` becomes ``d+`` — silently
    breaking every regex a DuckDB user types; found when
    ``regexp_extract('ab12', '([a-z]+)(\\d+)', 2)`` returned ``''``).
    Doubling restores the raw reading after Spark's unescape, and
    neutralizes every other C escape (\\n, \\t, \\u...) the same way.
    Runs innermost, right after dollar-string conversion, so every later
    pass sees Spark-ready literals."""
    if "\\" not in sql:
        return sql
    out: list[str] = []
    state: str | None = None
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if state == "sq":
            if ch == "\\":
                out.append("\\\\")
            else:
                out.append(ch)
                if ch == "'" and nxt == "'":
                    out.append(nxt)
                    i += 1
                elif ch == "'":
                    state = None
            i += 1
        elif state in ("dq", "bq"):
            q = '"' if state == "dq" else "`"
            out.append(ch)
            if ch == q and nxt == q:
                out.append(nxt)
                i += 1
            elif ch == q:
                state = None
            i += 1
        elif state == "line":
            out.append(ch)
            if ch == "\n":
                state = None
            i += 1
        elif state == "block":
            out.append(ch)
            if ch == "*" and nxt == "/":
                out.append(nxt)
                i += 1
                state = None
            i += 1
        else:
            out.append(ch)
            if ch == "-" and nxt == "-":
                out.append(nxt)
                i += 1
                state = "line"
            elif ch == "/" and nxt == "*":
                out.append(nxt)
                i += 1
                state = "block"
            elif ch == "'":
                state = "sq"
            elif ch == '"':
                state = "dq"
            elif ch == "`":
                state = "bq"
            i += 1
    return "".join(out)


_NUM_UNDERSCORE = re.compile(
    r"(?<![\w$.])\d[\d_]*(?:\.[\d_]+)?(?:[eE][+-]?\d[\d_]*)?(?![\w$])"
)


def _rewrite_numeric_underscores(sql: str) -> str:
    if "_" not in sql:
        return sql
    mask = _code_mask(sql)
    repls: list[tuple[int, int, str]] = []
    for m in _NUM_UNDERSCORE.finditer(sql):
        tok = m.group(0)
        if "_" not in tok or not all(mask[m.start() : m.end()]):
            continue
        # DuckDB rule: every underscore sits between two digits
        if all(
            i > 0 and tok[i - 1].isdigit() and i + 1 < len(tok) and tok[i + 1].isdigit()
            for i, c in enumerate(tok)
            if c == "_"
        ):
            repls.append((m.start(), m.end(), tok.replace("_", "")))
    for s, e, new in reversed(repls):
        sql = sql[:s] + new + sql[e:]
    return sql


_BARE_VARCHAR = re.compile(r"\bVARCHAR\b(?!\s*\()", re.IGNORECASE)
_JSON_CAST = re.compile(r"(::\s*|\bAS\s+)JSON\b(?=\s*[),]|\s*$|\s)", re.IGNORECASE)
# DuckDB BLOB/BYTEA → Spark BINARY, same cast positions as JSON
_BLOB_CAST = re.compile(
    r"(::\s*|\bAS\s+)(BLOB|BYTEA)\b(?=\s*[),]|\s*$|\s)", re.IGNORECASE
)
# DuckDB unsigned integer types → the next-wider signed Spark type (the
# VALUES are always representable; only typeof's rendering differs).
# UBIGINT/UHUGEINT need DECIMAL since Spark's widest integer is signed.
_UNSIGNED_CAST = re.compile(
    r"(::\s*|\bAS\s+)(UTINYINT|USMALLINT|UINTEGER|UBIGINT|UHUGEINT)"
    r"\b(?=\s*[),]|\s*$|\s)",
    re.IGNORECASE,
)
_UNSIGNED_MAP = {
    "utinyint": "SMALLINT",
    "usmallint": "INTEGER",
    "uinteger": "BIGINT",
    "ubigint": "DECIMAL(20,0)",
    "uhugeint": "DECIMAL(38,0)",
}


def _rewrite_bare_varchar(sql: str) -> str:
    """DuckDB's length-free ``VARCHAR`` (its canonical string type, in
    DDL and ``::VARCHAR`` casts) → Spark ``STRING`` — Spark rejects
    VARCHAR without a length (``VARCHAR(n)`` passes through).  The
    ``JSON`` type in cast position (``::JSON`` / ``CAST(x AS JSON)``)
    also becomes STRING: Spark has no JSON type; its JSON functions
    operate on strings."""
    mask = _code_mask(sql)
    repls = [
        (m.start(), m.end(), "STRING")
        for m in _BARE_VARCHAR.finditer(sql)
        if all(mask[i] for i in range(m.start(), m.end()))
    ] + [
        (m.end() - 4, m.end(), "STRING")
        for m in _JSON_CAST.finditer(sql)
        if all(mask[i] for i in range(m.start(), m.end()))
        and (m.group(1).startswith("::") or _looks_like_cast(sql, mask, m.start()))
    ] + [
        (m.start(2), m.end(), "BINARY")
        for m in _BLOB_CAST.finditer(sql)
        if all(mask[i] for i in range(m.start(), m.end()))
        and (m.group(1).startswith("::") or _looks_like_cast(sql, mask, m.start()))
    ] + [
        (m.start(2), m.end(), _UNSIGNED_MAP[m.group(2).lower()])
        for m in _UNSIGNED_CAST.finditer(sql)
        if all(mask[i] for i in range(m.start(), m.end()))
        and (m.group(1).startswith("::") or _looks_like_cast(sql, mask, m.start()))
    ]
    for s_, e_, rep in sorted(repls, reverse=True):
        sql = sql[:s_] + rep + sql[e_:]
    return sql


def _looks_like_cast(sql: str, mask: list[bool], pos: int) -> bool:
    # ``AS JSON`` only counts inside a CAST/TRY_CAST call — an alias
    # named json must survive
    depth = 0
    for i in range(pos - 1, -1, -1):
        if not mask[i]:
            continue
        if sql[i] == ")":
            depth += 1
        elif sql[i] == "(":
            if depth == 0:
                j = i - 1
                k = j
                while k >= 0 and (sql[k].isalnum() or sql[k] in "_$"):
                    k -= 1
                return sql[k + 1 : j + 1].lower() in ("cast", "try_cast")
            depth -= 1
    return False


# ── CAST to integer: DuckDB ROUNDS, Spark truncates ─────────────────────
#
# Probed: ``CAST(2.5 AS BIGINT)`` / ``2.5::BIGINT`` → 3 in DuckDB
# (half-away-from-zero, ``-2.5`` → -3) while Spark truncates to 2 — a
# silent wrong answer on any fractional value (playbook trap 7, fuzz
# r8).  Each integer-typed cast dispatches on runtime typeof: fractional
# inputs round half-away via the floor formula computed in DOUBLE (the
# explicit DOUBLE cast keeps the THEN branch analyzable for string
# operands; decimals above 2^53 lose exactness there — accepted edge),
# everything else keeps the plain cast.

_CAST_INT_TYPES = frozenset(
    "bigint integer int int1 int2 int4 int8 smallint tinyint signed".split()
)
_CAST_CALL_RE = re.compile(r"\b(TRY_CAST|CAST)\s*\(", re.IGNORECASE)
_COLON_INT_RE = re.compile(
    r"::\s*(BIGINT|INTEGER|INT[1248]?|SMALLINT|TINYINT|SIGNED)(?![\w$(])",
    re.IGNORECASE,
)


def _paren_close(sql: str, mask: list[bool], i: int) -> int | None:
    depth = 0
    for k in range(i, len(sql)):
        if not mask[k]:
            continue
        if sql[k] == "(":
            depth += 1
        elif sql[k] == ")":
            depth -= 1
            if depth == 0:
                return k
    return None


def _split_top_as(text: str) -> tuple[str, str] | None:
    """Split ``operand AS type`` on the LAST top-level ``AS``."""
    mask = _code_mask(text)
    depth = 0
    best = None
    for m in re.finditer(r"(?<![\w$])AS(?![\w$])", text, re.IGNORECASE):
        i = m.start()
        if not all(mask[i : i + 2]):
            continue
        d = 0
        for k in range(i):
            if mask[k] and text[k] in "([":
                d += 1
            elif mask[k] and text[k] in ")]":
                d -= 1
        if d == 0:
            best = i
    if best is None:
        return None
    return text[:best], text[best + 2 :]


_DUCKTYPE_WRAP_FN = re.compile(r"(round|ceil|ceiling|floor)\s*\(", re.IGNORECASE)


def _ducktype_wrap_arg(x: str) -> str | None:
    """If ``x`` is exactly the ducktype pass's emitted wrap —
    ``CAST(round|ceil|ceiling|floor(...) AS DOUBLE)``, possibly under
    unary minus / extra parens — return the wrapped call's FIRST
    argument.  The wrap exists to give the call DuckDB's DOUBLE static
    type for ``//`` dispatch, but it erases the decimal-vs-double
    distinction an integer CAST's rounding mode depends on; the
    pre-wrap argument type recovers it (fuzz r8 seed 25259)."""
    t = _strip_outer_parens(x.strip())
    while t.startswith("-"):
        t = _strip_outer_parens(t[1:].strip())
    parts = _case_parts(t)
    if parts is not None:
        # _duckdb_round's emitted dispatch: THEN is the binary-rounding
        # half formula (starts with the isnan guard), ELSE is the
        # decimal-path wrap — recurse into the ELSE branch
        conds, results = parts
        if (
            len(results) == 2
            and results[0].lstrip("(").startswith("CASE WHEN isnan(")
        ):
            return _ducktype_wrap_arg(results[1])
        return None
    if not re.match(r"CAST\s*\(", t, re.IGNORECASE):
        return None
    mask = _code_mask(t)
    cast_open = t.index("(")
    if _paren_close(t, mask, cast_open) != len(t) - 1:
        return None
    split = _split_top_as(t[cast_open + 1 : -1])
    if split is None or split[1].strip().upper() != "DOUBLE":
        return None
    inner = split[0].strip()
    m = _DUCKTYPE_WRAP_FN.match(inner)
    if not m:
        return None
    imask = _code_mask(inner)
    iopen = inner.index("(", m.end() - 1)
    if _paren_close(inner, imask, iopen) != len(inner) - 1:
        return None
    args = inner[iopen + 1 : -1]
    amask = _code_mask(args)
    depth = 0
    for i, ch in enumerate(args):
        if not amask[i]:
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            return args[:i].strip()
    return args.strip()


def _int_cast_emit(fn: str, x: str, T: str) -> str:
    # DECIMAL → int rounds HALF AWAY FROM ZERO (probed: CAST(0.5 AS INT)
    # = 1, CAST(-2.5 AS INT) = -3); DOUBLE/FLOAT → int rounds HALF TO
    # EVEN (probed: CAST(2.5::DOUBLE AS INT) = 2, 3.5 → 4, -2.5 → -2 —
    # std::nearbyint), which Spark bround matches.
    xd = f"CAST(({x}) AS DOUBLE)"
    away = (
        f"(CASE WHEN {xd} < 0 THEN -floor(0.5 - {xd}) "
        f"ELSE floor({xd} + 0.5) END)"
    )
    wrap_arg = _ducktype_wrap_arg(x)
    if wrap_arg is not None:
        # DuckDB round(decimal) stays DECIMAL (half-away on int cast);
        # every other input rounds to DOUBLE (half-even).  ceil/floor
        # yield integral values, so either mode is exact for them.
        return (
            f"(CASE WHEN typeof(({wrap_arg})) LIKE 'decimal%' "
            f"THEN {fn}({away} AS {T}) "
            f"ELSE {fn}(bround({xd}) AS {T}) END)"
        )
    return (
        f"(CASE WHEN typeof(({x})) IN ('double', 'float') "
        f"THEN {fn}(bround({xd}) AS {T}) "
        f"WHEN typeof(({x})) LIKE 'decimal%' "
        f"THEN {fn}({away} AS {T}) "
        f"ELSE {fn}(({x}) AS {T}) END)"
    )


def _rewrite_int_casts(sql: str) -> str:
    # CAST/TRY_CAST(x AS <int>) — innermost-first via recursion on the
    # operand; the scan cursor jumps past each emission so the plain-cast
    # ELSE branch is never re-captured (trap 31)
    out = sql
    pos = 0
    for _ in range(400):  # safety cap
        mask = _code_mask(out)
        m = next(
            (
                c
                for c in _CAST_CALL_RE.finditer(out, pos)
                if all(mask[i] for i in range(c.start(), c.end()))
            ),
            None,
        )
        if m is None:
            break
        close = _paren_close(out, mask, m.end() - 1)
        if close is None:
            pos = m.end()
            continue
        split = _split_top_as(out[m.end() : close])
        if split is None:
            pos = m.end()
            continue
        x, T = split
        if T.strip().lower() not in _CAST_INT_TYPES:
            pos = m.end()
            continue
        if x.strip().lower().startswith("try_divide"):
            # the // pass (which runs earlier) emits CAST(try_divide(..)
            # AS BIGINT) for its TRUNCATING integer branch — rounding it
            # would break integer division
            pos = m.end()
            continue
        rep = _int_cast_emit(
            m.group(1).upper(), _rewrite_int_casts(x.strip()), T.strip()
        )
        out = out[: m.start()] + rep + out[close + 1 :]
        pos = m.start() + len(rep)
    # x::<int> — the left operand (already cast-processed above) rounds
    # the same way; chains fold left because the cursor resumes after
    # each emission
    pos = 0
    for _ in range(400):
        mask = _code_mask(out)
        m = next(
            (
                c
                for c in _COLON_INT_RE.finditer(out, pos)
                if all(mask[i] for i in range(c.start(), c.start() + 2))
            ),
            None,
        )
        if m is None:
            break
        ls = _left_operand_start(out, mask, m.start())
        if ls is None:
            pos = m.end()
            continue
        x = out[ls : m.start()].strip()
        if not x or x.lower() in _BRACKET_NONLITERAL_KEYWORDS:
            pos = m.end()
            continue
        rep = _int_cast_emit("CAST", x, m.group(1).upper())
        out = out[:ls] + rep + out[m.end() :]
        pos = ls + len(rep)
    return out


def _rewrite_intdiv(sql: str) -> str:
    if "//" not in sql:
        return sql
    mask = _code_mask(sql)
    out: list[str] = []
    i = 0
    while i < len(sql):
        if sql[i] == "/" and i + 1 < len(sql) and sql[i + 1] == "/" and mask[i] and mask[i + 1]:
            out.append(" div ")
            i += 2
        else:
            out.append(sql[i])
            i += 1
    return "".join(out)


def _left_operand_start(
    sql: str, mask: list[bool], pos: int, absorb_sign: bool = True
) -> int | None:
    """Start index of the tight operand ending just before ``pos``:
    a ``(...)`` group with an optional call-name chain, or an
    identifier/number token (exponent-aware), with a unary sign absorbed
    when it is in unary position (DuckDB: -2^2 = 4)."""
    i = pos - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    if i < 0:
        return None
    end = i
    if sql[i] == "'" and not mask[i]:
        # string literal: the mask marks the whole literal (delimiters
        # included) as non-code — the operand is that contiguous run
        k = i
        while k >= 0 and not mask[k]:
            k -= 1
        return k + 1
    # postfix subscript groups (``x[1]``, ``f(x)[2]``) belong to the
    # operand — walk back over each balanced [..] and keep capturing
    while sql[i] == "]" and mask[i]:
        depth = 0
        while i >= 0:
            if mask[i] and sql[i] == "]":
                depth += 1
            elif mask[i] and sql[i] == "[":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        if depth != 0 or i == 0:
            return None
        i -= 1
        while i >= 0 and sql[i].isspace():
            i -= 1
        if i < 0:
            return None
    if sql[i] == ")":
        depth = 0
        while i >= 0:
            if mask[i] and sql[i] == ")":
                depth += 1
            elif mask[i] and sql[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        if depth != 0:
            return None
        k = i - 1
        while k >= 0 and (sql[k].isalnum() or sql[k] in "_$."):
            k -= 1
        name = sql[k + 1 : i]
        if (
            name
            and not name[0].isdigit()
            and name.lower() not in _BRACKET_NEVER_CALL_KEYWORDS
        ):
            start = k + 1
        else:
            start = i
    elif sql[i].isalnum() or sql[i] in "_$":
        k = i
        while k >= 0 and (sql[k].isalnum() or sql[k] in "_$."):
            k -= 1
        # exponent sign inside a float literal: 1.5e-3
        if (
            k >= 2
            and sql[k] in "+-"
            and sql[k - 1] in "eE"
            and sql[k - 2].isdigit()
        ):
            k -= 2
            while k >= 0 and (sql[k].isalnum() or sql[k] in "_$."):
                k -= 1
        start = k + 1
        tok = sql[start : end + 1]
        if not tok or tok.lower() in _BRACKET_NONLITERAL_KEYWORDS:
            return None
        if tok.startswith(".") and k >= 0 and sql[k] == ")":
            # struct-field access on a parenthesized base —
            # ``({'a': 1}).a % 2`` — absorb the (...) group (and any
            # call-name chain) into the operand (fuzz r8 seed 198)
            depth = 0
            j = k
            while j >= 0:
                if mask[j] and sql[j] == ")":
                    depth += 1
                elif mask[j] and sql[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            if depth != 0:
                return None
            k2 = j - 1
            while k2 >= 0 and (sql[k2].isalnum() or sql[k2] in "_$."):
                k2 -= 1
            name = sql[k2 + 1 : j]
            if (
                name
                and not name[0].isdigit()
                and name.lower() not in _BRACKET_NEVER_CALL_KEYWORDS
            ):
                start = k2 + 1
            else:
                start = j
    else:
        return None
    # a ``::type`` cast chain binds tighter than any operator here — keep
    # walking left across each ``::`` to the underlying operand
    while True:
        j = start - 1
        while j >= 0 and sql[j].isspace():
            j -= 1
        if j >= 1 and sql[j] == ":" and sql[j - 1] == ":" and mask[j]:
            inner = _left_operand_start(sql, mask, j - 1, absorb_sign=False)
            if inner is None:
                break
            start = inner
        else:
            break
    # unary sign binds tighter than ^ — absorb it when no operand precedes
    if not absorb_sign:
        return start
    j = start - 1
    while j >= 0 and sql[j].isspace():
        j -= 1
    if j >= 0 and sql[j] in "+-":
        k = j - 1
        while k >= 0 and sql[k].isspace():
            k -= 1
        prev = sql[k] if k >= 0 else ""
        if not (prev.isalnum() or prev in "_$.)'\""):
            start = j
        elif prev.isalpha() or prev == "_":
            # the sign follows a word — unary when that word is a keyword
            # (SELECT -1 ^ 2, WHEN -x ^ 2, ...), binary after an operand
            w = k
            while w >= 0 and (sql[w].isalnum() or sql[w] in "_$"):
                w -= 1
            if sql[w + 1 : k + 1].lower() in _BRACKET_NONLITERAL_KEYWORDS:
                start = j
    return start


def _right_operand_end(sql: str, mask: list[bool], pos: int) -> int | None:
    """End index (inclusive) of the tight operand starting at/after ``pos``:
    optional unary sign, then a ``(...)`` group, a call, or an
    identifier/number/string token."""
    n = len(sql)
    i = pos
    while i < n and sql[i].isspace():
        i += 1
    while i < n and sql[i] in "+-":
        i += 1
        while i < n and sql[i].isspace():
            i += 1
    if i >= n:
        return None
    if sql[i] == "'":
        m = re.match(r"'(?:[^']|'')*'", sql[i:])
        return i + m.end() - 1 if m else None
    if sql[i] == "(":
        depth = 0
        while i < n:
            if mask[i] and sql[i] == "(":
                depth += 1
            elif mask[i] and sql[i] == ")":
                depth -= 1
                if depth == 0:
                    # struct-field access binds tighter than any operator:
                    # ``10 // ({'a': k}).a`` — absorb trailing ``.ident``
                    # chains into the operand (fuzz r8 seed 349)
                    while (
                        i + 1 < n
                        and sql[i + 1] == "."
                        and i + 2 < n
                        and (sql[i + 2].isalpha() or sql[i + 2] in "_$")
                    ):
                        i += 2
                        while i + 1 < n and (
                            sql[i + 1].isalnum() or sql[i + 1] in "_$"
                        ):
                            i += 1
                    return i
            i += 1
        return None
    if sql[i].isalnum() or sql[i] in "_$":
        is_num = sql[i].isdigit()
        k = i
        while k < n and (sql[k].isalnum() or sql[k] in "_$."):
            k += 1
        if is_num and k < n and sql[k] in "+-" and sql[k - 1] in "eE":
            k += 1
            while k < n and sql[k].isdigit():
                k += 1
        j = k
        while j < n and sql[j].isspace():
            j += 1
        if not is_num and j < n and sql[j] == "(":
            depth = 0
            while j < n:
                if mask[j] and sql[j] == "(":
                    depth += 1
                elif mask[j] and sql[j] == ")":
                    depth -= 1
                    if depth == 0:
                        return j
                j += 1
            return None
        return k - 1
    return None


def _rewrite_caret_at(sql: str) -> str:
    """DuckDB ``a ^@ b`` (starts-with) → ``startswith(a, b)``."""
    while "^@" in sql:
        mask = _code_mask(sql)
        idx = next(
            (
                i
                for i in range(len(sql) - 1)
                if sql[i] == "^" and sql[i + 1] == "@" and mask[i] and mask[i + 1]
            ),
            None,
        )
        if idx is None:
            return sql
        ls = _left_operand_start(sql, mask, idx)
        rend = _right_operand_end(sql, mask, idx + 2)
        if ls is None or rend is None:
            return sql
        left = sql[ls:idx].strip()
        right = sql[idx + 2 : rend + 1].strip()
        sql = sql[:ls] + f"startswith({left}, {right})" + sql[rend + 1 :]
    return sql


_POW_OP = re.compile(r"\*\*|\^(?!@)")


def _rewrite_power(sql: str) -> str:
    """``a ^ b`` / ``a ** b`` → ``power(a, b)`` (leftmost-first, so chains
    associate left like DuckDB: 2^3^2 → power(power(2, 3), 2) = 64)."""
    while "^" in sql or "**" in sql:
        mask = _code_mask(sql)
        m = next(
            (
                c
                for c in _POW_OP.finditer(sql)
                if all(mask[i] for i in range(c.start(), c.end()))
            ),
            None,
        )
        if m is None:
            return sql
        ls = _left_operand_start(sql, mask, m.start())
        rend = _right_operand_end(sql, mask, m.end())
        if ls is None or rend is None:
            return sql
        left = sql[ls : m.start()].strip()
        right = sql[m.end() : rend + 1].strip()
        sql = sql[:ls] + f"power({left}, {right})" + sql[rend + 1 :]
    return sql


_SIMILAR_TO = re.compile(r"\b(NOT\s+)?SIMILAR\s+TO\b", re.IGNORECASE)


def _rewrite_similar_to(sql: str) -> str:
    """``x [NOT] SIMILAR TO p`` → anchored RLIKE (DuckDB treats the
    pattern as a full-match regex)."""
    while True:
        mask = _code_mask(sql)
        m = next(
            (
                c
                for c in _SIMILAR_TO.finditer(sql)
                if all(mask[i] for i in range(c.start(), c.end()))
            ),
            None,
        )
        if m is None:
            return sql
        ls = _left_operand_start(sql, mask, m.start())
        if ls is None:
            return sql
        # ``||`` binds tighter than SIMILAR TO — absorb concat chains
        while True:
            j = ls - 1
            while j >= 0 and sql[j].isspace():
                j -= 1
            if j >= 1 and sql[j] == "|" and sql[j - 1] == "|" and mask[j]:
                prev = _left_operand_start(sql, mask, j - 1)
                if prev is None:
                    break
                ls = prev
            else:
                break
        left = sql[ls : m.start()].strip()
        lit = re.match(r"\s*'((?:[^']|'')*)'(?!\s*\|\|)", sql[m.end() :])
        if lit:
            rep = f"{left} RLIKE '^(?:{lit.group(1)})$'"
            end = m.end() + lit.end()
        else:
            rend = _right_operand_end(sql, mask, m.end())
            if rend is None:
                return sql
            while True:
                j = rend + 1
                while j < len(sql) and sql[j].isspace():
                    j += 1
                if j + 1 < len(sql) and sql[j] == "|" and sql[j + 1] == "|" and mask[j]:
                    nxt = _right_operand_end(sql, mask, j + 2)
                    if nxt is None:
                        break
                    rend = nxt
                else:
                    break
            pat = sql[m.end() : rend + 1].strip()
            # `||` not concat(): the skip-NULLs pass would re-capture the
            # emitted concat and a NULL pattern must stay NULL (trap 31)
            rep = f"rlike({left}, '^(?:' || ({pat}) || ')$')"
            end = rend + 1
        if m.group(1):
            rep = f"NOT ({rep})"
        sql = sql[:ls] + "(" + rep + ")" + sql[end:]
    return sql


_TILDE_OP = re.compile(r"(?<![~!<>=|^*/%+-])(!?~)(?![~*=])")


def _rewrite_tilde_regex(sql: str) -> str:
    """Postgres-style regex operators ``x ~ p`` / ``x !~ p`` → anchored
    RLIKE (probed: DuckDB ``~`` is regexp_full_match — ``'abcd' ~ 'b.'``
    is false).  A ``~`` with no left operand (or a keyword before it) is
    unary bitwise NOT in both engines and is left alone."""
    while True:
        mask = _code_mask(sql)
        hit = None
        for c in _TILDE_OP.finditer(sql):
            if not all(mask[i] for i in range(c.start(1), c.end(1))):
                continue
            ls = _left_operand_start(sql, mask, c.start(1))
            if ls is None:
                # the operand helper rejects keyword tokens, but a literal
                # NULL left side is a valid regex operand (NULL ~ p → NULL)
                nm = re.search(r"(?<![\w$])NULL\s*$", sql[: c.start(1)], re.IGNORECASE)
                if nm is None:
                    continue
                ls = nm.start()
            left = sql[ls : c.start(1)].strip()
            if not left or (
                left.lower() in _BRACKET_NONLITERAL_KEYWORDS
                and left.lower() != "null"
            ):
                continue  # unary bitwise-NOT position
            hit = (c, ls, left)
            break
        if hit is None:
            return sql
        m, ls, left = hit
        lit = re.match(r"\s*'((?:[^']|'')*)'(?!\s*\|\|)", sql[m.end(1) :])
        if lit:
            rep = f"{left} RLIKE '^(?:{lit.group(1)})$'"
            end = m.end(1) + lit.end()
        else:
            rend = _right_operand_end(sql, mask, m.end(1))
            if rend is None:
                return sql
            pat = sql[m.end(1) : rend + 1].strip()
            # `||` not concat(): the skip-NULLs pass would re-capture the
            # emitted concat and a NULL pattern must stay NULL (trap 31)
            rep = f"rlike({left}, '^(?:' || ({pat}) || ')$')"
            end = rend + 1
        if m.group(1).startswith("!"):
            rep = f"NOT ({rep})"
        sql = sql[:ls] + "(" + rep + ")" + sql[end:]
    return sql


def _brace_close(sql: str, mask: list[bool], i: int) -> int | None:
    depth = 0
    for k in range(i, len(sql)):
        if not mask[k]:
            continue
        if sql[k] == "{":
            depth += 1
        elif sql[k] == "}":
            depth -= 1
            if depth == 0:
                return k
    return None


def _split_entries(text: str) -> list[str]:
    """Top-level comma split tracking (), [] and {} nesting."""
    mask = _code_mask(text)
    parts: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(text):
        if not mask[i]:
            continue
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return parts


def _split_entry_colon(text: str) -> tuple[str, str] | None:
    """Split ``k: v`` on the single top-level ``:`` (``::`` casts skipped)."""
    mask = _code_mask(text)
    depth = 0
    for i, ch in enumerate(text):
        if not mask[i]:
            continue
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif (
            ch == ":"
            and depth == 0
            and not (i + 1 < len(text) and text[i + 1] == ":")
            and not (i > 0 and text[i - 1] == ":")
        ):
            return text[:i], text[i + 1 :]
    return None


_MAP_KW_TAIL = re.compile(r"\bMAP\s*$", re.IGNORECASE)


def _rewrite_brace_literals(sql: str) -> str:
    """``{'a': 1, 'b': x}`` → ``named_struct('a', 1, 'b', x)``;
    ``MAP {k: v, ...}`` → ``map(k, v, ...)`` (innermost-first walk, same
    shape as the bracket pass — nested literals compose)."""
    if "{" not in sql:
        return sql
    mask = _code_mask(sql)

    def walk(start: int, end: int) -> str:
        out: list[str] = []
        i = start
        while i < end:
            ch = sql[i]
            if ch != "{" or not mask[i]:
                out.append(ch)
                i += 1
                continue
            j = _brace_close(sql, mask, i)
            if j is None or j >= end:
                out.append(ch)
                i += 1
                continue
            inner = walk(i + 1, j)
            i = j + 1
            prefix = "".join(out)
            pairs = [
                _split_entry_colon(e) for e in _split_entries(inner) if e.strip()
            ]
            if not pairs or any(p is None for p in pairs):
                out.append("{" + inner + "}")
                continue
            args = ", ".join(f"{k.strip()}, {v.strip()}" for k, v in pairs)
            mkw = _MAP_KW_TAIL.search(prefix)
            if mkw:
                out = [prefix[: mkw.start()], f"map({args})"]
            else:
                out = [prefix, f"named_struct({args})"]
        return "".join(out)

    return walk(0, len(sql))


_SERIES_TVF = re.compile(
    r"\b(?:FROM|JOIN)\s+(generate_series|range|unnest)\s*\(", re.IGNORECASE
)
_INTERVAL_ARG = re.compile(r"\bINTERVAL\b", re.IGNORECASE)


def _series_empty(a: str) -> str:
    # typed empty array: a 0-length slice of a 1-element sequence
    return f"slice(sequence(({a}), ({a})), 1, 0)"


def _series_body(fn: str, args: list[str]) -> str | None:
    if fn == "unnest":
        return f"({args[0]})" if len(args) == 1 else None
    err = (
        "raise_error('{} error: start is bigger than end, but increment "
        "is positive: cannot generate infinite series')".format(fn)
    )
    if fn == "range" and len(args) == 1:
        (n,) = args
        return (
            f"IF(({n}) > 0, sequence(0, ({n}) - 1), "
            f"IF(({n}) = 0, {_series_empty('0')}, {err}))"
        )
    if len(args) == 2:
        a, b = args
        if fn == "generate_series":
            return f"IF(({b}) >= ({a}), sequence(({a}), ({b})), {err})"
        return (
            f"IF(({b}) > ({a}), sequence(({a}), ({b}) - 1), "
            f"IF(({b}) = ({a}), {_series_empty(a)}, {err}))"
        )
    if len(args) == 3:
        a, b, s = args
        if fn == "generate_series":
            return f"sequence(({a}), ({b}), ({s}))"
        if _INTERVAL_ARG.search(s):
            # range is end-exclusive; timestamps step back one microsecond
            return f"sequence(({a}), ({b}) - INTERVAL '0.000001' SECOND, ({s}))"
        return (
            f"sequence(({a}), ({b}) - (CASE WHEN ({s}) < 0 THEN -1 ELSE 1 END), ({s}))"
        )
    return None


def _rewrite_series_tvf(sql: str) -> str:
    """FROM-position ``generate_series``/``range`` table functions →
    exploded ``sequence`` subqueries keeping DuckDB's column name and
    bound/empty/error behavior.  Trailing aliases (``t(x)``) survive as
    subquery aliases."""
    while True:
        mask = _code_mask(sql)
        m = next(
            (
                c
                for c in _SERIES_TVF.finditer(sql)
                if all(mask[i] for i in range(c.start(), c.end()))
            ),
            None,
        )
        if m is None:
            return sql
        open_paren = sql.index("(", m.start(1))
        parsed = _split_call_args(sql, mask, open_paren)
        if parsed is None:
            return sql
        args, close = parsed
        fn = m.group(1).lower()
        body = _series_body(fn, [a.strip() for a in args])
        if body is None:
            return sql
        rep = f"(SELECT explode({body}) AS `{fn}`)"
        sql = sql[: m.start(1)] + rep + sql[close + 1 :]
    return sql


_DOT_CALL = re.compile(r"\.\s*([A-Za-z_]\w*)\s*\(")

# members that look like calls but are Spark expression syntax, never
# DuckDB chained functions
_DOT_CALL_SKIP = frozenset({"over", "filter", "within"})


def _rewrite_dot_chain(sql: str) -> str:
    """DuckDB function chaining: ``expr.fn(args)`` → ``fn(expr, args)``.

    Pinned by probes: works on identifiers (``s.string_split(' ')``),
    paren groups and call results (``trim(x).len()``); a bare string
    literal base is a parser error in DuckDB too, so it is left alone
    here (the literal-left capture never fires — bases are code, the
    literal chars are masked).  Chains flatten leftmost-first:
    ``a.substr(2, 3).upper()`` → ``upper(substr(a, 2, 3))``.  The
    ambiguity with catalog-qualified function names (``db.fn(x)``) is
    resolved the DuckDB way: the dot reading wins."""
    for _ in range(_MAX_DOT_CHAIN):
        mask = _code_mask(sql)
        hit = None
        for m in _DOT_CALL.finditer(sql):
            if not all(mask[i] for i in range(m.start(), m.end())):
                continue
            if m.group(1).lower() in _DOT_CALL_SKIP:
                continue
            base = _left_operand_start(sql, mask, m.start(), absorb_sign=False)
            if base is None or base == m.start():
                continue
            # the literal-left capture (masked run) is not a valid chain
            # base — DuckDB rejects 'abc'.upper() as well
            if not mask[base]:
                continue
            hit = (m, base)
            break
        if hit is None:
            return sql
        m, base = hit
        parsed = _split_call_args(sql, mask, m.end() - 1)
        if parsed is None:
            return sql
        args, close = parsed
        base_txt = sql[base : m.start()].strip()
        arg_txt = ", ".join(a.strip() for a in args if a.strip())
        inner = f"{base_txt}, {arg_txt}" if arg_txt else base_txt
        sql = sql[:base] + f"{m.group(1)}({inner})" + sql[close + 1 :]
    return sql


_MAX_DOT_CHAIN = 100


# lambda-taking builtins whose ``var -> expr`` arrows must never be read
# as JSON extraction
_HOF_NAMES = frozenset(
    "transform filter exists forall aggregate reduce zip_with map_filter "
    "map_zip_with array_sort transform_keys transform_values "
    "list_transform list_filter list_reduce list_aggregate".split()
)

_JSON_ARROW = re.compile(r"->>?")


def _enclosing_call_name(sql: str, mask: list[bool], pos: int) -> str:
    depth = 0
    for i in range(pos - 1, -1, -1):
        if not mask[i]:
            continue
        if sql[i] == ")":
            depth += 1
        elif sql[i] == "(":
            if depth == 0:
                j = i - 1
                while j >= 0 and sql[j].isspace():
                    j -= 1
                k = j
                while k >= 0 and (sql[k].isalnum() or sql[k] in "_$"):
                    k -= 1
                return sql[k + 1 : j + 1].lower()
            depth -= 1
    return ""


def _rewrite_json_arrows(sql: str) -> str:
    """DuckDB JSON operators ``j -> 'key'`` / ``j ->> 'key'`` / ``-> i``
    → ``get_json_object`` with a ``$.key`` / ``$[i]`` path (leftmost-
    first, so chains nest).  Only fires when the right side is a string
    or integer literal AND the enclosing call is not a lambda-taking
    higher-order function — ``transform(l, x -> 'a')`` keeps its arrow.
    (Both arrows map to the text-returning form; DuckDB's ``->`` keeps
    JSON quoting on strings, a documented divergence shared with
    ``json_extract``.)"""
    while "->" in sql:
        mask = _code_mask(sql)
        hit = None
        for m in _JSON_ARROW.finditer(sql):
            if not all(mask[i] for i in range(m.start(), m.end())):
                continue
            after = sql[m.end() :]
            rm = re.match(r"\s*'((?:[^']|'')*)'", after) or re.match(
                r"\s*(\d+)(?![\w$.])", after
            )
            if rm is None:
                continue
            if (
                m.group(0) == "->"
                and _enclosing_call_name(sql, mask, m.start()) in _HOF_NAMES
            ):
                continue
            ls = _left_operand_start(sql, mask, m.start(), absorb_sign=False)
            if ls is None:
                continue
            hit = (m, rm, ls)
            break
        if hit is None:
            return sql
        m, rm, ls = hit
        base = sql[ls : m.start()].strip()
        if rm.re.pattern.startswith(r"\s*'"):
            key = rm.group(1)
            path = "$." + key if re.fullmatch(r"\w+", key) else f"$['{key}']"
        else:
            path = f"$[{rm.group(1)}]"
        rep = f"get_json_object({base}, '{path}')"
        sql = sql[:ls] + rep + sql[m.end() + rm.end() :]
    return sql


_ORDER_TERMINATOR = re.compile(
    r"(LIMIT|OFFSET|FETCH|ROWS|RANGE|GROUPS|WINDOW|UNION|INTERSECT|EXCEPT)\b",
    re.IGNORECASE,
)
_NULLS_EXPLICIT = re.compile(r"\bNULLS\s+(?:FIRST|LAST)$", re.IGNORECASE)
_DESC_TAIL = re.compile(r"\bDESC$", re.IGNORECASE)
_ALL_KEY = re.compile(r"^\s*ALL\s*$", re.IGNORECASE)


def _rewrite_order_by_nulls(sql: str) -> str:
    """Align default null ordering with DuckDB: NULLS LAST in BOTH sort
    directions (probed), where Spark's ASC default is NULLS FIRST — a
    silent row-order divergence on every nullable sort key.  Every
    ascending ORDER BY key (top level, subqueries, window clauses,
    in-aggregate ORDER BY) without an explicit NULLS marker gets
    ``NULLS LAST``; DESC keys already match and are left alone.
    ``ORDER BY ALL`` is skipped (Spark rejects ``ALL NULLS LAST``; its
    expansion keeps Spark defaults — documented residual)."""
    mask = _code_mask(sql)
    cmask = _comment_mask(sql)
    depths = _depths(sql, mask)
    inserts: list[int] = []

    def add_key(start: int, end: int) -> None:
        # Walk back over trailing whitespace AND comments (ADVICE r7:
        # 'a -- note' must insert before the comment, and a trailing
        # comment must not defeat the DESC / NULLS-explicit detection).
        j = end - 1
        while j >= start and (cmask[j] or sql[j].isspace()):
            j -= 1
        if j < start:
            return
        insert_at = j + 1
        # Comment-free view for the tail checks (string literals kept —
        # they are part of the key expression).
        stripped = "".join(
            " " if cmask[i] else sql[i] for i in range(start, insert_at)
        ).strip()
        if not stripped:
            return
        if _ALL_KEY.match(stripped):
            return
        if _NULLS_EXPLICIT.search(stripped) or _DESC_TAIL.search(stripped):
            return
        inserts.append(insert_at)

    for m in _keyword_matches(sql, mask, r"\bORDER\s+BY\b"):
        d0 = depths[m.start()]
        i = m.end()
        key_start = i
        while True:
            if i >= len(sql):
                add_key(key_start, i)
                break
            ch = sql[i]
            if not mask[i]:
                i += 1
                continue
            if depths[i] < d0:
                add_key(key_start, i)
                break
            if ch == ";" and depths[i] == d0:
                add_key(key_start, i)
                break
            if ch == "," and depths[i] == d0:
                add_key(key_start, i)
                key_start = i + 1
                i += 1
                continue
            if (
                depths[i] == d0
                and (ch.isalpha())
                and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] in "_$"))
            ):
                t = _ORDER_TERMINATOR.match(sql, i)
                if t and all(mask[k] for k in range(t.start(), t.end())):
                    add_key(key_start, i)
                    break
            i += 1
    for pos in sorted(inserts, reverse=True):
        sql = sql[:pos] + " NULLS LAST" + sql[pos:]
    return sql


_WINDOWISH = ("over", "filter")
_CLAUSE_KEYWORDS = frozenset(
    "from where group order having limit offset union intersect except "
    "join on as and or when then else end window qualify using select "
    "by asc desc nulls".split()
)


def _full_left_operand(sql: str, mask: list[bool], pos: int) -> int | None:
    """``_left_operand_start`` plus absorption of trailing aggregate
    clause chains: in ``count(*) FILTER (WHERE b) / 2`` the left operand
    of ``/`` is the whole aggregate, but the tight capture stops at the
    ``FILTER (...)`` group (reading FILTER as a call name).  Walk back
    across OVER/FILTER links to the underlying call; bail (None) when
    the context is ambiguous rather than risk mis-capture."""
    start = _left_operand_start(sql, mask, pos)
    if start is None:
        return None
    while True:
        if re.match(r"(?:over|filter)\b", sql[start:], re.IGNORECASE):
            prev = _left_operand_start(sql, mask, start)
            if prev is None:
                return None
            start = prev
            continue
        j = start - 1
        while j >= 0 and sql[j].isspace():
            j -= 1
        k = j
        while k >= 0 and (sql[k].isalnum() or sql[k] in "_$"):
            k -= 1
        if j >= 0 and sql[k + 1 : j + 1].lower() in _WINDOWISH:
            prev = _left_operand_start(sql, mask, k + 1)
            if prev is None:
                return None
            start = prev
            continue
        return start


def _full_right_operand(sql: str, mask: list[bool], pos: int) -> int | None:
    """``_right_operand_end`` plus absorption of a following
    ``OVER (...)`` / ``OVER w`` / ``FILTER (...)`` clause, so
    ``x / count(*) OVER ()`` captures the whole window expression."""
    rend = _right_operand_end(sql, mask, pos)
    if rend is None:
        return None
    n = len(sql)
    while True:
        j = rend + 1
        while j < n and sql[j].isspace():
            j += 1
        m = re.match(r"(over|filter)\b", sql[j:], re.IGNORECASE)
        if not m:
            return rend
        j2 = j + m.end()
        while j2 < n and sql[j2].isspace():
            j2 += 1
        if j2 < n and sql[j2] == "(":
            depth = 0
            k = j2
            while k < n:
                if mask[k] and sql[k] == "(":
                    depth += 1
                elif mask[k] and sql[k] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            if k >= n:
                return None
            rend = k
        elif (
            m.group(1).lower() == "over"
            and j2 < n
            and (sql[j2].isalpha() or sql[j2] == "_")
        ):
            k = j2
            while k < n and (sql[k].isalnum() or sql[k] in "_$"):
                k += 1
            if sql[j2:k].lower() in _CLAUSE_KEYWORDS:
                return rend  # 'over' was an identifier, not a window link
            rend = k - 1
        else:
            return rend


_CONCAT_CALL = re.compile(r"(?<![\w$])concat\s*\(", re.IGNORECASE)


def _rewrite_concat_skip_nulls(sql: str) -> str:
    """DuckDB ``concat`` SKIPS NULL arguments (probed: ``concat('a',
    NULL)`` → 'a', ``concat(NULL, NULL)`` → '') and stringifies every
    argument, while Spark's ``concat`` propagates NULL — a silent wrong
    answer on any nullable column.  ``concat_ws('', ...)`` has DuckDB's
    exact skip-NULL semantics, so the call is renamed with an injected
    empty separator.  (``||`` is NULL-propagating in both engines and is
    left alone; DuckDB's list-argument stringification is a documented
    residual — Spark joins array elements instead.)"""
    out = sql
    while True:
        mask = _code_mask(out)
        m = next(
            (
                c
                for c in _CONCAT_CALL.finditer(out)
                if all(mask[i] for i in range(c.start(), c.end()))
            ),
            None,
        )
        if m is None:
            return out
        out = out[: m.start()] + "concat_ws('', " + out[m.end() :]


_DIVMOD_OP = re.compile(r"(?<![\w$])div(?![\w$])|/|%", re.IGNORECASE)

_INTS_LIST = "('tinyint','smallint','int','bigint')"


def _strip_outer_parens(text: str) -> str:
    t = text.strip()
    while t.startswith("(") and t.endswith(")"):
        if _paren_close(t, _code_mask(t), 0) == len(t) - 1:
            t = t[1:-1].strip()
        else:
            break
    return t


_CASE_KW = re.compile(r"(CASE|WHEN|THEN|ELSE|END)(?![\w$])", re.IGNORECASE)


def _case_parts(text: str) -> tuple[list[str], list[str]] | None:
    """Parse a single top-level searched ``CASE WHEN … END`` expression
    into (when_conds, result_exprs); None when ``text`` isn't one.
    Nested CASEs inside branches (parenthesized or not) stay opaque."""
    t = _strip_outer_parens(text)
    if not re.match(r"CASE\s+WHEN(?![\w$])", t, re.IGNORECASE):
        return None
    mask = _code_mask(t)
    depth = 0
    case_depth = 0
    marks: list[tuple[str, int, int]] = []
    i, n = 0, len(t)
    while i < n:
        if not mask[i]:
            i += 1
            continue
        ch = t[i]
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            depth -= 1
            i += 1
            continue
        m = _CASE_KW.match(t, i)
        if m and (i == 0 or not (t[i - 1].isalnum() or t[i - 1] in "_$")):
            kw = m.group(1).upper()
            if depth == 0:
                if kw == "CASE":
                    case_depth += 1
                elif kw == "END":
                    case_depth -= 1
                    if case_depth == 0:
                        marks.append((kw, i, m.end()))
                        if t[m.end() :].strip():
                            return None  # trailing text — not a lone CASE
                        break
                elif case_depth == 1:
                    marks.append((kw, i, m.end()))
            i = m.end()
            continue
        i += 1
    if not marks or marks[-1][0] != "END":
        return None
    conds: list[str] = []
    results: list[str] = []
    for idx, (kw, _s, e) in enumerate(marks[:-1]):
        nxt_start = marks[idx + 1][1]
        seg = t[e:nxt_start].strip()
        if kw == "WHEN":
            conds.append(seg)
        elif kw in ("THEN", "ELSE"):
            results.append(seg)
    return (conds, results) if results else None


_COND_KEYWORDS = {
    "and", "or", "not", "when", "then", "else", "case", "in", "like",
    "ilike", "between", "is", "distinct", "from", "escape", "rlike",
}


def _split_top_arith(t: str) -> list[str]:
    """Split on top-level binary ``+ - *`` (mask-, paren- and CASE-depth-
    aware; unary signs, numeric-literal exponents, and keyword-adjacent
    signs don't split).  Empty list = no confident split (caller falls
    back to a whole-expression typeof)."""
    mask = _code_mask(t)
    parts: list[str] = []
    depth = 0
    case_depth = 0
    last = 0
    i, n = 0, len(t)
    while i < n:
        if not mask[i]:
            i += 1
            continue
        ch = t[i]
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_"):
            m = re.match(r"[A-Za-z_][\w$]*", t[i:])
            tok = m.group(0).lower()
            if tok == "case":
                case_depth += 1
            elif tok == "end" and case_depth:
                case_depth -= 1
            elif (
                tok == "div"
                and case_depth == 0
                and (i == 0 or not (t[i - 1].isalnum() or t[i - 1] in "_$"))
            ):
                # the ``//`` pass's emitted operator: an outer leaf can
                # still hold a raw inner ``div`` (outer-first text order)
                # whose later rewrite surfaces DOUBLE — but DuckDB types
                # ``a // b`` integral iff both operands are, so split
                # here like ``*`` and test the operands instead
                parts.append(t[last:i].strip())
                last = i + m.end()
                i += m.end()
                continue
            i += m.end()
            continue
        elif depth == 0 and case_depth == 0 and ch in "+-*":
            j = i - 1
            while j >= last and t[j].isspace():
                j -= 1
            if j < last:
                i += 1
                continue
            pc = t[j]
            if not (pc.isalnum() or pc in "_$)]" or not mask[j]):
                i += 1
                continue  # unary position
            if ch in "+-" and pc in "eE" and j - 1 >= last and (
                t[j - 1].isdigit() or t[j - 1] == "."
            ):
                k = j - 1
                while k >= last and (t[k].isdigit() or t[k] == "."):
                    k -= 1
                if k < last or not (t[k].isalnum() or t[k] in "_$"):
                    i += 1
                    continue  # exponent sign of a numeric literal
            if mask[j] and (pc.isalnum() or pc in "_$"):
                k = j
                while k >= last and (t[k].isalnum() or t[k] in "_$"):
                    k -= 1
                if t[k + 1 : j + 1].lower() in _COND_KEYWORDS:
                    i += 1
                    continue  # sign right after a keyword — unary
            parts.append(t[last:i].strip())
            last = i + 1
        i += 1
    if not parts or depth != 0 or case_depth != 0:
        return []
    parts.append(t[last:].strip())
    return parts if all(parts) else []


def _leaf_int_cond(text: str) -> str:
    """SQL condition for 'this // chain leaf is integral' — plain Spark
    typeof; the ducktype-numerics pass below has already aligned the
    functions whose static type disagrees between engines.

    A CASE leaf needs care: DuckDB types it as the UNION of its result
    branches (integral iff every branch is), but by the time the outer
    ``//`` is processed an inner ``//`` inside a branch has already been
    rewritten into the DOUBLE-surfaced dispatch CASE, so a plain
    ``typeof`` sees DOUBLE and divides plainly where DuckDB truncates
    (fuzz r8 seed 20313).  So: our own emitted dispatch shape reports
    the integrality condition it was built with (its WHEN clause), and a
    general CASE recurses into its branches, AND-ing them like the
    static union type does (bare NULL branches don't affect the union)."""
    t = _strip_outer_parens(text)
    arith = _split_top_arith(t)
    if len(arith) > 1:
        # DuckDB types a +|-|* chain integral iff every operand is
        return "(" + " AND ".join(_leaf_int_cond(p) for p in arith) + ")"
    parts = _case_parts(t)
    if parts is not None:
        conds, results = parts
        if (
            len(results) == 2
            and results[0].startswith("CAST(CAST(try_divide(")
            and results[1].startswith("try_divide(CAST(")
        ):
            return f"({conds[0]})"
        sub = [
            _leaf_int_cond(r) for r in results if r.upper() != "NULL"
        ]
        if not sub:  # all-NULL CASE: division yields NULL either way
            return "(1=1)"
        return "(" + " AND ".join(sub) + ")"
    return f"typeof({t}) IN {_INTS_LIST}"


# Functions whose DuckDB static type disagrees with Spark's (probed):
# round/ceil/ceiling/floor return DOUBLE (DECIMAL for decimal input) in
# DuckDB, never integral, while Spark keeps int/bigint; sign returns
# TINYINT in DuckDB (integral even for sign(1.5)) while Spark returns
# DOUBLE.  The `//` typeof dispatch — and anything else type-sensitive —
# must see DuckDB's typing, so each call is wrapped in a value-preserving
# CAST.  The cast is OUTSIDE the call: round/ceil/floor on decimals stay
# exact (half-up at decimal precision) and only the representation
# converts, so trap-14 binary-rounding divergences can't be introduced.
_DUCKTYPE_FN = re.compile(
    r"(?<![\w$.])(?P<fn>round|ceil|ceiling|floor|sign)\s*\(", re.IGNORECASE
)
_DUCKTYPE_CAST = {"sign": "INT"}  # everything else casts to DOUBLE


def _duckdb_round(x: str, d: str) -> str:
    """DuckDB rounds DOUBLE as ``std::round(x * 10^d) / 10^d`` on the raw
    BINARY value, while Spark rounds the shortest-decimal rendering
    HALF_UP — values straddling a .xx5 boundary diverge (2045.395 stored
    as 2045.39499… → DuckDB 2045.39, Spark 2045.40; fuzz seed 1915, the
    trap-14 class).  Emulate DuckDB for double/float inputs with the
    multiply-floor formula computed in double like DuckDB does; DECIMAL
    inputs keep Spark's exact decimal rounding (identical to DuckDB's
    decimal path).  Guard: once ``|x·10^d| ≥ 2^53`` the formula (and
    DuckDB) is the identity, and floor's BIGINT range must not overflow."""
    p = f"power(10, {d})"
    half = (
        f"(CASE WHEN isnan({x}) OR abs(({x}) * {p}) >= 9.007199254740992e15 "
        f"THEN CAST({x} AS DOUBLE) "
        f"WHEN ({x}) < 0 THEN -floor((-({x})) * {p} + 0.5d) / {p} "
        f"ELSE floor(({x}) * {p} + 0.5d) / {p} END)"
    )
    return (
        f"(CASE WHEN typeof({x}) IN ('double','float') THEN {half} "
        f"ELSE CAST(round({x}, {d}) AS DOUBLE) END)"
    )


def _rewrite_ducktype_numerics(sql: str) -> str:
    if not _DUCKTYPE_FN.search(sql):
        return sql
    for _ in range(200):  # one wrap per pass; cap is a safety net
        mask = _code_mask(sql)
        changed = False
        for m in reversed(list(_DUCKTYPE_FN.finditer(sql))):
            if not all(mask[m.start() : m.end()]):
                continue
            # find the matching close paren
            depth = 0
            close = None
            for k in range(m.end() - 1, len(sql)):
                if not mask[k]:
                    continue
                if sql[k] == "(":
                    depth += 1
                elif sql[k] == ")":
                    depth -= 1
                    if depth == 0:
                        close = k
                        break
            if close is None:
                continue
            target = _DUCKTYPE_CAST.get(m.group("fn").lower(), "DOUBLE")
            # already wrapped (by this pass or the user) → skip
            before = sql[: m.start()].rstrip()
            after = sql[close + 1 :].lstrip()
            if before.upper().endswith("CAST(") and re.match(
                rf"AS\s+{target}\s*\)", after, re.IGNORECASE
            ):
                continue
            if m.group("fn").lower() == "round":
                parsed = _split_call_args(sql, mask, m.end() - 1)
                if parsed is not None and len(parsed[0]) in (1, 2):
                    args, _ = parsed
                    rep = _duckdb_round(
                        args[0].strip(),
                        args[1].strip() if len(args) == 2 else "0",
                    )
                    sql = sql[: m.start()] + rep + sql[close + 1 :]
                    changed = True
                    break
            sql = (
                sql[: m.start()]
                + "CAST("
                + sql[m.start() : close + 1]
                + f" AS {target})"
                + sql[close + 1 :]
            )
            changed = True
            break  # offsets shifted; re-lex
        if not changed:
            return sql
    return sql


def _flatten_leading_mul_groups(sql: str) -> str:
    """See _rewrite_divmod_null: unwrap ``(a * b div c)`` when the group
    starts a multiplicative chain and contains only top-level ``*``/
    ``div`` operators."""
    for _ in range(64):
        mask = _code_mask(sql)
        changed = False
        for i, ch in enumerate(sql):
            if ch != "(" or not mask[i]:
                continue
            j = _paren_close(sql, mask, i)
            if j is None:
                continue
            inner = sql[i + 1 : j]
            imask = _code_mask(inner)
            depth = 0
            has_mul = False
            bad = False
            k = 0
            while k < len(inner):
                if not imask[k]:
                    k += 1
                    continue
                c = inner[k]
                if c in "([{":
                    depth += 1
                elif c in ")]}":
                    depth -= 1
                elif depth == 0:
                    if c == "*":
                        has_mul = True
                    elif c in "+-/%<>=!|&^~,:":
                        bad = True
                        break
                    elif c.isalpha():
                        w = k
                        while k + 1 < len(inner) and (
                            inner[k + 1].isalnum() or inner[k + 1] in "_$"
                        ):
                            k += 1
                        word = inner[w : k + 1].lower()
                        if word == "div":
                            has_mul = True
                        elif word in ("and", "or", "not", "case", "when",
                                      "then", "else", "end", "is", "in",
                                      "like", "between"):
                            bad = True
                            break
                k += 1
            if bad or not has_mul:
                continue
            # previous token must end a chain boundary (not a call name,
            # postfix, or same-level operator)
            p = i - 1
            while p >= 0 and sql[p].isspace():
                p -= 1
            if p >= 0:
                pc = sql[p]
                if pc in "_$)]'\"" or pc in "*%/":
                    continue
                if pc.isalnum():
                    w = p
                    while w >= 0 and (sql[w].isalnum() or sql[w] in "_$"):
                        w -= 1
                    word = sql[w + 1 : p + 1].lower()
                    # a statement keyword is a chain boundary; any other
                    # identifier would make the group a call argument
                    if word not in _BRACKET_NEVER_CALL_KEYWORDS:
                        continue
            # next token must continue the chain with div or *
            q = j + 1
            while q < len(sql) and sql[q].isspace():
                q += 1
            if not (
                sql[q : q + 1] == "*"
                or (
                    re.match(r"div(?![\w$])", sql[q:], re.IGNORECASE)
                    and all(mask[x] for x in range(q, min(q + 3, len(sql))))
                )
            ):
                continue
            sql = sql[:i] + " " + inner + " " + sql[j + 1 :]
            changed = True
            break
        if not changed:
            return sql
    return sql


def _rewrite_divmod_null(sql: str) -> str:
    """DuckDB returns NULL for division/modulo by zero (probed: ``5/0``,
    ``5 % 0``, ``5 // 0``, ``5.0 % 0`` → all NULL) while Spark under ANSI
    raises — so a DuckDB user's ``sum(x)/count(y)`` crashes the whole
    query here on an empty denominator.  Rewrite ``/`` → ``try_divide``,
    ``%`` → ``try_mod``, and the ``div`` emitted by the ``//`` pass →
    a zero-guarded CASE, capturing the full left-hand multiplicative
    chain so grouping — and therefore decimal scale and float rounding —
    is preserved exactly: ``a * b / c`` becomes ``try_divide(a * b, c)``,
    not ``a * try_divide(b, c)``.

    ``//`` is type-polymorphic in DuckDB AT THE STATIC-TYPE LEVEL
    (probed: ``7 // 2`` → INTEGER 3 truncated, but ``7.5 // 2`` → DOUBLE
    3.75 and ``9.99 // 2.5`` → 3.996, i.e. PLAIN division whenever an
    operand is non-integral).  The emitted CASE dispatches on Spark's
    ``typeof`` (also static per column), truncating for integral
    operands and dividing plainly otherwise; both branches surface as
    DOUBLE, which the JS-parity cell formatter renders identically to
    DuckDB's INTEGER for whole values.  Residuals (documented): integer
    ``//`` results beyond 2^53 round through the double path, and a
    nested ``a // b // c`` chain's intermediate loses its integer static
    type (the outer ``//`` then divides plainly).

    Runs OUTERMOST (after USING SAMPLE/QUALIFY/function renames) so
    ``10%`` percent spellings and macro expansions are already resolved.
    Leftmost-first with restart (like the ``^`` pass): every replacement
    removes exactly one ``/``/``%``/``div`` token and emits none, so the
    loop terminates with every occurrence — including ones nested inside
    captured operands — processed.  On an ambiguous capture the operator
    is skipped (Spark's ANSI error then surfaces — never a silent
    mis-capture)."""
    if "/" not in sql and "%" not in sql and not re.search(_DIVMOD_OP, sql):
        return sql
    # ``(a // b) // c`` parses identically to ``a // b // c`` (same
    # precedence level, left-assoc), but the parens split the chain into
    # two rewrites and the inner CASE's DOUBLE surface type poisons the
    # outer ``typeof`` dispatch (fuzz r8 seed 6884: integral chain took
    # plain division).  Strip parens around a pure multiplicative group
    # when it STARTS a chain — never after *, /, %, div (grouping would
    # change: ``2 * (a div b) div c`` ≠ ``2 * a div b div c``) and never
    # as a call/postfix argument.
    sql = _flatten_leading_mul_groups(sql)
    skipped: set[tuple[int, str]] = set()
    guard = 0
    while guard < 500:
        guard += 1
        mask = _code_mask(sql)
        m = next(
            (
                c
                for c in _DIVMOD_OP.finditer(sql)
                if all(mask[i] for i in range(c.start(), c.end()))
                and (c.start(), c.group(0)) not in skipped
            ),
            None,
        )
        if m is None:
            return sql
        ls = _full_left_operand(sql, mask, m.start())
        rend = _full_right_operand(sql, mask, m.end())
        if ls is None or rend is None:
            # can't capture safely — leave this occurrence untouched
            skipped.add((m.start(), m.group(0)))
            continue
        op = m.group(0).lower()
        if op in ("/", "%"):
            # absorb the left multiplicative chain as TEXT: '*' and 'div'
            # bind at the same level, so (a * b) / c captures 'a * b'
            while True:
                j = ls - 1
                while j >= 0 and sql[j].isspace():
                    j -= 1
                if j >= 0 and sql[j] == "*" and mask[j]:
                    prev = _full_left_operand(sql, mask, j)
                    if prev is None:
                        break
                    ls = prev
                elif (
                    j >= 2
                    and mask[j]
                    and sql[j - 2 : j + 1].lower() == "div"
                    and (j - 3 < 0 or not (sql[j - 3].isalnum() or sql[j - 3] in "_$"))
                ):
                    prev = _full_left_operand(sql, mask, j - 2)
                    if prev is None:
                        break
                    ls = prev
                else:
                    break
            left = sql[ls : m.start()].strip()
            right = sql[m.end() : rend + 1].strip()
            if op == "/":
                # DuckDB '/' ALWAYS divides as DOUBLE (probed:
                # typeof(1.5/2.5) = DOUBLE) where Spark keeps decimal
                # division — -2/3 at decimal scale 6 (-0.666667) vs the
                # double -0.666... is a visible value divergence.  The
                # dividend cast forces the double path BEFORE dividing
                # (an outer cast would keep decimal's truncated scale).
                # '%' keeps its operand types in both engines.  (Interval
                # division is a documented residual — the cast rejects it.)
                rep = f"try_divide(CAST({left} AS DOUBLE), {right})"
            else:
                rep = f"try_mod({left}, {right})"
            sql = sql[:ls] + rep + sql[rend + 1 :]
            continue
        # '//'-emitted div: DuckDB truncates ONLY while EVERY leaf of the
        # multiplicative chain so far is integral (7//2 → 3 but 7.5//2 →
        # 3.75 and 1//1//2 → 0, probed).  Collect the whole */div chain
        # around this div as LEAVES, then fold left with a per-div-stage
        # CASE whose condition is prefix-leaf integrality — one atomic
        # replacement per chain, so intermediate double typing can't
        # poison later stages.
        leaves = [(sql[ls : m.start()].strip(), None)]
        leaves.append((sql[m.end() : rend + 1].strip(), "div"))
        chain_start, chain_end = ls, rend
        # absorb leftward
        while True:
            j = chain_start - 1
            while j >= 0 and sql[j].isspace():
                j -= 1
            if j >= 0 and sql[j] == "*" and mask[j]:
                prev = _full_left_operand(sql, mask, j)
                if prev is None:
                    break
                leaves.insert(1, (leaves[0][0], "*"))
                leaves[0] = (sql[prev:j].strip(), None)
                chain_start = prev
            elif (
                j >= 2
                and mask[j]
                and sql[j - 2 : j + 1].lower() == "div"
                and (j - 3 < 0 or not (sql[j - 3].isalnum() or sql[j - 3] in "_$"))
            ):
                prev = _full_left_operand(sql, mask, j - 2)
                if prev is None:
                    break
                leaves.insert(1, (leaves[0][0], "div"))
                leaves[0] = (sql[prev : j - 2].strip(), None)
                chain_start = prev
            else:
                break
        # absorb rightward
        n = len(sql)
        while True:
            j = chain_end + 1
            while j < n and sql[j].isspace():
                j += 1
            nxt = None
            if j < n and sql[j] == "*" and mask[j]:
                nxt = ("*", j + 1)
            else:
                dm = re.match(r"div(?![\w$])", sql[j:], re.IGNORECASE)
                if dm and all(mask[i] for i in range(j, j + 3)):
                    nxt = ("div", j + 3)
            if nxt is None:
                break
            r2 = _full_right_operand(sql, mask, nxt[1])
            if r2 is None:
                break
            leaves.append((sql[nxt[1] : r2 + 1].strip(), nxt[0]))
            chain_end = r2
        texts = [t for t, _ in leaves]
        x = texts[0]
        for k in range(1, len(leaves)):
            leaf, kind = leaves[k]
            if kind == "*":
                x = f"({x} * {leaf})"
            else:
                cond = " AND ".join(
                    _leaf_int_cond(t) for t in texts[: k + 1]
                )
                x = (
                    f"(CASE WHEN {cond} "
                    f"THEN CAST(CAST(try_divide({x}, {leaf}) AS BIGINT) AS DOUBLE) "
                    f"ELSE try_divide(CAST({x} AS DOUBLE), {leaf}) END)"
                )
        sql = sql[:chain_start] + x + sql[chain_end + 1 :]
    return sql


_WINDOW_FILTER = re.compile(r"\bFILTER\s*\(\s*WHERE\b", re.IGNORECASE)


def _has_top_comma(text: str) -> bool:
    mask = _code_mask(text)
    depth = 0
    for i, ch in enumerate(text):
        if not mask[i]:
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            return True
    return False


def _rewrite_window_filter(sql: str) -> str:
    """DuckDB allows ``agg(x) FILTER (WHERE p) OVER w``; Spark raises
    "Window aggregate function with filter predicate is not supported"
    (probed).  Rewrite the FILTER into the argument —
    ``agg(CASE WHEN p THEN x END) OVER w`` (``count(*)`` counts a CASE
    over 1) — which matches DuckDB because every rewritten aggregate
    skips NULLs.  A ``DISTINCT`` argument keeps its keyword ahead of the
    CASE so the count-distinct window pass below can pick it up.
    GROUP-BY FILTER (no trailing OVER) is Spark-native and untouched."""
    if not _WINDOW_FILTER.search(sql):
        return sql
    for _ in range(50):
        mask = _code_mask(sql)
        changed = False
        for m in reversed(list(_WINDOW_FILTER.finditer(sql))):
            if not all(mask[m.start() : m.end()]):
                continue
            op = sql.index("(", m.start())
            close = _paren_close(sql, mask, op)
            if close is None:
                continue
            j = close + 1
            while j < len(sql) and (not mask[j] or sql[j].isspace()):
                j += 1
            if not re.match(r"OVER\b", sql[j:], re.IGNORECASE):
                continue
            pred = re.sub(
                r"^\s*WHERE\b", "", sql[op + 1 : close], flags=re.IGNORECASE
            ).strip()
            # the aggregate call directly before FILTER
            k = m.start() - 1
            while k >= 0 and (not mask[k] or sql[k].isspace()):
                k -= 1
            if k < 0 or sql[k] != ")":
                continue
            depth = 0
            open_i = None
            for t in range(k, -1, -1):
                if not mask[t]:
                    continue
                if sql[t] == ")":
                    depth += 1
                elif sql[t] == "(":
                    depth -= 1
                    if depth == 0:
                        open_i = t
                        break
            if open_i is None:
                continue
            nm = re.search(r"([A-Za-z_][A-Za-z_0-9]*)\s*$", sql[:open_i])
            if not nm:
                continue
            args = sql[open_i + 1 : k].strip()
            if args == "*":
                if nm.group(1).lower() != "count":
                    continue
                new_args = f"CASE WHEN {pred} THEN 1 END"
            else:
                dm = re.match(r"\s*DISTINCT\b", args, re.IGNORECASE)
                rest = args[dm.end() :].strip() if dm else args
                if not rest or _has_top_comma(rest):
                    continue  # multi-arg aggregates don't rewrite soundly
                new_args = f"CASE WHEN {pred} THEN {rest} END"
                if dm:
                    new_args = "DISTINCT " + new_args
            sql = sql[: open_i + 1] + new_args + ") " + sql[j:]
            changed = True
            break
        if not changed:
            break
    return sql


_DISTINCT_WIN = re.compile(
    r"\b(count|min|max)\s*\(\s*DISTINCT\b", re.IGNORECASE
)


def _rewrite_count_distinct_window(sql: str) -> str:
    """DuckDB allows DISTINCT aggregates as window functions; Spark
    raises DISTINCT_WINDOW_FUNCTION_UNSUPPORTED (probed).  Equivalences
    that hold per-frame: ``count(DISTINCT x) OVER w`` →
    ``coalesce(size(collect_set(x) OVER w), 0)`` (both skip NULLs; the
    coalesce covers an empty frame where DuckDB counts 0), and
    ``min/max(DISTINCT x)`` ≡ ``min/max(x)``.  ``sum/avg(DISTINCT)``
    have no lossless window rewrite and keep Spark's error."""
    if not _DISTINCT_WIN.search(sql):
        return sql
    for _ in range(50):
        mask = _code_mask(sql)
        changed = False
        for m in reversed(list(_DISTINCT_WIN.finditer(sql))):
            if not all(mask[m.start() : m.end()]):
                continue
            fn = m.group(1).lower()
            op = sql.index("(", m.end(1))
            close = _paren_close(sql, mask, op)
            if close is None:
                continue
            j = close + 1
            while j < len(sql) and (not mask[j] or sql[j].isspace()):
                j += 1
            if not re.match(r"OVER\b", sql[j:], re.IGNORECASE):
                continue
            expr = re.sub(
                r"^\s*DISTINCT\b", "", sql[op + 1 : close], flags=re.IGNORECASE
            ).strip()
            if not expr or _has_top_comma(expr):
                continue
            if fn in ("min", "max"):  # DISTINCT is a no-op for min/max
                sql = sql[: op + 1] + expr + sql[close:]
                changed = True
                break
            # locate the end of the OVER target: (spec) or a window name
            t = j + 4
            while t < len(sql) and (not mask[t] or sql[t].isspace()):
                t += 1
            if t < len(sql) and sql[t] == "(":
                oc = _paren_close(sql, mask, t)
                if oc is None:
                    continue
                over_end = oc + 1
            else:
                wm = re.match(r"[A-Za-z_][A-Za-z_0-9]*", sql[t:])
                if not wm:
                    continue
                over_end = t + wm.end()
            over_txt = sql[j:over_end]
            sql = (
                sql[: m.start()]
                + f"coalesce(size(collect_set({expr}) {over_txt}), 0)"
                + sql[over_end:]
            )
            changed = True
            break
        if not changed:
            break
    return sql


_GLOB_OP = re.compile(r"\b(NOT\s+)?GLOB\b", re.IGNORECASE)


def _glob_to_regex(pat: str) -> str:
    """POSIX-glob pattern → regex source, emitted for a Spark string
    literal (backslashes doubled — this text is produced AFTER the
    literal-backslash pass, so Spark's C-unescape halves it back)."""
    out: list[str] = []
    i, n = 0, len(pat)
    while i < n:
        c = pat[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = i + 1
            if j < n and pat[j] in "!^":
                j += 1
            if j < n and pat[j] == "]":
                j += 1  # leading ] is literal inside a class
            while j < n and pat[j] != "]":
                j += 1
            if j < n:
                inner = pat[i + 1 : j]
                if inner.startswith("!"):
                    inner = "^" + inner[1:]
                out.append("[" + inner + "]")
                i = j
            else:
                out.append("\\\\[")  # unclosed '[' is literal
        elif c in r".^$+{}()|\\":
            out.append("\\\\" + c)
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _rewrite_glob(sql: str) -> str:
    """``x [NOT] GLOB 'pat'`` → anchored case-sensitive RLIKE (DuckDB
    GLOB is a full-match filename-style pattern: ``*`` any run, ``?``
    one char, ``[...]``/``[!...]`` classes).  Only literal patterns are
    rewritten; a dynamic pattern surfaces Spark's parse error rather
    than risking wrong translation."""
    while True:
        mask = _code_mask(sql)
        m = next(
            (
                c
                for c in _GLOB_OP.finditer(sql)
                if all(mask[i] for i in range(c.start(), c.end()))
            ),
            None,
        )
        if m is None:
            return sql
        ls = _left_operand_start(sql, mask, m.start())
        if ls is None:
            return sql
        lit = re.match(r"\s*'((?:[^']|'')*)'", sql[m.end() :])
        if lit is None:
            return sql
        left = sql[ls : m.start()].strip()
        # the pattern was backslash-doubled by the literal pass; undo for
        # translation, the translator re-escapes for Spark's unescape
        pat = lit.group(1).replace("''", "'").replace("\\\\", "\\")
        rep = f"{left} RLIKE '^(?:{_glob_to_regex(pat)})$'"
        if m.group(1):
            rep = f"NOT ({rep})"
        sql = sql[:ls] + "(" + rep + ")" + sql[m.end() + lit.end() :]
    return sql


def _rewrite_ops_pack(sql: str) -> str:
    return _rewrite_order_by_nulls(
        _rewrite_series_tvf(
        _rewrite_glob(
        _rewrite_tilde_regex(
        _rewrite_similar_to(
            _rewrite_power(
                _rewrite_caret_at(
                    _rewrite_intdiv(
                        _rewrite_json_arrows(
                            _rewrite_sample_moments(_rewrite_bare_varchar(sql))
                        )
                    )
                )
            )
        )
        )
        )
        )
    )


def rewrite_duckdb_dialect(sql: str) -> str:
    """Apply every DuckDB-dialect rewrite (each pass re-lexes)."""
    sql = _unquote_function_names(strip_comments(sql))
    sql = _rewrite_dynamic_interval(sql)
    return _rewrite_named_window_case(_rewrite_divmod_null(_rewrite_int_casts(_rewrite_concat_skip_nulls(_rewrite_ducktype_numerics(_rewrite_count_distinct_window(_rewrite_window_filter(_rewrite_qualify(
        _rewrite_strptime(
            _rewrite_strftime(
                _rewrite_exclude(
                    _rewrite_using_sample(
                        _rewrite_function_names(
                            _rewrite_fn_macros(
                                _rewrite_ops_pack(
                                    _rewrite_brackets(
                                        _rewrite_dot_chain(
                                        _rewrite_brace_literals(
                                        _rewrite_asof_join(
                                            _rewrite_distinct_on(
                                                _rewrite_from_first(
                                                    _rewrite_describe(
                                                        _rewrite_unpivot(
                                                            _rewrite_read_functions(
                                                                _rewrite_pragma(
                                                                    _rewrite_numeric_underscores(
                                                                        _rewrite_literal_backslashes(
                                                                        _rewrite_dollar_strings(sql)
                                                                        )
                                                                    )
                                                                )
                                                            )
                                                        )
                                                    )
                                                )
                                            )
                                        )
                                        )
                                        )
                                    )
                                )
                            )
                        )
                    )
                )
            )
        )
    ))))))))


def rewrite_duckdb_dialect_fallbacks(sql: str) -> list[str]:
    """Alternate rewrites to retry when the primary form fails analysis
    (e.g. a QUALIFY window referencing a non-projected base column)."""
    sql = _unquote_function_names(strip_comments(sql))
    sql = _rewrite_dynamic_interval(sql)
    alt = _rewrite_qualify_inject(
        _rewrite_strptime(
            _rewrite_strftime(
                _rewrite_exclude(
                    _rewrite_using_sample(
                        _rewrite_function_names(
                            _rewrite_fn_macros(
                                _rewrite_ops_pack(
                                    _rewrite_brackets(
                                        _rewrite_dot_chain(
                                        _rewrite_brace_literals(
                                        _rewrite_asof_join(
                                            _rewrite_distinct_on(
                                                _rewrite_from_first(
                                                    _rewrite_describe(
                                                        _rewrite_unpivot(
                                                            _rewrite_read_functions(
                                                                _rewrite_pragma(
                                                                    _rewrite_numeric_underscores(
                                                                        _rewrite_literal_backslashes(
                                                                        _rewrite_dollar_strings(sql)
                                                                        )
                                                                    )
                                                                )
                                                            )
                                                        )
                                                    )
                                                )
                                            )
                                        )
                                        )
                                        )
                                    )
                                )
                            )
                        )
                    )
                )
            )
        )
    )
    alt = _rewrite_count_distinct_window(_rewrite_window_filter(alt))
    alt = _rewrite_divmod_null(_rewrite_int_casts(_rewrite_concat_skip_nulls(_rewrite_ducktype_numerics(alt))))
    alt = _rewrite_named_window_case(alt)
    primary = rewrite_duckdb_dialect(sql)
    out = [alt] if alt != primary else []
    # DuckDB ``len`` is polymorphic (strings AND lists); Spark's ``len``
    # alias is string-only.  The primary text keeps ``len`` (string case
    # analyzes fine); when analysis fails, retry with ``size`` — the
    # array/map reading.
    for base in (primary, *out):
        swapped = _swap_len_to_size(base)
        if swapped != base and swapped not in out:
            out.append(swapped)
    # string-typed subscripts: retry with every x[i] / x[i:j] rendered via
    # substr (DuckDB subscripts are polymorphic; element_at/slice are not)
    if "[" in sql:
        # contextvar, not a module global: a concurrent Engine.sql on
        # another thread during this window must not see string-subscript
        # mode (r9 ADVICE re-entrancy fix)
        _tok = _STRING_SUBSCRIPTS.set(True)
        try:
            strsub = rewrite_duckdb_dialect(sql)
        finally:
            _STRING_SUBSCRIPTS.reset(_tok)
        if strsub != primary and strsub not in out:
            out.append(strsub)
            # a query can need BOTH variants at once — string subscripts
            # and the array reading of ``len`` (fuzz r8 seed 1427)
            swapped = _swap_len_to_size(strsub)
            if swapped != strsub and swapped not in out:
                out.append(swapped)
    return out


def _swap_len_to_size(sql: str) -> str:
    mask = _code_mask(sql)
    repls = [
        m
        for m in re.finditer(r"\blen\s*\(", sql, re.IGNORECASE)
        if all(mask[i] for i in range(m.start(), m.end()))
        and (m.start() == 0 or sql[m.start() - 1] != ".")
    ]
    for m in reversed(repls):
        sql = sql[: m.start()] + "size" + sql[m.start() + 3 : m.end()] + sql[m.end() :]
    return sql
