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
   DuckDB's private mix function.  ``strip_accents`` is exact as of r9
   (full-Unicode NFD-drop-combining-marks pandas UDF, replacing the
   curated Latin-1 translate that let non-Latin marks pass through).
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
17. ``upper``/``lower``/``initcap`` use the JVM's FULL Unicode case
   mappings where DuckDB uses simple (1:1) mappings — probed r9:
   ``upper('ß')`` is 'SS' here, 'ẞ' there; ``lower('İ')`` is 'i̇'
   (i + combining dot above) here, 'i' there.  ASCII agrees
   everywhere; full mappings are what Unicode's SpecialCasing.txt
   prescribes, so the JVM behavior is kept.
18. ``reverse`` reverses CODEPOINTS (JVM) where DuckDB reverses
   grapheme clusters — a combining mark detaches from its base
   (probed r9: reverse of a decomposed 'é' reattaches the accent to
   the neighboring letter).  Precomposed text agrees.
19. A string-keyed map subscript ``m['k']`` returns the VALUE here
   (NULL when the key is missing or the map is NULL); DuckDB returns a
   one-element LIST ([] when missing — probed r9: ``MAP {'x': 1}['x']``
   is [1] there, 1 here).  DuckDB's own ``element_at`` and
   ``map_extract_value`` agree with our scalar reading; the list wrap
   is a DuckDB-specific wart we do not replicate.  (A struct subscript
   ``st['a']`` resolves natively in Spark; a scalar ``|| [list]`` mixed
   chain errors here where DuckDB silently VARCHAR-stringifies both
   sides.)
20. Ranking window functions over a LIST-typed partition key partition
   correctly here; the bundled DuckDB 1.0.0 treats EVERY row as its own
   partition for ntile/row_number/rank when PARTITION BY is list-typed
   (probed r9: ``row_number() OVER (PARTITION BY element_at(mp,'x')
   ORDER BY k)`` is all 1s there while ``count(*) OVER`` the same
   partition counts 7 — and a VARCHAR cast of the same key fixes it).
   A DuckDB-side bug we do not replicate (fuzz r9 seed 1854).
21. Ordering ARRAY values that contain NULL elements: Spark compares a
   NULL element as SMALLEST, DuckDB as LARGEST (probed r9:
   ``ORDER BY ls`` puts [NULL, 7] first here, last there).  Arrays
   without NULL elements — and any ordering where an earlier key
   disambiguates — agree; element-level null order inside array
   comparison is not controllable from the query (mutation-fuzz r9
   seed 417).  Same root surfaces through ``min``/``max`` over nested
   columns (r10/r11: ``max(COLUMNS(*))`` over the nested fixture — the
   MAP column aggregates via the insertion-order ``map_entries``
   surrogate, DuckDB's actual positional comparison (probed r11:
   ``MAP(['a','z'],[9,9]) < MAP(['b','a'],[1,1])`` — NOT key-sorted),
   and agrees when entry values are non-NULL; list/struct/
   NULL-valued-map winners can differ by the element-level null order —
   DuckDB's ``<`` even returns NULL when a compared entry value is
   NULL, where Spark ranks the NULL element smallest).
22. ``list_intersect``/``array_intersect`` element ORDER: DuckDB
   returns the same value set in an input-dependent internal hash
   order ([1,2,3] ∩ [2,3,99] is [3,2] there but [3,2] ∩ [2,3] is
   [2,3] — probed r9); this engine keeps the second list's order.
   VALUES agree (incl. DuckDB's NULL-element drop and its asymmetric
   NULL-argument rule, both replicated); wrap in list_sort for an
   order-stable comparison.
"""

from __future__ import annotations

import contextvars
import re



# Split in r9: the shim's passes live in three sibling modules —
# dialect_core (lexing, statement rewrites, bracket syntax),
# dialect_macros (function renames + _FN_MACROS expression macros),
# dialect_typing (operator/literal pack + numeric typing passes).
# This module keeps the public pipeline (rewrite_duckdb_dialect and
# its fallbacks) and re-exports every moved name so existing imports
# (tests, fuzzer, engine) are unaffected.

from parquet_query_spark.workbench.dialect_core import (  # noqa: F401
    _code_mask,
    _comment_mask,
    _DOLLAR_TAG,
    strip_comments,
    _RESERVED_BARE,
    _unquote_function_names,
    _depths,
    _keyword_matches,
    _DYN_INTERVAL,
    _DYN_INTERVAL_UNIT,
    _rewrite_dynamic_interval,
    _IDENT,
    _WINDOW_DEF,
    _WINDOW_DEF_CONT,
    _OVER_REF,
    _rewrite_named_window_case,
    _rewrite_exclude,
    _STRF_TO_JAVA,
    strftime_format_to_java,
    _split_call_args,
    _SQ_LITERAL,
    _rewrite_strftime,
    _rewrite_strptime,
    _QUALIFY_TAIL,
    _qualify_parts,
    _rewrite_qualify,
    _rewrite_qualify_inject,
    _ASOF_HELPER,
    AsofRewriteError,
    _ASOF_KW,
    _ASOF_RTABLE,
    _ASOF_CLAUSE_END,
    _ASOF_INEQ,
    _split_top_and,
    _rewrite_asof_join,
    _READ_FN,
    _READ_ARG,
    _rewrite_read_functions,
    _DESCRIBE_SELECT,
    _DESCRIBE_FROM,
    _rewrite_describe,
    _PRAGMA,
    _rewrite_pragma,
    _CREATE_VIEW,
    _rewrite_create_view,
    _UNPIVOT_STMT,
    _unpivot_label,
    _rewrite_unpivot,
    _rewrite_from_first,
    _paren_depth_at,
    _DISTINCT_ON,
    _top_level_split,
    _rewrite_distinct_on,
    _BRACKET_NONLITERAL_KEYWORDS,
    _subscript_base_heads,
    _BRACKET_NEVER_CALL_KEYWORDS,
    _IDX_CHAIN_END,
    _bracket_close,
    _split_top_colon,
    _rewrite_comprehension,
    _STRING_SUBSCRIPTS,
    _ARRAYISH_BASE,
    _str_slice,
    _rewrite_array_type_suffix,
    _rewrite_brackets,
    _USING_SAMPLE,
    _table_ref_before,
    _rewrite_using_sample,
    _INTERVAL_ARG,
    _series_empty,
    _series_body,
)
from parquet_query_spark.workbench.dialect_macros import (  # noqa: F401
    _FN_MAP,
    _FN_CALL,
    _rewrite_function_names,
    _D,
    _vec_dot,
    _vec_norm2,
    _macro_cosine,
    _macro_cosine_distance,
    _macro_inner_product,
    _macro_distance,
    _macro_list_unique,
    _macro_list_has_all,
    _UINT,
    _NAMED_ARG,
    _macro_struct_pack,
    _macro_list_slice,
    _list_nn,
    _list_sum_expr,
    _macro_list_sum,
    _macro_list_avg,
    _macro_list_aggregate,
    _macro_list_reduce,
    _DATE_UNITS,
    _unit_literal,
    _macro_sha256,
    _macro_to_base,
    _macro_log10_single,
    _macro_trim2,
    _trim_side,
    _macro_dayname,
    _macro_monthname,
    _macro_isodow,
    _macro_yearweek,
    _macro_date_diff,
    _macro_date_sub3,
    _macro_trunc1,
    _macro_isfinite,
    _macro_isinf,
    _macro_list_prepend,
    _DEC_LITERAL,
    _macro_least_greatest_double,
    _IGNORE_NULLS_TAIL,
    _macro_ignore_nulls_inside,
    _macro_product,
    _one_arg,
    _macro_century,
    _macro_decade,
    _macro_era,
    _macro_julian,
    _macro_to_interval,
    _macro_jaccard,
    _macro_hamming,
    _macro_parse_path,
    _macro_parse_dirname,
    _macro_parse_filename,
    _macro_date_add_interval,
    _macro_struct_insert,
    _macro_list_bool,
    _macro_list_grade_up,
    _macro_list_select,
    _macro_list_where,
    _macro_list_sort,
    _macro_array_sort_direction,
    _macro_list_reverse_sort,
    _macro_list_any_value,
    _macro_list_count,
    _macro_scalar_series,
    _macro_string_agg_ordered,
    _strip_order_arg,
    _strip_agg_order,
    _macro_avg_double,
    _macro_quantile_disc,
    _SAMPLE_MOMENT,
    _rewrite_sample_moments,
    _macro_skewness,
    _macro_kurtosis,
    _macro_struct_extract,
    _json_path_literal,
    _macro_json_extract,
    _macro_json_valid,
    _pattern_group_index,
    _java_named_groups,
    _macro_regexp_extract2,
    _macro_regexp_matches_flags,
    _macro_even,
    _macro_gcd,
    _macro_lcm,
    _macro_xor,
    _macro_signbit,
    _LANCZOS,
    _lanczos_ag,
    _lngamma_pos,
    _macro_lgamma,
    _macro_gamma,
    _macro_arg_minmax,
    _macro_fdiv,
    _macro_fmod,
    _macro_kahan_sum,
    _macro_current_schema,
    _macro_current_database,
    _macro_list_resize,
    _format_bytes_scaled,
    _macro_format_bytes,
    _macro_format_decimal_bytes,
    _histogram_sql,
    _macro_histogram,
    _macro_entropy,
    _macro_epoch_ns,
    _macro_encode1,
    _macro_decode1,
    _macro_regexp_extract_all2,
    _conv_backrefs,
    _replace_first_emit,
    _inline_regex_flags,
    _macro_regexp_replace_flags,
    _macro_regexp_full_match,
    _macro_regexp_escape,
    _TB_ORIGIN_US,
    _INTERVAL_LIT,
    _UNIT_US,
    _macro_time_bucket,
    _macro_epoch,
    _EPOCH_FROM,
    _macro_extract_epoch,
    _AGG_ORDER_KEY,
    _macro_array_agg_ordered,
    _ordered_first_last,
    _macro_map_extract,
    _FORMAT_BRACES,
    _macro_format,
    _macro_array_to_string,
    _macro_list_distinct,
    _macro_list_contains,
    _macro_list_concat,
    _FN_MACROS,
    _MACRO_CALL,
    _rewrite_fn_macros,
)
from parquet_query_spark.workbench.dialect_typing import (  # noqa: F401
    _rewrite_arrayish_pipe_concat,
    _rewrite_dollar_strings,
    _rewrite_literal_backslashes,
    _NUM_UNDERSCORE,
    _rewrite_numeric_underscores,
    _BARE_VARCHAR,
    _JSON_CAST,
    _BLOB_CAST,
    _UNSIGNED_CAST,
    _UNSIGNED_MAP,
    _rewrite_bare_varchar,
    _looks_like_cast,
    _CAST_INT_TYPES,
    _CAST_CALL_RE,
    _COLON_INT_RE,
    _paren_close,
    _split_top_as,
    _DUCKTYPE_WRAP_FN,
    _ducktype_wrap_arg,
    _int_cast_emit,
    _rewrite_int_casts,
    _rewrite_intdiv,
    _left_operand_start,
    _right_operand_end,
    _rewrite_caret_at,
    _POW_OP,
    _rewrite_power,
    _SIMILAR_TO,
    _rewrite_similar_to,
    _TILDE_OP,
    _rewrite_tilde_regex,
    _brace_close,
    _split_entries,
    _split_entry_colon,
    _MAP_KW_TAIL,
    _rewrite_brace_literals,
    _SERIES_TVF,
    _rewrite_series_tvf,
    _DOT_CALL,
    _DOT_CALL_SKIP,
    _rewrite_dot_chain,
    _MAX_DOT_CHAIN,
    _HOF_NAMES,
    _JSON_ARROW,
    _enclosing_call_name,
    _rewrite_json_arrows,
    _ORDER_TERMINATOR,
    _NULLS_EXPLICIT,
    _DESC_TAIL,
    _ALL_KEY,
    _rewrite_order_by_nulls,
    _WINDOWISH,
    _CLAUSE_KEYWORDS,
    _full_left_operand,
    _full_right_operand,
    _CONCAT_CALL,
    _rewrite_concat_skip_nulls,
    _DIVMOD_OP,
    _INTS_LIST,
    _strip_outer_parens,
    _CASE_KW,
    _case_parts,
    _COND_KEYWORDS,
    _split_top_arith,
    _leaf_int_cond,
    _DUCKTYPE_FN,
    _DUCKTYPE_CAST,
    _duckdb_round,
    _rewrite_ducktype_numerics,
    _flatten_leading_mul_groups,
    _rewrite_divmod_null,
    _WINDOW_FILTER,
    _has_top_comma,
    _rewrite_window_filter,
    _DISTINCT_WIN,
    _rewrite_count_distinct_window,
    _GLOB_OP,
    _glob_to_regex,
    _rewrite_glob,
    _rewrite_ops_pack,
)

# The pass pipeline, in application order.  Ordering constraints that
# matter (each learned from a fuzz failure): dollar-strings/backslashes/
# underscores run before ANY mask-based pass (the shared lexer doesn't
# know those token forms); brace literals before brackets (MAP {..}['k']
# needs the call form); dot-chain before brackets (subscripts glue to
# their chained base); brackets before the ops pack (subscript groups
# must already be calls when operands are captured); fn_macros before
# function_names (a macro's arity guard must see the DuckDB spelling);
# the numeric typing passes (ducktype → concat-skip-nulls → arrayish-||
# → int-casts → divmod) run last so they see every emitted shape.
_PASSES = (
    _rewrite_dollar_strings,
    _rewrite_literal_backslashes,
    _rewrite_numeric_underscores,
    _rewrite_pragma,
    _rewrite_create_view,
    _rewrite_read_functions,
    _rewrite_unpivot,
    _rewrite_describe,
    _rewrite_from_first,
    _rewrite_distinct_on,
    _rewrite_asof_join,
    _rewrite_brace_literals,
    _rewrite_dot_chain,
    _rewrite_array_type_suffix,
    _rewrite_brackets,
    _rewrite_ops_pack,
    _rewrite_fn_macros,
    _rewrite_function_names,
    _rewrite_using_sample,
    _rewrite_exclude,
    _rewrite_strftime,
    _rewrite_strptime,
    _rewrite_qualify,
    _rewrite_window_filter,
    _rewrite_count_distinct_window,
    _rewrite_ducktype_numerics,
    _rewrite_concat_skip_nulls,
    _rewrite_arrayish_pipe_concat,
    _rewrite_int_casts,
    _rewrite_divmod_null,
    _rewrite_named_window_case,
)


def rewrite_duckdb_dialect(sql: str) -> str:
    """Apply every DuckDB-dialect rewrite (each pass re-lexes)."""
    sql = _unquote_function_names(strip_comments(sql))
    sql = _rewrite_dynamic_interval(sql)
    for p in _PASSES:
        sql = p(sql)
    return sql


def rewrite_duckdb_dialect_fallbacks(sql: str) -> list[str]:
    """Alternate rewrites to retry when the primary form fails analysis
    (e.g. a QUALIFY window referencing a non-projected base column)."""
    sql = _unquote_function_names(strip_comments(sql))
    sql = _rewrite_dynamic_interval(sql)
    # the primary pipeline with QUALIFY's alternate (base-column-visible)
    # injection shape swapped in — every other pass identical by
    # construction, so the two can never drift apart again
    alt = sql
    for p in _PASSES:
        alt = _rewrite_qualify_inject(alt) if p is _rewrite_qualify else p(alt)
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
        # one query can subscript a STRING column and a LIST column at
        # once (fuzz r9 seed 171: us[2:5] vs ls[1]) — neither all-array
        # nor all-string analyzes.  Enumerate per-base string-mode
        # subsets over the distinct bare subscript bases (≤4 bases; the
        # all-bases case is the True variant above).
        bases = sorted(
            h
            for h in _subscript_base_heads(sql)
            # 'case' is a keyword but a (CASE ... END)[i] base is a real
            # expression whose reading must be enumerable (fuzz r9 seed
            # 10319: string-typed CASE subscript next to len(ls))
            if (h == "case" or h not in _BRACKET_NONLITERAL_KEYWORDS)
            and not _ARRAYISH_BASE.match(h)
            and not _ARRAYISH_BASE.match(h + "(")
        )
        if 2 <= len(bases) <= 4:
            import itertools

            for r in range(1, len(bases)):
                for subset in itertools.combinations(bases, r):
                    _tok = _STRING_SUBSCRIPTS.set(frozenset(subset))
                    try:
                        v = rewrite_duckdb_dialect(sql)
                    finally:
                        _STRING_SUBSCRIPTS.reset(_tok)
                    if v != primary and v not in out:
                        out.append(v)
                        # compose with the array reading of ``len`` — a
                        # query can need len(list), a string subscript
                        # AND a list subscript at once (fuzz r9 seed 1681)
                        swapped = _swap_len_to_size(v)
                        if swapped != v and swapped not in out:
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
