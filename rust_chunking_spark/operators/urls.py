"""URL canonicalization for web-crawl CDC pipelines.

No reference counterpart (rust-chunking is a chunking library); this is the
step that precedes keying a web corpus by url (the engine's MERGE key):
byte-different spellings of the same resource must canonicalize to one key
or the lake stores duplicate rows per page. Rules (the conservative,
semantics-preserving subset of RFC 3986 normalization):

- lowercase the scheme and host (case-insensitive per RFC);
- strip the fragment (never sent to the server);
- strip default ports (``:80`` for http, ``:443`` for https);
- empty path becomes ``/``;
- sort query parameters byte-lexicographically (order-insensitive on
  virtually all servers; makes ``?a=1&b=2`` and ``?b=2&a=1`` one key) and
  drop tracking parameters (``utm_*`` — never part of resource identity);
- drop a trailing ``?`` left by an emptied query.

Path case, percent-encoding, and duplicate-slash handling are deliberately
NOT touched: those change resource identity on real servers.

Everything is row-local JVM regex/array expressions — zero shuffles,
scan-speed at 100 TB. Patterns avoid lookaround and use explicit classes,
so Java regex (Spark) and RE2 (DuckDB) agree; the replacement-syntax
difference ($1 vs \\1) is why the twin is spelled separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: authority = everything between :// and the first /, ?, or #
_AUTH = r"[^/?#]*"


def canonicalize_url(docs: DataFrame, url_col: str = "url",
                     out_col: str = "canon_url") -> DataFrame:
    """Append ``out_col`` = canonicalized ``url_col`` (absolute http(s)
    URLs; anything else passes through the same steps unharmed — only the
    scheme/authority prefix and query are rewritten)."""
    u = F.regexp_replace(F.col(url_col), r"#.*", "")          # fragment
    # lowercase scheme://authority, keep the rest byte-identical
    prefix = F.lower(F.regexp_extract(u, rf"^([^/?#]*://{_AUTH})", 1))
    rest = F.regexp_replace(u, rf"^[^/?#]*://{_AUTH}", "")
    # default ports (after lowercasing, so :80 vs :80/ variants unify)
    prefix = F.regexp_replace(prefix, r"^(http://[^/?#:]*):80$", "$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^/?#:]*):443$", "$1")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"))
    query = F.array_join(F.array_sort(params), "&")
    canon = F.concat(prefix, path,
                     F.when(query == "", F.lit(""))
                     .otherwise(F.concat(F.lit("?"), query)))
    # non-absolute inputs (no ://): prefix extracts empty, rest = whole
    canon = F.when(prefix == "", F.col(url_col)).otherwise(canon)
    return docs.withColumn(out_col, canon)


def canonicalize_url_sql(expr: str = "url") -> str:
    """DuckDB scalar expression twin of :func:`canonicalize_url` (compose
    into ``SELECT {canonicalize_url_sql('url')} AS canon_url ...``)."""
    u = f"regexp_replace({expr}, '#.*', '')"
    prefix0 = (f"lower(regexp_extract({u},"
               f" '^([^/?#]*://{_AUTH})', 1))")
    prefix = (f"regexp_replace(regexp_replace({prefix0},"
              f" '^(http://[^/?#:]*):80$', '\\1'),"
              f" '^(https://[^/?#:]*):443$', '\\1')")
    rest = f"regexp_replace({u}, '^[^/?#]*://{_AUTH}', '')"
    path = (f"CASE WHEN regexp_extract({rest}, '^([^?]*)', 1) = ''"
            f" THEN '/' ELSE regexp_extract({rest}, '^([^?]*)', 1) END")
    # COALESCE: DuckDB's array_to_string is NULL on an empty list where
    # Spark's array_join is ''
    query = (f"COALESCE(array_to_string(list_sort(list_filter("
             f"string_split(regexp_extract({rest}, '^[^?]*\\?(.*)', 1),"
             f" '&'), p -> p <> '' AND NOT regexp_matches(p, '^utm_'))),"
             f" '&'), '')")
    return (f"CASE WHEN {prefix0} = '' THEN {expr} ELSE"
            f" {prefix} || {path} ||"
            f" CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END"
            f" END")
