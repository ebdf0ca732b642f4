"""URL canonicalization for web-crawl CDC pipelines.

No reference counterpart (rust-chunking is a chunking library); this is the
step that precedes keying a web corpus by url (the engine's MERGE key):
byte-different spellings of the same resource must canonicalize to one key
or the lake stores duplicate rows per page. Rules (the conservative,
semantics-preserving subset of RFC 3986 normalization):

- lowercase the scheme and host ONLY (case-insensitive per RFC 3986
  §6.2.2.1); userinfo (``user:pass@``) is case-SENSITIVE and passes
  through byte-identical;
- strip the fragment (never sent to the server);
- strip default ports (``:80`` for http, ``:443`` for https) — userinfo-
  and IPv6-bracket-aware (``[2001:db8::1]:443`` loses the port too);
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
    # authority = [userinfo@]hostport; only scheme and host are
    # case-insensitive (RFC 3986 §6.2.2.1) — userinfo carries credentials
    # and must pass through byte-identical, so split at the LAST @
    # (greedy .* — RE2 and Java agree) before lowercasing
    scheme = F.lower(F.regexp_extract(u, r"^([^/?#]*)://", 1))
    auth = F.regexp_extract(u, rf"^[^/?#]*://({_AUTH})", 1)
    userinfo = F.regexp_extract(auth, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    # default ports on the userinfo-free hostport; the bracket alternative
    # keeps IPv6 hosts ([2001:db8::1]:443) strippable despite inner colons
    hostport = (
        F.when(scheme == "http",
               F.regexp_replace(hostport, r"^(\[[^\]]*\]|[^:]*):80$", "$1"))
        .when(scheme == "https",
              F.regexp_replace(hostport, r"^(\[[^\]]*\]|[^:]*):443$", "$1"))
        .otherwise(hostport))
    prefix = F.concat(scheme, F.lit("://"), userinfo, hostport)
    rest = F.regexp_replace(u, rf"^[^/?#]*://{_AUTH}", "")
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
    # non-absolute inputs (no ://) pass through untouched
    is_abs = F.regexp_extract(u, r"^[^/?#]*://", 0) != ""
    canon = F.when(is_abs, canon).otherwise(F.col(url_col))
    return docs.withColumn(out_col, canon)


def canonicalize_url_sql(expr: str = "url") -> str:
    """DuckDB scalar expression twin of :func:`canonicalize_url` (compose
    into ``SELECT {canonicalize_url_sql('url')} AS canon_url ...``)."""
    u = f"regexp_replace({expr}, '#.*', '')"
    scheme = f"lower(regexp_extract({u}, '^([^/?#]*)://', 1))"
    auth = f"regexp_extract({u}, '^[^/?#]*://({_AUTH})', 1)"
    userinfo = f"regexp_extract({auth}, '^(.*@)', 1)"
    hostport0 = f"lower(regexp_replace({auth}, '^.*@', ''))"
    hostport = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport0},"
        f" '^(\\[[^\\]]*\\]|[^:]*):80$', '\\1')"
        f" WHEN {scheme} = 'https' THEN regexp_replace({hostport0},"
        f" '^(\\[[^\\]]*\\]|[^:]*):443$', '\\1')"
        f" ELSE {hostport0} END")
    prefix = f"({scheme} || '://' || {userinfo} || {hostport})"
    rest = f"regexp_replace({u}, '^[^/?#]*://{_AUTH}', '')"
    path = (f"CASE WHEN regexp_extract({rest}, '^([^?]*)', 1) = ''"
            f" THEN '/' ELSE regexp_extract({rest}, '^([^?]*)', 1) END")
    # COALESCE: DuckDB's array_to_string is NULL on an empty list where
    # Spark's array_join is ''
    query = (f"COALESCE(array_to_string(list_sort(list_filter("
             f"string_split(regexp_extract({rest}, '^[^?]*\\?(.*)', 1),"
             f" '&'), p -> p <> '' AND NOT regexp_matches(p, '^utm_'))),"
             f" '&'), '')")
    return (f"CASE WHEN regexp_extract({u}, '^[^/?#]*://', 0) = ''"
            f" THEN {expr} ELSE"
            f" {prefix} || {path} ||"
            f" CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END"
            f" END")
