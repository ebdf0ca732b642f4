"""Corpus-curation operators for LLM training-data pipelines.

No reference counterpart (rust-chunking is a chunking library); these are
the web-corpus curation stages a 100 TB run applies after dedup:

- ``ngram_contamination``: benchmark decontamination — flag training
  documents that contain word n-grams from an evaluation/benchmark set,
  the standard train/test-overlap control (n = 8..13 word n-grams in
  published pipelines).
- ``repetition_signals``: Gopher/C4-style repetition quality signals —
  distinct-word fraction, most-frequent-word share, duplicate word-trigram
  fraction — the cheap filters that remove degenerate/boilerplate pages
  before any model-based scoring.

Everything is JVM-side (higher-order functions + relational ops): no
Python UDF in any path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf


def word_ngrams(text_col: str, n: int) -> F.Column:
    """Word n-grams of a whitespace-tokenized text column as
    ``array<string>`` (empty when the doc has fewer than n words) —
    JVM-side via transform/sequence/slice.

    The split array is bound ONCE per row as a lambda variable (the
    array-wrap + transform idiom): Catalyst does not hoist loop-invariant
    subexpressions out of higher-order-function lambdas, so referencing
    ``split(text)`` directly inside the per-ngram lambda re-tokenizes the
    whole document for every emitted n-gram — O(words^2) per doc. With the
    binding, per-element work is an O(n) slice."""
    return F.expr(_word_ngrams_sql(text_col, n))


def _word_ngrams_sql(text_col: str, n: int) -> str:
    """Spark-SQL string form of :func:`word_ngrams` (split bound once)."""
    return (
        f"flatten(transform(array(split({text_col}, ' ')), ws ->"
        f" if(size(ws) >= {n},"
        f" transform(sequence(1, size(ws) - {n - 1}),"
        f" i -> concat_ws(' ', slice(ws, i, {n}))),"
        f" cast(array() as array<string>))))")


#: hard ceiling for the benchmark-side broadcast hint (same discipline as
#: __spark_entry__.BCAST_ROW_LIMIT / _bcast_if): never a hard hint on a
#: relation that could exceed driver memory
BCAST_ROW_LIMIT = 2_000_000


def ngram_contamination(docs: DataFrame, bench: DataFrame, n: int = 8,
                        id_col: str = "doc_id", text_col: str = "text",
                        broadcast_bench: bool | None = None) -> DataFrame:
    """Per-document benchmark contamination: (id, n_hits) where n_hits =
    how many DISTINCT benchmark n-grams the document contains (docs with
    zero hits are not returned — at scale almost everything is clean and
    the output stays skinny).

    Plan shape: both sides explode to distinct (ngram) rows — linear, no
    state — and meet in one equi-join on the ngram string. The benchmark
    side is the distinct n-gram set of an EVALUATION suite: small by
    construction, so it is broadcast when it fits and the join is map-side
    (zero shuffle of the corpus). The default (``broadcast_bench=None``)
    GUARDS the hint with one cheap count of the distinct bench n-grams —
    one extra pass over the small bench relation only, never the corpus —
    and drops to AQE's choice above BCAST_ROW_LIMIT, so an unusually large
    eval suite can never OOM the driver. ``True`` hard-hints (caller
    asserts the set is small), ``False`` never hints (same pattern as
    similarity.broadcast_probes).
    """
    d_grams = (docs.select(F.col(id_col).alias("id"),
                           F.explode(F.array_distinct(
                               word_ngrams(text_col, n))).alias("g")))
    b_grams = (bench.select(F.explode(word_ngrams(text_col, n)).alias("g"))
               .distinct())
    if broadcast_bench is None:
        broadcast_bench = b_grams.count() <= BCAST_ROW_LIMIT
    if broadcast_bench:
        b_grams = F.broadcast(b_grams)
    return (d_grams.join(b_grams, "g")
            .groupBy("id").agg(F.count("*").alias("n_hits"))
            .select(F.col("id").alias(id_col), "n_hits"))


def ngram_contamination_sql(docs_table: str, bench_where: str, n: int = 8,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    """ANSI-SQL twin of :func:`ngram_contamination` for the DuckDB oracle:
    the benchmark side is ``docs_table`` filtered by ``bench_where``, the
    eval side its complement."""
    grams = (f"list_transform(generate_series(1, "
             f"len(string_split({text_col}, ' ')) - {n - 1}), "
             f"i -> array_to_string("
             f"string_split({text_col}, ' ')[i:i+{n - 1}], ' '))")
    return f"""
      WITH d_grams AS (
        SELECT {id_col} AS id, UNNEST(list_distinct({grams})) AS g
        FROM {docs_table}
        WHERE NOT ({bench_where})
          AND len(string_split({text_col}, ' ')) >= {n}),
      b_grams AS (
        SELECT DISTINCT UNNEST({grams}) AS g
        FROM {docs_table}
        WHERE ({bench_where})
          AND len(string_split({text_col}, ' ')) >= {n})
      SELECT id AS {id_col}, count(*) AS n_hits
      FROM d_grams JOIN b_grams USING (g)
      GROUP BY id
    """


def repetition_signals(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher/C4-style per-document repetition signals:

    - ``n_words`` — whitespace token count;
    - ``distinct_word_frac`` — |distinct words| / n_words (degenerate
      repetition pushes this toward 0);
    - ``top_word_frac`` — share of the single most frequent word (a page
      that is 40% one token is boilerplate);
    - ``dup_trigram_frac`` — fraction of word trigrams that are repeats
      of an earlier trigram in the same doc.

    Plan shape: the array-based signals are row-local higher-order
    functions; top_word_frac is the one distributed part — explode to
    (id, word), one partial-aggregating groupBy, one max over the group —
    all keyed by (id, word) then id: linear, skew-free (a document is one
    group; no document is 100 TB). Ratios are rounded to 4 decimals so
    the DuckDB twin compares exactly.

    Each signal column is ONE self-contained expression that binds its
    split/trigram array once (array-wrap + transform): a shared Column
    object referenced from several select expressions is re-evaluated per
    reference — Catalyst has no cross-expression CSE here — which for the
    trigram array meant three O(words^2) passes per row.
    """
    words = F.split(F.col(text_col), " ")
    dup_tri = F.expr(
        f"transform(array({_word_ngrams_sql(text_col, 3)}), tri ->"
        f" if(size(tri) > 0,"
        f" round((size(tri) - size(array_distinct(tri))) / size(tri), 4),"
        f" cast(0.0 as double)))[0]")
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(words).alias("n_words"),
        F.expr(f"transform(array(split({text_col}, ' ')), ws ->"
               f" round(size(array_distinct(ws)) / size(ws), 4))[0]")
        .alias("distinct_word_frac"),
        dup_tri.alias("dup_trigram_frac"))
    counts = (docs.select(F.col(id_col).alias("id"),
                          F.explode(F.split(F.col(text_col), " "))
                          .alias("w"))
              .groupBy("id", "w").agg(F.count("*").alias("c"))
              .groupBy("id").agg(F.max("c").alias("top_c"),
                                 F.sum("c").alias("n")))
    top = counts.select("id", F.round(F.col("top_c") / F.col("n"), 4)
                        .alias("top_word_frac"))
    return (base.join(top, "id")
            .select(F.col("id").alias(id_col), "n_words",
                    "distinct_word_frac", "top_word_frac",
                    "dup_trigram_frac"))


def repetition_signals_sql(docs_table: str, id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """ANSI-SQL twin of :func:`repetition_signals` (DuckDB oracle)."""
    w = f"string_split({text_col}, ' ')"
    tri = (f"list_transform(generate_series(1, len({w}) - 2), "
           f"i -> array_to_string({w}[i:i+2], ' '))")
    return f"""
      WITH base AS (
        SELECT {id_col} AS id,
               len({w}) AS n_words,
               ROUND(len(list_distinct({w})) * 1.0 / len({w}), 4)
                 AS distinct_word_frac,
               CASE WHEN len({w}) >= 3 THEN
                 ROUND((len({tri}) - len(list_distinct({tri}))) * 1.0
                       / len({tri}), 4)
               ELSE 0.0 END AS dup_trigram_frac
        FROM {docs_table}),
      wc AS (
        SELECT id, word, count(*) AS c FROM (
          SELECT {id_col} AS id, UNNEST({w}) AS word FROM {docs_table}) t
        GROUP BY id, word),
      top AS (
        SELECT id, ROUND(max(c) * 1.0 / sum(c), 4) AS top_word_frac
        FROM wc GROUP BY id)
      SELECT base.id AS {id_col}, n_words, distinct_word_frac,
             top_word_frac, dup_trigram_frac
      FROM base JOIN top USING (id)
    """


#: Default quality-rule thresholds (Gopher/C4-flavored). Keys are the rule
#: names emitted in ``reasons``; evaluation/emission order is fixed
#: alphabetical so both engines build the identical reasons string.
QUALITY_RULES = {
    "low_distinct": 0.35,   # distinct_word_frac <  threshold
    "repetitive": 0.02,     # dup_trigram_frac   >  threshold
    "too_long": 100_000,    # n_words            >  threshold
    "too_short": 25,        # n_words            <  threshold
    "top_heavy": 0.15,      # top_word_frac      >  threshold
}


def quality_filter(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   rules: dict | None = None) -> DataFrame:
    """Composed keep/drop quality verdict per document — the C4/Gopher
    pre-filter pipeline as one operator: ``(id, n_words, keep, reasons)``
    where ``reasons`` is the comma-joined (alphabetical) list of failed
    rule names, empty when the doc passes.

    Built on :func:`repetition_signals` (one linear pass + one skinny
    per-doc aggregate); the verdict itself is row-local CASE logic, so the
    composition adds zero shuffles. ``reasons`` is a STRING (not an array)
    so the DuckDB twin compares byte-identically at the driver's
    value-hash level.
    """
    r = dict(QUALITY_RULES, **(rules or {}))
    sig = repetition_signals(docs, id_col=id_col, text_col=text_col)
    checks = [
        ("low_distinct",
         F.col("distinct_word_frac") < r["low_distinct"]),
        ("repetitive", F.col("dup_trigram_frac") > r["repetitive"]),
        ("too_long", F.col("n_words") > r["too_long"]),
        ("too_short", F.col("n_words") < r["too_short"]),
        ("top_heavy", F.col("top_word_frac") > r["top_heavy"]),
    ]
    reasons = F.concat_ws(",", *[
        F.when(cond, F.lit(name)) for name, cond in checks])
    return sig.select(
        F.col(id_col), "n_words",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"))


def quality_filter_sql(docs_table: str, id_col: str = "doc_id",
                       text_col: str = "text",
                       rules: dict | None = None) -> str:
    """ANSI-SQL twin of :func:`quality_filter` (DuckDB oracle): the
    repetition-signal CTEs wrapped in the same fixed-order CASE checks;
    NULLs drop out of concat_ws on the Spark side and are filtered before
    joining here — identical strings either way."""
    r = dict(QUALITY_RULES, **(rules or {}))
    sig = repetition_signals_sql(docs_table, id_col=id_col,
                                 text_col=text_col)
    checks = [
        ("low_distinct", f"distinct_word_frac < {r['low_distinct']}"),
        ("repetitive", f"dup_trigram_frac > {r['repetitive']}"),
        ("too_long", f"n_words > {r['too_long']}"),
        ("too_short", f"n_words < {r['too_short']}"),
        ("top_heavy", f"top_word_frac > {r['top_heavy']}"),
    ]
    cases = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' END" for name, cond in checks)
    return f"""
      WITH sig AS ({sig}),
      v AS (
        SELECT {id_col}, n_words,
               COALESCE(array_to_string(
                 list_filter([{cases}], x -> x IS NOT NULL), ','), '')
                 AS reasons
        FROM sig)
      SELECT {id_col}, n_words, reasons = '' AS keep, reasons FROM v
    """


#: PII patterns, applied IN THIS ORDER, each stage on the previous stage's
#: redacted output (so an email's digit run is never double-counted as an
#: id number). Restricted to syntax with identical semantics in Java regex
#: (Spark) and RE2 (DuckDB): \b, \d, bounded/unbounded repetition,
#: character classes — no backrefs, no lookaround.
PII_STAGES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\b\d{9,}\b", "<ID>"),
)


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """PII detection + redaction — the scrubbing pass a web corpus gets
    before training: ``(id, n_email, n_ipv4, n_idnum, clean_text)`` where
    each count is the number of spans REPLACED at that stage and
    ``clean_text`` is the fully redacted text.

    Stages run sequentially (:data:`PII_STAGES` order), each counting and
    replacing on the previous stage's output, which makes the counts a
    partition of the redacted spans: no span is counted twice even where
    patterns overlap textually (email local parts contain digit runs).

    Plan shape: row-local ``regexp_extract_all`` + ``regexp_replace``
    chains inside whole-stage codegen — zero shuffles, scan-speed at
    100 TB. Java regex and RE2 agree on every construct used, so the
    DuckDB twin (:func:`redact_pii_sql`) matches byte-for-byte.
    """
    cur = "__t0"
    out = docs.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias(cur))
    for i, (name, pat, token) in enumerate(PII_STAGES):
        nxt = f"__t{i + 1}"
        out = (out.withColumn(
                   f"n_{name}",
                   F.size(F.regexp_extract_all(F.col(cur), F.lit(pat),
                                               F.lit(0))))
               .withColumn(nxt, F.regexp_replace(F.col(cur), pat, token)))
        cur = nxt
    return out.select("id", *[f"n_{n}" for n, _, _ in PII_STAGES],
                      F.col(cur).alias("clean_text"))


def redact_pii_sql(docs_table: str, id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """ANSI-SQL twin of :func:`redact_pii` (DuckDB oracle): the same
    staged count-then-replace CTE chain ('g' flag = replace all, matching
    Spark's regexp_replace default)."""
    ctes = [f"s0 AS (SELECT {id_col} AS id, {text_col} AS t0"
            f" FROM {docs_table})"]
    for i, (name, pat, token) in enumerate(PII_STAGES):
        ctes.append(
            f"s{i + 1} AS (SELECT *,"
            f" len(regexp_extract_all(t{i}, '{pat}')) AS n_{name},"
            f" regexp_replace(t{i}, '{pat}', '{token}', 'g') AS t{i + 1}"
            f" FROM s{i})")
    n = len(PII_STAGES)
    cols = ", ".join(f"n_{name}" for name, _, _ in PII_STAGES)
    return (f"WITH {', '.join(ctes)} "
            f"SELECT id, {cols}, t{n} AS clean_text FROM s{n}")


#: normalization regexes — explicit character classes because Java regex
#: and RE2 disagree on \s (Java includes \x0b, RE2 does not): controls =
#: C0 minus tab/newline/CR, plus DEL; whitespace = the ASCII run set with
#: \x0b/\x0c handled by the control strip that precedes it
_CTRL_PAT = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_WS_PAT = r"[ \t\n\r]+"


def normalize_text(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Text normalization — the canonicalization pass every curation
    pipeline runs BEFORE dedup/fingerprinting so that byte-different,
    visually-identical pages hash identically: Unicode NFC composition,
    control-character strip (C0 minus tab/newline/CR, plus DEL), ASCII
    whitespace-run collapse to single spaces, and edge trim. Output:
    ``(id, norm_text, changed)``.

    NFC runs as an Arrow-batched ``pandas_udf`` (Spark has no built-in
    Unicode normalizer; pandas ``str.normalize`` is the stdlib
    ``unicodedata`` NFC, bit-identical to DuckDB's ``nfc_normalize``, so
    the twin (:func:`normalize_text_sql`) stays exact); the strip/collapse
    stages are JVM ``regexp_replace``. Everything is row-local — zero
    shuffles, scan-speed at 100 TB.
    """
    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    src = F.col(text_col)
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(_nfc(src), _CTRL_PAT, ""), _WS_PAT, " "))
    # two-stage projection: norm is aliased once, then `changed` references
    # the attribute — Catalyst has no cross-expression CSE, and a single
    # projection would inline the regex chain twice per row (the UDF itself
    # is hoisted into one ArrowEvalPython either way). CollapseProject keeps
    # the split because the alias is non-cheap and referenced twice.
    mid = docs.select(F.col(id_col).alias("id"), src.alias("_src"),
                      norm.alias("norm_text"))
    return mid.select("id", "norm_text",
                      (F.col("norm_text") != F.col("_src")).alias("changed"))


def normalize_text_sql(docs_table: str, id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """ANSI-SQL twin of :func:`normalize_text` (DuckDB oracle)."""
    norm = (f"trim(regexp_replace(regexp_replace("
            f"nfc_normalize({text_col}), '{_CTRL_PAT}', '', 'g'),"
            f" '{_WS_PAT}', ' ', 'g'))")
    return (f"SELECT {id_col} AS id, {norm} AS norm_text,"
            f" {norm} <> {text_col} AS changed FROM {docs_table}")


def dedup_lines(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", max_count: int = 2,
                broadcast_freq: bool | None = None) -> DataFrame:
    """Global line-level deduplication (the C4 / RefinedWeb boilerplate
    filter): remove every line whose CORPUS-WIDE occurrence count exceeds
    ``max_count`` — cookie banners, nav bars, copyright footers repeat
    across millions of pages; real content does not. Output per input doc:
    ``(id, clean_text, n_lines, n_removed)`` — docs whose every line is
    boilerplate survive with ``clean_text = ''`` (the caller decides
    whether to drop empties; silent row loss here would corrupt joins
    keyed on the doc id downstream).

    Plan shape at 100 TB: posexplode to (id, pos, line) — linear, no state
    — then ONE partial-aggregating groupBy(line) whose map-side combine
    collapses repeated boilerplate before the shuffle, so the exchange
    carries ~distinct lines, not ~total lines. The frequent set
    (count > max_count) is small by construction — boilerplate is heavy-
    tailed — so the removal anti-join broadcasts it when it fits (guarded
    by a count of the aggregated frequent side, which is CACHED first so
    the corpus-wide aggregation feeding it runs once, not once for the
    guard and once for the join; ``True``/``False`` hard overrides skip
    the count) and the corpus lines never shuffle for the join. The one
    unavoidable wide text exchange is the groupBy(id) reassembly — the
    output IS the text. Everything is JVM-side; no Python in any path.

    ``split(text, '\\n', -1)`` keeps trailing empty strings (Spark's
    default limit drops them; DuckDB's string_split keeps them — the twin
    would diverge on texts ending in a newline).
    """
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1))
        .alias("pos", "line"))
    freq = (lines.groupBy("line").agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") > max_count).select("line"))
    if broadcast_freq is None:
        # cache BEFORE the guard count: freq derives from the corpus-wide
        # line aggregation, so an uncached count would run that whole
        # pipeline once for the guard and AGAIN for the anti-join —
        # doubling the dominant scan+shuffle. The cached set is small by
        # construction (boilerplate is heavy-tailed) and is released by
        # the ContextCleaner when the plan is garbage-collected.
        freq = freq.cache()
        broadcast_freq = freq.count() <= BCAST_ROW_LIMIT
    kept = lines.join(F.broadcast(freq) if broadcast_freq else freq,
                      "line", "left_anti")
    agg = kept.groupBy("id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos",
                                                             "line"))),
                        lambda x: x["line"]), "\n").alias("clean_text"),
        F.count("*").alias("n_kept"))
    # long, not int: DuckDB's len()/count(*) are BIGINT and the driver's
    # compare is schema-exact
    orig = docs.select(F.col(id_col).alias("id"),
                       F.size(F.split(F.col(text_col), "\n", -1))
                       .cast("long").alias("n_lines"))
    return (orig.join(agg, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    "n_lines",
                    (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
                    .alias("n_removed")))


def dedup_lines_sql(docs_table: str, id_col: str = "doc_id",
                    text_col: str = "text", max_count: int = 2) -> str:
    """ANSI-SQL twin of :func:`dedup_lines` for the DuckDB oracle."""
    return f"""
      WITH ls AS (
        SELECT {id_col} AS id, lsp[i] AS line, i AS pos
        FROM (SELECT {id_col}, string_split({text_col}, chr(10)) AS lsp
              FROM {docs_table}),
             unnest(generate_series(1, len(lsp))) AS r(i)),
      freq AS (
        SELECT line FROM ls GROUP BY line HAVING count(*) > {max_count}),
      kept AS (
        SELECT * FROM ls WHERE line NOT IN (SELECT line FROM freq)),
      agg AS (
        SELECT id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY id)
      SELECT d.{id_col},
             COALESCE(a.clean_text, '') AS clean_text,
             len(string_split(d.{text_col}, chr(10))) AS n_lines,
             len(string_split(d.{text_col}, chr(10)))
                  - COALESCE(a.n_kept, 0) AS n_removed
      FROM {docs_table} d LEFT JOIN agg a ON a.id = d.{id_col}
    """
