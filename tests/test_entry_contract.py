"""Driver contract smoke: entry() runs, queries()/oracle_sql() are consistent."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    r = rows[0]
    assert r.total_chunks > 0 and r.unique_chunks > 0 and r.total_bytes > 0


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
    # rows-only entries are the genuinely non-SQL-expressible ones
    rows_only = set(q) - set(o)
    assert rows_only <= {
        "chunk_dedup_ratio_super", "minhash_dup_pairs", "simhash_docs",
        "chunk_stats_all"}


def test_sample_queries_run_at_smallest_sf(spark):
    q = entrymod.queries()
    for name in ["chunk_cov_super", "lww_latest_events", "pricing_summary",
                 "ann_topk_cosine", "doc_tokens"]:
        df = q[name](spark, "/root/testdata/sf0.001")
        assert df.count() >= 0
