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


def test_queries_fit_the_driver_window():
    """The driver's correctness sweep evaluates only the FIRST 50 entries
    of queries() in insertion order (VERDICT r6 finding #1: CORRECTNESS_r06
    was the exact 50-prefix, silently dropping the 8 newest operators).
    Pin the cap so a future addition without a consolidation fails HERE,
    not silently in the round artifact."""
    q = entrymod.queries()
    assert len(q) <= entrymod.DRIVER_QUERY_CAP == 50
    # the round-6 operators the cap overflow dropped must sit in the window
    for name in ["winnow_fingerprints", "winnow_shared_pairs",
                 "pii_redaction", "normalized_docs", "canonical_urls",
                 "contamination_hits", "doc_repetition", "quality_verdicts",
                 "packed_sequences", "chunk_cov_seq_dec"]:
        assert name in q, name
    # retired coverage is disjoint from the live window and fully oracled
    rq, ro = entrymod.retired_queries(), entrymod.retired_oracle_sql()
    assert not (set(rq) & set(q))
    assert set(ro) == set(rq)


def test_retired_queries_stay_oracle_green(spark):
    """Every query consolidated out of the driver window (VERDICT r6 next
    #1) keeps full Spark-vs-DuckDB value parity at sf0.001 — retirement
    frees a driver slot, it does not drop the evidence."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    oracles = entrymod.retired_oracle_sql()
    for name, fn in entrymod.retired_queries().items():
        sdf = fn(spark, sf).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        assert len(sdf) == len(odf), name
        assert sorted(sdf.columns) == sorted(odf.columns), name
        s = sdf[sorted(sdf.columns)].astype(str).sort_values(
            by=sorted(sdf.columns)).reset_index(drop=True)
        o = odf[sorted(odf.columns)].astype(str).sort_values(
            by=sorted(odf.columns)).reset_index(drop=True)
        assert s.equals(o), name


def test_sample_queries_run_at_smallest_sf(spark):
    q = entrymod.queries()
    for name in ["chunk_cov_super", "lww_latest_events", "pricing_summary",
                 "ann_topk_cosine", "doc_tokens"]:
        df = q[name](spark, "/root/testdata/sf0.001")
        assert df.count() >= 0


def test_ann_ivf_trained_oracle_parity_at_driver_sf(spark):
    """The trained-quantizer oracle (VERDICT r4 missing #4) rests on both
    engines deriving bit-identical centroids from the same sample: run the
    Spark query AND the generated DuckDB SQL at sf0.01 — the driver's
    contractual oracle scale — and compare values row-for-row."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    sdf = entrymod.queries()["ann_ivf_topk"](spark, sf)
    # compare at the queries' own 4-decimal precision: DuckDB's
    # list_cosine_similarity returns FLOAT, so its round(x, 4) carries
    # float32 representation noise (0.29280000925 for 0.2928) that the
    # driver's value-hash normalizes away
    norm = lambda rows: sorted((a, b, round(float(s), 4)) for a, b, s in rows)
    srows = norm(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    orows = norm(con.execute(entrymod.oracle_sql()["ann_ivf_topk"]).fetchall())
    assert len(srows) > 0
    assert srows == orows
