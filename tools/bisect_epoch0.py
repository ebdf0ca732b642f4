import sys, time, tempfile
sys.path.insert(0, "/root/repo")
from rust_chunking_spark.session import get_spark
from rust_chunking_spark.engine import BucketedLake, CdcIngestJob
from rust_chunking_spark.engine.lake import AppendOnlyTable
from rust_chunking_spark.functions.chunking import sha3_256_udf
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
wal = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/bw2"
spark = get_spark(cpus=cpus, shuffle_partitions=32)
w = spark.range(1024).repartition(cpus).select(sha3_256_udf(F.encode(F.col("id").cast("string"),"utf-8"))); w.count(); w.count()
tmp = tempfile.mkdtemp(dir="/dev/shm")
lake = BucketedLake(f"{tmp}/lake", n_buckets=32)
job = CdcIngestJob(spark, lake, AppendOnlyTable(f"{tmp}/chunks"), AppendOnlyTable(f"{tmp}/metrics"), collect_metrics=False)
for ep in range(2):
    events = spark.read.parquet(f"{wal}/epoch={ep:06d}")
    T = {}
    t=time.perf_counter()
    latest, keys = job._lww_latest(events)
    pb = latest.groupBy(lake.bucket_expr().alias("b")).agg(F.sum("n_events").alias("seen"), F.count("*").alias("w")).collect()
    dirty=[int(r.b) for r in pb]; nw=int(sum(r.w for r in pb)); T['lww']=time.perf_counter()-t
    t=time.perf_counter()
    cur_wide = lake.read(spark, buckets=dirty)
    extras=[c for c in latest.columns if c not in {"url","warc_ts","lsn","op","html","text","lang","__fp","n_events","epoch"}]
    ev_meta = latest.select("url", F.col("warc_ts").alias("ev_warc_ts"), F.col("lsn").alias("ev_lsn"), F.col("op").alias("ev_op"), sha3_256_udf(F.col("html")).alias("ev_fp"), *[F.col(c).alias(f"ev_x_{c}") for c in extras])
    if cur_wide is None:
        decided = (ev_meta.withColumn("cur_warc_ts", F.lit(None).cast("timestamp")).withColumn("cur_lsn", F.lit(None).cast("long"))
                   .withColumn("cur_fp", F.lit(None).cast("binary")).withColumn("cur_deleted", F.lit(None).cast("boolean")).withColumn("cur_exists", F.lit(False)))
    else:
        cur_meta = cur_wide.select("url", F.col("warc_ts").alias("cur_warc_ts"), F.col("lsn").alias("cur_lsn"), F.col("content_fp").alias("cur_fp"), F.col("deleted").alias("cur_deleted"), F.lit(True).alias("cur_exists"))
        decided = ev_meta.join(cur_meta, "url", "left").withColumn("cur_exists", F.coalesce(F.col("cur_exists"), F.lit(False)))
    decided = decided.withColumn("decision", job._decision_expr()).cache(); decided.count(); T['decide+sha3']=time.perf_counter()-t
    t=time.perf_counter()
    new_rows, iu_urls = job._assemble_rows(latest, decided, cur_wide, nw, extras)
    mf = lake.overwrite_buckets(new_rows, dirty, ep, {"__schema": new_rows.schema.json()})
    T['write(chunkUDF)']=time.perf_counter()-t
    t=time.perf_counter()
    cs = job._update_chunk_store(mf, iu_urls, nw, ep); T['store']=time.perf_counter()-t
    t=time.perf_counter(); job._append_metrics(decided, ep); T['metrics']=time.perf_counter()-t
    decided.unpersist(); keys.unpersist()
    print(f"cpus={cpus} ep{ep}:", {k: round(v,1) for k,v in T.items()}, "total", round(sum(T.values()),1))
spark.stop()
