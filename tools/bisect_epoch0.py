import sys, time, tempfile, os
sys.path.insert(0, "/root/repo")
from rust_chunking_spark.session import get_spark
from rust_chunking_spark.engine import BucketedLake, CdcIngestJob
from rust_chunking_spark.engine.lake import AppendOnlyTable
from rust_chunking_spark.functions.chunking import sha3_256_udf, fingerprint_udf
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
spark = get_spark(cpus=cpus, shuffle_partitions=32)
w = spark.range(1024).repartition(cpus).select(sha3_256_udf(F.encode(F.col("id").cast("string"),"utf-8"))); w.count(); w.count()
tmp = tempfile.mkdtemp(dir="/dev/shm")
lake = BucketedLake(f"{tmp}/lake", n_buckets=32)
job = CdcIngestJob(spark, lake, AppendOnlyTable(f"{tmp}/chunks"), AppendOnlyTable(f"{tmp}/metrics"), collect_metrics=False)
events = spark.read.parquet("/dev/shm/bw2/epoch=000000")
T={}
t=time.perf_counter()
latest, keys = job._lww_latest(events)
latest = latest.withColumn("__fp", sha3_256_udf(F.col("html"))).cache()
pb = latest.groupBy(lake.bucket_expr().alias("b")).agg(F.sum("n_events").alias("seen"), F.count("*").alias("w")).collect()
dirty=[int(r.b) for r in pb]; nw=int(sum(r.w for r in pb)); T['lww+fp+cache']=time.perf_counter()-t
t=time.perf_counter()
cur_wide = lake.read(spark, buckets=dirty)
ev_meta = latest.select("url", F.col("warc_ts").alias("ev_warc_ts"), F.col("lsn").alias("ev_lsn"), F.col("op").alias("ev_op"), F.col("__fp").alias("ev_fp"))
decided = (ev_meta.withColumn("cur_warc_ts", F.lit(None).cast("timestamp")).withColumn("cur_lsn", F.lit(None).cast("long"))
           .withColumn("cur_fp", F.lit(None).cast("binary")).withColumn("cur_deleted", F.lit(None).cast("boolean")).withColumn("cur_exists", F.lit(False)))
decided = decided.withColumn("decision", job._decision_expr()).cache(); decided.count(); T['decide']=time.perf_counter()-t
t=time.perf_counter()
new_rows, changed = job._assemble_rows(latest, decided, cur_wide, nw, [])
T['assemble-plan']=time.perf_counter()-t
t=time.perf_counter()
fp = fingerprint_udf("super")
chunked = changed.repartition(max(2, spark.sparkContext.defaultParallelism)).withColumn("chunks", fp(F.col("html")))
n = chunked.select(F.explode("chunks")).count()
T['chunkUDF']=time.perf_counter()-t
t=time.perf_counter()
cs = job._update_chunk_store(changed, 0); T['chunkstore(redo)']=time.perf_counter()-t
t=time.perf_counter(); job._append_metrics(decided, 0); T['metrics']=time.perf_counter()-t
t=time.perf_counter(); lake.overwrite_buckets(new_rows, dirty, 0, {"__schema": new_rows.schema.json()}); T['lakewrite']=time.perf_counter()-t
print(f"cpus={cpus}:", {k: round(v,1) for k,v in T.items()}, "total", round(sum(T.values()),1), "chunks", n)
spark.stop()
