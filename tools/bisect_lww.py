import sys, time
sys.path.insert(0, "/root/repo")
from rust_chunking_spark.session import get_spark
from rust_chunking_spark.engine import BucketedLake, CdcIngestJob
from rust_chunking_spark.engine.lake import AppendOnlyTable
from rust_chunking_spark.functions.chunking import sha3_256_udf
from pyspark.sql import functions as F
cpus = int(sys.argv[1])
spark = get_spark(cpus=cpus, shuffle_partitions=32)
w = spark.range(1024).repartition(cpus).select(sha3_256_udf(F.encode(F.col("id").cast("string"),"utf-8"))); w.count(); w.count()
import tempfile
lake = BucketedLake(tempfile.mkdtemp(dir="/dev/shm") + "/lake", n_buckets=32)
job = CdcIngestJob(spark, lake, None, None)
events = spark.read.parquet("/dev/shm/bw2/epoch=000000")
t=time.perf_counter(); latest, keys = job._lww_latest(events); n=latest.count(); print("a) scan+join:", round(time.perf_counter()-t,1), n)
t=time.perf_counter(); l2 = latest.withColumn("__fp", sha3_256_udf(F.col("html"))); l2.filter(F.col("__fp").isNotNull()).count(); print("b) +sha3:", round(time.perf_counter()-t,1))
t=time.perf_counter(); l3 = l2.cache(); l3.count(); print("c) +cache:", round(time.perf_counter()-t,1))
t=time.perf_counter(); l3.groupBy(lake.bucket_expr().alias("b")).agg(F.count("*")).collect(); print("d) reuse cache:", round(time.perf_counter()-t,1))
spark.stop()
