#!/usr/bin/env python
"""Stage-isolated timing of the jvm admission pipeline on the cached
mega-round input: where did the wall go?"""
import os
import sys
import time

sys.argv = ["prof_admit"]
sys.path.insert(0, "/root/repo")
import bench_scaling as B  # noqa: E402

B.N_DOCS, B.N_HOSTS, B.FRONTIER_EVERY = 24_000_000, 24_000, 3
docs_path, frontier_path = B.materialize_inputs()

from pyspark.sql import functions as F  # noqa: E402

spark = B.make_spark(8)
spark.sparkContext.setLogLevel("ERROR")
from methanol_web_crawler_spark.config import default_config  # noqa: E402
from methanol_web_crawler_spark.functions.extract_jvm import (  # noqa: E402
    split_jvm_extractable,
)
from methanol_web_crawler_spark.functions.admit_jvm import (  # noqa: E402
    split_fast_admit,
)
from methanol_web_crawler_spark.functions.udfs import (  # noqa: E402
    CANDIDATE_SCHEMA,
    make_link_admitter,
)

docs = B.register_bucketed_docs(spark, docs_path)
docs.count()
frontier = spark.read.parquet(frontier_path).persist()
frontier.count()
cfg = default_config(robotstxt=True)

ordered = frontier.withColumn(
    "fetch_ord", F.xxhash64("url")
).withColumn("fetch_round", F.lit(0))
fetched = ordered.join(
    docs, ordered.url == docs.doc_id, "left"
).drop("doc_id").persist()
t0 = time.time()
n = fetched.count()
print(f"T fetch_join={time.time()-t0:.1f}s rows={n}", flush=True)

link_rows, py_docs = split_jvm_extractable(fetched, cfg)
t0 = time.time()
n = link_rows.count()
print(f"T extract(link_rows)={time.time()-t0:.1f}s rows={n}", flush=True)

fast, residue, _ = split_fast_admit(link_rows, cfg, "default", cache=False)
t0 = time.time()
n = fast.count()
print(f"T fast_out={time.time()-t0:.1f}s rows={n}", flush=True)
t0 = time.time()
n = residue.count()
print(f"T residue(count only)={time.time()-t0:.1f}s rows={n}", flush=True)
admitter = make_link_admitter(cfg, "default")
t0 = time.time()
n = residue.mapInPandas(admitter, CANDIDATE_SCHEMA).count()
print(f"T residue(admitted)={time.time()-t0:.1f}s rows={n}", flush=True)
t0 = time.time()
n = link_rows.mapInPandas(admitter, CANDIDATE_SCHEMA).count()
print(f"T all_python_admit={time.time()-t0:.1f}s rows={n}", flush=True)
spark.stop()
