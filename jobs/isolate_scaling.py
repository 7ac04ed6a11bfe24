"""Dev tool: isolate which phase fails to scale 4->16 cores.

Phases measured separately on the same 100k-page corpus:
  extract : parquet scan + Arrow UDF only (Python-heavy)
  parse   : sentence split + triple carve on PRE-EXTRACTED text (JVM-only)
  full    : extract+parse fused (the production triples stage)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, make_spark, warmup

spark = make_spark(CPUS)
warmup(spark)
from pyspark.sql import functions as F

from docprocai_service_spark.operators.extract import extract_stage
from docprocai_service_spark.operators.triples import triples_stage

pages = spark.read.parquet("/tmp/bench_corpus_100000")
out = {"cpus": CPUS}

# pre-extract once to parquet so the parse phase reads plain text
pre = "/tmp/bench_extracted_100000"
if not os.path.exists(os.path.join(pre, "_SUCCESS")):
    extract_stage(pages).write.mode("overwrite").parquet(pre)
extracted = spark.read.parquet(pre)

def timed(name, df):
    df.count()  # warm
    t0 = time.time()
    df.count()
    out[name] = round(time.time() - t0, 2)

timed("extract", extract_stage(pages).select(F.length("text").alias("n")).groupBy().sum("n"))
timed("parse_jvm", triples_stage(extracted))
timed("full_fused", triples_stage(extract_stage(pages)))
print(json.dumps(out))
spark.stop()
