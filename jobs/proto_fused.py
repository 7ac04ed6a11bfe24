"""Dev prototype: fused extract+sentence-split+triple-parse in ONE mapInPandas
vs the extract-UDF + JVM-parse production path. Measures wall at
$SPARK_GRAFT_CPUS and verifies row equality on a small corpus."""

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, make_spark, warmup
from docprocai_service_spark.functions.text import (
    _RE_SENT_SPLIT,
    _RE_TRIPLE,
    extract_text_series,
)

TRIPLES_SCHEMA = "subj string, pred string, obj string, url string, warc_ts timestamp, sent_no int"


def fused(batches):
    for pdf in batches:
        pdf = pdf[pdf["lang"] == "en"]
        if not len(pdf):
            yield pd.DataFrame({c: [] for c in ["subj", "pred", "obj", "url", "warc_ts", "sent_no"]})
            continue
        text = extract_text_series(pdf["html"])
        sent_lists = [
            [x for x in _RE_SENT_SPLIT.split(t)] if t else [] for t in text
        ]
        sent_lists = [[x for x in sl if x] for sl in sent_lists]
        counts = np.array([len(sl) for sl in sent_lists])
        idx = np.repeat(np.arange(len(pdf)), counts)
        sents = pd.Series([s for sl in sent_lists for s in sl], dtype="object")
        sent_no = np.concatenate([np.arange(c) for c in counts]) if counts.sum() else np.array([], dtype=int)
        m = sents.str.extract(_RE_TRIPLE)
        keep = m[0].notna()
        out = pd.DataFrame(
            {
                "subj": m[0][keep],
                "pred": m[1][keep],
                "obj": m[2][keep],
                "url": pdf["url"].to_numpy()[idx][keep.to_numpy()],
                "warc_ts": pdf["warc_ts"].to_numpy()[idx][keep.to_numpy()],
                "sent_no": sent_no[keep.to_numpy()].astype("int32"),
            }
        )
        yield out


def main():
    spark = make_spark(CPUS)
    warmup(spark)
    from pyspark.sql import functions as F

    from docprocai_service_spark.operators.extract import extract_stage
    from docprocai_service_spark.operators.triples import triples_stage

    pages = spark.read.parquet("/tmp/bench_corpus_100000")

    jvm = triples_stage(extract_stage(pages))
    py = pages.mapInPandas(fused, schema=TRIPLES_SCHEMA)

    # equality on a slice
    small = spark.read.parquet("/tmp/bench_corpus_100000").limit(1500).localCheckpoint()
    a = sorted(map(tuple, triples_stage(extract_stage(small)).collect()))
    b = sorted(map(tuple, small.mapInPandas(fused, schema=TRIPLES_SCHEMA).collect()))
    same = a == b
    t = {"cpus": CPUS, "equal_on_1500": same, "n": len(a)}

    for name, df in (("jvm", jvm), ("python_fused", py)):
        df.count()
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            df.count()
            best = min(best, time.time() - t0)
        t[name] = round(best, 2)
    print(json.dumps(t))
    spark.stop()


if __name__ == "__main__":
    main()
