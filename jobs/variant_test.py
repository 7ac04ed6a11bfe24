"""Dev tool: A/B spark-conf variants for the KG scaling investigation."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant = sys.argv[1]
os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
from bench import CPUS, warmup  # noqa: E402

extra = {}
if variant == "mem12":
    os.environ["SPARK_DRIVER_MEM"] = "12g"
elif variant == "parallelgc":
    extra["spark.driver.extraJavaOptions"] = "-XX:+UseParallelGC"
elif variant == "zgc":
    extra["spark.driver.extraJavaOptions"] = "-XX:+UseZGC -XX:+ZGenerational"
elif variant == "g1small":
    extra["spark.driver.extraJavaOptions"] = "-XX:MaxGCPauseMillis=50"
    os.environ["SPARK_DRIVER_MEM"] = "16g"

from docprocai_service_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="v", cores=CPUS, shuffle_partitions=CPUS,
                  extra_conf={"spark.ui.showConsoleProgress": "false", **extra})
warmup(spark)
from docprocai_service_spark import schemas  # noqa: E402
from docprocai_service_spark.corpus import alias_dict_pdf  # noqa: E402
from docprocai_service_spark.plans.pipeline import run_pipeline  # noqa: E402

alias = spark.createDataFrame(alias_dict_pdf(400), schema=schemas.ALIAS_DICT).localCheckpoint()
pages = spark.read.parquet("/tmp/bench_corpus_100000")
warm = run_pipeline(spark, pages.limit(2000), alias, out_dir=None, collect_lineage=False)
warm.edges.count()
warm.linked.count()
warm.triples.unpersist()
warm.canon_map.unpersist()
t0 = time.time()
r = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
r.edges.count()
r.linked.count()
wall = time.time() - t0
print(json.dumps({"variant": variant, "cpus": CPUS, "wall_s": round(wall, 2),
                  "tps": round(r.n_triples() / wall, 1)}))
spark.stop()
