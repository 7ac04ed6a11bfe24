"""docprocai_service_spark — a brand-new PySpark-native knowledge-graph
construction engine with the data-processing capabilities of
MEITREX/docprocai_service, re-expressed Spark-first.

This is NOT a port: the reference is a per-document FastAPI/Postgres service
(see /root/reference, SURVEY.md). Here every stage is a declarative DataFrame
transformation (Catalyst-optimized, whole-stage-codegen where possible) with
vectorized Arrow pandas UDFs only where built-in functions genuinely cannot
express the semantics (HTML boilerplate stripping, MinHash signatures).

Layout:
  session.py              SparkSession factory (Arrow on, AQE on)
  schemas.py              every table schema declared once (SURVEY §1.3)
  corpus.py               deterministic synthetic Common-Crawl-style corpus
  reference_impl.py       pure-Python oracle extractor (the correctness bar)
  functions/              scalar/vector function library (text, hashing, cosine)
  operators/              the KG stages + dedup/similarity/search operators
  sources/                table IO + checkpoint manifests (resume semantics)
  plans/                  end-to-end pipeline driver (stage DAG, lineage)
  streaming/              incremental ingest (availableNow micro-batch)
"""

__version__ = "0.1.0"
