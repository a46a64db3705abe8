"""BenSP-Suite re-engineered as a PySpark-native analytics engine.

Reference: carlinhosfranco/BenSP-Suite (PARSEC-derived stream-parallelism
benchmark suite: dedup + ferret pipelines). This package re-expresses the
reference's data-processing capabilities Spark-first:

- ``operators/``  — relational operator shapes from SURVEY.md §2 (first-wins
  dedup J1, semi joins J7, top-K O2, histograms A2, set ops E2, ...), plus
  LLM-data-pipeline generalizations (text dedup, ANN similarity search,
  text analysis).
- ``dedup/``      — the content-defined-chunking dedup/compress pipeline
  (reference: apps/dedup/src/encoder.c) as DataFrame ops + Arrow pandas UDF
  kernels.
- ``ferret/``     — the feature-extraction + LSH + EMD-rerank similarity
  search pipeline (reference: apps/ferret/src/benchmark/ferret-pthreads.c).
- ``streaming/``  — Structured Streaming variants (bounded triggers, keyed
  dedup state, windowed throughput/latency metrics).
- ``sources/``    — binary-file ingestion and the ``ddp`` archive table format.
- ``functions/``  — scalar/vector kernels (distances, hashing, chunking).

Everything here is built on public PySpark 4.x APIs only.
"""

__version__ = "0.1.0"
