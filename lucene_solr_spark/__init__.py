"""lucene_solr_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference Lucene/Solr snapshot (/root/reference, 6.0.0-SNAPSHOT), expressed
Spark-first: the corpus and every derived index structure is a DataFrame /
Parquet table, every hot kernel is a vectorized numpy/pandas (Arrow) UDF,
and all distribution decisions (partitioning, salting, merge tiers) are
explicit DataFrame operations.

Layout:
  analysis/   HTMLStrip + StandardAnalyzer-chain kernels (shared with oracle)
  index/      codec (posting blocks), segment build, tiered merge, manifest
  search/     BM25 float32 math, boolean planner, WAND top-k engine
  functions/  text analytics, dedup (minhash/simhash), similarity search
  oracle/     pure-pandas reference implementation (rank-identity gate)
  streaming/  incremental (NRT-style) index append via Structured Streaming
"""

__version__ = "0.1.0"
