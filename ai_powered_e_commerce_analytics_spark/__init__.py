"""ai_powered_e_commerce_analytics_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference repo ``aymen-fkir/AI-Powered-E-commerce-Analytics`` (a Polars/Go
medallion ETL with LLM enrichment), re-expressed Spark-first:

- All relational work is declarative DataFrame/SQL (Catalyst optimizes).
- The LLM enrichment operator family (SURVEY.md §2.10 F1-F7) is a single
  Arrow-batched ``mapInPandas`` operator with a deterministic stub client
  for offline correctness and an OpenAI-compatible async client for prod.
- Medallion dataflow (bronze→silver→gold, SURVEY.md §2.9 ST1-ST4) is
  Structured Streaming file sources with checkpointing + archival.
- Keyed KPI upserts (SURVEY.md §2.1 S8) are a parquet-backed MERGE.
- Beyond-parity training-data ops: dedup (exact/minhash-LSH/simhash/
  n-gram-jaccard/embedding), similarity search, text analysis, multimodal
  column plumbing — all built for 100 TB scale (shuffle-conscious,
  JVM-side expressions, broadcast where small).
"""

__version__ = "0.1.0"
