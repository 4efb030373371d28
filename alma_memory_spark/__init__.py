"""alma_memory_spark — a PySpark-native agent-memory analytics engine.

A brand-new implementation (not a port) of the query and data-processing
capabilities of the ALMA-memory reference engine, re-expressed on Spark
DataFrames / SQL / Window functions / pandas UDFs and designed for
multi-executor scale:

- five typed memory tables (heuristics, outcomes, preferences,
  domain_knowledge, anti_patterns) as partitioned Parquet DataFrames with
  embedding columns (reference data model: alma/types.py:144-252),
- a retrieval pipeline fusing exact vector top-k, TF-IDF/BM25 text search
  (RRF), and a multi-factor composite scorer (reference:
  alma/retrieval/scoring.py:15-310),
- a learning layer aggregating outcomes into heuristics / anti-patterns
  (reference: alma/learning/heuristic_extractor.py, protocols.py),
- lifecycle (decay, forgetting, quotas, archive), consolidation
  (similarity self-join), feedback / trust re-ranking, workflow
  checkpoints + state reducers, bitemporal graph with as-of queries,
- plus large-corpus pipeline operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), ANN similarity search,
  text analysis (language-ID, quality, tokens, fingerprints) and
  multimodal column plumbing.
"""

__version__ = "0.1.0"

from alma_memory_spark.session import get_spark  # noqa: F401
