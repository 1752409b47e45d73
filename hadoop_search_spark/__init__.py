"""hadoop_search_spark — a PySpark-native analytics/search engine.

A from-scratch re-expression of the capabilities of the reference
Hadoop MapReduce Wikipedia search engine (carinadu/hadoop-search):
corpus ingestion, stop-word discovery, TF-IDF positional inverted
index with range-partitioned output, and a CNF boolean query engine
with NOT handling and phrase-proximity scoring — plus the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing, streaming) a 100 TB
corpus pipeline needs.

Design stance (see SURVEY.md §7): relational-first. The inverted
index is a plain DataFrame ``postings(term, doc_id, tf, positions,
score)``; posting-list algebra is expressed as DataFrame joins so
Catalyst/Tungsten/AQE pick the physical strategy. Python UDFs appear
only where built-ins cannot express the semantics (Porter stemming).
"""

__version__ = "0.1.0"

from hadoop_search_spark.session import get_spark  # noqa: F401
