"""crawler_spark — a PySpark-native distributed crawl + web-text analytics engine.

A from-scratch reimplementation of the *capabilities* of the reference
crawler (`shenghai3711/Crawler`, read-only at /root/reference) on idiomatic
PySpark: URL frontier + politeness scheduler as DataFrame supersteps over
Iceberg-style versioned tables, partitioned Bloom URL-seen, vectorized
pandas/Arrow extraction UDFs, checkpoint/resume, plus the training-data
pipeline operators (dedup, similarity search, text analysis) a 100 TB web
corpus needs.

Nothing here is a port: the reference's thread-pool/EF-Core architecture
(HZ.Crawler.DataSpider/BaseSpider.cs) is replaced by declarative DataFrame
plans that Catalyst optimizes; state lives in versioned parquet tables
(Iceberg-compatible layout) rather than SQLite/Redis.
"""

__version__ = "0.1.0"
