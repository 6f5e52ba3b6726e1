"""pdf_extractor_spark — a PySpark-native document-to-clean-text engine.

A from-scratch reimplementation of the capabilities of traagel/pdf-extractor
(reference snapshot at /root/reference) on Apache Spark:

- ``kernels/``   pure-Python per-document semantics (no Spark imports) shared by
  the vectorized pandas-UDF stages and the single-node golden generator.
- ``pipeline/``  the extraction surface: fused ``mapInPandas`` stages over a
  Common-Crawl-style ``pages`` table, salted repartitioning, checkpoint/resume,
  per-partition lineage.
- ``operators/`` the relational surface: every SURVEY.md §2 operator expressed
  as DataFrame/SQL ops (window sessionization, broadcast joins, top-k, dedup,
  similarity search, text analytics).
- ``sources/``   deterministic synthetic ``pages`` generator + readers.
"""

__version__ = "0.1.0"
