"""Pure-Python per-document kernels (no Spark imports).

Each kernel reproduces a documented behavior of the reference
(traagel/pdf-extractor) — citations are to /root/reference file:line.
The same functions run inside vectorized pandas UDFs on executors and in
the single-node golden generator, which is what makes byte-identity under
distribution tractable (SURVEY.md §7.3).
"""
