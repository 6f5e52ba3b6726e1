"""Extraction pipeline: fused pandas-UDF stages, salting, lineage, resume."""
