"""samba_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of UFFeScience/SAMbA (reference studied at
/root/reference), re-expressed Spark-first.

Layers (SURVEY.md):
- Layer B: the full relational/dataflow surface — idiomatic DataFrame/SQL,
  Catalyst-optimized (``samba_spark.queries``).
- Layer A: the SAMbA delta — run/task/element provenance, transformation
  groups, file groups + black-box execution, artifact versioning
  (``samba_spark.prov``, ``samba_spark.sources.filegroup``,
  ``samba_spark.blackbox``).
- Extensions: large-scale training-data pipeline operators — dedup,
  similarity search, text analysis, multimodal columns
  (``samba_spark.operators``).
"""

from samba_spark.session import ProvSession, get_spark

__all__ = ["ProvSession", "get_spark"]
__version__ = "0.1.0"
