"""Sources & sinks: parquet/csv/json/text/binaryFile readers plus the
FileGroup source (SURVEY.md §2.1 A4, §2.3 sources table)."""

from samba_spark.sources.tables import TABLE_NAMES, load_tables

__all__ = ["TABLE_NAMES", "load_tables"]
