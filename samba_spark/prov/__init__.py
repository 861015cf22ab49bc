"""Provenance capture, storage and query (SAMbA Layer A).

The reference persists provenance to a 7-table Cassandra keyspace
``dfanalyzer`` (reference CassandraDatabaseScript.cql:1-62) with
fire-and-forget per-element async inserts
(br/uff/spark/database/CassandraDBDao.scala:18-268). Our store keeps the
same logical schema as parquet tables under one run directory, written in
per-partition batches — orders of magnitude fewer round trips, and the
tables are directly queryable by Spark SQL (samba_spark/prov/queries.py).
"""

from samba_spark.prov.store import ProvStore
from samba_spark.prov import queries

__all__ = ["ProvStore", "queries"]
