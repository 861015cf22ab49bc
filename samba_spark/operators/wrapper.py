"""ProvDataFrame — the provenance-instrumented DataFrame.

Design (SURVEY.md §2.1, §4.2): the reference forks Spark so that every RDD
operator computes ``Iterator[DataElement[T]]`` (reference
core/src/main/scala/org/apache/spark/rdd/RDD.scala:123) and fires one async
Cassandra insert per element (br/uff/spark/DataElement.scala:24-29). We stay
on stock Spark: each public operator is a thin passthrough to the DataFrame
API that

1. mints a *task* row at construction time (reference rdd/RDD.scala:157-197
   persists the Task synchronously on RDD construction — same timing here),
2. when element provenance is enabled, carries ``_prov_id`` /
   ``_prov_deps`` as ordinary columns so lineage rides the same Tungsten
   pipeline as the data (no per-record side channel), and
3. persists element tables in columnar batches.

Element-dependency semantics preserved from the reference (SURVEY.md §2.1):
map 1-1 (rdd/RDD.scala:496-516), filter pass-through + opt-in drop-sentinel
(rdd/MapPartitionsRDD.scala:83-127), aggregation n-1 via collect_set
(Aggregator.scala:38-55), join all-matching-sides (CoGroupedRDD.scala:86-133),
distinct survivor-depends-on-duplicates (rdd/RDD.scala:534-548), ignored ops
transparent (DataElement.scala:34-46).

Provenance levels:
- ``provenance=False``: wrapper is a pure passthrough (zero overhead).
- ``provenance=True`` (default): run/task-level capture — O(#operators)
  metadata, no per-row cost; this is the bench configuration.
- ``element_provenance=True`` on an operator chain (``.with_elements()``):
  full element-level capture, persisted per operator in distributed batches.
  Opt-in because at 100 TB the element tables dwarf the data.
"""

from __future__ import annotations

import uuid
from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from samba_spark.prov.model import PROV_DEPS, PROV_ID

# Cap on fan-in recorded through one aggregation output element. Reference
# accumulates unbounded UUID lists across spills
# (util/collection/ExternalSorter.scala:181-460); unbounded is not viable at
# 100 TB, so we cap and mark truncation (SURVEY.md §4.2 hard spot (a)).
AGG_DEPS_CAP = 10_000
DROP_SENTINEL_PREFIX = "don't-pass: "


def _new_task_id() -> str:
    return str(uuid.uuid4())


class ProvDataFrame:
    """A DataFrame plus its provenance Task. All relational methods mirror
    pyspark.sql.DataFrame and return ProvDataFrame."""

    def __init__(
        self,
        session,
        df: DataFrame,
        *,
        op: str,
        desc: Optional[str] = None,
        parents: Sequence["ProvDataFrame"] = (),
        ignored: bool = False,
        elements_enabled: bool = False,
        register: bool = True,
    ):
        self.session = session
        self._df = df
        self.op = op
        self.desc = desc or op
        self.parents = list(parents)
        self.ignored = ignored
        self.elements_enabled = elements_enabled
        self.task_id = _new_task_id()
        self.schema_fn: Optional[Callable] = None
        self._elements_written = False
        if register and session.provenance_enabled and not ignored:
            dep_ids = self._effective_parent_task_ids()
            group_id = session.groups.register(
                self.task_id,
                has_parent_in_group=any(
                    p.task_id in (session.groups.current.init_tasks
                                  + session.groups.current.intermediary_tasks)
                    for p in self.parents
                ) if session.groups.current else False,
            )
            session.store.write_task(
                session.run_id,
                self.task_id,
                transformation_type=op,
                description=self.desc,
                schema_fields=self.user_columns,
                dep_task_ids=dep_ids,
                group_id=group_id,
            )

    # -- plumbing ----------------------------------------------------------
    def _effective_parent_task_ids(self) -> list[str]:
        """Task deps skip ignored parents to their nearest recorded ancestor
        (reference Task.scala:34-43: ignored tasks are transparent)."""
        out: list[str] = []
        for p in self.parents:
            if p.ignored:
                out.extend(p._effective_parent_task_ids())
            else:
                out.append(p.task_id)
        return out

    @property
    def df(self) -> DataFrame:
        """The underlying Spark DataFrame *without* provenance columns."""
        return self._df.select(*self.user_columns)

    @property
    def raw(self) -> DataFrame:
        return self._df

    @property
    def user_columns(self) -> list[str]:
        return [c for c in self._df.columns if c not in (PROV_ID, PROV_DEPS)]

    @property
    def columns(self) -> list[str]:
        return self.user_columns

    @property
    def schema(self):
        return self.df.schema

    @staticmethod
    def _mint_ids(df: DataFrame) -> DataFrame:
        """Assign fresh element ids: random-prefix + partition-local counter,
        unique across operators and executors. The reference uses time-based
        UUIDv1 with a per-worker LSB offset for the same collision concern
        (DataElement.scala:78-85)."""
        prefix = uuid.uuid4().hex[:12]
        return df.withColumn(
            PROV_ID,
            F.concat_ws(
                ":", F.lit(prefix), F.monotonically_increasing_id().cast("string")
            ),
        )

    def _child(
        self,
        df: DataFrame,
        op: str,
        desc: Optional[str] = None,
        *,
        parents: Optional[Sequence["ProvDataFrame"]] = None,
        ignored: bool = False,
    ) -> "ProvDataFrame":
        return ProvDataFrame(
            self.session,
            df,
            op=op,
            desc=desc,
            parents=parents if parents is not None else [self],
            ignored=ignored,
            elements_enabled=self.elements_enabled,
        )

    # element-capture helpers ------------------------------------------------
    def _with_row_lineage(self, df: DataFrame) -> DataFrame:
        """1-1 ops: new id, deps = [parent id] (reference map semantics,
        rdd/RDD.scala:496-516). If capture is off, strip prov columns."""
        if not self.elements_enabled:
            return df.drop(PROV_ID, PROV_DEPS)
        deps = (
            F.array(F.col(PROV_ID)) if PROV_ID in df.columns else F.array().cast("array<string>")
        )
        df = df.withColumn(PROV_DEPS, deps).drop(PROV_ID)
        return self._mint_ids(df)

    def with_elements(self) -> "ProvDataFrame":
        """Turn on element-level capture from this operator downstream."""
        out = self._child(self._df, op="with_elements", desc="enable elements")
        out.elements_enabled = True
        out._df = out._mint_ids(
            out._df.withColumn(PROV_DEPS, F.array().cast("array<string>"))
        )
        return out

    def persist_elements(self) -> "ProvDataFrame":
        """Write this operator's element + element-dep rows (distributed)."""
        if not (self.session.provenance_enabled and self.elements_enabled):
            return self
        if self._elements_written:
            return self
        self._elements_written = True
        cached = self._df.cache()
        self._df = cached
        run_id, task_id = self.session.run_id, self.task_id
        user_cols = self.user_columns
        if self.schema_fn is not None:
            values = self.schema_fn(cached)
        else:
            values = F.array(
                F.array(*[F.col(c).cast("string") for c in user_cols])
            )
        elements = cached.select(
            F.lit(run_id).alias("run_id"),
            F.lit(task_id).alias("task_id"),
            F.col(PROV_ID).alias("element_id"),
            values.alias("values"),
            F.to_json(F.struct(*[F.col(c) for c in user_cols])).alias("value_json"),
        )
        self.session.store.append_elements(elements)
        deps = cached.select(
            F.lit(run_id).alias("run_id"),
            F.lit(task_id).alias("task_id"),
            F.col(PROV_ID).alias("element_id"),
            F.explode(F.col(PROV_DEPS)).alias("dep_element_id"),
        ).select("run_id", "task_id", "element_id", "dep_element_id")
        self.session.store.append_element_deps(deps)
        return self

    # -- A10/A11/A12 --------------------------------------------------------
    def set_schema(self, fn: Callable[[DataFrame], Column]) -> "ProvDataFrame":
        """A10: provenance projection (reference rdd/RDD.scala:271-275).
        ``fn(df) -> array<array<string>> column`` used for elements.values."""
        self.schema_fn = fn
        return self

    def ignore_it(self) -> "ProvDataFrame":
        """A11: exclude this op from provenance; deps flow through
        (reference rdd/RDD.scala:238-241, DataElement.scala:34-46)."""
        self.ignored = True
        return self

    def set_name(self, name: str) -> "ProvDataFrame":
        """A12 (reference rdd/RDD.scala:281-285)."""
        self.desc = name
        return self

    # -- sources -------------------------------------------------------------
    @classmethod
    def _source(cls, session, df: DataFrame, op: str, desc: str) -> "ProvDataFrame":
        return cls(session, df, op=op, desc=desc, parents=())

    # -- relational surface (Layer B passthroughs) ---------------------------
    def select(self, *cols) -> "ProvDataFrame":
        keep = [PROV_ID] if self.elements_enabled and PROV_ID in self._df.columns else []
        df = self._df.select(*cols, *keep)
        return self._child(self._with_row_lineage_from(df), "map", "select")

    def _with_row_lineage_from(self, df: DataFrame) -> DataFrame:
        if not self.elements_enabled:
            return df.drop(PROV_ID, PROV_DEPS)
        df = df.withColumn(PROV_DEPS, F.array(F.col(PROV_ID))).drop(PROV_ID)
        return self._mint_ids(df)

    def with_column(self, name: str, col: Column) -> "ProvDataFrame":
        df = self._df.withColumn(name, col)
        return self._child(self._with_row_lineage(df), "map", f"with_column({name})")

    withColumn = with_column

    def where(self, condition, *, track_dropped: bool = False) -> "ProvDataFrame":
        """filter. ``track_dropped=True`` also records dropped rows as deps of
        a per-task sentinel element (reference
        rdd/MapPartitionsRDD.scala:83-127) — opt-in: it doubles scan work."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        df = self._df.where(cond)
        child = self._child(self._with_row_lineage(df), "filter", str(condition)[:200])
        if (
            track_dropped
            and self.elements_enabled
            and self.session.provenance_enabled
        ):
            dropped = self._df.where(~cond)
            sentinel = DROP_SENTINEL_PREFIX + child.task_id
            elements = dropped.select(
                F.lit(self.session.run_id).alias("run_id"),
                F.lit(child.task_id).alias("task_id"),
                F.lit(sentinel).alias("element_id"),
                F.array(F.array(F.lit(sentinel))).alias("values"),
                F.lit(None).cast("string").alias("value_json"),
            ).limit(1)
            self.session.store.append_elements(elements)
            deps = dropped.select(
                F.lit(self.session.run_id).alias("run_id"),
                F.lit(child.task_id).alias("task_id"),
                F.lit(sentinel).alias("element_id"),
                F.col(PROV_ID).alias("dep_element_id"),
            )
            self.session.store.append_element_deps(deps)
        return child

    filter = where

    def explode_col(self, col: str, alias: str) -> "ProvDataFrame":
        """flatMap analogue: one input row → N output rows, each depending on
        its input (reference rdd/RDD.scala:507-516)."""
        keep = [c for c in self.user_columns if c != col]
        df = self._df.select(*keep, F.explode(F.col(col)).alias(alias),
                             *( [F.col(PROV_ID)] if self.elements_enabled and PROV_ID in self._df.columns else []))
        return self._child(self._with_row_lineage_from(df), "flatMap", f"explode({col})")

    def group_by(self, *cols):
        return _GroupedProv(self, cols)

    groupBy = group_by

    def join(
        self,
        other: "ProvDataFrame",
        on=None,
        how: str = "inner",
        *,
        broadcast_other: bool = False,
    ) -> "ProvDataFrame":
        """Equi/theta join. Output element depends on the matching elements
        of both sides (reference rdd/CoGroupedRDD.scala:86-133)."""
        right = other._df
        if broadcast_other:
            right = F.broadcast(right)
        if self.elements_enabled:
            left = self._df.withColumnRenamed(PROV_ID, "_prov_id_l").drop(PROV_DEPS)
            right = right.withColumnRenamed(PROV_ID, "_prov_id_r")
            if PROV_DEPS in right.columns:
                right = right.drop(PROV_DEPS)
            joined = left.join(right, on=on, how=how)
            deps = F.filter(
                F.array(F.col("_prov_id_l"), F.col("_prov_id_r")),
                lambda x: x.isNotNull(),
            )
            joined = joined.withColumn(PROV_DEPS, deps).drop("_prov_id_l", "_prov_id_r")
            child_df = self._mint_ids(joined)
        else:
            child_df = self._df.drop(PROV_ID, PROV_DEPS).join(
                right.drop(PROV_ID, PROV_DEPS), on=on, how=how
            )
        return self._child(child_df, f"join_{how}", parents=[self, other])

    def cross_join(self, other: "ProvDataFrame") -> "ProvDataFrame":
        if self.elements_enabled:
            left = self._df.withColumnRenamed(PROV_ID, "_prov_id_l").drop(PROV_DEPS)
            right = other._df.withColumnRenamed(PROV_ID, "_prov_id_r")
            if PROV_DEPS in right.columns:
                right = right.drop(PROV_DEPS)
            joined = left.crossJoin(right).withColumn(
                PROV_DEPS, F.array(F.col("_prov_id_l"), F.col("_prov_id_r"))
            ).drop("_prov_id_l", "_prov_id_r")
            child_df = self._mint_ids(joined)
        else:
            child_df = self.df.crossJoin(other.df)
        return self._child(child_df, "cartesian", parents=[self, other])

    crossJoin = cross_join

    def distinct(self) -> "ProvDataFrame":
        """Surviving element depends on all duplicate occurrences
        (reference rdd/RDD.scala:534-548)."""
        if self.elements_enabled:
            cols = self.user_columns
            df = (
                self._df.groupBy(*cols)
                .agg(F.slice(F.collect_set(PROV_ID), 1, AGG_DEPS_CAP).alias(PROV_DEPS))
            )
            child_df = self._mint_ids(df)
        else:
            child_df = self.df.distinct()
        return self._child(child_df, "distinct")

    def drop_duplicates(self, subset: Optional[list[str]] = None) -> "ProvDataFrame":
        if subset is None:
            return self.distinct()
        if self.elements_enabled:
            from pyspark.sql import Window

            w = Window.partitionBy(*subset).orderBy(F.col(PROV_ID))
            df = (
                self._df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            child_df = self._with_row_lineage(df)
        else:
            child_df = self.df.dropDuplicates(subset)
        return self._child(child_df, "distinct", f"dropDuplicates({subset})")

    dropDuplicates = drop_duplicates

    def union(self, other: "ProvDataFrame") -> "ProvDataFrame":
        """unionAll (reference rdd/RDD.scala:752; UnionRDD.scala:75)."""
        if self.elements_enabled:
            l = self._df.withColumn(PROV_DEPS, F.array(F.col(PROV_ID))).drop(PROV_ID)
            r = other._df
            if PROV_ID in r.columns:
                r = r.withColumn(PROV_DEPS, F.array(F.col(PROV_ID))).drop(PROV_ID)
            else:
                r = r.withColumn(PROV_DEPS, F.array().cast("array<string>"))
            child_df = self._mint_ids(l.unionByName(r))
        else:
            child_df = self.df.unionByName(other.df)
        return self._child(child_df, "union", parents=[self, other])

    def intersect(self, other: "ProvDataFrame") -> "ProvDataFrame":
        child_df = self.df.intersect(other.df)
        if self.elements_enabled:
            child_df = self._mint_ids(
                child_df.withColumn(PROV_DEPS, F.array().cast("array<string>"))
            )
        return self._child(child_df, "intersection", parents=[self, other])

    def subtract(self, other: "ProvDataFrame") -> "ProvDataFrame":
        child_df = self.df.exceptAll(other.df)
        if self.elements_enabled:
            child_df = self._mint_ids(
                child_df.withColumn(PROV_DEPS, F.array().cast("array<string>"))
            )
        return self._child(child_df, "subtract", parents=[self, other])

    def order_by(self, *cols) -> "ProvDataFrame":
        df = self._df.orderBy(*cols)
        return self._child(
            self._with_row_lineage(df) if self.elements_enabled else df.drop(PROV_ID, PROV_DEPS),
            "sort",
        )

    orderBy = order_by

    def limit(self, n: int) -> "ProvDataFrame":
        df = self._df.limit(n)
        return self._child(
            self._with_row_lineage(df) if self.elements_enabled else df.drop(PROV_ID, PROV_DEPS),
            "take",
            f"limit({n})",
        )

    def repartition(self, n: int, *cols) -> "ProvDataFrame":
        df = self._df.repartition(n, *cols) if cols else self._df.repartition(n)
        return self._child(df, "partitionBy", f"repartition({n})")

    def coalesce(self, n: int) -> "ProvDataFrame":
        return self._child(self._df.coalesce(n), "coalesce", f"coalesce({n})")

    def cache(self) -> "ProvDataFrame":
        self._df = self._df.cache()
        return self

    def sample(self, fraction: float, seed: Optional[int] = None) -> "ProvDataFrame":
        df = self._df.sample(fraction=fraction, seed=seed)
        return self._child(
            self._with_row_lineage(df) if self.elements_enabled else df,
            "sample",
        )

    def map_in_pandas(self, fn, schema) -> "ProvDataFrame":
        """mapPartitions analogue (reference rdd/RDD.scala:955-1044)."""
        child_df = self.df.mapInPandas(fn, schema)
        if self.elements_enabled:
            child_df = self._mint_ids(
                child_df.withColumn(PROV_DEPS, F.array().cast("array<string>"))
            )
        return self._child(child_df, "mapPartitions")

    mapInPandas = map_in_pandas

    # -- actions -------------------------------------------------------------
    def collect(self):
        if self.elements_enabled:
            self.persist_elements()
        return self.df.collect()

    def count(self) -> int:
        return self.df.count()

    def to_pandas(self):
        return self.df.toPandas()

    def write_parquet(self, path: str, mode: str = "overwrite") -> None:
        if self.elements_enabled:
            self.persist_elements()
        self.df.write.mode(mode).parquet(path)

    def explain(self, mode: str = "formatted"):
        return self.df.explain(mode=mode)

    def foreach_with_element(self, fn) -> None:
        """A14 analogue: user code sees (_prov_id, row)
        (reference rdd/RDD.scala:1124-1126)."""
        if not self.elements_enabled:
            raise RuntimeError("enable element provenance first (.with_elements())")
        self.persist_elements()
        self._df.foreach(fn)


class _GroupedProv:
    """groupBy().agg() with n-1 lineage: the output element per key depends
    on all inputs merged into it, capped at AGG_DEPS_CAP (reference
    Aggregator.scala:38-55, ExternalSorter.scala:181-460 — dependency lists
    merged across spills; ours rides the same shuffle as the user agg)."""

    def __init__(self, parent: ProvDataFrame, cols):
        self.parent = parent
        self.cols = list(cols)

    def agg(self, *exprs) -> ProvDataFrame:
        p = self.parent
        if p.elements_enabled:
            lineage = F.slice(F.collect_set(F.col(PROV_ID)), 1, AGG_DEPS_CAP).alias(
                PROV_DEPS
            )
            df = p._df.groupBy(*self.cols).agg(*exprs, lineage)
            child_df = p._mint_ids(df)
        else:
            child_df = p.df.groupBy(*self.cols).agg(*exprs)
        child = p._child(child_df, "reduceByKey", f"groupBy({self.cols})")
        return child

    def count(self) -> ProvDataFrame:
        return self.agg(F.count(F.lit(1)).alias("count"))
