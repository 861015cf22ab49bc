"""Column-level lineage from the analyzed Catalyst plan.

The reference tracks lineage at ELEMENT grain (DataElement.scala) and task
grain (Task.scala); column grain — which output columns derive from which
source-table columns — is the third axis a warehouse audit needs (impact
analysis: "what breaks downstream if nation.n_name changes?"). Spark
already resolves every expression to numbered attributes during analysis,
so lineage is read off the analyzed logical plan rather than instrumented:
walk the plan's expression trees, map each defined attribute (Alias) to
the attributes it references, resolve transitively down to the scan
relations, and label leaves by their file path.

Driver-side by design: the lineage graph is PLAN-sized (#columns ×
#operators), not data-sized — reading it costs no Spark job at any table
scale. Handled nodes: every operator whose outputs are expression lists
(Project, Aggregate, Window — i.e. select/withColumn/groupBy-agg/window)
plus Generate (explode) specially; row-level nodes (Filter, Join, Sort,
Limit) pass attributes through untouched, which is exactly their column
semantics. Union (incl. unionByName) merges POSITIONALLY: the analyzed plan
re-uses the first child's attribute ids for the union's output, so
_union_branch_defs maps each output position to the corresponding
attribute of EVERY branch — outputs of a union-of-two-scans resolve to
both source tables. Intersect/Except keep first-child-only resolution
deliberately: their output VALUES come from the left child only (the
right side affects membership, i.e. rows, not column derivation).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame


def _leaf_tables(jplan) -> dict[int, tuple[str, str]]:
    """exprId.id → (table_name, column_name) for every scan-relation
    attribute; table name = file/dir basename without extension, or
    ``leaf<i>`` when the relation exposes no path."""
    out: dict[int, tuple[str, str]] = {}
    leaves = jplan.collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        name = f"leaf{i}"
        try:
            path = (
                leaf.relation().location().rootPaths().apply(0).toString()
            )
            base = os.path.basename(path.rstrip("/"))
            name = base[:-8] if base.endswith(".parquet") else base
        except Exception:
            pass  # non-file relation (in-memory, stream): keep leaf<i>
        attrs = leaf.output()
        for j in range(attrs.size()):
            a = attrs.apply(j)
            out[a.exprId().id()] = (name, a.name())
    return out


def _union_branch_defs(jplan) -> dict[int, list[int]]:
    """exprId.id → [same-position exprId of every union branch] for each
    Union node's output. The analyzed plan gives a Union's output the
    FIRST child's attribute ids, so without this the second..nth branches
    are invisible to resolution. Self-references (the first child's id
    equals the output id) are excluded — resolve() handles that id through
    the ordinary leaf/Alias chain."""
    out: dict[int, list[int]] = {}
    stack = [jplan]
    while stack:
        node = stack.pop()
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
        if not node.getClass().getName().endswith(".Union"):
            continue
        outputs = node.output()
        for pos in range(outputs.size()):
            oid = outputs.apply(pos).exprId().id()
            refs = []
            for k in range(kids.size()):
                kout = kids.apply(k).output()
                rid = kout.apply(pos).exprId().id()
                if rid != oid:
                    refs.append(rid)
            if refs:
                out.setdefault(oid, []).extend(refs)
    return out


def _expr_arrays(node: dict):
    """Yield every flattened expression tree (list of node dicts) found in
    a serialized plan node."""
    for key, val in node.items():
        if key in ("child", "left", "right"):
            continue
        if (
            isinstance(val, list)
            and val
            and isinstance(val[0], list)
            and val[0]
            and isinstance(val[0][0], dict)
            and "class" in val[0][0]
        ):
            for arr in val:
                yield key, arr


def _attr_ids(arr) -> list[int]:
    return [
        el["exprId"]["id"]
        for el in arr
        if el.get("class", "").endswith(".AttributeReference")
        and "exprId" in el
    ]


def column_lineage_map(df: DataFrame) -> dict[str, set[tuple[str, str]]]:
    """output column name → {(source_table, source_column), …} for the
    DataFrame's analyzed plan."""
    qe = df._jdf.queryExecution()
    jplan = qe.analyzed()
    nodes = json.loads(jplan.toJSON())

    defs: dict[int, list[int]] = {}
    for node in nodes:
        cls = node.get("class", "")
        if cls.endswith(".Generate"):
            # generatorOutput attrs derive from the generator expression;
            # `generator` is a single flattened expr (flat list of dicts),
            # `generatorOutput` a list of single-attr exprs
            gen = node.get("generator") or []
            gen_refs = _attr_ids([el for el in gen if isinstance(el, dict)])
            for key, arr in _expr_arrays(node):
                if key == "generatorOutput":
                    for aid in _attr_ids(arr):
                        defs[aid] = gen_refs
            continue
        for _, arr in _expr_arrays(node):
            top = arr[0]
            if top.get("class", "").endswith(".Alias") and "exprId" in top:
                defs[top["exprId"]["id"]] = _attr_ids(arr[1:])

    leaves = _leaf_tables(jplan)
    union_defs = _union_branch_defs(jplan)

    memo: dict[int, frozenset] = {}

    def resolve(aid: int, seen: frozenset = frozenset()):
        if aid in memo:
            return memo[aid]
        if aid in seen:  # defensive: analyzed plans are acyclic
            return frozenset()
        acc: set = set()
        if aid in leaves:
            acc.add(leaves[aid])
        elif aid in defs:
            for ref in defs[aid]:
                acc |= resolve(ref, seen | {aid})
        # a union output id is ALSO its first branch's id (handled above
        # as a leaf or Alias); the other branches add their lineage here
        for ref in union_defs.get(aid, ()):
            acc |= resolve(ref, seen | {aid})
        res = frozenset(acc)
        memo[aid] = res
        return res

    out: dict[str, set[tuple[str, str]]] = {}
    attrs = jplan.output()
    for i in range(attrs.size()):
        a = attrs.apply(i)
        out[a.name()] = set(resolve(a.exprId().id()))
    return out


def column_lineage(df: DataFrame, spark: Optional[object] = None) -> DataFrame:
    """Lineage as a DataFrame: (out_col, src_table, src_col), one row per
    edge; columns derived from literals only (no source attribute) get a
    single (NULL, NULL) row so every output column appears."""
    spark = spark or df.sparkSession
    rows = []
    for out_col, srcs in column_lineage_map(df).items():
        if srcs:
            for t, c in sorted(srcs):
                rows.append((out_col, t, c))
        else:
            rows.append((out_col, None, None))
    return spark.createDataFrame(
        rows, "out_col string, src_table string, src_col string"
    )
