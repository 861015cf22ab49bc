"""Line-mode pipe — stream DataFrame rows through a native command.

Reference semantics (core/src/main/scala/org/apache/spark/rdd/RDD.scala:
887-945 and rdd/PipedRDD.scala:70-236): each partition's elements are
printed as lines to the forked process's stdin; the process's stdout lines
become the output partition. The reference forks one process per partition
and wires element lineage all-to-all within the partition (PipedRDD.scala:
170-236) — the command is a black box, so any output line may depend on any
input line it has seen.

Spark-first shape: one ``mapInPandas`` pass, one ``subprocess.Popen`` per
partition. A writer thread streams the incoming Arrow batches into the
process's stdin while the main thread drains stdout — no deadlock at any
partition size, no full-partition input buffering. Output lines are
buffered per partition (the reference's PipedRDD iterator does the same via
the process's stdout buffer); at 100 TB keep partitions at the usual
128 MB and the buffer is bounded by the command's output volume.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def make_partition_runner(
    command: "str | list[str]",
    *,
    env: Optional[dict] = None,
    encoding: str = "utf-8",
    check_exit_code: bool = True,
):
    """Build the per-partition runner closure: fork the command once,
    stream lines to stdin from a writer thread, return stdout lines —
    PipedRDD's stdin-writer thread + stdout iterator pair.

    Returned as a NESTED function on purpose: cloudpickle serializes it by
    value (code + captured constants, stdlib-only globals), so executors
    never need ``samba_spark`` importable — the driver contract runs under
    an external SparkSession whose Python workers know nothing about this
    repo's sys.path."""

    def run(lines: Iterator[str]) -> list[str]:
        import os as _os
        import subprocess as _sp
        import threading as _th

        shell = isinstance(command, str)
        proc_env = dict(_os.environ)
        if env:
            proc_env.update({k: str(v) for k, v in env.items()})
        proc = _sp.Popen(
            ["/bin/bash", "-c", command] if shell else command,
            stdin=_sp.PIPE,
            stdout=_sp.PIPE,
            stderr=_sp.PIPE,
            env=proc_env,
        )

        write_err: list[BaseException] = []

        def _writer():
            try:
                for line in lines:
                    proc.stdin.write((line + "\n").encode(encoding))
                proc.stdin.close()
            except BrokenPipeError:
                # command exited early (e.g. head) — reference PipedRDD
                # tolerates this the same way
                pass
            except BaseException as e:  # surface worker-side failures
                write_err.append(e)
                try:
                    proc.stdin.close()
                except Exception:
                    pass

        t = _th.Thread(target=_writer, daemon=True)
        t.start()
        out = [
            ln.decode(encoding, errors="replace").rstrip("\n")
            for ln in proc.stdout
        ]
        stderr = proc.stderr.read()
        proc.wait()
        t.join()
        if write_err:
            raise write_err[0]
        if check_exit_code and proc.returncode != 0:
            raise RuntimeError(
                f"pipe command failed (exit {proc.returncode}): {command!r}\n"
                f"stderr: {stderr.decode(encoding, errors='replace')[:2000]}"
            )
        return out

    return run


def pipe_lines(
    df: DataFrame,
    command: "str | list[str]",
    *,
    input_col: Optional[str] = None,
    output_col: str = "value",
    env: Optional[dict] = None,
    encoding: str = "utf-8",
    check_exit_code: bool = True,
) -> DataFrame:
    """``rdd.pipe`` for DataFrames: rows → stdin lines, stdout lines → rows.

    ``input_col`` selects the column to print (default: the single column,
    or all columns tab-joined like the reference's ``T.toString`` default).
    Returns a one-column DataFrame (``output_col`` string). Output order is
    partition-dependent, as with the reference — sort downstream if needed.
    """
    cols = df.columns
    if input_col is not None:
        src = df.select(F.col(input_col).cast("string").alias("_line"))
    elif len(cols) == 1:
        src = df.select(F.col(cols[0]).cast("string").alias("_line"))
    else:
        src = df.select(
            F.concat_ws(
                "\t", *[F.col(c).cast("string") for c in cols]
            ).alias("_line")
        )

    schema = T.StructType([T.StructField(output_col, T.StringType())])
    runner = make_partition_runner(
        command, env=env, encoding=encoding, check_exit_code=check_exit_code
    )

    def _pipe(batches: Iterable[pd.DataFrame]):
        import pandas as _pd

        def lines():
            for b in batches:
                for v in b["_line"]:
                    yield "" if v is None else str(v)

        out = runner(lines())
        for i in range(0, len(out), 10_000):
            yield _pd.DataFrame({output_col: out[i : i + 10_000]})
        if not out:
            yield _pd.DataFrame({output_col: _pd.Series([], dtype="object")})

    return src.mapInPandas(_pipe, schema)
