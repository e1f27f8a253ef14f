"""Checkpoint/resume for the sketch build — per-partition lineage.

The unit of lineage is the input FILE CHUNK (exactly Iceberg-manifest
granularity at 10^12 rows). Stage-1 partial sketches are appended to a
parquet checkpoint directory in COMMIT GROUPS — one Spark job per group,
one `commit=<k>` subdirectory with Spark's atomic `_SUCCESS` marker.
Resume lists durably committed chunks, anti-joins them from the file
list, and builds ONLY the missing ones; the final merge always reads the
full committed state, so a resumed run yields byte-identical final
sketches to an uninterrupted run (merge is order-invariant) and no chunk
is ever sketched twice.

The reference simulator restarts from scratch on failure; this module is
north_rule gap-fill: "resumable from checkpoint with per-partition
lineage + metrics".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p2pddsketch_spark.operators.harness import (SketchSpec,
                                                 build_partials_from_files,
                                                 merge_partials,
                                                 parquet_file_list)

__all__ = ["build_sketches_checkpointed", "committed_state",
           "completed_chunks", "lineage"]


def _chunks(paths: list[str], files_per_task: int) -> list[list[str]]:
    return [paths[i:i + files_per_task] for i in range(0, len(paths), files_per_task)]


def _committed_dirs(checkpoint_dir: str) -> list[str]:
    if not os.path.isdir(checkpoint_dir):
        return []
    out = []
    for name in sorted(os.listdir(checkpoint_dir)):
        d = os.path.join(checkpoint_dir, name)
        if name.startswith("commit=") and os.path.exists(os.path.join(d, "_SUCCESS")):
            out.append(d)
    return out


def committed_state(spark: SparkSession, checkpoint_dir: str) -> DataFrame | None:
    dirs = _committed_dirs(checkpoint_dir)
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def completed_chunks(spark: SparkSession, checkpoint_dir: str) -> set[int]:
    """Chunk ids whose partials are durably committed."""
    state = committed_state(spark, checkpoint_dir)
    if state is None:
        return set()
    return {r["chunk_id"] for r in state.select("chunk_id").distinct().collect()}


def build_sketches_checkpointed(spark: SparkSession, path: str,
                                specs: list[SketchSpec],
                                checkpoint_dir: str,
                                group_cols: tuple[str, ...] = (),
                                salt_buckets: int = 32,
                                files_per_task: int = 1,
                                chunks_per_commit: int = 64) -> DataFrame:
    """Build with resume; returns the final sketch DataFrame."""
    paths = parquet_file_list(path)
    chunks = _chunks(paths, files_per_task)
    done = completed_chunks(spark, checkpoint_dir)
    missing = [i for i in range(len(chunks)) if i not in done]
    next_commit = len(_committed_dirs(checkpoint_dir))

    for gi, lo in enumerate(range(0, len(missing), chunks_per_commit)):
        group = missing[lo:lo + chunks_per_commit]
        flat_files = [f for cid in group for f in chunks[cid]]
        # split_within_files=False: resume lineage is keyed on the
        # (partition id == file-chunk id) bijection below, which
        # row-group/row-range splitting would break (round-6)
        partials = build_partials_from_files(
            spark, flat_files, specs, group_cols,
            salt_buckets=salt_buckets, files_per_task=files_per_task,
            split_within_files=False)
        # one chunk per stage-1 partition by construction, in `group`
        # order → partition id pi maps to global chunk id group[pi]
        map_expr = F.create_map(*[x for pi, cid in enumerate(group)
                                  for x in (F.lit(pi), F.lit(cid))])
        partials = partials.withColumn("chunk_id", map_expr[F.col("partition_id")])
        (partials.write.mode("overwrite")
         .parquet(os.path.join(checkpoint_dir, f"commit={next_commit + gi}")))

    state = committed_state(spark, checkpoint_dir)
    # re-salt on chunk identity so stage-2 fan-in stays bounded no matter
    # how many commits accumulated
    state = state.withColumn("salt", (F.col("chunk_id") % salt_buckets).cast("int"))
    cols = [f.name for f in state.schema.fields if f.name != "chunk_id"]
    return merge_partials(state.select(*cols), group_cols)


def lineage(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Lineage/metrics table: one row per (chunk, spec, group) with
    rows_seen and build_secs — the run manifest the north_rule asks for."""
    state = committed_state(spark, checkpoint_dir)
    if state is None:
        raise FileNotFoundError(f"no committed checkpoint state in {checkpoint_dir}")
    return state.select("chunk_id", "sketch_name", "rows_seen", "build_secs")
