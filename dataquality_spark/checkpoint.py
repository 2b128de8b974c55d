"""Checkpointed, resumable pipeline runs with per-partition lineage.

The north rule requires exact resume after executor/driver loss. Design
(SURVEY.md §4.3(3)):

  * The input is split into ``n_chunks`` logical partitions by
    ``pmod(xxhash64(normalized_text), n_chunks)`` — the CONTENT hash, not the
    url, so every exact-duplicate group lives entirely inside one chunk and
    per-chunk dedup is exactly equal to global dedup. Resume therefore yields
    a byte-identical decisions table (tested in tests/test_checkpoint.py).
  * Each chunk writes its decisions to its own directory, then commits a
    state file atomically (tmp + rename). A crash between write and commit
    re-runs that chunk idempotently (same deterministic output, overwrite).
  * The state file carries the chunk's lineage: input row count, keep count,
    per-rule pass counts — the `lineage(partition_id, …, checkpoint_state)`
    table of SURVEY.md §1.4.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataquality_spark import pipeline as P
from dataquality_spark.functions import text as TX


def _chunk_col(n_chunks: int):
    # must hash exactly like the pipeline's dedup key (raw text) so that
    # every exact-dup group stays inside one chunk
    return F.pmod(TX.content_hash(F.col("text")), F.lit(n_chunks))


def _state_path(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, "_state", f"chunk_{i:05d}.json")


def run_checkpointed(spark: SparkSession, pages: DataFrame, out_dir: str,
                     n_chunks: int = 8, max_chunks: int | None = None,
                     salt_buckets: int = 64) -> dict:
    """Process all incomplete chunks; returns run summary.

    ``max_chunks`` limits how many (incomplete) chunks to process this call —
    the kill/resume test uses it to simulate a mid-run crash.
    """
    os.makedirs(os.path.join(out_dir, "_state"), exist_ok=True)
    done = completed_chunks(out_dir)
    todo = [i for i in range(n_chunks) if i not in done]
    if max_chunks is not None:
        todo = todo[:max_chunks]
    processed = []
    for i in todo:
        chunk = pages.where(_chunk_col(n_chunks) == i)
        ann = P.run_pipeline(spark, chunk, salt_buckets=salt_buckets)
        dec = P.decisions_table(ann)
        data_dir = os.path.join(out_dir, "data", f"chunk={i}")
        dec.write.mode("overwrite").parquet(data_dir)
        metrics = [r.asDict() for r in P.pipeline_metrics(ann).collect()]
        n_in = ann.count()
        n_keep = ann.where("keep").count()
        ann.unpersist()
        state = {
            "chunk": i,
            "n_chunks": n_chunks,
            "rows_in": n_in,
            "rows_kept": n_keep,
            "rule_metrics": metrics,
            "data_dir": data_dir,
        }
        tmp = _state_path(out_dir, i) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, _state_path(out_dir, i))  # atomic commit
        processed.append(i)
    return {"processed": processed, "completed": sorted(completed_chunks(out_dir))}


def completed_chunks(out_dir: str) -> set[int]:
    sdir = os.path.join(out_dir, "_state")
    if not os.path.isdir(sdir):
        return set()
    out = set()
    for f in os.listdir(sdir):
        if f.startswith("chunk_") and f.endswith(".json"):
            out.add(int(f[6:11]))
    return out


def read_decisions(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))


def lineage(out_dir: str) -> list[dict]:
    """Per-partition lineage rows from the committed state files."""
    rows = []
    for i in sorted(completed_chunks(out_dir)):
        with open(_state_path(out_dir, i)) as f:
            rows.append(json.load(f))
    return rows
