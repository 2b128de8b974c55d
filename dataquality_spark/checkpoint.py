"""Checkpointed, resumable pipeline runs with per-partition lineage.

The north rule requires exact resume after executor/driver loss. Design
(SURVEY.md §4.3(3)):

  * The input is split into ``n_chunks`` logical partitions by
    ``pmod(xxhash64(text), n_chunks)`` — the RAW-text content hash (the same
    key ``content_hash()`` uses for the pipeline's exact dedup; NOT the
    normalized text), so every exact-duplicate group lives entirely inside
    one chunk and per-chunk dedup is exactly equal to global dedup. Resume
    therefore yields a byte-identical decisions table
    (tested in tests/test_checkpoint.py).
  * All incomplete chunks are processed in ONE pass over the input: filter to
    the todo-chunk set, run the pipeline once, and write every chunk's
    decisions in a single ``partitionBy(chunk)`` dynamic-overwrite write.
    (The round-1 design re-filtered the full input once per chunk — the chunk
    key is a content hash, so no partition pruning is possible and n_chunks
    full scans become n_chunks × input-size read amplification at 100 TB.)
  * Per-chunk state files still commit atomically (tmp + rename), AFTER the
    partitioned write succeeds. A crash inside the write re-runs all still-
    incomplete chunks idempotently (dynamic partition overwrite replaces only
    their directories; completed chunks' data and state are untouched).
  * The state file carries the chunk's lineage: input row count, keep count,
    per-rule pass counts — the `lineage(partition_id, …, checkpoint_state)`
    table of SURVEY.md §1.4. Lineage is computed from the just-written
    decisions parquet (column-pruned scan; rules/keep only, never
    scrubbed_text), not by re-running the dedup join.
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
                     salt_buckets: int = 64,
                     with_classifier: bool = False,
                     lang_optional: bool = False) -> dict:
    """Process all incomplete chunks in one input pass; returns run summary.

    ``max_chunks`` limits how many (incomplete) chunks to process this call —
    the kill/resume test uses it to simulate a mid-run crash.
    """
    os.makedirs(os.path.join(out_dir, "_state"), exist_ok=True)
    done = completed_chunks(out_dir)
    # resume with a different n_chunks silently re-processes (or skips)
    # rows whose pmod changed — every committed state file records the
    # partitioning it was written under, so refuse the mismatch loudly
    for i in sorted(done):
        with open(_state_path(out_dir, i)) as f:
            committed = json.load(f).get("n_chunks")
        if committed != n_chunks:
            raise ValueError(
                f"resume n_chunks={n_chunks} does not match committed "
                f"n_chunks={committed} in {_state_path(out_dir, i)}; "
                f"re-run with --chunks {committed} or use a fresh out_dir")
    todo = [i for i in range(n_chunks) if i not in done]
    if max_chunks is not None:
        todo = todo[:max_chunks]
    if not todo:
        return {"processed": [], "completed": sorted(done)}

    subset = (pages.withColumn("chunk", _chunk_col(n_chunks))
              .where(F.col("chunk").isin(todo)))
    cleanup: list[DataFrame] = []
    ann = P.run_pipeline(spark, subset, salt_buckets=salt_buckets,
                         cleanup=cleanup, with_classifier=with_classifier,
                         lang_optional=lang_optional)
    data_dir = os.path.join(out_dir, "data")
    # One job writes every todo chunk; dynamic mode replaces only the chunk=i
    # directories present in this write, leaving completed chunks intact.
    (P.decisions_table(ann, extra_cols=("chunk",))
     .write.partitionBy("chunk")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(data_dir))
    for frame in cleanup:
        frame.unpersist()

    # Lineage from the written decisions: rules map + keep flag only — the
    # parquet reader prunes scrubbed_text, so this is a cheap second scan of
    # the OUTPUT, not the input.
    # Empty-input guard: when every todo chunk had zero rows the dynamic
    # write emits no data files (possibly just a _SUCCESS marker), and the
    # read fails UNABLE_TO_INFER_SCHEMA — the chunks are still DONE
    # (rows_in=0) and must commit state, or resume wedges forever.
    from pyspark.errors import AnalysisException
    try:
        written = spark.read.parquet(data_dir).where(
            F.col("chunk").isin(todo))
    except AnalysisException:
        counts = {}
        metrics_by_chunk: dict[int, list[dict]] = {i: [] for i in todo}
        return _commit_states(out_dir, data_dir, todo, n_chunks, counts,
                              metrics_by_chunk)
    counts = {r["chunk"]: r for r in
              written.groupBy("chunk")
              .agg(F.count(F.lit(1)).alias("rows_in"),
                   F.sum(F.col("keep").cast("long")).alias("rows_kept"))
              .collect()}
    # one definition of the rule score: the pipeline's, grouped by chunk
    per_rule = P.metrics_from_decisions(written,
                                        group_cols=("chunk",)).collect()
    metrics_by_chunk: dict[int, list[dict]] = {i: [] for i in todo}
    for r in per_rule:
        metrics_by_chunk[r["chunk"]].append({
            "rule_id": r["rule_id"],
            "pass_count": r["pass_count"],
            "fail_count": r["fail_count"],
            "score": r["score"],
        })

    return _commit_states(out_dir, data_dir, todo, n_chunks, counts,
                          metrics_by_chunk)


def _commit_states(out_dir: str, data_dir: str, todo: list[int],
                   n_chunks: int, counts: dict,
                   metrics_by_chunk: dict[int, list[dict]]) -> dict:
    processed = []
    for i in todo:
        c = counts.get(i)
        state = {
            "chunk": i,
            "n_chunks": n_chunks,
            "rows_in": c["rows_in"] if c else 0,
            "rows_kept": c["rows_kept"] if c else 0,
            "rule_metrics": sorted(metrics_by_chunk[i],
                                   key=lambda m: m["rule_id"]),
            "data_dir": os.path.join(data_dir, f"chunk={i}"),
        }
        tmp = _state_path(out_dir, i) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, _state_path(out_dir, i))  # atomic commit
        processed.append(i)
    return {"processed": processed,
            "completed": sorted(completed_chunks(out_dir))}


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
