"""Flagship pipeline: transcripts -> entropy rollups -> retention tiers.

Three physical plans over one logical plan (SURVEY.md §4.2), fastest
first:

1. ``fused_rollup_encode_colocated`` (conversation-partitioned files —
   the production ingest layout): ZERO shuffles, one task per file does
   read → project(value=len(text)) → all-tier windowed rollup → atomic
   rollup-row checkpoint → gap-fill + Gorilla/DoD blocks; the block
   stream goes straight to the Parquet sink with no barriers.

2. ``rollup_files_colocated`` + ``encode_blocks_colocated``: same layout,
   separate stages (used when the rollup rows feed other consumers).

3. ``rollup_dataset(mode="bucketed")`` (any layout): ONE hash shuffle —
   ``part = hash(conv_id) % P`` then ``groupby(part).map_groups`` over
   whole hash buckets (per-task Python cost O(P), not O(windows));
   ``mode="window_groups"`` is the reference-shaped (conv, day) exact
   grouping kept as a correctness cross-check.

Streaming properties: no driver-side materialization of the turn table;
the rollup output is ~windows-sized (orders smaller than input); blocks
are smaller still. Never call ray.init() here — the session owner does.
"""

from __future__ import annotations

import time
from pathlib import Path

import ray.data as rd

from eristropy_ray.config import EncodeConfig, RollupConfig
from eristropy_ray.stages.encode import make_partition_encode_fn
from eristropy_ray.stages.project import add_partition_key, project_turns
from eristropy_ray.stages.rollup import (
    add_day_column,
    make_partition_rollup_fn,
    make_window_group_fn,
)
from eristropy_ray.state.manifest import Manifest
from eristropy_ray.state.metrics import MetricsLog


def _footer_rows(path: str) -> int:
    """Exact row count of a written parquet dir from footer metadata —
    no data re-scan (the write already streamed the rows once; counting
    metrics must not read them back)."""
    import os

    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                total += pq.ParquetFile(
                    os.path.join(root, n)
                ).metadata.num_rows
    return total

TRANSCRIPT_READ_COLUMNS = ["conv_id", "turn_idx", "text", "ts"]


def _pin_arrow_threads() -> None:
    """Cap Arrow's global thread pools inside Ray workers.

    Each worker defaults to a CPU-count-sized Arrow pool; with 32
    concurrent single-CPU tasks that's 32x oversubscription on reads and
    decompression. Idempotent, once per worker process."""
    import pyarrow as _pa

    if _pa.cpu_count() != 1:
        _pa.set_cpu_count(1)
        _pa.set_io_thread_count(2)


def _default_partitions(cfg: RollupConfig) -> int:
    if cfg.num_partitions:
        return cfg.num_partitions
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2 * cpus, 16)


def rollup_dataset(
    turns: rd.Dataset,
    cfg: RollupConfig = RollupConfig(),
    mode: str = "bucketed",
) -> rd.Dataset:
    """Transcript-shaped Dataset -> rollup-row Dataset (lazy)."""
    projected = turns.map_batches(project_turns, batch_format="pyarrow")
    if mode == "bucketed":
        nparts = _default_partitions(cfg)
        keyed = projected.map_batches(
            lambda b: add_partition_key(b, nparts), batch_format="pyarrow"
        )
        return keyed.groupby("part").map_groups(
            make_partition_rollup_fn(cfg), batch_format="pyarrow"
        )
    if mode == "window_groups":
        keyed = projected.map_batches(add_day_column, batch_format="pyarrow")
        return keyed.groupby(["conv_id", "day"]).map_groups(
            make_window_group_fn(cfg), batch_format="pyarrow"
        )
    raise ValueError(f"unknown mode {mode!r}")


class RollupFileActor:
    """Actor-pool variant of the colocated rollup task.

    Stateless stages run as tasks by default here because Ray reuses
    worker processes, so per-process setup (imports, kernel warm-up,
    Arrow thread pinning) is already amortized. This class exists for
    deployments that prefer an explicit pool — setup runs ONCE per actor
    in ``__init__`` (the idiomatic stateful-stage shape), and it is the
    natural home for future per-actor state (model handles, reusable
    scratch buffers). Used via::

        paths.map_batches(RollupFileActor, fn_constructor_args=(cfg,),
                          concurrency=n_actors, batch_size=1,
                          batch_format="pyarrow")
    """

    def __init__(self, cfg: RollupConfig) -> None:
        _pin_arrow_threads()
        self.cfg = cfg
        # kernel warm-up: first numpy ufunc dispatch is the slow one
        from eristropy_ray.stages.windows import rollup_windows
        import numpy as np

        rollup_windows(
            np.array(["w"], dtype=object), np.array([0]),
            np.array([0], dtype=np.int64), np.array([1.0]), cfg,
        )

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from eristropy_ray.stages.rollup import _rollup_table

        tables = [
            pq.read_table(p, columns=TRANSCRIPT_READ_COLUMNS)
            for p in batch["path"].to_pylist()
        ]
        turns = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        return _rollup_table(project_turns(turns), self.cfg)


def rollup_files_colocated(
    files: list[str], cfg: RollupConfig = RollupConfig()
) -> rd.Dataset:
    """Zero-shuffle fast path for conversation-partitioned input layouts.

    CONTRACT: every conversation's turns live entirely inside one input
    file (the synthesizer guarantees this; a production ingest at 10^12
    turns would bucket-by-conv at write time for exactly this reason —
    it converts the one big all-to-all exchange into embarrassingly
    parallel per-file tasks). One read task per file; project + full
    multi-tier rollup fused into a single ``map_batches`` whole-block
    task. Output blocks are conversation-complete, so the downstream
    encode stage can also run block-local without a shuffle
    (``encode_blocks_colocated``).

    For unpartitioned inputs use ``rollup_dataset`` (bucketed mode), which
    pays the hash shuffle to establish the same co-location.
    """
    import pyarrow as pa

    from eristropy_ray.stages.rollup import _rollup_table

    # A dataset of file paths with batch_size=1 guarantees exactly one
    # fn call per file — map_batches cuts batches at 1 row no matter how
    # from_items packs paths into blocks, so a conversation can never be
    # split (read_parquet + override_num_blocks is only a hint: Ray's
    # dynamic block splitting can still cut a file — and therefore a
    # conversation — across blocks, which silently breaks the window
    # contract. Observed in practice on the hot-conversation file.)
    # Default block packing (~1.3 paths/block) is kept: forcing one block
    # per path costs ~0.3 s of extra task dispatch at 256 files for no
    # correctness gain (measured round 3).
    paths = rd.from_items([{"path": f} for f in files])

    def read_project_rollup(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        _pin_arrow_threads()
        tables = [
            pq.read_table(p, columns=TRANSCRIPT_READ_COLUMNS)
            for p in batch["path"].to_pylist()
        ]
        turns = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        return _rollup_table(project_turns(turns), cfg)

    return paths.map_batches(
        read_project_rollup, batch_format="pyarrow", batch_size=1
    )


def encode_blocks_colocated(
    rollup: rd.Dataset, enc_cfg: EncodeConfig = EncodeConfig()
) -> rd.Dataset:
    """Block-local encode for conversation-complete rollup blocks (the
    output shape of ``rollup_files_colocated``). No shuffle."""
    fn = make_partition_encode_fn(enc_cfg)
    return rollup.map_batches(fn, batch_format="pyarrow", batch_size=None)


def fused_rollup_encode_colocated(
    files: list[str],
    rows_out_dir: str,
    cfg: RollupConfig = RollupConfig(),
    enc_cfg: EncodeConfig = EncodeConfig(),
) -> rd.Dataset:
    """Single-pass flagship for conversation-partitioned layouts.

    Each task: read its file -> project -> all-tier rollup -> CHECKPOINT
    the rollup rows itself (atomic tmp+rename, hive-partitioned by tier,
    one file per (input file, tier)) -> return the gap-filled compressed
    blocks. One map stage, zero Dataset barriers — the returned Dataset
    streams blocks straight into its sink while later files are still
    being read. The per-task side-effect write is idempotent (same input
    file -> same output path), so Ray task retries are safe.
    """
    import pyarrow as pa

    from eristropy_ray.stages.rollup import _rollup_table

    encode_fn = make_partition_encode_fn(enc_cfg)
    # batch_size=1 guarantees each task call sees exactly one path (so the
    # checkpoint stem below is always that file's); default block packing
    # is kept — one-block-per-path cost ~0.3 s of dispatch overhead at 256
    # files (measured round 3) for no correctness gain
    paths = rd.from_items([{"path": f} for f in files])

    def task(batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        _pin_arrow_threads()
        tables = [
            pq.read_table(p, columns=TRANSCRIPT_READ_COLUMNS)
            for p in batch["path"].to_pylist()
        ]
        src = batch["path"][0].as_py()
        # stem alone collides for equal basenames in different dirs —
        # whichever task finished last would silently overwrite the
        # other's rollup checkpoint; salt with a path digest
        import hashlib as _hashlib

        stem = (
            Path(src).stem
            + "-"
            + _hashlib.sha1(src.encode()).hexdigest()[:8]
        )
        turns = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        rollup = _rollup_table(project_turns(turns), cfg)
        tiers = rollup["tier"].to_numpy(zero_copy_only=False)
        for tier in dict.fromkeys(tiers.tolist()):
            sub = rollup.filter(pa.array(tiers == tier))
            d = Path(rows_out_dir) / f"tier={tier}"
            d.mkdir(parents=True, exist_ok=True)
            tmp = d / f".{stem}.parquet.tmp"
            pq.write_table(sub.drop_columns(["tier"]), tmp)
            os.replace(tmp, d / f"{stem}.parquet")
        return encode_fn(rollup)

    return paths.map_batches(task, batch_format="pyarrow", batch_size=1)


def encode_dataset(
    rollup: rd.Dataset,
    cfg: RollupConfig = RollupConfig(),
    enc_cfg: EncodeConfig = EncodeConfig(),
) -> rd.Dataset:
    """Rollup rows -> gap-filled compressed tier blocks (lazy)."""
    nparts = max(_default_partitions(cfg) // 4, 4)
    # no day salt here: gap-fill needs a conversation's ENTIRE tier
    # series in one group to build the dense bucket grid
    keyed = rollup.map_batches(
        lambda b: add_partition_key(b, nparts, salt_by_day=False),
        batch_format="pyarrow",
    )
    return keyed.groupby("part").map_groups(
        make_partition_encode_fn(enc_cfg), batch_format="pyarrow"
    )


def run_rollup_job(
    input_files: list[str],
    out_dir: str,
    cfg: RollupConfig = RollupConfig(),
    enc_cfg: EncodeConfig = EncodeConfig(),
    n_shards: int = 4,
    resume: bool = True,
    mode: str = "bucketed",
    layout: str = "unpartitioned",
) -> dict:
    """Checkpointed, resumable rollup over a list of transcript files.

    Shards = strided round-robin input-file groups, ``files[idx::n_shards]``
    (any grouping is valid — conversations never span files — and striding
    balances size-skewed inputs; do NOT build range/locality logic on a
    contiguity assumption). Completed shards (manifest + output present)
    are skipped on resume; in the two-stage layout a shard whose rollup
    stage completed resumes from its checkpoint and reruns only encode.
    Emits per-(stage, shard) lineage metrics. Returns a summary dict.

    ``layout="conv_files"`` uses the fused single-pass colocated path
    (each conversation contained in one input file); ``"unpartitioned"``
    pays the hash shuffle (bucketed mode) and works for any layout.
    """
    out = Path(out_dir)
    manifest = Manifest(out)
    metrics = MetricsLog(out)
    input_files = sorted(input_files)
    shards = [
        (f"s{idx:04d}", input_files[idx::n_shards]) for idx in range(n_shards)
    ]
    summary = {"shards_total": len(shards), "shards_skipped": 0, "rows": 0, "blocks": 0}
    for shard_id, files in shards:
        if not files:
            continue
        if resume and manifest.is_complete(shard_id, "encode"):
            summary["shards_skipped"] += 1
            continue
        # a shard not marked complete may have partial output from a
        # crashed attempt; Ray's write_parquet APPENDS uuid-named files,
        # so rerunning without clearing would duplicate every row. In the
        # two-stage layout a COMPLETED rollup stage survives a crash
        # during encode: resume re-reads its checkpoint instead of
        # re-scanning and re-shuffling the turn table.
        import shutil as _shutil

        rollup_done = (
            resume
            and layout != "conv_files"
            and manifest.is_complete(shard_id, "rollup")
        )
        stale_stages = ("blocks",) if rollup_done else ("rollup", "blocks")
        for stale in stale_stages:
            _shutil.rmtree(out / stale / f"shard={shard_id}", ignore_errors=True)
        if layout == "conv_files":
            t0 = time.time()
            rows_path = str(out / "rollup" / f"shard={shard_id}")
            blocks_path = str(out / "blocks" / f"shard={shard_id}")
            blocks = fused_rollup_encode_colocated(files, rows_path, cfg, enc_cfg)
            blocks.write_parquet(blocks_path, partition_cols=["tier"])
            n_rows = _footer_rows(rows_path)
            n_blocks = _footer_rows(blocks_path)
            t1 = time.time()
            # one emission for the fused stage so the shared wall time is
            # not double-counted in lineage totals
            metrics.emit(
                stage="rollup_encode_fused", shard=shard_id, rows_out=n_rows,
                blocks_out=n_blocks, input_files=len(files),
                wall_s=round(t1 - t0, 3),
            )
            manifest.mark_complete(shard_id, "rollup", rows_path, n_rows, t1 - t0)
            manifest.mark_complete(shard_id, "encode", blocks_path, n_blocks, t1 - t0)
            summary["rows"] += n_rows
            summary["blocks"] += n_blocks
            continue
        t0 = time.time()
        rows_path = str(out / "rollup" / f"shard={shard_id}")
        from eristropy_ray.stages.windows import ROLLUP_COLUMNS

        if rollup_done:
            # resume from the completed rollup checkpoint (stage-level
            # resume: only encode reruns)
            rollup_written = rd.read_parquet(rows_path).select_columns(
                list(ROLLUP_COLUMNS)
            )
            n_rows = _footer_rows(rows_path)
            t1 = time.time()
        else:
            turns = rd.read_parquet(files, columns=TRANSCRIPT_READ_COLUMNS)
            rollup = rollup_dataset(turns, cfg, mode=mode)
            rollup.write_parquet(rows_path, partition_cols=["tier"])
            # re-read = checkpoint barrier; drop the hive "shard=" path column
            rollup_written = rd.read_parquet(rows_path).select_columns(
                list(ROLLUP_COLUMNS)
            )
            n_rows = _footer_rows(rows_path)
            t1 = time.time()
            metrics.emit(
                stage="rollup", shard=shard_id, rows_out=n_rows,
                input_files=len(files), wall_s=round(t1 - t0, 3),
            )
            manifest.mark_complete(shard_id, "rollup", rows_path, n_rows, t1 - t0)

        blocks_path = str(out / "blocks" / f"shard={shard_id}")
        blocks = encode_dataset(rollup_written, cfg, enc_cfg)
        blocks.write_parquet(blocks_path, partition_cols=["tier"])
        n_blocks = _footer_rows(blocks_path)
        t2 = time.time()
        metrics.emit(
            stage="encode", shard=shard_id, rows_out=n_blocks,
            wall_s=round(t2 - t1, 3),
        )
        manifest.mark_complete(shard_id, "encode", blocks_path, n_blocks, t2 - t1)
        summary["rows"] += n_rows
        summary["blocks"] += n_blocks
    return summary
