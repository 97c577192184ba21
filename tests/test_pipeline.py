"""End-to-end Ray pipeline tests: execution-mode equivalence, codec
round-trip through the block stage, checkpoint/resume, determinism."""

import glob

import numpy as np
import pandas as pd
import pytest

from eristropy_ray.config import EncodeConfig, RollupConfig


@pytest.fixture(scope="module")
def fixture_ds(ray_session):
    import ray.data as rd

    from eristropy_ray.sources.transcripts import fixture_transcripts

    return rd.from_arrow(fixture_transcripts())


def _sorted_rollup(ds):
    return (
        ds.to_pandas()
        .sort_values(["tier", "conv_id", "bucket_ts"], kind="stable")
        .reset_index(drop=True)
    )


def test_modes_agree(ray_session, fixture_ds):
    from eristropy_ray.pipelines.rollup import rollup_dataset

    cfg = RollupConfig()
    r1 = _sorted_rollup(rollup_dataset(fixture_ds, cfg, mode="bucketed"))
    r2 = _sorted_rollup(rollup_dataset(fixture_ds, cfg, mode="window_groups"))
    pd.testing.assert_frame_equal(r1, r2)
    assert len(r1) > 0
    # ramp conversation: raw SampEn of a pure trend must be 0 at 1h/1d
    ramp = r1[(r1.conv_id == "ramp") & (r1.tier != "1m")]
    assert (ramp["sampen_raw"] == 0.0).all()


def test_shuffled_input_invariant(ray_session, fixture_ds):
    """Stable turn ordering: a permuted input yields identical rollups."""
    import ray.data as rd

    from eristropy_ray.pipelines.rollup import rollup_dataset
    from eristropy_ray.sources.transcripts import fixture_transcripts

    t = fixture_transcripts()
    perm = np.random.default_rng(5).permutation(t.num_rows)
    shuffled = rd.from_arrow(t.take(perm))
    cfg = RollupConfig()
    a = _sorted_rollup(rollup_dataset(fixture_ds, cfg))
    b = _sorted_rollup(rollup_dataset(shuffled, cfg))
    pd.testing.assert_frame_equal(a, b)


def test_block_roundtrip(ray_session, fixture_ds):
    """Gorilla/DoD blocks decode back to the gap-filled rollup series."""
    import ray.data as rd

    from eristropy_ray.codecs.gapfill import gapfill_series
    from eristropy_ray.config import TIER_STEPS_US
    from eristropy_ray.pipelines.rollup import encode_dataset, rollup_dataset
    from eristropy_ray.stages.encode import decode_blocks

    cfg = RollupConfig()
    enc_cfg = EncodeConfig()
    rollup = _sorted_rollup(rollup_dataset(fixture_ds, cfg))
    blocks = encode_dataset(
        rollup_dataset(fixture_ds, cfg), cfg, enc_cfg
    ).to_pandas()
    decoded = decode_blocks(
        __import__("pyarrow").Table.from_pandas(blocks), enc_cfg.columns
    )
    for (conv, tier), g in rollup.groupby(["conv_id", "tier"]):
        step = TIER_STEPS_US[tier]
        buckets = g["bucket_ts"].astype("int64").to_numpy()
        want_grid, want_vals, _ = gapfill_series(
            buckets, g["sampen"].to_numpy(), step
        )
        d = decoded[(decoded.conv_id == conv) & (decoded.tier == tier)].sort_values(
            "bucket_ts"
        )
        np.testing.assert_array_equal(d["bucket_ts"].to_numpy(), want_grid)
        a, b = d["sampen"].to_numpy(), want_vals
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()
    # headers dominate single-point blocks; compression must hold in
    # aggregate and per-block once a block has real length
    assert blocks["enc_bytes"].sum() < blocks["raw_bytes"].sum()
    big = blocks[blocks["n_points"] >= 8]
    assert len(big) > 0 and (big["enc_bytes"] < big["raw_bytes"]).all()


def test_job_resume(ray_session, tmp_path):
    from eristropy_ray.pipelines.rollup import run_rollup_job
    from eristropy_ray.sources.transcripts import synthesize_transcripts

    d = synthesize_transcripts(
        tmp_path / "tx", n_convs=12, mean_turns=20, n_files=4, hot_factor=3
    )
    files = sorted(glob.glob(f"{d}/*.parquet"))
    out = str(tmp_path / "out")
    s1 = run_rollup_job(files, out, n_shards=2)
    assert s1["shards_skipped"] == 0 and s1["rows"] > 0
    s2 = run_rollup_job(files, out, n_shards=2)
    assert s2["shards_skipped"] == 2 and s2["rows"] == 0
    # lineage metrics emitted per (stage, shard)
    from eristropy_ray.state.metrics import MetricsLog

    records = MetricsLog(out).read()
    assert {(r["stage"], r["shard"]) for r in records} == {
        ("rollup", "s0000"), ("rollup", "s0001"),
        ("encode", "s0000"), ("encode", "s0001"),
    }


def test_synthesizer_deterministic(tmp_path):
    from eristropy_ray.sources.transcripts import synthesize_transcripts
    import pyarrow.parquet as pq

    d1 = synthesize_transcripts(tmp_path / "a", n_convs=6, mean_turns=15, n_files=2)
    d2 = synthesize_transcripts(tmp_path / "b", n_convs=6, mean_turns=15, n_files=2)
    for f1, f2 in zip(sorted(glob.glob(f"{d1}/*.parquet")), sorted(glob.glob(f"{d2}/*.parquet"))):
        assert pq.read_table(f1).equals(pq.read_table(f2))


def test_colocated_matches_bucketed(ray_session, tmp_path):
    """The zero-shuffle fast path produces the same rollup rows as the
    generic bucketed mode on a conversation-partitioned layout."""
    import glob as _glob

    import ray.data as rd

    from eristropy_ray.pipelines.rollup import (
        encode_blocks_colocated,
        rollup_dataset,
        rollup_files_colocated,
    )
    from eristropy_ray.pipelines.rollup import TRANSCRIPT_READ_COLUMNS
    from eristropy_ray.sources.transcripts import synthesize_transcripts

    d = synthesize_transcripts(
        tmp_path / "tx", n_convs=10, mean_turns=25, n_files=3, hot_factor=4
    )
    files = sorted(_glob.glob(f"{d}/*.parquet"))
    cfg = RollupConfig()
    a = _sorted_rollup(rollup_files_colocated(files, cfg))
    b = _sorted_rollup(
        rollup_dataset(
            rd.read_parquet(files, columns=TRANSCRIPT_READ_COLUMNS), cfg
        )
    )
    pd.testing.assert_frame_equal(a, b)
    blocks = encode_blocks_colocated(rollup_files_colocated(files, cfg)).to_pandas()
    assert blocks["n_points"].sum() > 0


def test_job_fused_layout_and_resume(ray_session, tmp_path):
    """conv_files layout: fused single-pass path, same manifest/resume
    contract, and its rollup checkpoint equals the bucketed job's rows."""
    import ray.data as rd

    from eristropy_ray.pipelines.rollup import run_rollup_job
    from eristropy_ray.sources.transcripts import synthesize_transcripts

    d = synthesize_transcripts(
        tmp_path / "tx", n_convs=10, mean_turns=24, n_files=4, hot_factor=3
    )
    files = sorted(glob.glob(f"{d}/*.parquet"))
    out_a = str(tmp_path / "fused")
    out_b = str(tmp_path / "bucketed")
    s1 = run_rollup_job(files, out_a, n_shards=2, layout="conv_files")
    s2 = run_rollup_job(files, out_b, n_shards=2, layout="unpartitioned")
    assert s1["rows"] == s2["rows"] and s1["rows"] > 0
    a = (
        rd.read_parquet(f"{out_a}/rollup")
        .to_pandas()
        .sort_values(["tier", "conv_id", "bucket_ts"], kind="stable")
        .reset_index(drop=True)
    )
    b = (
        rd.read_parquet(f"{out_b}/rollup")
        .to_pandas()
        .sort_values(["tier", "conv_id", "bucket_ts"], kind="stable")
        .reset_index(drop=True)
    )
    cols = [c for c in a.columns if c not in ("shard", "tier")]
    pd.testing.assert_frame_equal(a[cols], b[cols])
    s3 = run_rollup_job(files, out_a, n_shards=2, layout="conv_files")
    assert s3["shards_skipped"] == 2


def test_actor_pool_rollup_matches_tasks(ray_session, tmp_path):
    import ray.data as rd

    from eristropy_ray.pipelines.rollup import (
        RollupFileActor,
        rollup_files_colocated,
    )
    from eristropy_ray.sources.transcripts import synthesize_transcripts

    d = synthesize_transcripts(
        tmp_path / "tx", n_convs=8, mean_turns=20, n_files=2, hot_factor=2
    )
    files = sorted(glob.glob(f"{d}/*.parquet"))
    cfg = RollupConfig()
    a = _sorted_rollup(rollup_files_colocated(files, cfg))
    paths = rd.from_items([{"path": f} for f in files])
    b = _sorted_rollup(
        paths.map_batches(
            RollupFileActor,
            fn_constructor_args=(cfg,),
            concurrency=2,
            batch_size=1,
            batch_format="pyarrow",
        )
    )
    pd.testing.assert_frame_equal(a, b)


def test_encode_multi_block_roundtrip(ray_session):
    """A (conv, tier) series longer than max_points splits into several
    blocks that decode back to the full gap-filled series."""
    import pyarrow as pa

    from eristropy_ray.config import TIER_STEPS_US
    from eristropy_ray.stages.encode import decode_blocks, make_partition_encode_fn

    n = 30
    step = TIER_STEPS_US["1m"]
    buckets = np.arange(n, dtype=np.int64) * step + 1_700_000_000_000_000
    buckets = np.delete(buckets, [7, 8, 20])  # punch gaps
    vals = np.sin(np.arange(buckets.size) / 3.0)
    t = pa.table(
        {
            "conv_id": pa.array(["c"] * buckets.size),
            "tier": pa.array(["1m"] * buckets.size),
            "bucket_ts": pa.array(buckets, pa.timestamp("us")),
            "sampen": pa.array(vals, pa.float64()),
            "permen": pa.array(vals * 0.5, pa.float64()),
            "value_mean": pa.array(vals + 2, pa.float64()),
        }
    )
    cfg = EncodeConfig(max_points=8)
    blocks = make_partition_encode_fn(cfg)(t)
    assert blocks.num_rows == 4  # 30 dense points / 8 per block
    assert blocks["gap_filled_points"].to_pylist().count(0) < 4
    decoded = decode_blocks(blocks, cfg.columns).sort_values("bucket_ts")
    assert len(decoded) == 30  # dense grid restored
    # observed points round-trip exactly
    obs = decoded[decoded["bucket_ts"].isin(buckets)]
    np.testing.assert_array_equal(obs["sampen"].to_numpy(), vals)


def test_resume_after_partial_failure_does_not_duplicate(ray_session, tmp_path):
    """A shard that crashed mid-write leaves partial parquet files; the
    rerun must replace them, not append (Ray write_parquet appends
    uuid-named files into an existing dir)."""
    import json

    import ray.data as rd

    from eristropy_ray.pipelines.rollup import run_rollup_job
    from eristropy_ray.sources.transcripts import synthesize_transcripts

    d = synthesize_transcripts(
        tmp_path / "tx", n_convs=8, mean_turns=20, n_files=2, hot_factor=2
    )
    files = sorted(glob.glob(f"{d}/*.parquet"))
    out = tmp_path / "out"
    s1 = run_rollup_job(files, str(out), n_shards=1, layout="unpartitioned")
    rows_before = rd.read_parquet(str(out / "rollup")).count()
    # simulate a crash AFTER rollup wrote but BEFORE encode completed:
    # drop the manifest's encode record, keep the partial files on disk
    mpath = out / "MANIFEST.json"
    state = json.loads(mpath.read_text())
    del state["shards"]["s0000"]["stages"]["encode"]
    mpath.write_text(json.dumps(state))
    s2 = run_rollup_job(files, str(out), n_shards=1, layout="unpartitioned")
    assert s2["shards_skipped"] == 0 and s2["rows"] == s1["rows"]
    rows_after = rd.read_parquet(str(out / "rollup")).count()
    assert rows_after == rows_before  # would be 2x without the cleanup


def test_hopping_window_non_divisible_span(ray_session, tmp_path):
    """span not a multiple of slide: every window containing an event
    must be counted (ceil hops + membership filter), pinned against a
    brute-force per-window scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from eristropy_ray.pipelines.queries import q_hopping_window

    rng = np.random.default_rng(9)
    n = 400
    ts = np.sort(rng.integers(0, 20_000, size=n)).astype(np.int64) * 1_000_000
    uid = rng.integers(0, 3, size=n).astype(np.int64)
    val = rng.normal(size=n).round(3)
    pq.write_table(
        pa.table(
            {"event_id": pa.array(np.arange(n), pa.int64()),
             "user_id": pa.array(uid, pa.int64()),
             "ts": pa.array(ts, pa.timestamp("us")),
             "value": pa.array(val, pa.float64()),
             "event_type": pa.array(["click"] * n, pa.string())}
        ),
        tmp_path / "events.parquet",
    )
    span, slide = 3_500_000_000, 1_400_000_000  # non-divisible: ceil=3
    out = (
        q_hopping_window(str(tmp_path), span_us=span, slide_us=slide)
        .to_pandas()
        .sort_values(["signal_id", "window_start_us"])
        .reset_index(drop=True)
    )
    rows = {"signal_id": [], "window_start_us": [], "n_obs": [], "value_sum": []}
    for u in np.unique(uid):
        t_u = ts[uid == u]
        v_u = val[uid == u]
        starts = np.unique(
            np.array(
                [t - t % slide - k * slide for t in t_u for k in range(3)],
                dtype=np.int64,
            )
        )
        for s in starts:
            m = (t_u >= s) & (t_u < s + span)
            if m.any():
                rows["signal_id"].append(int(u))
                rows["window_start_us"].append(int(s))
                rows["n_obs"].append(int(m.sum()))
                rows["value_sum"].append(
                    float(np.round(v_u[m] * 1e6).astype(np.int64).sum() / 1e6)
                )
    exp = (
        pd.DataFrame(rows)
        .astype({"signal_id": "int64", "window_start_us": "int64",
                 "n_obs": "int64", "value_sum": "float64"})
        .sort_values(["signal_id", "window_start_us"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)


def test_streaming_window_late_path_fires(ray_session):
    """The watermark must actually drop late arrivals on the fixture
    (105 of 131 out-of-order events at sf0.01) and keep totals
    consistent: kept + late == all events."""
    from eristropy_ray.pipelines.queries import q_streaming_window

    out = q_streaming_window("/root/testdata/sf0.01").to_pandas()
    assert int(out["n_late"].sum()) == 105
    assert int(out["n_obs"].sum()) + int(out["n_late"].sum()) == 10_000
    # a window that lost events to lateness still reports its survivors
    lossy = out[out["n_late"] > 0]
    assert len(lossy) > 0


def test_late_data_policy_modes_agree(ray_session, tmp_path):
    """cfg.lateness_us: the (conv, day)-local watermark drops late turns
    identically in every physical plan, under shuffled arrival order."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from eristropy_ray.config import TIER_STEPS_US
    from eristropy_ray.pipelines.rollup import (
        TRANSCRIPT_READ_COLUMNS,
        rollup_dataset,
        rollup_files_colocated,
    )

    day = TIER_STEPS_US["1d"]
    hour = TIER_STEPS_US["1h"]
    rng = np.random.default_rng(23)
    rows = []
    for conv in ("c0", "c1"):
        base = day if conv == "c1" else 0
        # a conv-day whose max ts is base+20h; turns at 1h..20h
        for i in range(20):
            rows.append((conv, i, "t" * (i % 7 + 1), base + (i + 1) * hour))
        # second day for c0: exercises day-locality of the watermark
        if conv == "c0":
            for i in range(5):
                rows.append((conv, 100 + i, "x" * 3, base + day + (i + 1) * hour))
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        }
    )
    perm = rng.permutation(t.num_rows)  # shuffled arrival
    t = t.take(perm)
    f = tmp_path / "late_tx.parquet"
    pq.write_table(t, f)

    cfg = RollupConfig(lateness_us=6 * hour)
    a = _sorted_rollup(rollup_files_colocated([str(f)], cfg))
    ds = rd.read_parquet(str(f), columns=TRANSCRIPT_READ_COLUMNS)
    b = _sorted_rollup(rollup_dataset(ds, cfg, mode="bucketed"))
    c = _sorted_rollup(rollup_dataset(ds, cfg, mode="window_groups"))
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)

    # manual expectation: day-1 of c0 keeps ts >= 20h - 6h = 14h
    h1 = a[(a.conv_id == "c0") & (a.tier == "1h")]
    kept_buckets = sorted(h1["bucket_ts"].astype("int64") // hour)
    assert kept_buckets == [14, 15, 16, 17, 18, 19, 20, 25, 26, 27, 28, 29]
    # no policy -> everything kept
    full = _sorted_rollup(rollup_files_colocated([str(f)], RollupConfig()))
    f1 = full[(full.conv_id == "c0") & (full.tier == "1h")]
    assert len(f1) == 25
    with pytest.raises(ValueError):
        RollupConfig(lateness_us=-1)


def test_jsonl_source_matches_parquet(ray_session, tmp_path):
    """The JSONL ingest path produces byte-identical rollups to parquet."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from eristropy_ray.pipelines.rollup import rollup_dataset
    from eristropy_ray.sources.transcripts import (
        fixture_transcripts,
        read_transcripts_jsonl,
    )

    t = fixture_transcripts()
    df = t.to_pandas()
    df["ts"] = df["ts"].astype("int64")  # JSONL contract: epoch-µs int64
    half = len(df) // 2
    for i, part in enumerate((df.iloc[:half], df.iloc[half:])):
        with open(tmp_path / f"tx_{i}.jsonl", "w") as f:
            for rec in part.to_dict(orient="records"):
                f.write(json.dumps(rec) + "\n")

    cfg = RollupConfig()
    a = _sorted_rollup(rollup_dataset(rd.from_arrow(t), cfg))
    b = _sorted_rollup(
        rollup_dataset(
            read_transcripts_jsonl(
                [str(tmp_path / "tx_0.jsonl"), str(tmp_path / "tx_1.jsonl")]
            ),
            cfg,
        )
    )
    pd.testing.assert_frame_equal(a, b)


def test_csv_source_matches_parquet(ray_session, tmp_path):
    """The CSV ingest path produces byte-identical rollups to parquet."""
    import pyarrow as pa
    import ray.data as rd
    from pyarrow import csv as pa_csv

    from eristropy_ray.pipelines.rollup import rollup_dataset
    from eristropy_ray.sources.transcripts import (
        fixture_transcripts,
        read_transcripts_csv,
    )

    t = fixture_transcripts()
    # CSV contract: ts as int64 epoch-µs (same as JSONL)
    t_csv = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        t["ts"].cast(pa.int64()),
    )
    half = len(t_csv) // 2
    files = []
    for i, part in enumerate((t_csv.slice(0, half), t_csv.slice(half))):
        path = tmp_path / f"tx_{i}.csv"
        pa_csv.write_csv(part, path)
        files.append(str(path))

    cfg = RollupConfig()
    a = _sorted_rollup(rollup_dataset(rd.from_arrow(t), cfg))
    b = _sorted_rollup(rollup_dataset(read_transcripts_csv(files), cfg))
    pd.testing.assert_frame_equal(a, b)
