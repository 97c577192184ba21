"""Driver-facing query surface: one entry per operator (SURVEY.md §2),
each with a DuckDB oracle where ANSI SQL can express it.

Cross-engine exactness: float aggregates are accumulated as integer
micro-units on the Ray side and as DECIMAL(.,6) sums on the DuckDB side —
both are exact, and every subsequent float op is written in the same
order, so value hashes match bit-for-bit (no tolerance needed). Columns
carrying event time are emitted as ``ts_us``/``bucket_us`` BIGINT
(microseconds) on both sides to avoid timestamp-type mismatches.

All callables take ``sf_dir`` and return a Ray Dataset / pandas DataFrame.
Ray is initialised by the caller — never here.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache as _lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from eristropy_ray.config import EncodeConfig, RollupConfig
from eristropy_ray.stages.signals import (
    adf_partition,
    difference_partition,
    entropy_partition,
    zscore_partition,
)

_NPARTS = 32  # hash buckets for grouped signal ops (2×CPU at test scale)


def _hash_part(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash -> partition id. ONE definition for every
    co-location argument in this module ("same key -> same part")."""
    return (np.asarray(ids, dtype=np.int64) * 2654435761 % (2**31 - 1)) % _NPARTS

US_1H = 3_600_000_000
US_1D = 86_400_000_000
_BAND_JOIN_WINDOW_US = 600_000_000  # band_join window; SQL twin generated


@_lru_cache(maxsize=256)
def _clean_schema(path: str, columns: tuple[str, ...] | None) -> pa.Schema:
    import pyarrow.parquet as pq

    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def _read(path: str, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """``rd.read_parquet`` with the file's ``b'pandas'`` schema metadata
    stripped via an explicit pruned schema override.

    The driver-generated testdata carries pandas metadata, and a
    ``pa.Schema`` WITH metadata is unhashable (``hash`` raises on the
    metadata dict), so every downstream block-schema dedup — sort /
    groupby / join concats — logs Ray's "Failed to hash the schemas"
    warning and pays full schema unification per concat instead of the
    hashable early exit. Passing ``schema=`` keeps the read a pure read
    op (``count()`` stays a parquet-footer fast path; a strip-metadata
    ``map_batches`` would not) and costs one cached driver-side footer
    read per (path, columns)."""
    cols = None if columns is None else tuple(columns)
    return rd.read_parquet(
        path, columns=columns, schema=_clean_schema(path, cols), **kw
    )


def _events_signals(sf_dir: str) -> rd.Dataset:
    """events -> (signal_id, ts_us, value, tie, part)."""
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def project(b: pa.Table) -> pa.Table:
        sid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = _hash_part(sid)
        return pa.table(
            {
                "signal_id": pa.array(sid, pa.int64()),
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "value": b["value"],
                "tie": pc.cast(b["event_id"], pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def _grouped(ds: rd.Dataset, fn) -> rd.Dataset:
    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=["part"]))

    wrapper.__name__ = fn.__name__
    return ds.groupby("part").map_groups(wrapper, batch_format="pandas")


# ---------------------------------------------------------------- queries

def _user_counts(sf_dir: str, nparts: int = 64) -> rd.Dataset:
    """(user_id, n_obs) via per-batch collapse + part-hash combine: the
    shuffle carries (users x blocks) partial rows, not one row per
    event, and skips Ray's sort-based Aggregate fixed cost."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(uid, return_counts=True)
        part = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            nparts
        )
        return pa.table(
            {
                "part": pa.array(part.astype(np.int64), pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "n_obs": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(dtype=np.int64)
        n = df["n_obs"].to_numpy(dtype=np.int64)
        order = np.argsort(uid, kind="stable")
        uid, n = uid[order], n[order]
        st = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        return pd.DataFrame(
            {"user_id": uid[st], "n_obs": np.add.reduceat(n, st)}
        )

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return combine(df.drop(columns=["part"]))

    wrapper.__name__ = "user_count_combine"
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wrapper, batch_format="pandas")
    )


def q_signal_counts(sf_dir: str, nparts: int = 64):
    """V3-style per-signal sizes + exact min/max (validation surface).
    Partial-collapsed per batch (count/min/max are mergeable), then the
    part-hash combine — the shuffle carries partial rows, not events."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(uid, kind="stable")
        uid, v = uid[order], v[order]
        st = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        u = uid[st]
        part = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            nparts
        )
        return pa.table(
            {
                "part": pa.array(part.astype(np.int64), pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "n_obs": pa.array(
                    np.diff(np.append(st, uid.size)), pa.int64()
                ),
                "value_min": pa.array(
                    np.minimum.reduceat(v, st), pa.float64()
                ),
                "value_max": pa.array(
                    np.maximum.reduceat(v, st), pa.float64()
                ),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(dtype=np.int64)
        n = df["n_obs"].to_numpy(dtype=np.int64)
        vmin = df["value_min"].to_numpy(dtype=np.float64)
        vmax = df["value_max"].to_numpy(dtype=np.float64)
        order = np.argsort(uid, kind="stable")
        uid, n, vmin, vmax = uid[order], n[order], vmin[order], vmax[order]
        st = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        return pd.DataFrame(
            {
                "user_id": uid[st],
                "n_obs": np.add.reduceat(n, st),
                "value_min": np.minimum.reduceat(vmin, st),
                "value_max": np.maximum.reduceat(vmax, st),
            }
        )

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return combine(df.drop(columns=["part"]))

    wrapper.__name__ = "signal_counts_combine"
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wrapper, batch_format="pandas")
    )


def q_min_signal_length(sf_dir: str):
    """min group size guard (sample_entropy.py:106-111)."""
    counts = _user_counts(sf_dir)
    if counts.count() == 0:  # empty table: Dataset.min returns None
        return pd.DataFrame({"min_len": pd.Series(dtype="int64")})
    return pd.DataFrame({"min_len": [int(counts.min("n_obs"))]})


def q_doc_len(sf_dir: str):
    """value = len(text) derivation (the transcript ingest projection)."""
    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "value": pc.cast(pc.utf8_length(b["text"]), pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_doc_len_quantiles(
    sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99)
):
    """EXACT corpus doc-length quantiles via a mergeable histogram.

    The 100 TB shape for percentile cutoffs (quality filters pick "drop
    below P5 / above P99 length" thresholds): each batch collapses to
    (length, count) partial rows — the exchange is value-domain-sized
    (distinct lengths × blocks), independent of corpus row count — one
    small groupby sums them, and the driver finish interpolates on the
    cumulative histogram (value-domain-sized, the same legal
    small-result pinch as the other sketch finishes, but EXACT: integer
    value domains need no GK/t-digest approximation). Interpolation
    mirrors DuckDB's quantile_cont bit-for-bit (convex combination
    lo*(1-f) + hi*f at h=(n-1)*q, fuzz-pinned in tests)."""
    ds = _read(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        # utf8_length == pandas str.len == DuckDB LENGTH (codepoints)
        lens = pc.cast(pc.utf8_length(b["text"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        u, c = np.unique(lens, return_counts=True)
        return pa.table(
            {"len": pa.array(u, pa.int64()), "cnt": pa.array(c, pa.int64())}
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("len")
        .sum("cnt")
        .to_pandas()
    )
    cnt_col = "sum(cnt)" if "sum(cnt)" in hist.columns else "cnt"
    hist = hist.sort_values("len").reset_index(drop=True)
    lens = hist["len"].to_numpy(dtype=np.float64)
    cum = hist[cnt_col].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out = {"q": [], "value": []}
    for q in qs:
        h = (n - 1) * q
        i = int(np.floor(h))
        f = h - i
        lo = lens[np.searchsorted(cum, i, side="right")]
        hi = lens[np.searchsorted(cum, min(i + 1, n - 1), side="right")]
        out["q"].append(float(q))
        out["value"].append(lo * (1.0 - f) + hi * f)
    return pd.DataFrame(out).astype({"q": "float64", "value": "float64"})


def q_difference(sf_dir: str):
    """T2 per-signal first difference (difference.py:29-81)."""
    return _grouped(_events_signals(sf_dir), difference_partition).select_columns(
        ["signal_id", "ts_us", "value"]
    )


def q_zscore(sf_dir: str):
    """A4 per-signal z-score, ddof=1 (stationarity.py:278-281)."""
    return _grouped(_events_signals(sf_dir), zscore_partition).select_columns(
        ["signal_id", "ts_us", "value"]
    )


def _bucket_rollup(sf_dir: str, step_us: int, nparts: int = 64):
    """Continuous-aggregate rollup with the scalable partial-agg pattern:
    exact integer-micro partials per batch, then one hash exchange on a
    ``part`` key and a vectorized per-partition combine. (Round 5: the
    part-hash combine replaced ``groupby(keys).aggregate(...)`` — same
    shuffle volume, but Ray's sort-based Aggregate cost ~2.4 s of fixed
    machinery on 4.5 MB of partials; the part plan reads 2.8x faster at
    sf0.1 and is bit-equal because every merge op is order-insensitive:
    int64 sums, float min/max.)"""
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        # segmented numpy reduction (lexsort + reduceat), ~2x faster per
        # batch than the pandas groupby it replaced and bit-identical
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ts - ts % step_us
        vmu = np.round(v * 1e6).astype(np.int64)
        order = np.lexsort((bucket, uid))
        su, sb = uid[order], bucket[order]
        sv, svmu = v[order], vmu[order]
        n = su.size
        if n == 0:
            empty_i = np.empty(0, dtype=np.int64)
            empty_f = np.empty(0, dtype=np.float64)
            return pa.table(
                {
                    "part": pa.array(empty_i, pa.int64()),
                    "user_id": pa.array(empty_i, pa.int64()),
                    "bucket_us": pa.array(empty_i, pa.int64()),
                    "n_obs": pa.array(empty_i, pa.int64()),
                    "sum_mu": pa.array(empty_i, pa.int64()),
                    "value_min": pa.array(empty_f, pa.float64()),
                    "value_max": pa.array(empty_f, pa.float64()),
                }
            )
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (su[1:] != su[:-1]) | (sb[1:] != sb[:-1])
        starts = np.flatnonzero(change)
        part = (
            su[starts].astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(nparts)
        return pa.table(
            {
                "part": pa.array(part.astype(np.int64), pa.int64()),
                "user_id": pa.array(su[starts], pa.int64()),
                "bucket_us": pa.array(sb[starts], pa.int64()),
                "n_obs": pa.array(
                    np.diff(np.append(starts, n)), pa.int64()
                ),
                "sum_mu": pa.array(np.add.reduceat(svmu, starts), pa.int64()),
                "value_min": pa.array(
                    np.minimum.reduceat(sv, starts), pa.float64()
                ),
                "value_max": pa.array(
                    np.maximum.reduceat(sv, starts), pa.float64()
                ),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # one lexsort + reduceat merge of the partition's partials, then
        # finalize in place (int64 sums / float min-max: order-free)
        uid = df["user_id"].to_numpy(dtype=np.int64)
        bkt = df["bucket_us"].to_numpy(dtype=np.int64)
        order = np.lexsort((bkt, uid))
        uid, bkt = uid[order], bkt[order]
        n_obs = df["n_obs"].to_numpy(dtype=np.int64)[order]
        smu = df["sum_mu"].to_numpy(dtype=np.int64)[order]
        vmin = df["value_min"].to_numpy(dtype=np.float64)[order]
        vmax = df["value_max"].to_numpy(dtype=np.float64)[order]
        ch = np.empty(uid.size, dtype=bool)
        ch[0] = True
        ch[1:] = (uid[1:] != uid[:-1]) | (bkt[1:] != bkt[:-1])
        st = np.flatnonzero(ch)
        n2 = np.add.reduceat(n_obs, st)
        vsum = np.add.reduceat(smu, st).astype(np.float64) / 1e6
        return pd.DataFrame(
            {
                "user_id": uid[st],
                "bucket_us": bkt[st],
                "n_obs": n2,
                "value_min": np.minimum.reduceat(vmin, st),
                "value_max": np.maximum.reduceat(vmax, st),
                "value_sum": vsum,
                "value_mean": vsum / n2,
            }
        )

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return combine(df.drop(columns=["part"]))

    wrapper.__name__ = "rollup_combine"
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wrapper, batch_format="pandas")
    )


def q_rollup_1h(sf_dir: str):
    """1h tumbling-bucket rollup (count/min/max/sum/mean) via the
    partial-agg pattern: exact integer-micro sums per batch, then a
    small groupby — binary-exact vs the DECIMAL-sum SQL twin."""
    return _bucket_rollup(sf_dir, US_1H)


def q_rollup_1d(sf_dir: str):
    """1d tumbling-bucket rollup; same partial-agg pattern as 1h."""
    return _bucket_rollup(sf_dir, US_1D)


def q_doc_counts_by_lang(sf_dir: str):
    """Document counts per language label (single pruned-column groupby)."""
    ds = _read(f"{sf_dir}/documents.parquet", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def q_dedup_exact(sf_dir: str, nparts: int = 64):
    """Exact dedup: hash-partition by 128-bit content hash, keep min
    doc_id. Hashing is one vectorized pass over the Arrow string
    column's flat buffer + offsets (``batch_hash128`` — C-speed rolling
    hashes, no per-row Python; replaced the ``Series.map(sha1)`` loop
    flagged in VERDICT r4), and the shuffle carries two int64 key
    columns instead of 40-char hex strings. The combine is the
    part-hash plan (``part = h1 % nparts`` — every row of a hash group
    lands in one partition, so the per-partition lexsort + first/count
    is globally exact); it replaced ``groupby((h1,h2)).aggregate`` for
    the same fixed-shuffle-machinery reason as ``_bucket_rollup``."""
    from eristropy_ray.datapipe.dedup import batch_hash128

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def hash_batch(b: pa.Table) -> pa.Table:
        h1, h2 = batch_hash128(b["text"])
        part = (h1 % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "doc_id": b["doc_id"],
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        h1 = df["h1"].to_numpy(dtype=np.int64)
        h2 = df["h2"].to_numpy(dtype=np.int64)
        did = df["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((did, h2, h1))
        h1, h2, did = h1[order], h2[order], did[order]
        ch = np.empty(h1.size, dtype=bool)
        ch[0] = True
        ch[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        st = np.flatnonzero(ch)
        return pd.DataFrame(
            {
                "doc_id": did[st],  # doc_id is the last lexsort key -> min
                "n_dupes": np.diff(np.append(st, h1.size)).astype(np.int64),
            }
        )

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return combine(df.drop(columns=["part"]))

    wrapper.__name__ = "dedup_combine"
    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wrapper, batch_format="pandas")
    )


# GPT-2-style pre-tokenizer, simplified to be lookahead-free and written
# with EXPLICIT ASCII whitespace classes (Python's \s is Unicode-aware,
# RE2's is not — explicit classes make both engines match identically):
# contractions | space?letter-run | space?digit-run | space?punct-run
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\f\r']+"
_WS_TOKEN_PAT = r"[^ \t\n\f\r]+"


def _parquet_rows(path_glob: str) -> int:
    """Exact row count from parquet footer metadata — no data scan."""
    import glob as _glob

    import pyarrow.parquet as _pq

    paths = _glob.glob(path_glob) or [path_glob]
    return sum(_pq.ParquetFile(p).metadata.num_rows for p in paths)


def _sql_regex(pat: str) -> str:
    """SQL string literal of a Python regex: the escapes (\t etc.) are
    already literal backslash sequences RE2 understands; only quotes need
    doubling. Generating the oracle pattern from the SAME constant keeps
    the two engines from drifting (CLAUDE.md bit-exactness rule)."""
    return "'" + pat.replace("'", "''") + "'"


def q_token_counts(sf_dir: str):
    """Token counting (text-analysis op): whitespace tokens plus a
    BPE-ish pre-tokenizer count (compiled once per worker via the pandas
    str engine; the regex is RE2-compatible so the SQL twin is exact)."""
    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        # count_substring_regex = RE2 non-overlapping match count — the
        # same engine the SQL twin runs, C-speed on the Arrow buffer
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pc.cast(
                    pc.count_substring_regex(b["text"], pattern=_WS_TOKEN_PAT),
                    pa.int64(),
                ),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(b["text"], pattern=_BPE_PAT),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_quality_scores(sf_dir: str):
    """Quality scoring: exact integer counts + deterministic ratios."""
    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        n_chars = pc.cast(pc.utf8_length(b["text"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n_punct = pc.cast(
            pc.count_substring_regex(b["text"], pattern=r"[.!?,;:]"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        n_upper = pc.cast(
            pc.count_substring_regex(b["text"], pattern=r"[A-Z]"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        # max(n,1): an empty doc scores 0.0 on BOTH engines
        # (0/0 would be NaN here but NULL in DuckDB)
        denom = np.maximum(n_chars, 1)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_punct": pa.array(n_punct, pa.int64()),
                "n_upper": pa.array(n_upper, pa.int64()),
                "punct_ratio": pa.array(n_punct / denom, pa.float64()),
                "upper_ratio": pa.array(n_upper / denom, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_similarity_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k vs the vec_id=0 embedding (broadcast).

    The broadcast side is the SINGLE query vector (the correct
    small-side pattern); the row is fetched with a predicate-pushdown
    read so only the row groups whose vec_id range covers 0 leave
    storage — no full-corpus driver read."""
    import pyarrow.parquet as pq
    import ray

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 0)],
    )
    if len(tbl) == 0:
        raise ValueError("similarity_topk: no row with vec_id=0 in embeddings")
    qvec = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
    qref = ray.put(qvec / max(np.sqrt((qvec * qvec).sum()), 1e-30))

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def score(b: pa.Table) -> pa.Table:
        import ray as _ray

        q = _ray.get(qref)
        # flat list-buffer reshape (no per-row to_pylist loop); float64
        # values and row order are identical, so sims stay bit-exact
        lst = b["embedding"].combine_chunks()
        flat = np.asarray(lst.flatten(), dtype=np.float64)
        n = len(b)
        emb = flat.reshape(n, flat.size // n) if n else flat.reshape(0, 0)
        norms = np.maximum(np.sqrt((emb * emb).sum(axis=1)), 1e-30)
        sims = np.round((emb @ q) / norms, 4)
        ids = b["vec_id"].to_numpy()
        # per-block top-k on the SAME key as the final sort, so the tiny
        # merge below equals a global sort+limit without the all-to-all
        head = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[head], pa.int64()),
                "sim": pa.array(sims[head], pa.float64()),
            }
        )

    # merge of per-block heads: the sort input is num_blocks x k rows
    scored = ds.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["sim", "vec_id"], descending=[True, False]).limit(k)
    return top


def q_sampen_per_signal(sf_dir: str):
    """O4 analogue: per-signal SampEn/PermEn (rows-only; not SQL)."""
    return _grouped(_events_signals(sf_dir), entropy_partition)


def q_adf_stationarity(sf_dir: str):
    """A1+A2: difference -> per-signal ADF p -> Holm-Sidak accept set.

    The multiple-testing barrier runs on the driver over one scalar per
    signal (rows-only; not SQL)."""
    from eristropy_ray.kernels.multitest import holm_sidak

    diffed = _grouped(_events_signals(sf_dir), difference_partition)

    def rekey(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = _hash_part(df["signal_id"].to_numpy())
        df["tie"] = 0
        return df

    pvals = (
        diffed.map_batches(rekey, batch_format="pandas")
        .groupby("part")
        .map_groups(
            lambda df: adf_partition(df.drop(columns=["part"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    pvals = pvals.sort_values("signal_id").reset_index(drop=True)
    reject, corrected = holm_sidak(pvals["pvalue"].to_numpy(), alpha=0.05)
    pvals["stationary"] = reject
    pvals["pvalue_corrected"] = corrected
    return pvals


def q_transcript_rollup(sf_dir: str):
    """Flagship rollup over events projected to transcript shape
    (rows-only; windowed entropies are not SQL-expressible)."""
    from eristropy_ray.pipelines.rollup import rollup_dataset
    from eristropy_ray.sources.transcripts import events_to_transcripts

    ds = _read(f"{sf_dir}/events.parquet")
    turns = ds.map_batches(events_to_transcripts, batch_format="pyarrow")
    return rollup_dataset(turns, RollupConfig())


def q_transcript_rollup_stats(sf_dir: str):
    """SQL-expressible face of the flagship rollup: the SAME
    rollup_dataset pipeline as ``transcript_rollup``, projected to its
    stats columns. value = utf8 length of text is integer-valued, so the
    float64 sums are exact and the mean is the identical division on
    both engines — this pins the flagship's windowing, bucketing and
    stats hash-exactly (the entropy columns stay pytest-pinned in
    ``transcript_rollup``)."""
    from eristropy_ray.pipelines.rollup import rollup_dataset
    from eristropy_ray.sources.transcripts import events_to_transcripts

    ds = _read(f"{sf_dir}/events.parquet")
    turns = ds.map_batches(events_to_transcripts, batch_format="pyarrow")
    rollup = rollup_dataset(turns, RollupConfig())

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "tier": b["tier"],
                "bucket_us": pc.cast(b["bucket_ts"], pa.int64()),
                "n_turns": pc.cast(b["n_turns"], pa.int64()),
                "value_sum": b["value_sum"],
                "value_min": b["value_min"],
                "value_max": b["value_max"],
                "value_mean": b["value_mean"],
            }
        )

    return rollup.map_batches(project, batch_format="pyarrow")


def _tier_block_ds(sf_dir: str):
    from eristropy_ray.pipelines.rollup import encode_dataset, rollup_dataset
    from eristropy_ray.sources.transcripts import events_to_transcripts

    ds = _read(f"{sf_dir}/events.parquet")
    turns = ds.map_batches(events_to_transcripts, batch_format="pyarrow")
    return encode_dataset(rollup_dataset(turns, RollupConfig()))


def q_tier_blocks(sf_dir: str):
    """Gap-filled tier blocks: per (conv, tier, block) boundary, point and
    gap-filled-point counts — binary-exact vs a dense-grid windowed SQL
    oracle (generate_series grid LEFT JOIN observed buckets)."""
    blocks = _tier_block_ds(sf_dir)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "tier": b["tier"],
                "block_start_us": pc.cast(b["block_start"], pa.int64()),
                "n_points": pc.cast(b["n_points"], pa.int64()),
                "gap_filled_points": pc.cast(b["gap_filled_points"], pa.int64()),
            }
        )

    return blocks.map_batches(project, batch_format="pyarrow")


def q_tier_block_sizes(sf_dir: str):
    """Raw-side compression accounting per tier block. ``raw_bytes`` is a
    pure function of the gap-filled point count (8 bytes x (1 timestamp +
    len(EncodeConfig.columns) values) per point), so this side is
    oracle-exact against the dense-grid SQL twin; the codec-dependent
    encoded size lives in ``q_tier_block_enc`` (rows-only, pinned by
    round-trip tests)."""
    blocks = _tier_block_ds(sf_dir)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "tier": b["tier"],
                "block_start_us": pc.cast(b["block_start"], pa.int64()),
                "raw_bytes": b["raw_bytes"],
            }
        )

    return blocks.map_batches(project, batch_format="pyarrow")


def q_tier_block_enc(sf_dir: str):
    """Encoded-side compression accounting (Gorilla/DoD output bytes per
    tier block; rows-only — codec byte counts are pinned by the codec
    round-trip and golden tests, not SQL-expressible)."""
    blocks = _tier_block_ds(sf_dir)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "tier": b["tier"],
                "block_start_us": pc.cast(b["block_start"], pa.int64()),
                "enc_bytes": b["enc_bytes"],
            }
        )

    return blocks.map_batches(project, batch_format="pyarrow")


def q_stationary_signals(sf_dir: str):
    """Full StationarySignals flow (difference -> ADF -> Holm-Sidak ->
    semi-join filter -> z-score) on the events signal table (rows-only)."""
    from eristropy_ray.pipelines.stationary import (
        StationaryConfig,
        make_stationary_signals,
    )

    out, _ = make_stationary_signals(
        _events_signals(sf_dir), StationaryConfig(method="difference")
    )
    return out.select_columns(["signal_id", "ts_us", "value"])


def q_sampen_optimized(sf_dir: str):
    """SampleEntropy.compute_all_sampen(optimize=True) analogue with a
    deterministic TPE-lite search (rows-only)."""
    import warnings

    from eristropy_ray.pipelines.entropy import (
        SampEnConfig,
        SampEnSettingWarning,
        compute_all_sampen,
    )

    from eristropy_ray.stages.signals import zscore_plain_partition

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SampEnSettingWarning)
        cfg = SampEnConfig(random_seed=17, n_boot=20, n_trials=10, m=2)
    # the reference's r_range is for normalized signals (the
    # StationarySignals output) — z-score first, as its flow does
    normalized = _grouped(_events_signals(sf_dir), zscore_plain_partition)
    out, _ = compute_all_sampen(
        normalized, cfg, optimize=True, estimate_uncertainty=True
    )
    return out


def q_sampen_efficiency(sf_dir: str):
    """SampEnEfficiency grid path: Lake analytic r* + per-signal SampEn
    and analytic SE (rows-only)."""
    from eristropy_ray.pipelines.entropy import sampen_efficiency
    from eristropy_ray.stages.signals import zscore_plain_partition

    normalized = _grouped(_events_signals(sf_dir), zscore_plain_partition)
    out, _ = sampen_efficiency(
        normalized, m=2, r_range=(0.1, 0.5), random_seed=17
    )
    return out


def q_doc_bytes(sf_dir: str):
    """Opaque-payload byte length (multimodal metadata op; text treated
    as its utf-8 payload)."""
    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_bytes": pc.cast(
                    pc.binary_length(pc.cast(b["text"], pa.binary())), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_langid(sf_dir: str):
    """Heuristic language ID (stopword/CJK n-gram scoring). Oracle-backed:
    the SQL twin is generated from the SAME stopword sets (_langid_sql),
    so the per-doc labels are hash-checked even though the synthetic
    corpus carries no real language signal. Batch-vectorized since
    round 5 (langid_predict_arrow — one slab regex split + np.isin per
    language, element-identical to the scalar kernel)."""
    from eristropy_ray.datapipe.textstats import langid_predict_arrow

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "lang_pred": pa.array(
                    langid_predict_arrow(b["text"]).astype(str), pa.string()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_fingerprints(sf_dir: str):
    """Winnowing document fingerprints + whole-doc rolling hash."""
    from eristropy_ray.datapipe.textstats import content_hash64, winnow_fingerprints

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_fingerprints": [
                    int(winnow_fingerprints(t).size) for t in df["text"]
                ],
                "content_hash": [format(content_hash64(t), "016x") for t in df["text"]],
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def q_simhash(sf_dir: str):
    """64-bit SimHash per document (near-dup signature; rows-only).
    Arrow-native: signatures come off the string column's flat buffer
    (``simhash64_arrow``, element-identical to the scalar kernel)."""
    from eristropy_ray.datapipe.dedup import simhash64_arrow

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        sig = simhash64_arrow(b["text"])
        hexcat = sig.astype(">u8").tobytes().hex()
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "simhash": pa.array(
                    [hexcat[i * 16 : (i + 1) * 16] for i in range(sig.size)],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_simhash_neardup(sf_dir: str, max_hamming: int = 3, bucket_cap: int = 200):
    """SimHash near-dup pairs: Hamming(sig_a, sig_b) <= ``max_hamming``
    over 64-bit word-unigram SimHash (rows-only; the SQL-expressible
    dedup surfaces are minhash_neardup / ngram_jaccard).

    Scale-safe plan, and SIMPLER than the minhash one because the
    signature (8 bytes) travels with every bucket row, so verification
    needs no second pass over the corpus: vectorized signatures per
    batch -> explode 4 chunk keys per doc (pigeonhole: any pair within
    Hamming <= 3 of a 4-chunk split shares at least one exact 16-bit
    chunk, so recall is 1.0 by construction, not probabilistically) ->
    groupby(bucket hash-partition) -> segment-local candidate pair
    expansion carrying both sigs -> inline vectorized Hamming verify ->
    output-scale pair set, deduped across chunks driver-side (the same
    legal small-result pinch as minhash_neardup). The corpus text never
    moves past the sign stage; buckets over ``bucket_cap`` docs are
    counted and logged, not silently dropped."""
    import logging

    from eristropy_ray.datapipe.dedup import hamming64_batch, simhash64_arrow

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sign(b: pa.Table) -> pa.Table:
        sig = simhash64_arrow(b["text"])
        ids = b["doc_id"].to_numpy()
        n = ids.size
        chunk_id = np.tile(np.arange(4, dtype=np.uint64), n)
        rep_sig = np.repeat(sig, 4)
        chunk_val = (rep_sig >> (chunk_id * np.uint64(16))) & np.uint64(0xFFFF)
        # one flat int key per (chunk, value) bucket
        bucket = (chunk_id.astype(np.int64) << 16) | chunk_val.astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "sig": pa.array(rep_sig.view(np.int64), pa.int64()),
                "part": pa.array(bucket % _NPARTS, pa.int64()),
            }
        )

    banded = docs.map_batches(sign, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # segment-local all-pairs expansion (the minhash pattern) with
        # the sigs carried along; Hamming verify inline, fully vectorized
        codes = df.groupby("bucket", sort=False).ngroup().to_numpy()
        ids = df["doc_id"].to_numpy()
        sigs = df["sig"].to_numpy().view(np.uint64)
        order = np.lexsort((ids, codes))
        codes, ids, sigs = codes[order], ids[order], sigs[order]
        sizes = np.bincount(codes) if codes.size else np.empty(0, np.int64)
        n_over = int((sizes > bucket_cap).sum())
        keep = (
            ((sizes >= 2) & (sizes <= bucket_cap))[codes]
            if codes.size
            else codes.astype(bool)
        )
        codes, ids, sigs = codes[keep], ids[keep], sigs[keep]
        cols = {"doc_a": [], "doc_b": [], "hamming": []}
        out = pd.DataFrame(cols).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
        )
        if ids.size:
            _, codes = np.unique(codes, return_inverse=True)
            seg_sizes = np.bincount(codes)
            starts = np.concatenate(([0], np.cumsum(seg_sizes)[:-1]))
            pos = np.arange(ids.size) - starts[codes]
            firsts = np.cumsum(pos) - pos
            a_idx = np.repeat(starts[codes], pos) + (
                np.arange(int(pos.sum())) - np.repeat(firsts, pos)
            )
            b_idx = np.repeat(np.arange(ids.size), pos)
            ham = hamming64_batch(sigs[a_idx], sigs[b_idx])
            ok = ham <= max_hamming
            out = (
                pd.DataFrame(
                    {
                        "doc_a": ids[a_idx][ok],
                        "doc_b": ids[b_idx][ok],
                        "hamming": ham[ok],
                    }
                )
                .drop_duplicates(["doc_a", "doc_b"])
                .astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
            )
        if n_over:  # sentinel row; filtered + logged driver-side
            out = pd.concat(
                [out, pd.DataFrame({"doc_a": [-1], "doc_b": [n_over], "hamming": [-1]})],
                ignore_index=True,
            ).astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
        return out

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return bucket_pairs(df.drop(columns=["part"]))

    wrapper.__name__ = "simhash_bucket_pairs"

    pairs = (
        banded.groupby("part")
        .map_groups(wrapper, batch_format="pandas")
        .to_pandas()
    )
    n_over_total = (
        int(pairs.loc[pairs["doc_a"] < 0, "doc_b"].sum()) if len(pairs) else 0
    )
    if n_over_total:
        logging.getLogger(__name__).warning(
            "simhash_neardup: %d chunk buckets exceeded cap=%d docs and were "
            "not paired (near-dup recall may be reduced for those buckets)",
            n_over_total, bucket_cap,
        )
        pairs = pairs[pairs["doc_a"] >= 0]
    # a pair within Hamming<=3 can share up to 4 chunks -> dedupe across
    # partitions on the (small) verified output
    return (
        pairs.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"], kind="stable")
        .reset_index(drop=True)
    )


def q_doc_chunks(sf_dir: str, max_tokens: int = 128, stride: int = 96):
    """Token-window document chunking (rows-only): explode each document
    into fixed-token-count overlapping windows — the pre-tokenization
    split a training pipeline runs before sequence packing. One output
    row per (doc, chunk); a pure streaming flat-map (no shuffle, no
    state), so at 100 TB it rides the same wave-parallel scan as every
    other text op. Windows are deterministic (chunk i = tokens
    [i*stride, i*stride+max_tokens)), overlap = max_tokens - stride,
    and the union of windows covers every token exactly (pinned by
    property tests in tests/test_datapipe.py). The explode is fully
    batch-vectorized off the Arrow flat buffer (one whitespace-mask pass
    per batch, ranges-to-indices gather for the chunk text — no per-row
    Python loop; element-identical to the scalar kernel)."""
    from eristropy_ray.datapipe.textstats import chunk_token_windows_arrow

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        doc_idx, chunk_id, first, ntok, text_arr = chunk_token_windows_arrow(
            b.column("text"), max_tokens, stride
        )
        ids = b.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx], pa.int64()),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "first_token": pa.array(first, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "chunk_text": text_arr,
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def q_seq_pack(sf_dir: str, capacity: int = 256, n_parts: int = 32):
    """Sequence packing (rows-only): assign every document to a
    fixed-token-capacity training sequence — the step after chunking
    that fills model context windows before tokenization.

    Plan: one Arrow map_batches computes per-doc token counts (same
    C-speed regex count as ``token_counts``) and a multiplicative-hash
    partition key; one hash shuffle colocates each partition; inside a
    partition docs are walked in doc_id order and packed greedily
    (``greedy_pack_tokens`` — the scan loop runs per OUTPUT sequence,
    not per doc). Sequences never span partitions, so the shuffle is the
    only exchange and partitions pack independently — at 100 TB each
    partition's loop count is its token budget / capacity. A doc longer
    than ``capacity`` gets its own overflowing sequence (callers chunk
    first via ``doc_chunks`` if they need hard caps). Output one row per
    doc: (part, seq_id, seq_offset, doc_id, n_tokens); (part, seq_id)
    is the globally unique sequence key. Deterministic for a fixed
    ``n_parts``."""
    from eristropy_ray.datapipe.textstats import greedy_pack_tokens

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tag(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy().astype(np.int64)
        part = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            n_parts
        )
        return pa.table(
            {
                "part": pa.array(part.astype(np.int64), pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(b["text"], pattern=_WS_TOKEN_PAT),
                    pa.int64(),
                ),
            }
        )

    def pack_partition(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        ntok = df["n_tokens"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids, ntok = ids[order], ntok[order]
        seq, off = greedy_pack_tokens(ntok, capacity)
        return pd.DataFrame(
            {
                "part": df["part"].to_numpy(dtype=np.int64)[order],
                "seq_id": seq,
                "seq_offset": off,
                "doc_id": ids,
                "n_tokens": ntok,
            }
        )

    pack_partition.__name__ = "seq_pack_partition"
    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack_partition, batch_format="pandas")
    )


#: default per-language sampling rates for q_weighted_mix — module-level
#: so the SQL twin (_weighted_mix_sql) is generated from the SAME dict.
WEIGHTED_MIX_RATES = {"en": 0.6, "unknown": 0.3}
WEIGHTED_MIX_DEFAULT_RATE = 0.5
WEIGHTED_MIX_M = 1000


def q_weighted_mix(sf_dir: str):
    """Weighted corpus mixing (rows-only registry; exact DuckDB pin in
    pytest via a twin generated from the same rate dict): rebalance a
    multi-source corpus by sampling each predicted language at its own
    rate — the source-mixing step before training. Deterministic
    systematic sample (the ``sample_events`` idiom): doc kept iff
    ``doc_id % M < round(rate(lang) * M)``, so re-weighting is a pure
    filter change — no shuffle, no state, reproducible across runs and
    cluster sizes. Output (doc_id, lang_pred)."""
    from eristropy_ray.datapipe.textstats import langid_predict_arrow

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    m = WEIGHTED_MIX_M
    thresholds = {
        lang: int(round(r * m)) for lang, r in WEIGHTED_MIX_RATES.items()
    }
    default_thr = int(round(WEIGHTED_MIX_DEFAULT_RATE * m))

    def fn(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = langid_predict_arrow(b["text"])
        thr = np.array(
            [thresholds.get(x, default_thr) for x in lang], dtype=np.int64
        )
        keep = (ids % m) < thr
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "lang_pred": pa.array(lang[keep].astype(str), pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _weighted_mix_sql() -> str:
    """SQL twin of q_weighted_mix (pytest pin, not a driver oracle —
    the 50-slot prefix is full). Generated from WEIGHTED_MIX_RATES so
    the rates cannot drift between engines."""
    m = WEIGHTED_MIX_M
    cases = " ".join(
        f"WHEN lang_pred = '{lang}' THEN {int(round(r * m))}"
        for lang, r in sorted(WEIGHTED_MIX_RATES.items())
    )
    thr = f"CASE {cases} ELSE {int(round(WEIGHTED_MIX_DEFAULT_RATE * m))} END"
    return f"""
WITH lang AS ({_langid_sql()})
SELECT doc_id, lang_pred FROM lang
WHERE doc_id % {m} < {thr}
"""


def q_minhash_neardup(sf_dir: str, bucket_cap: int = 50):
    """MinHash-LSH near-dup candidate pairs, Jaccard-verified (>= 0.5).

    Scale-safe plan: vectorized signatures per batch -> explode
    (band_id, band_hash, doc_id) -> groupby(bucket) -> candidate PAIRS
    only (ids, no text) -> distributed pair dedupe -> broadcast the
    candidate id->pair map (output-scale, the legal driver pinch) ->
    one streaming filter tags candidate texts with their pair ids ->
    one groupby(pair-hash) regroups them -> exact-Jaccard verify per
    pair. The corpus text is never broadcast or collected on the driver
    and never joins: only candidate texts move through the one regroup
    shuffle. Buckets larger than ``bucket_cap`` docs are counted and
    logged, not silently dropped.

    Oracle-exact: on the test corpus LSH recall is 1.0 (every exact
    word-shingle-Jaccard>=0.5 pair shares at least one band — asserted in
    tests/test_datapipe.py), so the verified output IS the exact pair set
    and matches the all-pairs SQL twin (``_minhash_sql``) bit-for-bit:
    the emitted jaccard is an unrounded int/int double division on both
    sides.
    """
    import logging

    from eristropy_ray.datapipe.dedup import (
        jaccard_from_hashes,
        lsh_band_keys,
        minhash_signature_arrow,
        word_shingle_hashes,
    )

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sign(b: pa.Table) -> pa.Table:
        # Arrow-native hot stage: signatures come straight off the string
        # column's flat buffer (segment-vectorized, no per-text Python)
        sigs = minhash_signature_arrow(b["text"], num_perm=64)
        band_id, band_hash = lsh_band_keys(sigs, n_bands=16)
        n_bands = 16
        bh = band_hash.view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(b["doc_id"].to_numpy(), n_bands), pa.int64()
                ),
                "band_id": pa.array(band_id.astype(np.int64), pa.int64()),
                "band_hash": pa.array(bh, pa.int64()),
                # hash-partition buckets so pair generation is one UDF call
                # per partition, not one per LSH bucket
                "part": pa.array(bh % _NPARTS, pa.int64()),
            }
        )

    banded = docs.map_batches(sign, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized within the partition: bucket codes + sizes via
        # ngroup/bincount, then segment-local all-pairs expansion (each
        # id-sorted element at local position p is the b-side of p pairs
        # with all earlier elements of its bucket) — no Python loop over
        # LSH buckets
        df = df.drop_duplicates(["band_id", "band_hash", "doc_id"])
        codes = df.groupby(["band_id", "band_hash"], sort=False).ngroup().to_numpy()
        ids = df["doc_id"].to_numpy()
        order = np.lexsort((ids, codes))
        codes, ids = codes[order], ids[order]
        sizes = np.bincount(codes) if codes.size else np.empty(0, np.int64)
        n_over = int((sizes > bucket_cap).sum())
        keep = ((sizes >= 2) & (sizes <= bucket_cap))[codes] if codes.size else codes.astype(bool)
        codes, ids = codes[keep], ids[keep]
        if ids.size:
            _, codes = np.unique(codes, return_inverse=True)
            seg_sizes = np.bincount(codes)
            starts = np.concatenate(([0], np.cumsum(seg_sizes)[:-1]))
            pos = np.arange(ids.size) - starts[codes]
            b_side = np.repeat(ids, pos)
            firsts = np.cumsum(pos) - pos
            a_idx = np.repeat(starts[codes], pos) + (
                np.arange(int(pos.sum())) - np.repeat(firsts, pos)
            )
            out = (
                pd.DataFrame({"doc_a": ids[a_idx], "doc_b": b_side})
                .drop_duplicates()
                .astype({"doc_a": "int64", "doc_b": "int64"})
            )
        else:
            out = pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64")}
            )
        if n_over:  # sentinel row; filtered + logged driver-side
            out = pd.concat(
                [out, pd.DataFrame({"doc_a": [-1], "doc_b": [n_over]})],
                ignore_index=True,
            ).astype({"doc_a": "int64", "doc_b": "int64"})
        return out

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return bucket_pairs(df.drop(columns=["part"]))

    wrapper.__name__ = "bucket_pairs"

    # candidate pairs are tiny relative to the corpus — collecting them
    # (NOT the corpus) is the legal small-result pinch point; dedupe of
    # pairs surfacing from several bands happens here too
    pairs_pd = (
        banded.groupby("part")
        .map_groups(wrapper, batch_format="pandas")
        .to_pandas()
    )
    n_over_total = (
        int(pairs_pd.loc[pairs_pd["doc_a"] < 0, "doc_b"].sum())
        if len(pairs_pd)
        else 0
    )
    if n_over_total:
        logging.getLogger(__name__).warning(
            "minhash_neardup: %d LSH buckets exceeded cap=%d docs and were "
            "not paired (near-dup recall may be reduced for those buckets)",
            n_over_total, bucket_cap,
        )
        pairs_pd = pairs_pd[pairs_pd["doc_a"] >= 0]
    pairs_pd = pairs_pd.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)
    if pairs_pd.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"),
             "doc_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    # Candidate texts reach their pairs WITHOUT a join barrier: the
    # candidate id -> (pair, side) map is output-scale (the same data as
    # pairs_pd, which already legally sits on the driver), so it is
    # broadcast once via ray.put; one streaming map over the corpus
    # filters to candidate docs and tags each with its pair ids, then a
    # single groupby(pair-hash) regroups that candidate-text set for
    # verification. The corpus itself streams through the filter — only
    # candidate texts shuffle, and the ~1.3 s local-mode join barrier of
    # the previous plan is gone.
    import ray as _ray_mod

    a_ids = pairs_pd["doc_a"].to_numpy()
    b_ids = pairs_pd["doc_b"].to_numpy()
    # candidate id -> (pair, side) map as SORTED flat numpy arrays (CSR
    # layout): zero-copy through the object store, and the tag stage
    # below is fully vectorized (searchsorted + repeat), no per-doc
    # Python. Two refs so each stage ships only what it reads.
    n_pairs = a_ids.size
    occ_doc = np.concatenate([a_ids, b_ids])
    occ_pid = np.tile(np.arange(n_pairs, dtype=np.int64), 2)
    occ_side = np.repeat(np.array([0, 1], dtype=np.int64), n_pairs)
    order = np.argsort(occ_doc, kind="stable")
    occ_doc, occ_pid, occ_side = occ_doc[order], occ_pid[order], occ_side[order]
    cand_ids, starts = np.unique(occ_doc, return_index=True)
    offsets = np.append(starts, occ_doc.size).astype(np.int64)
    tag_ref = _ray_mod.put((cand_ids, offsets, occ_pid, occ_side))
    pairs_ref = _ray_mod.put((a_ids, b_ids))

    def tag_candidates(batch: pa.Table) -> pa.Table:
        # Arrow in AND out: the corpus text column never converts to
        # pandas object dtype (the scan's dominant cost), and zero-row
        # no-candidate batches have exact Arrow size accounting (the
        # pandas estimator cannot size an empty object column).
        cids, offs, o_pid, o_side = _ray_mod.get(tag_ref)
        ids = batch.column("doc_id").to_numpy()
        if cids.size == 0 or ids.size == 0:
            rows = np.empty(0, dtype=np.int64)
        else:
            pos = np.searchsorted(cids, ids)
            hit = (pos < cids.size) & (cids[np.minimum(pos, cids.size - 1)] == ids)
            rows = np.flatnonzero(hit)
        if rows.size == 0:
            empty = np.empty(0, dtype=np.int64)
            return pa.table(
                {
                    "pid": pa.array(empty, pa.int64()),
                    "side": pa.array(empty, pa.int64()),
                    "text": pa.array([], pa.string()),
                    "part": pa.array(empty, pa.int64()),
                }
            )
        idx = np.searchsorted(cids, ids[rows])
        counts = offs[idx + 1] - offs[idx]
        # flat occurrence indices for each candidate row's slice
        flat = (
            np.repeat(offs[idx], counts)
            + np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
        )
        # one Arrow take with repeated row indices == np.repeat(texts)
        text = batch.column("text").take(pa.array(np.repeat(rows, counts)))
        return pa.table(
            {
                "pid": pa.array(o_pid[flat], pa.int64()),
                "side": pa.array(o_side[flat], pa.int64()),
                "text": text,
                "part": pa.array(o_pid[flat] % _NPARTS, pa.int64()),
            }
        )

    tagged = docs.map_batches(tag_candidates, batch_format="pyarrow")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        p_a, p_b = _ray_mod.get(pairs_ref)
        df = df.drop(columns=["part"])
        a_rows = df[df["side"] == 0][["pid", "text"]].rename(
            columns={"text": "text_a"}
        )
        b_rows = df[df["side"] == 1][["pid", "text"]].rename(
            columns={"text": "text_b"}
        )
        both = a_rows.merge(b_rows, on="pid")  # inner: need both sides
        both["doc_a"] = p_a[both["pid"].to_numpy()]
        both["doc_b"] = p_b[both["pid"].to_numpy()]
        # shingle each distinct text once (docs recur across pairs)
        cache: dict[str, np.ndarray] = {}

        def shingles(t: str) -> np.ndarray:
            s = cache.get(t)
            if s is None:
                s = cache[t] = word_shingle_hashes(t, 3)
            return s

        keep = {"doc_a": [], "doc_b": [], "jaccard": []}
        for a, b, ta, tb in zip(
            both["doc_a"], both["doc_b"], both["text_a"], both["text_b"]
        ):
            j = jaccard_from_hashes(shingles(ta), shingles(tb))
            if j >= 0.5:
                keep["doc_a"].append(int(a))
                keep["doc_b"].append(int(b))
                # unrounded: inter/union int->double division is
                # bit-identical to the SQL twin's CAST(...)/uni
                keep["jaccard"].append(j)
        return pd.DataFrame(keep).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
        )

    verify.__name__ = "verify_pairs"
    out = (
        tagged.groupby("part")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["doc_a", "doc_b"], kind="stable").reset_index(drop=True)


def _embedding_dim(path: str) -> int:
    """Embedding dimensionality via a single-row driver-side read.

    The stored column type is variable ``list<float>``, so an empty
    Arrow batch cannot self-describe its dimensionality; resolving d
    once at plan-build time lets batch UDFs emit correctly-typed empty
    ``fixed_size_list`` columns for zero-row inputs (Ray's shuffle
    concat requires every block's schema to agree)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    batch = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(batch.column(0)[0])


def _fsl2d(col: "pa.ChunkedArray") -> np.ndarray:
    """Zero-copy a FixedSizeList column to a 2-D numpy array
    (rows x list_size), respecting any slice offsets (``flatten()``,
    not ``.values``)."""
    arr = col.combine_chunks()
    d = arr.type.list_size
    return arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, d)


def _merge_topk(tbl: pa.Table, k: int) -> pa.Table:
    """Merge per-partition kNN partials into the global top-k per query:
    sort by (qid, rounded-sim DESC, nid ASC) — the shared reproducible
    order — drop the self-match, keep the first k of each qid run.
    Shared by q_knn_all and q_ann_ivf (their partials both emit disjoint
    (qid, nid) rows with already-rounded sims)."""
    qid = tbl.column("qid").to_numpy()
    nid = tbl.column("nid").to_numpy()
    sim = tbl.column("sim").to_numpy()
    order = np.lexsort((nid, -sim, qid))
    qid, nid, sim = qid[order], nid[order], sim[order]
    keep = nid != qid  # drop self-match
    qid, nid, sim = qid[keep], nid[keep], sim[keep]
    # rank within each query run (qid-sorted): cumcount via segment starts
    starts = np.flatnonzero(np.concatenate(([True], qid[1:] != qid[:-1])))
    rank = np.arange(qid.size) - np.repeat(
        starts, np.diff(np.concatenate((starts, [qid.size])))
    )
    top = rank < k
    return pa.table(
        {
            "vec_id": pa.array(qid[top].astype(np.int64)),
            "neighbor_id": pa.array(nid[top].astype(np.int64)),
            "sim": pa.array(np.round(sim[top], 4).astype(np.float64)),
        }
    )


def q_knn_all(sf_dir: str, k: int = 5, n_parts: int = 8):
    """Exact top-k cosine neighbors for EVERY vector — corpus-partitioned
    partial top-k + merge (replaces the whole-corpus ``ray.put``
    broadcast flagged scale-unsafe in VERDICT r4; selection stays on
    ROUNDED similarity (4 dp) with id tie-break so the SQL oracle is
    exactly reproducible).

    Scale shape (no full-corpus driver read or single-object broadcast):
      1. one ``map_batches`` unit-normalizes each batch and emits, per
         vector, a member row in its own corpus partition
         (``vec_id % n_parts``) that DOUBLES as its query row there, plus
         query copies to the other ``n_parts - 1`` partitions — exactness
         requires every query to meet every corpus partition, so the
         shuffle carries ``n_parts`` x the embedding table (the exact-kNN
         tax; the IVF path is the sub-linear alternative);
      2. ``groupby(part)`` computes per-partition top-(k+1) partials with
         the (rounded sim DESC, id ASC) integer selection key — any
         global top-k neighbor of q is beaten by < k non-self rows
         globally, hence by <= k rows (self included) in its own
         partition, so per-partition top-(k+1) provably contains it;
      3. ``groupby(qpart)`` merges partials to the global top-k, dropping
         the self-match (``_merge_topk``, shared with q_ann_ivf).
    At cluster scale ``n_parts`` rises so one partition's member matrix
    fits a worker's heap; per-partition compute is a dense matmul.
    """
    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # the column type is variable list<float>, so a zero-row batch cannot
    # self-describe its dimensionality — resolve d once at plan build
    # (one-row driver read) and close over it
    dim = _embedding_dim(f"{sf_dir}/embeddings.parquet")

    def route(b: pa.Table) -> pa.Table:
        from eristropy_ray.datapipe.similarity import unit_rows

        ids = b["vec_id"].to_numpy().astype(np.int64)
        if not ids.size:
            empty = np.empty(0, np.int64)
            return pa.table(
                {
                    "part": pa.array(empty, pa.int64()),
                    "role": pa.array(empty, pa.int64()),
                    "rid": pa.array(empty, pa.int64()),
                    "vec": pa.FixedSizeListArray.from_arrays(
                        pa.array([], pa.float64()), dim
                    ),
                }
            )
        lst = b["embedding"].combine_chunks()
        # flatten(), not .values: offset-safe on sliced chunks (_fsl2d)
        flat = np.asarray(lst.flatten(), dtype=np.float64)
        d = dim
        u = unit_rows(flat.reshape(len(ids), d))
        n = ids.size
        own = ids % n_parts
        # query copies to every OTHER partition (member row covers its own)
        qi = np.repeat(np.arange(n), n_parts - 1)
        offs = np.tile(np.arange(1, n_parts, dtype=np.int64), n)
        part = np.concatenate([own, (own[qi] + offs) % n_parts])
        role = np.concatenate(
            [np.zeros(n, np.int64), np.ones(qi.size, np.int64)]
        )
        rid = np.concatenate([ids, ids[qi]])
        vecs = np.concatenate([u, u[qi]])
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "role": pa.array(role, pa.int64()),
                "rid": pa.array(rid, pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1), pa.float64()), d
                ),
            }
        )

    routed = ds.map_batches(route, batch_format="pyarrow")

    def part_topk(tbl: pa.Table) -> pa.Table:
        role = tbl.column("role").to_numpy()
        rid_all = tbl.column("rid").to_numpy()
        mmask = role == 0
        if not mmask.any():
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "nid": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                    "qpart": pa.array([], pa.int64()),
                }
            )
        vecs_all = _fsl2d(tbl.column("vec"))
        m = vecs_all[mmask]
        mids = rid_all[mmask]
        # id-sort members so column index order == id order: the integer
        # key below then realizes (rounded sim DESC, id ASC), matching
        # the merge and the SQL oracle's row_number order exactly
        morder = np.argsort(mids, kind="stable")
        m, mids = m[morder], mids[morder]
        n_m = m.shape[0]
        col = np.arange(n_m, dtype=np.int64)[None, :]
        kk = min(k + 1, n_m)
        q_chunks, n_chunks, s_chunks = [], [], []
        # chunk queries so the sim matrix stays bounded regardless of
        # group size
        for s in range(0, len(tbl), 1024):
            q = vecs_all[s : s + 1024]
            qids = rid_all[s : s + 1024]
            sims = np.round(q @ m.T, 4)
            key = np.rint(sims * 1e4).astype(np.int64) * n_m - col
            idx = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
            q_chunks.append(np.repeat(qids, kk))
            n_chunks.append(mids[idx].ravel())
            s_chunks.append(np.take_along_axis(sims, idx, axis=1).ravel())
        qid = np.concatenate(q_chunks).astype(np.int64)
        return pa.table(
            {
                "qid": pa.array(qid),
                "nid": pa.array(np.concatenate(n_chunks).astype(np.int64)),
                "sim": pa.array(np.concatenate(s_chunks).astype(np.float64)),
                "qpart": pa.array(qid % _NPARTS),
            }
        )

    partials = routed.groupby("part").map_groups(
        part_topk, batch_format="pyarrow"
    )

    def merge_wrapper(tbl: pa.Table) -> pa.Table:
        return _merge_topk(tbl, k)

    merge_wrapper.__name__ = "merge_topk"
    return partials.groupby("qpart").map_groups(
        merge_wrapper, batch_format="pyarrow"
    )


#: Default IVF cell count, shared by q_ann_ivf's signature and the
#: full-probe registered variant — the "ann_ivf" oracle is only valid
#: while its n_probe equals the cell count, so both must read ONE name.
_IVF_N_CELLS = 16


def _ivf_route(
    sf_dir: str,
    n_cells: int,
    n_probe: int,
    sample_cap: int,
    n_super: int | None,
) -> rd.Dataset:
    """Shared IVF build + supercell routing (used by ``q_ann_ivf`` and
    ``q_embedding_neardup_ivf``): train centroids on a bounded
    deterministic sample, cluster them into proximity supercells, then
    one ``map_batches`` emits member rows (shipped once, doubling as the
    query in their own supercell) plus query copies to the OTHER
    distinct probe supercells, each carrying its probe-cell list.
    n_probe is clamped to the trained centroid count so tiny corpora /
    small n_cells cannot produce ragged probe lists; the clamp only
    affects the routed probes column, so only the dataset is returned."""
    import ray

    from eristropy_ray.datapipe.similarity import (
        _kmeans,
        supercell_assign,
        unit_rows,
    )

    emb = _read(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # footer-metadata row count — sizing the sample stride must not cost
    # a full scan of the embedding table
    n_total = _parquet_rows(f"{sf_dir}/embeddings.parquet")
    # power-of-2 stride so the mask is a cheap bit_wise_and
    stride = 1
    while n_total // stride > sample_cap:
        stride *= 2

    def sample_mask(b: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.bit_wise_and(b["vec_id"], np.int64(stride - 1)), np.int64(0)
        )
        return b.filter(keep)

    sample_tbl = pa.Table.from_pandas(
        emb.map_batches(sample_mask, batch_format="pyarrow")
        .limit(sample_cap)
        .to_pandas()
    )
    s_ids = sample_tbl["vec_id"].to_numpy()
    order = np.argsort(s_ids)  # order-independent training input
    s_flat = np.asarray(
        sample_tbl["embedding"].combine_chunks().flatten(), dtype=np.float64
    )
    s_vecs = s_flat.reshape(len(s_ids), s_flat.size // len(s_ids))[order]
    centroids = _kmeans(unit_rows(s_vecs), n_cells, seed=7)
    n_probe = min(n_probe, centroids.shape[0])
    if n_super is None:
        n_super = max(2, n_cells // 4)
    cell_super = supercell_assign(centroids, n_super)
    cref = ray.put((centroids, cell_super))

    def assign_and_route(b: pa.Table) -> pa.Table:
        c, csuper = ray.get(cref)
        d = c.shape[1]  # dimensionality from the broadcast centroids
        ids = b["vec_id"].to_numpy().astype(np.int64)
        if not ids.size:
            empty = np.empty(0, np.int64)
            return pa.table(
                {
                    "super": pa.array(empty, pa.int64()),
                    "cell": pa.array(empty, pa.int64()),
                    "role": pa.array(empty, pa.int64()),
                    "rid": pa.array(empty, pa.int64()),
                    "vec": pa.FixedSizeListArray.from_arrays(
                        pa.array([], pa.float64()), d
                    ),
                    "probes": pa.FixedSizeListArray.from_arrays(
                        pa.array([], pa.int64()), n_probe
                    ),
                }
            )
        lst = b["embedding"].combine_chunks()
        # flatten(), not .values: offset-safe on sliced chunks (_fsl2d)
        flat = np.asarray(lst.flatten(), dtype=np.float64)
        u = unit_rows(flat.reshape(len(ids), d))
        scores = u @ c.T
        # members: one row per vector, in its own cell's supercell. The
        # member row carries the vector's probe list and DOUBLES as its
        # query row in that group (the top probe cell is the member cell
        # itself), so query copies ship only to the OTHER distinct
        # supercells among the probed cells.
        m_cell = scores.argmax(axis=1).astype(np.int64)
        q_cells = np.argsort(-scores, axis=1)[:, :n_probe].astype(np.int64)
        m_super = csuper[m_cell]
        q_supers = np.sort(csuper[q_cells], axis=1)
        first = np.ones_like(q_supers, dtype=bool)
        first[:, 1:] = q_supers[:, 1:] != q_supers[:, :-1]
        first &= q_supers != m_super[:, None]  # own group: member row covers it
        qi, qj = np.nonzero(first)
        n_q = qi.size
        supercell = np.concatenate([m_super, q_supers[qi, qj]])
        role = np.concatenate(
            [np.zeros(ids.size, np.int64), np.ones(n_q, np.int64)]
        )
        rid = np.concatenate([ids, ids[qi]])
        vecs = np.concatenate([u, u[qi]])
        cell = np.concatenate([m_cell, np.full(n_q, -1, np.int64)])
        probes = np.concatenate([q_cells, q_cells[qi]])
        return pa.table(
            {
                "super": pa.array(supercell, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "role": pa.array(role, pa.int64()),
                "rid": pa.array(rid, pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1), pa.float64()), d
                ),
                "probes": pa.FixedSizeListArray.from_arrays(
                    pa.array(probes.reshape(-1), pa.int64()), n_probe
                ),
            }
        )

    return emb.map_batches(assign_and_route, batch_format="pyarrow")


def q_ann_ivf(
    sf_dir: str,
    k: int = 5,
    n_cells: int = _IVF_N_CELLS,
    n_probe: int = 4,
    sample_cap: int = 4096,
    n_super: int | None = None,
):
    """IVF approximate nearest neighbors — distributed build AND probe.

    Scale shape (no full-corpus driver read anywhere):
      1. centroids are k-means-trained on a bounded deterministic sample
         (vec_id stride mask, capped at ``sample_cap`` rows — the only
         driver materialization besides the final result) and broadcast
         once via ``ray.put``; the cells are then clustered into
         ``n_super`` proximity supercells (``supercell_assign``);
      2. one ``map_batches`` assigns every vector to its nearest cell
         (role=member, shipped ONCE; the member row doubles as the query
         in its own supercell) and ships query copies only to the OTHER
         distinct supercells among its ``n_probe`` nearest cells, each
         carrying its probe-cell list. The shuffle therefore carries
         1 + E[distinct other probe supercells] times the embedding
         table: ~2.7x on adversarial uniform-random vectors (this
         corpus; asserted < n_probe in tests/test_datapipe.py) and
         approaching 1x on clustered real corpora, vs a flat
         (1 + n_probe) = 5x for naive per-cell routing;
      3. ``groupby(super)`` computes per-supercell top-(k+1) partials,
         masking members whose cell is not in the query's probe list
         (IVF semantics preserved exactly — parity-tested);
      4. ``groupby(query-hash)`` merges partials into the global top-k.
    At cluster scale ``n_super`` rises with the node count so one
    supercell's members fit a worker's heap; probe locality persists
    because supercells group neighboring centroids.
    Recall vs brute force and parity with the single-process
    ``IVFIndex`` are asserted in tests/test_datapipe.py.
    """
    routed = _ivf_route(sf_dir, n_cells, n_probe, sample_cap, n_super)

    def super_topk(tbl: pa.Table) -> pa.Table:
        role = tbl.column("role").to_numpy()
        rid_all = tbl.column("rid").to_numpy()
        mmask = role == 0
        if not mmask.any() or len(tbl) == 0:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "nid": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                    "qpart": pa.array([], pa.int64()),
                }
            )
        vecs_all = _fsl2d(tbl.column("vec"))
        probes_all = _fsl2d(tbl.column("probes"))
        m = vecs_all[mmask]
        mids = rid_all[mmask]
        mcells = tbl.column("cell").to_numpy()[mmask]
        # id-sort members so column index order == id order: the partial
        # selection key below then realizes (rounded sim DESC, id ASC) —
        # the same total order the merge and the SQL oracle rank by, so
        # per-partition top-(k+1) provably contains the global top-k
        morder = np.argsort(mids, kind="stable")
        m, mids, mcells = m[morder], mids[morder], mcells[morder]
        n_m = m.shape[0]
        col = np.arange(n_m, dtype=np.int64)[None, :]
        sentinel = np.int64(-(1 << 62))
        kk = min(k + 1, n_m)
        q_chunks, n_chunks, s_chunks = [], [], []
        # chunk queries (every row — member or routed copy — queries
        # here) so the (chunk x n_probe x members) probe mask and the
        # sim matrix stay bounded regardless of group size
        for s in range(0, len(tbl), 1024):
            q = vecs_all[s : s + 1024]
            qids = rid_all[s : s + 1024]
            probes = probes_all[s : s + 1024]
            # select on ROUNDED similarity with id tie-break (like
            # q_knn_all) so the ranking is reproducible across partition
            # layouts and bit-identical to the SQL oracle's row_number
            sims = np.round(q @ m.T, 4)
            r_int = np.rint(sims * 1e4).astype(np.int64)
            # IVF semantics: only members of this query's probed cells
            allowed = (probes[:, :, None] == mcells[None, None, :]).any(axis=1)
            key = np.where(allowed, r_int * n_m - col, sentinel)
            part = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
            rows_ix = np.arange(q.shape[0])[:, None]
            valid = key[rows_ix, part] != sentinel
            flat = valid.ravel()
            q_chunks.append(np.repeat(qids, kk)[flat])
            n_chunks.append(mids[part.ravel()][flat])
            s_chunks.append(sims[rows_ix, part][valid])
        qid = np.concatenate(q_chunks).astype(np.int64)
        return pa.table(
            {
                "qid": pa.array(qid),
                "nid": pa.array(np.concatenate(n_chunks).astype(np.int64)),
                "sim": pa.array(np.concatenate(s_chunks).astype(np.float64)),
                "qpart": pa.array(qid % _NPARTS),
            }
        )

    partials = routed.groupby("super").map_groups(
        super_topk, batch_format="pyarrow"
    )

    def merge_wrapper(tbl: pa.Table) -> pa.Table:
        return _merge_topk(tbl, k)

    merge_wrapper.__name__ = "merge_topk"
    return partials.groupby("qpart").map_groups(
        merge_wrapper, batch_format="pyarrow"
    )


def q_ann_ivf_fullprobe(sf_dir: str):
    """Driver-checked configuration of ``q_ann_ivf``: probing every cell
    (n_probe = n_cells) makes IVF ≡ brute force, so the ENTIRE
    distributed machinery — sample-trained centroids, supercell routing,
    per-supercell rounded-sim partials, query-hash merge — is
    oracle-checkable against ``knn_all``'s SQL twin (selection on
    rounded similarity with id tie-break is the shared reproducible
    order). The approximate default (n_probe=4) keeps its own pins:
    parity with the single-process IVFIndex and recall vs brute force in
    tests/test_datapipe.py."""
    return q_ann_ivf(sf_dir, n_probe=_IVF_N_CELLS)


def q_embedding_neardup_ivf(
    sf_dir: str,
    tau: float = 0.45,
    n_cells: int = _IVF_N_CELLS,
    n_probe: int = 8,
    sample_cap: int = 4096,
    n_super: int | None = None,
):
    """Embedding-cosine near-dup pairs via IVF cell bucketing — the SCALE
    path of ``q_embedding_neardup`` (its all-pairs exactness twin): a
    pair is a candidate iff one side's member cell is among the other
    side's ``n_probe`` probe cells, so per-group work is ~n²/n_cells
    instead of n² and nothing is broadcast. Same supercell routing as
    ``q_ann_ivf`` (member row doubles as its own-group query). Emits
    (vec_a, vec_b) id pairs; recall vs the exact pair set is asserted in
    tests/test_datapipe.py (rows-only: candidate coverage is
    data-dependent, the exactness baseline is the oracle's job).
    ``n_probe`` defaults to 8 (vs 4 for top-k search): a near-dup pair
    at a LOW tau can sit far from both its cell centroids, so near-dup
    bucketing needs wider probing — 8/16 cells recovers the full exact
    pair set on both test corpora while still halving the work."""
    routed = _ivf_route(sf_dir, n_cells, n_probe, sample_cap, n_super)

    def _uniq_pairs(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.ones(a.size, dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return a[keep], b[keep]

    def super_pairs(tbl: pa.Table) -> pa.Table:
        role = tbl.column("role").to_numpy()
        rid_all = tbl.column("rid").to_numpy()
        mmask = role == 0
        if not mmask.any():
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        vecs_all = _fsl2d(tbl.column("vec"))
        probes_all = _fsl2d(tbl.column("probes"))
        m = vecs_all[mmask]
        mids = rid_all[mmask]
        mcells = tbl.column("cell").to_numpy()[mmask]
        rows_a: list[np.ndarray] = []
        rows_b: list[np.ndarray] = []
        for s in range(0, len(tbl), 1024):
            q = vecs_all[s : s + 1024]
            qids = rid_all[s : s + 1024]
            probes = probes_all[s : s + 1024]
            sims = q @ m.T
            allowed = (probes[:, :, None] == mcells[None, None, :]).any(axis=1)
            hit = (sims >= tau) & allowed & (qids[:, None] != mids[None, :])
            qi, mi = np.nonzero(hit)
            rows_a.append(np.minimum(qids[qi], mids[mi]))
            rows_b.append(np.maximum(qids[qi], mids[mi]))
        a, b2 = _uniq_pairs(np.concatenate(rows_a), np.concatenate(rows_b))
        return pa.table(
            {
                "vec_a": pa.array(a.astype(np.int64)),
                "vec_b": pa.array(b2.astype(np.int64)),
                "part": pa.array((a % _NPARTS).astype(np.int64)),
            }
        )

    pairs = routed.groupby("super").map_groups(
        super_pairs, batch_format="pyarrow"
    )

    def dedupe(tbl: pa.Table) -> pa.Table:
        # a pair can surface from both sides' probes / several supercells
        a, b2 = _uniq_pairs(
            tbl.column("vec_a").to_numpy(), tbl.column("vec_b").to_numpy()
        )
        return pa.table(
            {
                "vec_a": pa.array(a.astype(np.int64)),
                "vec_b": pa.array(b2.astype(np.int64)),
            }
        )

    return pairs.groupby("part").map_groups(dedupe, batch_format="pyarrow")


def q_embedding_neardup(sf_dir: str, tau: float = 0.45):
    """Embedding-cosine near-duplicate pairs (exact all-pairs baseline vs
    a broadcast unit matrix — the labeled small-corpus baseline; the scale
    path buckets by IVF cell first). Emits pair ids only: the cosine
    itself differs from DuckDB's sequential accumulation in the last ulp,
    while threshold membership is stable (the nearest pair sits ~5e-4
    from tau on this corpus)."""
    import pyarrow.parquet as pq
    import ray

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    flat = np.asarray(tbl["embedding"].combine_chunks().flatten(), dtype=np.float64)
    emb = flat.reshape(len(ids), flat.size // len(ids)) if len(ids) else flat.reshape(0, 0)
    unit = emb / np.maximum(np.sqrt((emb * emb).sum(axis=1, keepdims=True)), 1e-30)
    ref = ray.put((ids, unit))

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def pairs(b: pa.Table) -> pa.Table:
        import ray as _ray

        c_ids, c_unit = _ray.get(ref)
        q_ids = b["vec_id"].to_numpy()
        lst = b["embedding"].combine_chunks()
        qf = np.asarray(lst.flatten(), dtype=np.float64)
        nq = len(b)
        q = qf.reshape(nq, qf.size // nq) if nq else qf.reshape(0, 0)
        qu = q / np.maximum(np.sqrt((q * q).sum(axis=1, keepdims=True)), 1e-30)
        sims = qu @ c_unit.T
        qi, ci = np.nonzero((sims >= tau) & (c_ids[None, :] > q_ids[:, None]))
        rows_a, rows_b = q_ids[qi].astype(np.int64), c_ids[ci].astype(np.int64)
        return pa.table(
            {
                "vec_a": pa.array(rows_a, pa.int64()),
                "vec_b": pa.array(rows_b, pa.int64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def q_ngram_jaccard(sf_dir: str, tau: float = 0.5, k: int = 3):
    """Exact all-pairs character-n-gram Jaccard near-dup (the exactness
    baseline; minhash_neardup is the scale path). Corpus gram incidence
    is packed into bitsets (one bit per vocab gram) and broadcast once —
    ~2 MB per 5k docs at a 30k-gram vocab — then each batch scores its
    rows against the whole corpus with an AND+popcount sweep. Jaccard is
    an int/int double ratio, so it is bit-identical to the SQL oracle."""
    import pyarrow.parquet as pq
    import ray

    from eristropy_ray.datapipe.textstats import rolling_kgram_hashes

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_numpy().astype(np.int64)
    texts = tbl["text"].to_pylist()

    def grams(t: str) -> np.ndarray:
        if len(t) == 0:
            return np.array([np.uint64(0)], dtype=np.uint64)  # SQL: {''}
        if len(t) < k:
            return np.unique(rolling_kgram_hashes(t, len(t)))
        return np.unique(rolling_kgram_hashes(t, k))

    gram_sets = [grams(t) for t in texts]
    vocab = np.unique(np.concatenate(gram_sets))
    nbytes = (vocab.size + 7) // 8
    bits = np.zeros((ids.size, nbytes), dtype=np.uint8)
    for i, g in enumerate(gram_sets):
        pos = np.searchsorted(vocab, g)
        np.bitwise_or.at(bits[i], pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    sizes = np.array([g.size for g in gram_sets], dtype=np.int64)
    order = np.argsort(ids)
    ref = ray.put((ids[order], bits[order], sizes[order]))
    pop = np.array([bin(x).count("1") for x in range(256)], dtype=np.uint16)

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def pairs(b: pa.Table) -> pa.Table:
        import ray as _ray

        c_ids, c_bits, c_sizes = _ray.get(ref)
        q_ids = b["doc_id"].to_numpy().astype(np.int64)
        rows = {"doc_a": [], "doc_b": [], "jaccard": []}
        for qid in q_ids:
            qi = int(np.searchsorted(c_ids, qid))
            # c_ids is sorted: only the > qid half can form an (a < b)
            # pair, so AND+popcount over just that slice (halves the
            # dominant cost of this baseline)
            tail_bits = c_bits[qi + 1 :]
            if not tail_bits.size:
                continue
            inter = pop[np.bitwise_and(c_bits[qi][None, :], tail_bits)].sum(
                axis=1, dtype=np.int64
            )
            union = c_sizes[qi] + c_sizes[qi + 1 :] - inter
            j = inter / np.maximum(union, 1)
            hit = np.flatnonzero(j >= tau)
            rows["doc_a"].extend([int(qid)] * hit.size)
            rows["doc_b"].extend(c_ids[qi + 1 :][hit].tolist())
            rows["jaccard"].extend(j[hit].tolist())
        return pa.table(
            {
                "doc_a": pa.array(rows["doc_a"], pa.int64()),
                "doc_b": pa.array(rows["doc_b"], pa.int64()),
                "jaccard": pa.array(rows["jaccard"], pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def q_vocab_topk(sf_dir: str, k: int = 50):
    """Corpus vocabulary: top-k words by total frequency (count desc, word
    asc). The classic wordcount shape with the scalable pre-aggregation:
    per-batch word counts collapse each batch to its distinct words
    BEFORE the shuffle, so the exchange carries (word, partial-count)
    rows, not one row per token. Exact SQL twin via unnest."""
    ds = _read(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        # Arrow-native wordcount partial: regex split + flatten + hash
        # value_counts, all C kernels — splitting on the whitespace class
        # yields exactly the _WS_TOKEN_PAT tokens plus empty edge strings
        # (filtered), so tokenization is unchanged vs str.findall
        toks = pc.list_flatten(
            pc.split_pattern_regex(b["text"], pattern="[ \\t\\n\\f\\r]+")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "word": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("word").aggregate(Sum("n", alias_name="n"))

    # per-block top-k then a tiny final sort: each word's total is
    # complete within one aggregate block (groupby co-locates keys), so
    # top-k of per-block top-ks is exact — no all-to-all sort of the
    # full vocabulary (word cardinality is corpus-scale at 100 TB)
    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n", "word"], ascending=[False, True], kind="stable"
        ).head(k)

    top = (
        agg.map_batches(block_topk, batch_format="pandas")
        .sort(["n", "word"], descending=[True, False])
        .limit(k)
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {"word": b["word"], "n": pc.cast(b["n"], pa.int64())}
        )

    return top.map_batches(finalize, batch_format="pyarrow")


def _uid_key(t: pa.Table) -> np.ndarray:
    return t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)


def _purchaser_fold(ev: rd.Dataset, m_bits: int, key_of=_uid_key):
    """ONE fold over the build side producing two mergeable summaries
    per batch: the OR-mergeable m/8-byte Bloom bits (fixed size) and the
    union-mergeable DISTINCT purchaser key set (key-dimension-sized — it
    grows with distinct keys, not with the event stream, and is the
    explicit scale bound of the exact-verify side). Two-level in-Ray
    fold: per-batch summary rows combine inside worker tasks
    (64 rows -> 1), then one final task folds the few survivors — the
    driver receives exactly ONE summary row, never a per-batch stream
    (OR / set-union monoids make any fold tree equivalent). Returns a
    shared object ref to ``(bloom_bits, sorted_exact_keys)`` — broadcast
    once via ``ray.put``, read by every probe task. ``key_of`` maps the
    purchase-filtered batch to its int64 join key (plain user id for the
    semi-join; a composite (user, day) key for the anti-join). Shared by
    the semi- and anti-join probes."""
    import ray

    from eristropy_ray.datapipe.sketch import bloom_build

    def build_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], "purchase"))
        uid = key_of(t)
        bits = bloom_build(uid, m_bits)
        return pa.table(
            {
                "bits": pa.array([bits.tobytes()], pa.binary()),
                "ids": pa.array([np.unique(uid).tobytes()], pa.binary()),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        id_parts = []
        for payload in b["bits"].to_pylist():
            np.bitwise_or(acc, np.frombuffer(payload, dtype=np.uint8), out=acc)
        for payload in b["ids"].to_pylist():
            id_parts.append(np.frombuffer(payload, dtype=np.int64))
        ids = (
            np.unique(np.concatenate(id_parts))
            if id_parts
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "bits": pa.array([acc.tobytes()], pa.binary()),
                "ids": pa.array([ids.tobytes()], pa.binary()),
            }
        )

    folded = (
        ev.map_batches(build_partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64)
        .repartition(1)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    merged = np.frombuffer(folded[0]["bits"], dtype=np.uint8).copy()
    exact_ids = np.frombuffer(folded[0]["ids"], dtype=np.int64).copy()
    return ray.put((merged, exact_ids))


def q_bloom_semijoin(sf_dir: str, m_bits: int = 1 << 17):
    """Semi-join via a Bloom prefilter plus exact verification: click
    events by users who made a purchase. Probe applies the Bloom mask
    first (4 cheap hash probes per row prune non-members before the
    log-n sorted-set lookup survivors pay), then re-checks survivors
    against the exact purchaser set from the same fold
    (``_purchaser_fold``), so the output is the EXACT semi-join
    (oracle-checked). When the distinct build side outgrows a broadcast,
    the documented pattern is the same Bloom prefilter with a
    hash-partitioned join as the verify stage instead of the broadcast
    set; the Bloom stage's zero-FN / bounded-FP contract keeps its own
    pin in tests/test_datapipe.py."""
    import ray

    from eristropy_ray.datapipe.sketch import bloom_contains

    ev = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value", "event_type"],
    )
    bref = _purchaser_fold(ev, m_bits)

    def probe(b: pa.Table) -> pa.Table:
        bits, exact = ray.get(bref)
        t = b.filter(pc.equal(b["event_type"], "click"))
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = bloom_contains(bits, uid)
        # exact verification of the Bloom survivors (sorted-set member
        # check; `exact` is the folded distinct purchaser set)
        pos = np.searchsorted(exact, uid)
        pos_c = np.minimum(pos, max(exact.size - 1, 0))
        keep &= (pos < exact.size) & (
            exact[pos_c] == uid if exact.size else False
        )
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "value": t["value"],
            }
        )

    return ev.map_batches(probe, batch_format="pyarrow")


def _user_day_key(t: pa.Table) -> np.ndarray:
    """Composite int64 (user, epoch-day) key: ``user_id * 2^21 + day``.
    Injective while ``day < 2^21`` (valid until year 7729) and
    ``user_id < 2^42`` — both documented premises of the anti-join's
    exactness (a 100-TB deployment with wider ids would widen the key to
    two int64 columns and a hash-partitioned verify join instead)."""
    uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    day = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // US_1D
    return uid * (1 << 21) + day


def q_anti_join(sf_dir: str, m_bits: int = 1 << 17):
    """Anti-join — the complement of ``q_bloom_semijoin``: click events
    on (user, day) pairs with NO purchase by that user that day
    (completing the join family: inner `order_segments_join`,
    broadcast-dim `orders_by_segment`, as-of `asof_purchase_click`,
    range `clicks_before_purchase` / `band_join`, semi `bloom_semijoin`,
    anti here). Day-scoped because the dense synthetic corpus gives
    every user every event type — a user-only anti-join is degenerately
    empty at every sf.

    The Bloom filter's zero-false-negative contract flips roles on the
    anti side: ``bloom_contains(key) == False`` PROVES non-membership,
    so the no-purchase-that-day majority keeps rows without ever
    touching the exact set — only the Bloom-positive minority pays the
    log-n sorted-set verify that separates true members (drop) from
    false positives (keep). Build side is the same single
    ``_purchaser_fold`` broadcast over composite (user, day) keys;
    output is the EXACT anti-join (oracle-checked NOT EXISTS twin)."""
    import ray

    from eristropy_ray.datapipe.sketch import bloom_contains

    ev = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value", "event_type"],
    )
    bref = _purchaser_fold(ev, m_bits, key_of=_user_day_key)

    def probe(b: pa.Table) -> pa.Table:
        bits, exact = ray.get(bref)
        t = b.filter(pc.equal(b["event_type"], "click"))
        key = _user_day_key(t)
        maybe = bloom_contains(bits, key)  # False => provably no purchase
        member = np.zeros(key.size, dtype=bool)
        if maybe.any() and exact.size:
            cand = key[maybe]
            pos = np.searchsorted(exact, cand)
            pos_c = np.minimum(pos, exact.size - 1)
            member[maybe] = (pos < exact.size) & (exact[pos_c] == cand)
        t = t.filter(pa.array(~member))
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "value": t["value"],
            }
        )

    return ev.map_batches(probe, batch_format="pyarrow")


def q_heavy_hitters(sf_dir: str, k_summary: int = 256, topn: int = 20):
    """Approximate heavy hitters (frequent words) via mergeable
    Misra-Gries summaries — the sketch counterpart to the exact
    ``vocab_topk``: each batch collapses to at most ``k_summary``
    (word, estimate) rows BEFORE the shuffle, so the exchange is
    O(batches x k), independent of corpus size (at 100 TB the exact
    wordcount's (word, count) exchange is vocabulary-sized; this one is
    constant per batch). Estimates undercount by at most
    n_total/k_summary (mergeability bound, Agarwal et al. PODS'12) —
    pinned against exact counts in tests/test_datapipe.py. Oracle-backed
    since round 5: when the corpus vocabulary fits k_summary (true of
    the test corpus: 31 words << 256) MG never evicts, estimates equal
    exact counts, and the SQL twin checks the entire distributed plan."""
    from eristropy_ray.datapipe.sketch import mg_merge, mg_summary
    from eristropy_ray.datapipe.textstats import content_hash64

    ds = _read(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(b: pa.Table) -> pa.Table:
        # Arrow-native tokenize + count (same kernels as vocab_topk's
        # partial: whitespace-class split == _WS_TOKEN_PAT findall)
        toks = pc.list_flatten(
            pc.split_pattern_regex(b["text"], pattern="[ \\t\\n\\f\\r]+")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        items, counts = mg_summary(
            vc.field("values").to_numpy(zero_copy_only=False).astype(object),
            vc.field("counts").to_numpy(zero_copy_only=False),
            k_summary,
        )
        # deterministic fan-in key from the batch's MIN doc_id — unique
        # per batch even on dup-heavy corpora (keying on leading TEXT
        # would collapse the fan-in to one merge group when many batches
        # start with identical boilerplate)
        part = (
            int(content_hash64(str(int(pc.min(b["doc_id"]).as_py()))))
            % _NPARTS
            if b.num_rows
            else 0
        )
        return pa.table(
            {
                "word": pa.array(items.astype(str), pa.string()),
                "est": pa.array(counts, pa.int64()),
                "part": pa.array(
                    np.full(items.size, part, dtype=np.int64), pa.int64()
                ),
            }
        )

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        items, counts = mg_merge(
            [(df["word"].to_numpy(dtype=object),
              df["est"].to_numpy(dtype=np.int64))],
            k_summary,
        )
        return pd.DataFrame({"word": items.astype(str), "est": counts}).astype(
            {"est": "int64"}
        )

    merge_group.__name__ = "mg_merge_group"
    # tree reduce: batch summaries -> per-part MG merges (each emits at
    # most k rows) -> the driver receives <= _NPARTS x k rows and does
    # the final merge — bounded regardless of corpus size (any MG merge
    # tree preserves the n/k undercount bound)
    candidates = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda df: merge_group(df.drop(columns=["part"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    items, counts = mg_merge(
        [(candidates["word"].to_numpy(dtype=object),
          candidates["est"].to_numpy(dtype=np.int64))],
        k_summary,
    )
    order = np.lexsort((items.astype(str), -counts))[:topn]
    return pd.DataFrame(
        {"word": items[order].astype(str), "est": counts[order]}
    ).astype({"est": "int64"})


# RE2-compatible patterns shared verbatim with the SQL twins (explicit
# ASCII whitespace class; no lookahead)
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
_URL_PAT = r"https?://[^ \t\n\f\r]+"


def q_pii_counts(sf_dir: str):
    """Per-document PII-ish pattern counts (emails, URLs) — the redaction
    pre-scan of a training-data pipeline. One stateless vectorized pass
    (compiled regex, no shuffle); the SQL twin runs the IDENTICAL RE2
    patterns, generated from the same constants."""
    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_emails": pc.cast(
                    pc.count_substring_regex(b["text"], pattern=_EMAIL_PAT),
                    pa.int64(),
                ),
                "n_urls": pc.cast(
                    pc.count_substring_regex(b["text"], pattern=_URL_PAT),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_split_contamination(sf_dir: str):
    """Train/eval contamination check: near-dup pairs (word-shingle
    Jaccard >= 0.5, the minhash_neardup surface) that CROSS dataset-split
    boundaries — the leakage audit run before any training job. Composed
    from two oracle-exact operators, so the SQL twin is their CTE
    composition; the split label is pure id arithmetic (no extra join)."""
    pairs = q_minhash_neardup(sf_dir)
    if pairs.empty:
        return pairs.assign(
            split_a=pd.Series(dtype="object"), split_b=pd.Series(dtype="object")
        )

    def split_of(ids: np.ndarray) -> np.ndarray:
        p = np.int64(1000000007)
        h = ((ids % p + p) % p) * 2654435761 % p % 100
        return np.where(h < 80, "train", np.where(h < 90, "val", "test"))

    sa = split_of(pairs["doc_a"].to_numpy())
    sb = split_of(pairs["doc_b"].to_numpy())
    out = pairs.assign(split_a=sa, split_b=sb)
    return out[out["split_a"] != out["split_b"]].reset_index(drop=True)


def q_repetition(sf_dir: str, k: int = 10):
    """Per-document repetition ratio: 1 - distinct/total character
    k-grams — the boilerplate/spam quality signal. Stateless vectorized
    pass; distinct counts the ACTUAL k-char substrings (UTF-32 sliding
    windows uniqued as fixed-width byte records), not their hashes, so
    the substring-based SQL twin matches UNCONDITIONALLY — no rolling-
    hash collision can undercount. The ratio is an int/int division,
    bit-identical to the SQL CAST(... AS DOUBLE) / n."""
    from numpy.lib.stride_tricks import sliding_window_view

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        total = np.empty(len(df), dtype=np.int64)
        distinct = np.empty(len(df), dtype=np.int64)
        for i, t in enumerate(df["text"]):
            if len(t) < k:
                total[i] = 0
                distinct[i] = 0
                continue
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            win = np.ascontiguousarray(sliding_window_view(cp, k))
            recs = win.view(np.dtype((np.void, k * 4))).ravel()
            total[i] = recs.size
            distinct[i] = np.unique(recs).size
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "n_grams": total,
                "n_distinct": distinct,
                "rep_ratio": np.where(
                    total > 0, 1.0 - distinct / np.maximum(total, 1), 0.0
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def _synthesize_payloads(b: pa.Table) -> pa.Table:
    """Deterministic binary payloads from document text (shared by the
    multimodal queries): even doc_ids become real PNGs (text bytes as a
    W x 8 gray raster, all five filter types), odd ones PCM WAVs, and
    every 7th an undecodable JPEG-magic payload to exercise per-row
    degradation."""
    from eristropy_ray.datapipe.media import encode_png, encode_wav

    ids = b["doc_id"].to_numpy().astype(np.int64)
    payloads = []
    for did, text in zip(ids, b["text"].to_pylist()):
        data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        data = data[:256] if data.size else np.zeros(1, np.uint8)
        if did % 7 == 0:  # undecodable: JPEG magic, no decoder
            payloads.append(b"\xff\xd8\xff" + data.tobytes())
        elif did % 2 == 0:  # image: pad to a W x 8 gray raster
            w = 8
            n = max((data.size + w - 1) // w, 1) * w
            px = np.zeros(n, np.uint8)
            px[: data.size] = data
            payloads.append(
                encode_png(px.reshape(-1, w, 1), filters=[0, 1, 2, 3, 4])
            )
        else:  # audio: bytes as centered 16-bit samples
            samples = (data.astype(np.int64) - 128) * 256
            payloads.append(encode_wav(samples.reshape(-1, 1)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def q_multimodal_features(sf_dir: str):
    """Multimodal decode pipeline over binary payload columns (rows-only:
    zlib/codec byte streams are not SQL-expressible).

    Payloads are synthesized DETERMINISTICALLY from the documents table
    (text bytes become PNG pixels / WAV samples; every 7th doc gets an
    undecodable JPEG-magic payload to exercise per-row degradation), then
    decoded for real by the stdlib decoders behind an actor-pool
    ``map_batches`` stage — the exact shape a production image/audio
    feature-extraction stage has (per-actor setup, small batches for wide
    binary rows, typed metadata out)."""
    from eristropy_ray.datapipe.multimodal import BinaryFeatureStage

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    feats = ds.map_batches(_synthesize_payloads, batch_format="pyarrow").map_batches(
        BinaryFeatureStage(extractor="real"),
        batch_format="pyarrow",
        batch_size=128,  # small: payload rows are wide
        concurrency=4,
    )

    def project(b: pa.Table) -> pa.Table:
        emb = b["embedding"].combine_chunks()
        first = pc.list_element(emb, 0)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "format": b["format"],
                "n_bytes": b["n_bytes"],
                "decode_ok": b["decode_ok"],
                "feat_mean": pc.round(first, ndigits=6),
            }
        )

    return feats.map_batches(project, batch_format="pyarrow")


def q_image_resize(sf_dir: str, out_h: int = 16, out_w: int = 16):
    """Image resize pipeline — decode PNG -> nearest-neighbor resize ->
    re-encode — over the same deterministic payloads as
    ``multimodal_features`` (rows-only: codec byte streams aren't SQL).
    Real resolution normalization for image training data: PNG rows are
    actually decoded, resampled with the half-pixel-center gather and
    re-encoded (round-trip pixel equality pinned in tests); WAV/JPEG/
    corrupt rows degrade per row (``resize_ok=False``), never fail the
    task. Actor-pool stage, small batches for wide binary rows; output
    is the resized payload plus typed in/out dimension metadata, with
    one schema across all rows."""
    from eristropy_ray.datapipe.multimodal import ImageResizeStage

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    resized = ds.map_batches(
        _synthesize_payloads, batch_format="pyarrow"
    ).map_batches(
        ImageResizeStage(out_h=out_h, out_w=out_w),
        batch_format="pyarrow",
        batch_size=128,  # small: payload rows are wide
        concurrency=4,
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "resize_ok": b["resize_ok"],
                "in_height": b["in_height"],
                "in_width": b["in_width"],
                "n_bytes_out": pc.binary_length(b["resized"].combine_chunks()),
            }
        )

    return resized.map_batches(project, batch_format="pyarrow")


def q_frame_sample(sf_dir: str, n_frames: int = 4, frame_bytes: int = 32):
    """Video-style frame sampling — 1->N explode of evenly spaced windows
    of each DECODED payload (scanline bands of PNGs, sample windows of
    WAV clips; undecodable rows degrade to empty frames) — over the same
    deterministic payloads as ``multimodal_features`` (rows-only: codec
    byte streams aren't SQL). The canonical video pre-processing shape:
    actor-pool stage, small batches for wide binary rows, one output row
    per (doc, frame_idx) with the binary frame column plus typed
    metadata."""
    from eristropy_ray.datapipe.multimodal import FrameSampleStage

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    frames = ds.map_batches(
        _synthesize_payloads, batch_format="pyarrow"
    ).map_batches(
        FrameSampleStage(
            n_frames=n_frames, frame_bytes=frame_bytes, decoder="real"
        ),
        batch_format="pyarrow",
        batch_size=128,  # small: payload rows are wide
        concurrency=4,
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "frame_idx": b["frame_idx"],
                "n_frame_bytes": pc.binary_length(
                    b["frame"].combine_chunks()
                ),
            }
        )

    return frames.map_batches(project, batch_format="pyarrow")


def q_clean_corpus(
    sf_dir: str,
    min_chars: int = 100,
    max_punct: float = 0.1,
    nparts: int = 64,
):
    """End-to-end corpus cleaning composition — the pipeline shape a
    training-data user actually runs: length/quality filter -> exact
    dedup (content-hash groupby, keep min doc_id) -> English-only
    (langid) -> token counts. One streaming pass plus one dedup shuffle
    of (hash, id, tokens) triples; binary-exact vs a composed SQL twin."""
    from eristropy_ray.datapipe.dedup import batch_hash128
    from eristropy_ray.datapipe.textstats import langid_predict_arrow

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def score_filter(b: pa.Table) -> pa.Table:
        # Arrow-native filters; the batch langid kernel runs on the
        # already-filtered subset. Dedup keys are the vectorized 128-bit
        # buffer digest (two int64 shuffle keys, same plan as
        # q_dedup_exact).
        n_chars = pc.utf8_length(b["text"])
        punct = pc.count_substring_regex(b["text"], pattern=r"[.!?,;:]")
        keep = pc.and_(
            pc.greater_equal(n_chars, min_chars),
            pc.less(
                pc.divide(
                    pc.cast(punct, pa.float64()),
                    pc.cast(n_chars, pa.float64()),
                ),
                max_punct,
            ),
        )
        sub = b.filter(pc.fill_null(keep, False))
        if sub.num_rows:
            en = langid_predict_arrow(sub["text"]) == "en"
            sub = sub.filter(pa.array(en))
        h1, h2 = batch_hash128(sub["text"])
        return pa.table(
            {
                "part": pa.array(
                    (h1 % np.uint64(nparts)).astype(np.int64), pa.int64()
                ),
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
                "doc_id": pc.cast(sub["doc_id"], pa.int64()),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(
                        sub["text"], pattern=_WS_TOKEN_PAT
                    ),
                    pa.int64(),
                ),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # part-hash combine (same plan as q_dedup_exact): doc_id is the
        # last lexsort key, so the group head is the min; identical
        # texts carry identical n_tokens, so the head's count IS the min
        h1 = df["h1"].to_numpy(dtype=np.int64)
        h2 = df["h2"].to_numpy(dtype=np.int64)
        did = df["doc_id"].to_numpy(dtype=np.int64)
        ntok = df["n_tokens"].to_numpy(dtype=np.int64)
        order = np.lexsort((did, h2, h1))
        h1, h2, did, ntok = h1[order], h2[order], did[order], ntok[order]
        ch = np.empty(h1.size, dtype=bool)
        ch[0] = True
        ch[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        st = np.flatnonzero(ch)
        return pd.DataFrame({"doc_id": did[st], "n_tokens": ntok[st]})

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return combine(df.drop(columns=["part"]))

    wrapper.__name__ = "clean_dedup_combine"
    return (
        ds.map_batches(score_filter, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wrapper, batch_format="pandas")
    )


def q_hopping_window(sf_dir: str, span_us: int = 3_600_000_000,
                     slide_us: int = 900_000_000):
    """Hopping (sliding) window aggregate: 1h windows advancing every
    15m per user. Each event explodes to its span/slide windows inside
    ``map_batches`` (vectorized repeat), exact integer-micro partials
    combine per batch, and one small groupby finishes — the shuffle
    moves per-(user, window) partials, never the exploded rows."""
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    n_hops = -(-span_us // slide_us)  # ceil: span need not divide slide

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ts - ts % slide_us
        k = np.arange(n_hops, dtype=np.int64) * slide_us
        starts = base[:, None] - k[None, :]
        # membership: start <= ts (by construction) AND ts < start + span
        keep = (ts[:, None] < starts + span_us).reshape(-1)
        sid = np.repeat(uid, n_hops)[keep]
        wst = starts.reshape(-1)[keep]
        vmu = np.repeat(np.round(v * 1e6).astype(np.int64), n_hops)[keep]
        # segmented numpy reduction (lexsort + reduceat) — same pattern
        # as _bucket_rollup's partial, no pandas in the hot path
        order = np.lexsort((wst, sid))
        ss, sw, svmu = sid[order], wst[order], vmu[order]
        n = ss.size
        if n == 0:
            empty_i = np.empty(0, dtype=np.int64)
            return pa.table(
                {
                    "part": pa.array(empty_i, pa.int64()),
                    "signal_id": pa.array(empty_i, pa.int64()),
                    "window_start_us": pa.array(empty_i, pa.int64()),
                    "n_obs": pa.array(empty_i, pa.int64()),
                    "sum_mu": pa.array(empty_i, pa.int64()),
                }
            )
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (ss[1:] != ss[:-1]) | (sw[1:] != sw[:-1])
        g_starts = np.flatnonzero(change)
        u = ss[g_starts]
        part = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)
        return pa.table(
            {
                "part": pa.array(part.astype(np.int64), pa.int64()),
                "signal_id": pa.array(u, pa.int64()),
                "window_start_us": pa.array(sw[g_starts], pa.int64()),
                "n_obs": pa.array(
                    np.diff(np.append(g_starts, n)), pa.int64()
                ),
                "sum_mu": pa.array(
                    np.add.reduceat(svmu, g_starts), pa.int64()
                ),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # part-hash combine + in-place finalize (same plan as
        # _bucket_rollup; int64 sums are order-insensitive)
        sid = df["signal_id"].to_numpy(dtype=np.int64)
        wst = df["window_start_us"].to_numpy(dtype=np.int64)
        order = np.lexsort((wst, sid))
        sid, wst = sid[order], wst[order]
        n = df["n_obs"].to_numpy(dtype=np.int64)[order]
        smu = df["sum_mu"].to_numpy(dtype=np.int64)[order]
        ch = np.empty(sid.size, dtype=bool)
        ch[0] = True
        ch[1:] = (sid[1:] != sid[:-1]) | (wst[1:] != wst[:-1])
        st = np.flatnonzero(ch)
        return pd.DataFrame(
            {
                "signal_id": sid[st],
                "window_start_us": wst[st],
                "n_obs": np.add.reduceat(n, st),
                "value_sum": np.add.reduceat(smu, st).astype(np.float64)
                / 1e6,
            }
        )

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return combine(df.drop(columns=["part"]))

    wrapper.__name__ = "hopping_combine"
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wrapper, batch_format="pandas")
    )


def q_streaming_window(
    sf_dir: str,
    step_us: int = US_1H,
    lateness_us: int = 1_800_000_000,
    delay_shift: int = 40,
):
    """Streaming tumbling windows with a per-key WATERMARK and an
    allowed-lateness drop policy — the streaming-window operator.

    Events are processed in ARRIVAL order; the watermark per key is the
    running max event-time of prior arrivals minus ``lateness_us``; an
    arrival whose event-time is below the watermark is dropped as late
    (counted per window), everything else aggregates into its tumbling
    window. The synthetic feed is perfectly time-ordered, so a
    deterministic delayed-arrival permutation (every 16th event arrives
    ``delay_shift`` positions late — mirrored exactly in the SQL twin)
    exercises the late path for real: at sf0.01, 131 events arrive out
    of order, 105 fall below the watermark and are dropped, 26 are
    accepted within lateness.

    Scale shape = sessionization's: one hash shuffle by key, then one
    stateful vectorized pass per partition (pandas C-level segmented
    cummax for the watermark), partial aggregation before emit.
    """
    events = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def to_typed(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        arrival = eid + np.where(eid % 16 == 5, delay_shift, 0)
        return pa.table(
            {
                "signal_id": pa.array(uid, pa.int64()),
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "vmu": pa.array(
                    np.round(
                        b["value"].to_numpy(zero_copy_only=False) * 1e6
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "arrival": pa.array(arrival, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "part": pa.array(_hash_part(uid), pa.int64()),
            }
        )

    def window_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["signal_id", "arrival", "event_id"], kind="stable"
        ).reset_index(drop=True)
        g = df.groupby("signal_id", sort=False)
        # watermark at each arrival: cummax of PRIOR arrivals' event time
        prev_max = g["ts_us"].cummax().groupby(df["signal_id"]).shift(1)
        late = df["ts_us"] < prev_max - lateness_us  # NaN -> False (first)
        win = df["ts_us"] - df["ts_us"] % step_us
        out = (
            pd.DataFrame(
                {
                    "signal_id": df["signal_id"],
                    "window_start_us": win,
                    "n_obs": (~late).astype("int64"),
                    "sum_mu": df["vmu"].where(~late, 0),
                    "n_late": late.astype("int64"),
                }
            )
            .groupby(["signal_id", "window_start_us"], sort=True)
            .agg(
                n_obs=("n_obs", "sum"),
                sum_mu=("sum_mu", "sum"),
                n_late=("n_late", "sum"),
            )
            .reset_index()
        )
        out["value_sum"] = out["sum_mu"].astype(np.float64) / 1e6
        return out[
            ["signal_id", "window_start_us", "n_obs", "value_sum", "n_late"]
        ].astype(
            {"signal_id": "int64", "window_start_us": "int64",
             "n_obs": "int64", "value_sum": "float64", "n_late": "int64"}
        )

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return window_partition(df.drop(columns=["part"]))

    wrapper.__name__ = "streaming_window_partition"
    typed = events.map_batches(to_typed, batch_format="pyarrow")
    return typed.groupby("part").map_groups(wrapper, batch_format="pandas")


def q_distinct_users(sf_dir: str):
    """Exact distributed COUNT(DISTINCT user_id) per event_type.

    One real shuffle: per-batch pair dedup (combiner), hash-partition by
    user (int key — all of a user's (type, user) pairs co-locate, so the
    partition-local dedup is globally exact), per-partition counts, then
    a P x n_types-row summing groupby. Avoids sorting the full pair set
    on a string key twice."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        # per-batch pair dedup as a C-speed Arrow hash-distinct
        sub = b.group_by(["event_type", "user_id"]).aggregate([])
        uid = sub["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return sub.append_column(
            "part", pa.array(_hash_part(uid), pa.int64())
        )

    def count_partition(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(["event_type", "user_id"])
        g = u.groupby("event_type", sort=True).size().reset_index(name="n_partial")
        g["n_partial"] = g["n_partial"].astype("int64")
        return g

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return count_partition(df.drop(columns=["part"]))

    wrapper.__name__ = "count_partition"
    partials = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wrapper, batch_format="pandas")
    )
    return partials.groupby("event_type").aggregate(
        Sum("n_partial", alias_name="n_users")
    )


def q_distinct_users_approx(sf_dir: str, p: int = 12):
    """HyperLogLog distinct users per event_type (rows-only; the error
    bound vs the exact count is pinned in tests). Each batch reduces to
    one 2^p-byte register row per event_type; merge is an elementwise
    max inside one tiny groupby."""
    from eristropy_ray.datapipe.sketch import hll_estimate, hll_merge, hll_partial

    ds = _read(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        # one lexsort, then hll_partial over contiguous type segments
        # (cardinality of event_type is tiny; no per-row pandas groupby)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(et, kind="stable")
        et, uid = et[order], uid[order]
        starts = np.flatnonzero(np.concatenate(([True], et[1:] != et[:-1])))
        bounds = np.append(starts, et.size)
        return pa.table(
            {
                "event_type": pa.array(et[starts], pa.string()),
                "regs": pa.array(
                    [
                        hll_partial(uid[bounds[i] : bounds[i + 1]], p).tobytes()
                        for i in range(starts.size)
                    ],
                    pa.binary(),
                ),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        regs = hll_merge([np.frombuffer(b, dtype=np.uint8) for b in df["regs"]])
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_users_approx": [float(hll_estimate(regs))],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )


def q_value_quantiles_hdr(sf_dir: str, m: int = 7):
    """Approximate value quantiles per event_type via a mergeable
    HDR-style log-bucketed histogram (rows-only; relative error bound
    2^-(m+1) vs the exact order statistic is pinned in tests) — the
    sketch twin of exact ``doc_len_quantiles`` for UNBOUNDED positive
    double domains, completing the sketch family: HLL (distinct),
    Misra-Gries (heavy hitters), Bloom (membership), HDR (quantiles).
    Each batch folds to one (event_type, bucket, n) summary whose size
    is bounded by the occupied buckets, not the row count. Because the
    counts form a commutative monoid AND ``hdr_quantiles`` ranks via a
    cumulative sum (duplicate bucket ids contribute identically to an
    explicit pre-sum), the partials need NO summing aggregate — one
    hash shuffle colocates each event_type's few thousand summary rows
    and the finish consumes them directly."""
    from eristropy_ray.datapipe.sketch import hdr_partial, hdr_quantiles

    ds = _read(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    qs = np.array([0.25, 0.5, 0.75, 0.99])

    def partial(b: pa.Table) -> pa.Table:
        # one lexsort, hdr_partial per contiguous type segment
        et = b["event_type"].to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(et, kind="stable")
        et, val = et[order], val[order]
        starts = np.flatnonzero(np.concatenate(([True], et[1:] != et[:-1])))
        bounds = np.append(starts, et.size)
        bs, ns, types = [], [], []
        for i in range(starts.size):
            bk, c = hdr_partial(val[bounds[i] : bounds[i + 1]], m)
            bs.append(bk)
            ns.append(c)
            types.append(np.full(bk.size, et[starts[i]], dtype=object))
        cat = np.concatenate if starts.size else lambda x: np.array([])
        return pa.table(
            {
                "event_type": pa.array(
                    cat(types).astype(str) if starts.size else [], pa.string()
                ),
                "bucket": pa.array(
                    cat(bs).astype(np.int64) if starts.size else [], pa.int64()
                ),
                "n": pa.array(
                    cat(ns).astype(np.int64) if starts.size else [], pa.int64()
                ),
            }
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        est = hdr_quantiles(
            df["bucket"].to_numpy(np.int64), df["n"].to_numpy(np.int64), qs, m
        )
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "q": qs,
                "value_approx": est,
            }
        )

    return (
        # batch_size=None: fold whole blocks — the summary is bucket-
        # bounded, so bigger batches mean strictly fewer partial rows.
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .map_groups(finish, batch_format="pandas")
    )


def q_group_cap(sf_dir: str, k: int = 3):
    """First-k-per-group cap (earliest k events per user by (ts, id)) —
    the "at most N documents per domain/source" diversity cap of a
    training-data pipeline. One hash shuffle, then a vectorized
    rank-and-filter per partition; exact row_number SQL twin."""
    ds = _events_signals(sf_dir)

    def group_cap(df: pd.DataFrame) -> pd.DataFrame:
        sid = df["signal_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        tie = df["tie"].to_numpy()
        order = np.lexsort((tie, ts, sid))
        sid, ts, tie = sid[order], ts[order], tie[order]
        v = df["value"].to_numpy()[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sid[1:] != sid[:-1]))
        )
        seg_len = np.diff(np.append(starts, sid.size))
        rank = np.arange(sid.size) - np.repeat(starts, seg_len)
        keep = rank < k
        return pd.DataFrame(
            {
                "signal_id": sid[keep],
                "ts_us": ts[keep],
                "event_id": tie[keep],
                "value": v[keep],
            }
        )

    return _grouped(ds, group_cap)


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test assignment (80/10/10) by multiplicative
    id hash — the reproducible split every training-data pipeline needs.
    The id is reduced mod p BEFORE the multiply (floor-safe form) so the
    int64 product cannot overflow for ANY int64 doc_id and negative ids
    agree across engines (DuckDB % truncates, numpy floors); pure int64
    arithmetic on both sides, so the SQL twin is exact. At 100 TB this
    is a stateless map with no shuffle at all."""
    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def fn(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        p = np.int64(1000000007)
        h = ((ids % p + p) % p) * 2654435761 % p % 100
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_sample_events(sf_dir: str):
    """Deterministic systematic sample (the reproducible analogue of
    random_sample; exact SQL oracle)."""
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def fn(b: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(b["event_id"], np.int64(15)), np.int64(3))
        t = b.filter(keep)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "value": t["value"],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_reservoir_sample(sf_dir: str, k: int = 1000):
    """Fixed-size uniform sample — EXACTLY k rows regardless of corpus
    size (the "give me 10k examples from 100 TB" op; the fixed-RATE
    twin is ``sample_events``). Mergeable bottom-k sketch: every row
    gets the deterministic key splitmix64(event_id) — a bijection, so
    distinct ids never tie — each block keeps its k smallest keys
    vectorized (argpartition), and because bottom-k is a commutative,
    associative, idempotent reduction, the global bottom-k of the
    per-block survivors equals the bottom-k of the full table. The
    final sort touches at most k x num_blocks summary rows, so shuffle
    volume is corpus-size-independent. Rows-only: the 64-bit mix isn't
    SQL-expressible; exactness vs a single-pass local bottom-k and
    block-layout invariance are pinned in tests."""
    from eristropy_ray.datapipe.sketch import sample_key64

    ds = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def bottomk(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        key = sample_key64(ids)
        if ids.size > k:
            sel = np.argpartition(key, k)[:k]
            b, key = b.take(pa.array(sel)), key[sel]
        return pa.table(
            {
                "sample_key": pa.array(key, pa.uint64()),
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "value": b["value"],
            }
        )

    return (
        ds.map_batches(bottomk, batch_format="pyarrow", batch_size=None)
        .sort("sample_key")
        .limit(k)
    )


def q_top_users(sf_dir: str, k: int = 10):
    """Top-k users by observation count (count desc, user_id asc).
    Counts come from the partial-collapsed part-hash combine; each
    user's total is complete within one combine partition, so the final
    sort touches per-user rows only."""
    counts = _user_counts(sf_dir)
    return counts.sort(["n_obs", "user_id"], descending=[True, False]).limit(k)


def q_orders_by_segment(sf_dir: str):
    """Broadcast hash join: orders x customer (small side shipped once via
    ray.put), then exact-decimal revenue per market segment — the A3-style
    broadcast-join pattern generalized to a dimension lookup."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    # broadcast the dim as SORTED flat numpy (keys + dictionary-encoded
    # segment codes): searchsorted lookup inside the partial instead of a
    # Python dict probe per row, and the object-store payload is three
    # dense arrays instead of a pickled dict of Python strings.
    keys = cust["c_custkey"].to_numpy()
    seg_names, seg_codes = np.unique(
        cust["c_mktsegment"].to_numpy(zero_copy_only=False), return_inverse=True
    )
    korder = np.argsort(keys, kind="stable")
    lookup_ref = ray.put(
        (keys[korder], seg_codes[korder].astype(np.int64),
         [str(s) for s in seg_names])
    )

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        skeys, scodes, names = _ray.get(lookup_ref)
        ck = batch.column("o_custkey").to_numpy()
        code = scodes[np.searchsorted(skeys, ck)]  # FK: every key present
        price_mu = np.round(
            batch.column("o_totalprice").to_numpy() * 1e6
        ).astype(np.int64)
        # exact int64 group sums (bincount's float64 weights would lose
        # ulps past 2^53 — sum-of-micros can exceed that in one batch):
        # sort + reduceat keeps the accumulator integral.
        g = np.argsort(code, kind="stable")
        gc, starts = np.unique(code[g], return_index=True)
        return pa.table(
            {
                "c_mktsegment": pa.array([names[c] for c in gc], pa.string()),
                "n_orders": pa.array(
                    np.diff(np.append(starts, code.size)), pa.int64()
                ),
                "sum_mu": pa.array(
                    np.add.reduceat(price_mu[g], starts), pa.int64()
                ),
            }
        )

    partials = orders.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("sum_mu", alias_name="sum_mu"),
    )

    def finalize(b: pa.Table) -> pa.Table:
        sum_mu = b["sum_mu"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n_orders"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = sum_mu.astype(np.float64) / 1e6
        return pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "n_orders": pa.array(n, pa.int64()),
                "total_price": pa.array(total, pa.float64()),
                "avg_price": pa.array(total / n, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_order_segments_join(sf_dir: str):
    """Distributed hash join (``Dataset.join``) of orders x customer —
    the LARGE-x-large join surface (contrast ``orders_by_segment``, the
    broadcast map-side variant for small dims): both sides hash-shuffle
    on the key, so this is the plan when neither side fits a broadcast.
    Emits one row per order with its market segment; exact SQL twin."""
    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    cust = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    # partition count scales with the BIG side (~50k rows/partition,
    # floor 8) from parquet footers — a constant would bottleneck each
    # partition at 1/k of the orders table regardless of cluster size
    n_parts = max(8, _parquet_rows(f"{sf_dir}/orders.parquet") // 50_000)
    joined = orders.join(
        cust, "inner", num_partitions=n_parts,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "c_mktsegment": b["c_mktsegment"],
                "o_totalprice": b["o_totalprice"],
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


def q_sessions(sf_dir: str):
    """Gap-based session windows over each user's event stream (streaming
    op; exact integer outputs vs a window-function SQL oracle)."""
    from eristropy_ray.stages.signals import sessionize_partition

    return _grouped(_events_signals(sf_dir), sessionize_partition)


def q_rolling_mean(sf_dir: str):
    """Rolling mean over the last 5 events per user (exact via
    integer-micro prefix sums)."""
    from eristropy_ray.stages.signals import rolling_mean_partition

    return _grouped(_events_signals(sf_dir), rolling_mean_partition)


def q_running_sum(sf_dir: str):
    """Cumulative sum per user at every event — the unbounded-frame
    window aggregate (``SUM OVER (PARTITION BY user ORDER BY ts, id)``),
    completing the window family: rolling (bounded ROWS frame), hopping,
    streaming-watermark, session, and now cumulative. One hash shuffle
    on the user key, then a single global integer-micro cumsum per
    partition rebased at group starts (segmented prefix sum, no Python
    loop); ties broken by event_id on both engines."""
    from eristropy_ray.stages.signals import running_sum_partition

    return _grouped(_events_signals(sf_dir), running_sum_partition)


def q_topk_per_user(sf_dir: str, k: int = 3):
    """Top-k events by value per user with their rank — the ranked
    window-function shape (``ROW_NUMBER OVER (PARTITION BY user ORDER BY
    value DESC, event_id)``), vs ``group_cap``'s arrival-order cap. The
    scalable plan is partial top-k: each batch keeps at most k rows per
    user BEFORE the shuffle (the global per-user top-k is a subset of
    the union of batch-local top-ks), so the exchange carries
    O(users x k) rows, not the event stream. Ordering is on raw doubles
    (identical bits both engines) with the id tie-break; no NaN values
    by the documented corpus contract."""
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def topk_local(uid, eid, v, k_keep):
        order = np.lexsort((eid, -v, uid))
        su, se, sv = uid[order], eid[order], v[order]
        change = np.empty(su.size, dtype=bool)
        change[0] = True
        change[1:] = su[1:] != su[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, su.size))
        pos = np.arange(su.size) - np.repeat(starts, counts)
        keep = pos < k_keep
        return su[keep], se[keep], sv[keep], (pos[keep] + 1)

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        if uid.size:
            uid, eid, v, _ = topk_local(uid, eid, v, k)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "value": pa.array(v, pa.float64()),
                "part": pa.array(_hash_part(uid), pa.int64()),
            }
        )

    def select_partition(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(dtype=np.int64)
        if uid.size == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "event_id": pd.Series(dtype="int64"),
                    "value": pd.Series(dtype="float64"),
                    "rk": pd.Series(dtype="int64"),
                }
            )
        su, se, sv, rk = topk_local(
            uid,
            df["event_id"].to_numpy(dtype=np.int64),
            df["value"].to_numpy(dtype=np.float64),
            k,
        )
        return pd.DataFrame(
            {
                "user_id": su,
                "event_id": se,
                "value": sv,
                "rk": rk.astype(np.int64),
            }
        )

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return select_partition(df.drop(columns=["part"]))

    wrapper.__name__ = "topk_partition"
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wrapper, batch_format="pandas")
    )


def q_event_types(sf_dir: str):
    """Distinct values (set op; ds.unique is the same shuffle — done via
    groupby for a deterministic, oracle-matched output)."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["event_type"])
    return ds.groupby("event_type").aggregate(Count(alias_name="n"))


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style pricing summary over lineitem: grouped exact-decimal
    sums and means (classic OLAP shape on the biggest table)."""
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )

    def partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        qty_mu = np.round(
            b["l_quantity"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        price_mu = np.round(price * 1e6).astype(np.int64)
        # disc_price rounded to micro per row BEFORE summing, so the
        # DuckDB DECIMAL(24,6) cast of the identical double matches
        disc_price_mu = np.round(price * (1.0 - disc) * 1e6).astype(np.int64)
        g = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty_mu": pa.array(qty_mu, pa.int64()),
                "price_mu": pa.array(price_mu, pa.int64()),
                "disc_price_mu": pa.array(disc_price_mu, pa.int64()),
            }
        ).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty_mu", "count"),
                ("qty_mu", "sum"),
                ("price_mu", "sum"),
                ("disc_price_mu", "sum"),
            ]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "n_rows": pc.cast(g["qty_mu_count"], pa.int64()),
                "qty_mu": g["qty_mu_sum"],
                "price_mu": g["price_mu_sum"],
                "disc_price_mu": g["disc_price_mu_sum"],
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("qty_mu", alias_name="qty_mu"),
        Sum("price_mu", alias_name="price_mu"),
        Sum("disc_price_mu", alias_name="disc_price_mu"),
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = b["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = b["qty_mu"].to_numpy(zero_copy_only=False) / 1e6
        price = b["price_mu"].to_numpy(zero_copy_only=False) / 1e6
        disc_price = b["disc_price_mu"].to_numpy(zero_copy_only=False) / 1e6
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "n_rows": pa.array(n, pa.int64()),
                "sum_qty": pa.array(qty, pa.float64()),
                "sum_base_price": pa.array(price, pa.float64()),
                "sum_disc_price": pa.array(disc_price, pa.float64()),
                "avg_qty": pa.array(qty / n, pa.float64()),
                "avg_price": pa.array(price / n, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def _typed_user_events(sf_dir: str) -> rd.Dataset:
    """Shared typed projection for the user-keyed joins (as-of, range):
    (user_id, ts_us, event_id, event_type, part) — ONE definition so the
    join queries can never departition differently."""
    events = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def to_typed(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "event_type": b["event_type"],
                "part": pa.array(_hash_part(uid), pa.int64()),
            }
        )

    return events.map_batches(to_typed, batch_format="pyarrow")


def q_asof_purchase_click(sf_dir: str):
    """As-of join: for each 'purchase' event, the user's most recent
    STRICTLY earlier 'click' event (pd.merge_asof inside hash partitions
    keyed by user — the guide's canonical as-of pattern; right side made
    unique per (user, ts) so tie resolution is deterministic on both
    engines)."""
    typed = _typed_user_events(sf_dir)

    def asof_partition(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["event_type"] == "purchase"][
            ["user_id", "ts_us", "event_id"]
        ].sort_values(["ts_us", "event_id"], kind="stable")
        right = df[df["event_type"] == "click"][["user_id", "ts_us", "event_id"]]
        # deterministic tie resolution: one row per (user, ts), max event_id
        right = (
            right.groupby(["user_id", "ts_us"], sort=False)["event_id"]
            .max()
            .reset_index()
            .rename(columns={"event_id": "click_event_id", "ts_us": "click_ts_us"})
            .sort_values(["click_ts_us", "click_event_id"], kind="stable")
        )
        if left.empty or right.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts_us", "click_event_id",
                         "click_ts_us", "lag_us"]
            ).astype({"event_id": "int64", "user_id": "int64", "ts_us": "int64",
                      "click_event_id": "int64", "click_ts_us": "int64",
                      "lag_us": "int64"})
        merged = pd.merge_asof(
            left,
            right,
            left_on="ts_us",
            right_on="click_ts_us",
            left_by="user_id",
            right_by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        merged = merged.dropna(subset=["click_event_id"])
        merged["click_event_id"] = merged["click_event_id"].astype("int64")
        merged["click_ts_us"] = merged["click_ts_us"].astype("int64")
        merged["lag_us"] = merged["ts_us"] - merged["click_ts_us"]
        return merged[["event_id", "user_id", "ts_us", "click_event_id",
                       "click_ts_us", "lag_us"]]

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return asof_partition(df.drop(columns=["part"]))

    wrapper.__name__ = "asof_partition"
    return typed.groupby("part").map_groups(wrapper, batch_format="pandas")


def q_clicks_before_purchase(sf_dir: str):
    """Range join: for each 'purchase', count the same user's clicks in
    the preceding hour (vectorized searchsorted per partition; exact
    integer output vs an inequality-join SQL oracle)."""
    typed = _typed_user_events(sf_dir)

    def range_partition(df: pd.DataFrame) -> pd.DataFrame:
        out = {"event_id": [], "user_id": [], "ts_us": [], "n_clicks_1h": []}
        hour = 3_600_000_000
        for uid, g in df.groupby("user_id", sort=True):
            clicks = np.sort(
                g[g["event_type"] == "click"]["ts_us"].to_numpy(dtype=np.int64)
            )
            purchases = g[g["event_type"] == "purchase"]
            if purchases.empty:
                continue
            ts = purchases["ts_us"].to_numpy(dtype=np.int64)
            hi = np.searchsorted(clicks, ts, side="left")  # strictly before
            lo = np.searchsorted(clicks, ts - hour, side="right")  # > ts-1h
            out["event_id"].extend(purchases["event_id"].tolist())
            out["user_id"].extend([uid] * len(purchases))
            out["ts_us"].extend(ts.tolist())
            out["n_clicks_1h"].extend((hi - lo).astype(np.int64).tolist())
        res = pd.DataFrame(out).astype(
            {"event_id": "int64", "user_id": "int64",
             "ts_us": "int64", "n_clicks_1h": "int64"}
        )
        return res.sort_values(
            ["user_id", "ts_us", "event_id"], kind="stable"
        ).reset_index(drop=True)

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return range_partition(df.drop(columns=["part"]))

    wrapper.__name__ = "range_join_partition"
    return typed.groupby("part").map_groups(wrapper, batch_format="pandas")


def q_band_join(sf_dir: str, window_us: int = _BAND_JOIN_WINDOW_US):
    """KEYLESS time-band interval join: for each 'purchase' event, the
    count of clicks by ANY user in the preceding 10 minutes
    ``[ts - window, ts)``. Unlike ``clicks_before_purchase`` (which
    hash-partitions on the user equality key), there is NO equality key
    here — the scalable plan is the classic band replication: with band
    width B == window, each click replicates to bands ``floor(t/B)`` and
    ``floor(t/B)+1`` (a bounded 2x of the probe-side stream, key-free),
    purchases route to their own band only, and every purchase's window
    is fully covered by its single band group (``t >= p - B`` implies
    ``floor(t/B) >= floor(p/B) - 1``) with no double counting (each
    click copy carries a distinct band value). Bands hash-partition into
    ``part`` buckets; inside a partition one composite-key sort
    ``band * 2B + (t - band*B + B)`` (offset is in ``[-B, B)`` so the
    key is collision-free and fits int64) makes the per-purchase count a
    pair of global ``searchsorted`` calls — fully vectorized, no Python
    loop over bands."""
    ev = _read(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"]
    )
    B = window_us

    def route(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_p = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        )
        is_c = pc.equal(b["event_type"], "click").to_numpy(
            zero_copy_only=False
        )
        band = np.concatenate(
            [ts[is_p] // B, ts[is_c] // B, ts[is_c] // B + 1]
        )
        out = pa.table(
            {
                "band": pa.array(band, pa.int64()),
                "kind": pa.array(
                    np.concatenate(
                        [
                            np.ones(int(is_p.sum()), np.int64),
                            np.zeros(2 * int(is_c.sum()), np.int64),
                        ]
                    ),
                    pa.int64(),
                ),
                "ts_us": pa.array(
                    np.concatenate([ts[is_p], ts[is_c], ts[is_c]]), pa.int64()
                ),
                "event_id": pa.array(
                    np.concatenate(
                        [eid[is_p], np.full(2 * int(is_c.sum()), -1, np.int64)]
                    ),
                    pa.int64(),
                ),
                "part": pa.array(_hash_part(band), pa.int64()),
            }
        )
        return out

    def band_partition(df: pd.DataFrame) -> pd.DataFrame:
        band = df["band"].to_numpy(dtype=np.int64)
        kind = df["kind"].to_numpy(dtype=np.int64)
        ts = df["ts_us"].to_numpy(dtype=np.int64)
        c = kind == 0
        # composite key: band-major, in-band offset in [-B, B) shifted
        # non-negative — one sort serves every band segment at once
        ckey = np.sort(band[c] * (2 * B) + (ts[c] - band[c] * B + B))
        pb, pt = band[~c], ts[~c]
        pkey_hi = pb * (2 * B) + (pt - pb * B + B)
        n = np.searchsorted(ckey, pkey_hi, side="left") - np.searchsorted(
            ckey, pkey_hi - B, side="left"
        )
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(dtype=np.int64)[~c],
                "ts_us": pt,
                "n_clicks_10m": n.astype(np.int64),
            }
        )

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return band_partition(df.drop(columns=["part"]))

    wrapper.__name__ = "band_partition"
    return (
        ev.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wrapper, batch_format="pandas")
    )


def q_user_value_median(sf_dir: str):
    """Per-user exact median (order statistic; both engines average the
    two middle elements of the identical sorted doubles)."""
    ds = _events_signals(sf_dir)

    def med_partition(df: pd.DataFrame) -> pd.DataFrame:
        sig = df["signal_id"].to_numpy()
        val = df["value"].to_numpy(dtype=np.float64)
        # one lexsort, then order-statistic medians at segment boundaries
        # (identical to np.median per group: average of the two middle
        # elements of the sorted values; values are NaN-free by schema)
        order = np.lexsort((val, sig))
        sig, val = sig[order], val[order]
        starts = np.flatnonzero(np.concatenate(([True], sig[1:] != sig[:-1])))
        counts = np.diff(np.append(starts, sig.size))
        lo = starts + (counts - 1) // 2
        hi = starts + counts // 2
        return pd.DataFrame(
            {
                "signal_id": sig[starts],
                "value_median": (val[lo] + val[hi]) / 2.0,
            }
        )

    def wrapper(df: pd.DataFrame) -> pd.DataFrame:
        return med_partition(df.drop(columns=["part"]))

    wrapper.__name__ = "median_partition"
    return ds.groupby("part").map_groups(wrapper, batch_format="pandas")


# Registry order is load-bearing: the correctness driver checks the
# first ~50 entries per round, so every ORACLE_SQL-backed query comes
# FIRST (hash-exact rows), then the rows-only queries ordered by how
# much a formal row adds over their pytest pins (the optimizer/ADF
# surfaces lead; sketch/codec queries whose exactness is approximate or
# non-SQL by DESIGN trail). tests/test_queries_registry.py pins the
# partitioning.
QUERIES = {
    # --- oracle-backed (hash-exact vs ORACLE_SQL) ---
    "signal_counts": q_signal_counts,
    "min_signal_length": q_min_signal_length,
    "doc_len": q_doc_len,
    "doc_len_quantiles": q_doc_len_quantiles,
    "difference": q_difference,
    "zscore": q_zscore,
    "rollup_1h": q_rollup_1h,
    "rollup_1d": q_rollup_1d,
    "doc_counts_by_lang": q_doc_counts_by_lang,
    "dedup_exact": q_dedup_exact,
    "token_counts": q_token_counts,
    "quality_scores": q_quality_scores,
    "similarity_topk": q_similarity_topk,
    "transcript_rollup_stats": q_transcript_rollup_stats,
    "split_contamination": q_split_contamination,
    "repetition": q_repetition,
    "tier_blocks": q_tier_blocks,
    "tier_block_sizes": q_tier_block_sizes,
    "doc_bytes": q_doc_bytes,
    "langid": q_langid,
    "minhash_neardup": q_minhash_neardup,
    "ngram_jaccard": q_ngram_jaccard,
    "embedding_neardup": q_embedding_neardup,
    "embedding_neardup_ivf": q_embedding_neardup_ivf,
    "knn_all": q_knn_all,
    "ann_ivf": q_ann_ivf_fullprobe,
    "vocab_topk": q_vocab_topk,
    "bloom_semijoin": q_bloom_semijoin,
    "anti_join": q_anti_join,
    "pii_counts": q_pii_counts,
    "clean_corpus": q_clean_corpus,
    "hopping_window": q_hopping_window,
    "streaming_window": q_streaming_window,
    "distinct_users": q_distinct_users,
    "group_cap": q_group_cap,
    "dataset_split": q_dataset_split,
    "sample_events": q_sample_events,
    "top_users": q_top_users,
    "orders_by_segment": q_orders_by_segment,
    "order_segments_join": q_order_segments_join,
    "sessions": q_sessions,
    "rolling_mean": q_rolling_mean,
    "running_sum": q_running_sum,
    "topk_per_user": q_topk_per_user,
    "heavy_hitters": q_heavy_hitters,
    "pricing_summary": q_pricing_summary,
    "asof_purchase_click": q_asof_purchase_click,
    "clicks_before_purchase": q_clicks_before_purchase,
    "band_join": q_band_join,
    "user_value_median": q_user_value_median,
    # --- rows-only (non-SQL-expressible or approximate by design;
    #     each pinned by ported-reference / golden pytest coverage) ---
    "sampen_optimized": q_sampen_optimized,
    "sampen_efficiency": q_sampen_efficiency,
    "adf_stationarity": q_adf_stationarity,
    "sampen_per_signal": q_sampen_per_signal,
    "transcript_rollup": q_transcript_rollup,
    "stationary_signals": q_stationary_signals,
    "tier_block_enc": q_tier_block_enc,
    "fingerprints": q_fingerprints,
    "simhash": q_simhash,
    "simhash_neardup": q_simhash_neardup,
    "doc_chunks": q_doc_chunks,
    "seq_pack": q_seq_pack,
    "weighted_mix": q_weighted_mix,
    # event_types rotated out of the oracle prefix in round 5 (its
    # trivial-groupby shape is already hash-covered by doc_counts_by_lang)
    # to free the slot for heavy_hitters' full distributed sketch plan
    "event_types": q_event_types,
    "multimodal_features": q_multimodal_features,
    "image_resize": q_image_resize,
    "frame_sample": q_frame_sample,
    "distinct_users_approx": q_distinct_users_approx,
    "value_quantiles_hdr": q_value_quantiles_hdr,
    "reservoir_sample": q_reservoir_sample,
}


def _rollup_sql(step_us: int) -> str:
    return f"""
SELECT user_id,
       -- ((x % s + s) % s) keeps FLOOR semantics for negative epochs
       -- (DuckDB % truncates toward zero; the numpy side floors)
       epoch_us(ts) - ((epoch_us(ts) % {step_us} + {step_us}) % {step_us})
         AS bucket_us,
       COUNT(*) AS n_obs,
       MIN(value) AS value_min,
       MAX(value) AS value_max,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS value_mean
FROM events
GROUP BY 1, 2
"""


def _langid_sql() -> str:
    """SQL twin of q_langid, generated from the SAME stopword sets so the
    two sides cannot drift."""
    from eristropy_ray.datapipe.textstats import _STOPWORDS

    def inlist(ws: set[str]) -> str:
        return "(" + ",".join(f"'{w}'" for w in sorted(ws)) + ")"

    score_cols = ",\n    ".join(
        f"CAST(len(list_filter(ws, x -> x IN {inlist(sw)})) AS DOUBLE)"
        f"/greatest(len(ws),1) AS s_{lang}"
        for lang, sw in sorted(_STOPWORDS.items())
    )
    langs = sorted(_STOPWORDS) + ["zh"]
    lang_list = "[" + ",".join(f"'{x}'" for x in langs) + "]"
    score_list = "[" + ",".join(f"s_{x}" for x in langs) + "]"
    return f"""
WITH w AS (
  SELECT doc_id, text,
         list_transform(regexp_extract_all(text, '[\\p{{L}}]+'), x -> lower(x)) AS ws
  FROM documents
), sc AS (
  SELECT doc_id,
    {score_cols},
    CAST(len(regexp_extract_all(text, '[\\x{{4E00}}-\\x{{9FFF}}]')) AS DOUBLE)
      /greatest(length(text),1) AS s_zh
  FROM w
), u AS (
  SELECT doc_id, unnest({lang_list}) AS lang,
         unnest({score_list}) AS score FROM sc
), r AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM u
)
SELECT doc_id, CASE WHEN score >= 0.02 THEN lang ELSE 'unknown' END AS lang_pred
FROM r WHERE rn = 1
"""


def _split_case_sql(col: str) -> str:
    """The dataset_split hash as a SQL CASE expression — ONE definition
    shared by the dataset_split and split_contamination oracles, matching
    q_dataset_split's numpy arithmetic exactly (mod p before the multiply
    so int64 never overflows; floor-safe double-mod for negative ids)."""
    h = f"(({col} % 1000000007 + 1000000007) % 1000000007) * 2654435761 % 1000000007 % 100"
    return (
        f"CASE WHEN {h} < 80 THEN 'train' "
        f"WHEN {h} < 90 THEN 'val' ELSE 'test' END"
    )


def _minhash_sql() -> str:
    """All-pairs word-shingle-Jaccard twin of q_minhash_neardup.

    The word splitter's character class is GENERATED from
    ``dedup.WS_RANGES`` (the same Python-``\\s`` codepoint set that
    ``dedup._whitespace_mask`` implements byte-wise), so the two engines
    tokenize identically. Shingle semantics mirror
    ``dedup.word_shingle_hashes``: docs with >= 3 words use the distinct
    3-word shingle set; shorter docs collapse to one shingle (the whole
    word tuple — a space join is unambiguous because words contain no
    whitespace). jaccard = inter/union as an exact int->double division.
    """
    from eristropy_ray.datapipe.dedup import WS_RANGES

    cls = "".join(
        (f"\\x{{{lo:04X}}}" if lo == hi else f"\\x{{{lo:04X}}}-\\x{{{hi:04X}}}")
        for lo, hi in WS_RANGES
    )
    return f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '[^{cls}]+') AS ws FROM documents
), sh AS (
  SELECT doc_id,
    CASE WHEN len(ws) >= 3 THEN
      list_distinct(list_transform(generate_series(1, len(ws)-2),
        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
    ELSE [array_to_string(ws, ' ')] END AS grams
  FROM w
), p AS (
  SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS uni
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / uni AS jaccard
FROM p WHERE CAST(inter AS DOUBLE) / uni >= 0.5
"""


_TIER_BLOCKS_SQL = f"""
WITH t(tier, step) AS (VALUES ('1m', 60000000), ('1h', 3600000000), ('1d', 86400000000)),
b AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id, t.tier, t.step,
         epoch_us(ts) - ((epoch_us(ts) % t.step + t.step) % t.step) AS bucket
  FROM events, t GROUP BY 1,2,3,4
), g AS (
  SELECT conv_id, tier, step, MIN(bucket) AS b0, MAX(bucket) AS b1
  FROM b GROUP BY 1,2,3
), grid AS (
  SELECT g.conv_id, g.tier, g.step, gs.i AS idx, g.b0 + gs.i*g.step AS bucket
  FROM g, LATERAL (
    SELECT unnest(generate_series(0, CAST((g.b1-g.b0)/g.step AS BIGINT))) AS i
  ) gs
)
SELECT grid.conv_id, grid.tier,
       MIN(grid.bucket) AS block_start_us,
       COUNT(*) AS n_points,
       CAST(SUM(CASE WHEN b.bucket IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS gap_filled_points
FROM grid LEFT JOIN b
  ON b.conv_id = grid.conv_id AND b.tier = grid.tier AND b.bucket = grid.bucket
GROUP BY grid.conv_id, grid.tier, grid.idx // {EncodeConfig().max_points}
"""


def _clean_corpus_sql() -> str:
    """Composed twin of q_clean_corpus: the langid oracle as a CTE, then
    the same quality filter, dedup-by-text and token count."""
    return f"""
WITH lang AS ({_langid_sql()}),
scored AS (
  SELECT d.doc_id, d.text,
         CAST(len(regexp_extract_all(d.text, {_sql_regex(_WS_TOKEN_PAT)})) AS BIGINT) AS n_tokens
  FROM documents d JOIN lang ON d.doc_id = lang.doc_id
  WHERE length(d.text) >= 100
    AND CAST(length(regexp_extract_all(d.text, '[.!?,;:]')) AS DOUBLE)
        / length(d.text) < 0.1
    AND lang.lang_pred = 'en'
)
SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens
FROM scored GROUP BY text
"""


ORACLE_SQL = {
    "minhash_neardup": _minhash_sql(),
    # raw_bytes = 8 B x (1 ts + n value columns) per gap-filled point;
    # the multiplier is GENERATED from EncodeConfig so SQL cannot drift
    "tier_block_sizes": f"""
SELECT conv_id, tier, block_start_us,
       CAST(n_points * 8 * {1 + len(EncodeConfig().columns)} AS BIGINT)
         AS raw_bytes
FROM ({_TIER_BLOCKS_SQL})
""",
    "clean_corpus": _clean_corpus_sql(),
    "langid": _langid_sql(),
    "tier_blocks": _TIER_BLOCKS_SQL,
    "ngram_jaccard": """
WITH g AS (
  SELECT doc_id, substring(text, gs.i, 3) AS gram
  FROM documents, LATERAL (
    SELECT unnest(generate_series(1, greatest(length(text) - 2, 1))) AS i
  ) gs(i)
), s AS (
  SELECT doc_id, list(DISTINCT gram) AS grams FROM g GROUP BY doc_id
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS uni
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / uni AS jaccard
FROM p WHERE CAST(inter AS DOUBLE) / uni >= 0.5
""",
    "embedding_neardup": """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
""",
    # unnest of two same-length lists in one SELECT zips in DuckDB, so
    # each q lands beside its quantile; interpolation parity with
    # quantile_cont is fuzz-pinned in tests/test_queries_registry.py.
    "doc_len_quantiles": """
SELECT unnest([0.25, 0.5, 0.75, 0.95, 0.99]) AS q,
       unnest(quantile_cont(length(text),
                            [0.25, 0.5, 0.75, 0.95, 0.99])) AS value
FROM documents
""",
    # The IVF-bucketed scale path recovers the exact pair set at
    # n_probe=8/16 (recall 1.0 asserted in tests/test_datapipe.py on
    # both corpora), so its oracle IS the exact all-pairs twin.
    "embedding_neardup_ivf": """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
""",
    # Registered at n_probe = n_cells, where IVF is exactly brute force
    # (every member allowed for every query) — the knn_all twin checks
    # the whole distributed route/partial/merge machinery.
    "ann_ivf": """
WITH sims AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 4) AS sim
  FROM embeddings a, embeddings b
  WHERE a.vec_id <> b.vec_id
)
SELECT vec_id, neighbor_id, sim FROM (
  SELECT vec_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, neighbor_id) AS rk
  FROM sims
) WHERE rk <= 5
""",
    # Bloom prefilter + exact verification = the plain semi-join.
    "bloom_semijoin": """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
FROM events
WHERE event_type = 'click' AND user_id IN (
  SELECT user_id FROM events WHERE event_type = 'purchase')
""",
    "distinct_users": """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
    "streaming_window": """
WITH a AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
         MAX(epoch_us(ts)) OVER (
           PARTITION BY user_id
           ORDER BY event_id + CASE WHEN event_id % 16 = 5 THEN 40 ELSE 0 END,
                    event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events
), b AS (
  SELECT user_id, ts_us, value,
         (wm IS NOT NULL AND ts_us < wm - 1800000000) AS late,
         ts_us - ((ts_us % 3600000000 + 3600000000) % 3600000000) AS win
  FROM a
)
SELECT user_id AS signal_id, win AS window_start_us,
       CAST(COALESCE(SUM(CASE WHEN NOT late THEN 1 END), 0) AS BIGINT) AS n_obs,
       CAST(COALESCE(SUM(CASE WHEN NOT late
                          THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE)
         AS value_sum,
       CAST(COALESCE(SUM(CASE WHEN late THEN 1 END), 0) AS BIGINT) AS n_late
FROM b GROUP BY 1, 2
""",
    "hopping_window": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
w AS (
  SELECT user_id, value,
         ts_us - ((ts_us % 900000000 + 900000000) % 900000000)
           - CAST(k.i AS BIGINT) * 900000000 AS win_start
  FROM e, (VALUES (0),(1),(2),(3)) k(i)
)
SELECT user_id AS signal_id, win_start AS window_start_us,
       COUNT(*) AS n_obs,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
FROM w GROUP BY 1, 2
""",
    "signal_counts": """
SELECT user_id, COUNT(*) AS n_obs, MIN(value) AS value_min, MAX(value) AS value_max
FROM events GROUP BY user_id
""",
    "min_signal_length": """
SELECT MIN(n_obs) AS min_len
FROM (SELECT COUNT(*) AS n_obs FROM events GROUP BY user_id)
""",
    "doc_len": """
SELECT doc_id, CAST(length(text) AS DOUBLE) AS value FROM documents
""",
    "difference": """
SELECT signal_id, ts_us, value FROM (
  SELECT user_id AS signal_id, epoch_us(ts) AS ts_us,
         value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value
  FROM events
) WHERE value IS NOT NULL
""",
    "zscore": """
WITH s AS (
  SELECT user_id AS signal_id, epoch_us(ts) AS ts_us, value,
         COUNT(*) OVER w AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sv,
         CAST(SUM(CAST(value * value AS DECIMAL(24,6))) OVER w AS DOUBLE) AS sq
  FROM events
  WINDOW w AS (PARTITION BY user_id)
)
SELECT signal_id, ts_us, (value - sv / n) / sqrt((sq - sv * sv / n) / (n - 1)) AS value
FROM s WHERE n >= 2
""",
    "rollup_1h": _rollup_sql(US_1H),
    "rollup_1d": _rollup_sql(US_1D),
    "doc_counts_by_lang": """
SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
""",
    "dedup_exact": """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dupes FROM documents GROUP BY text
""",
    "token_counts": f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, {_sql_regex(_WS_TOKEN_PAT)})) AS BIGINT)
         AS n_tokens,
       CAST(len(regexp_extract_all(text, {_sql_regex(_BPE_PAT)})) AS BIGINT)
         AS n_bpe_tokens
FROM documents
""",
    "quality_scores": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS n_punct,
       CAST(length(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
       CAST(length(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE)
         / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
       CAST(length(regexp_extract_all(text, '[A-Z]')) AS DOUBLE)
         / greatest(CAST(length(text) AS DOUBLE), 1.0) AS upper_ratio
FROM documents
""",
    "clicks_before_purchase": """
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, epoch_us(ts) AS cts
           FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts_us,
       CAST(COALESCE(SUM(CASE WHEN c.cts > p.ts_us - 3600000000
                          AND c.cts < p.ts_us THEN 1 END), 0) AS BIGINT) AS n_clicks_1h
FROM p LEFT JOIN c ON p.user_id = c.user_id
GROUP BY p.event_id, p.user_id, p.ts_us
""",
    "band_join": f"""
WITH p AS (SELECT event_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT epoch_us(ts) AS cts
           FROM events WHERE event_type = 'click')
SELECT p.event_id, p.ts_us,
       CAST(COUNT(c.cts) AS BIGINT) AS n_clicks_10m
FROM p LEFT JOIN c
  ON c.cts >= p.ts_us - {_BAND_JOIN_WINDOW_US}
 AND c.cts < p.ts_us
GROUP BY p.event_id, p.ts_us
""",
    "anti_join": f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
FROM events e
WHERE event_type = 'click' AND NOT EXISTS (
  SELECT 1 FROM events p
  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
    AND epoch_us(p.ts) // {US_1D} = epoch_us(e.ts) // {US_1D})
""",
    "user_value_median": """
SELECT user_id AS signal_id, MEDIAN(value) AS value_median
FROM events GROUP BY user_id
""",
    "asof_purchase_click": """
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, epoch_us(ts) AS click_ts_us,
                  MAX(event_id) AS click_event_id
           FROM events WHERE event_type = 'click'
           GROUP BY user_id, epoch_us(ts))
SELECT p.event_id, p.user_id, p.ts_us,
       c.click_event_id, c.click_ts_us,
       p.ts_us - c.click_ts_us AS lag_us
FROM p ASOF JOIN c
  ON p.user_id = c.user_id AND p.ts_us > c.click_ts_us
""",
    # heavy_hitters' twin is exact because the test corpus vocabulary
    # (31 words) is far below k_summary=256: Misra-Gries never evicts,
    # so every estimate equals the exact count and the whole distributed
    # sketch plan (per-batch summaries -> per-part merges -> final merge
    # -> (est DESC, word ASC) top-n) is hash-checkable — the same
    # full-capacity pattern that makes ann_ivf oracle-checkable via
    # n_probe=n_cells. The n/k undercount bound for the general case
    # keeps its own pin in tests/test_datapipe.py.
    "heavy_hitters": f"""
SELECT word, CAST(COUNT(*) AS BIGINT) AS est
FROM (SELECT unnest(regexp_extract_all(text, {_sql_regex(_WS_TOKEN_PAT)})) AS word
      FROM documents)
GROUP BY word ORDER BY est DESC, word LIMIT 20
""",
    "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
    "sessions": """
WITH marked AS (
  SELECT user_id AS signal_id, epoch_us(ts) AS ts_us, event_id,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT signal_id, ts_us,
         SUM(new_s) OVER (PARTITION BY signal_id
                          ORDER BY ts_us, event_id) AS session_id
  FROM marked
)
SELECT signal_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM sess GROUP BY 1, 2
""",
    "rolling_mean": """
SELECT user_id AS signal_id, epoch_us(ts) AS ts_us,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / LEAST(CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS DOUBLE), 5.0) AS value
FROM events
""",
    "running_sum": """
SELECT user_id AS signal_id, epoch_us(ts) AS ts_us,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_sum
FROM events
""",
    "topk_per_user": """
SELECT user_id, event_id, value, CAST(rk AS BIGINT) AS rk
FROM (SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rk
      FROM events)
WHERE rk <= 3
""",
    "sample_events": """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
FROM events WHERE event_id & 15 = 3
""",
    "vocab_topk": f"""
SELECT word, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_extract_all(text, {_sql_regex(_WS_TOKEN_PAT)})) AS word
      FROM documents)
GROUP BY word ORDER BY n DESC, word LIMIT 50
""",
    "pii_counts": f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(text, {_sql_regex(_EMAIL_PAT)})) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, {_sql_regex(_URL_PAT)})) AS BIGINT)
         AS n_urls
FROM documents
""",
    "transcript_rollup_stats": """
WITH t(tier, step) AS (VALUES ('1m', 60000000), ('1h', 3600000000),
                              ('1d', 86400000000)),
e AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         length(COALESCE(props, '')) AS v,
         epoch_us(ts) AS ts_us
  FROM events
)
SELECT e.conv_id, t.tier,
       ts_us - ((ts_us % t.step + t.step) % t.step) AS bucket_us,
       COUNT(*) AS n_turns,
       CAST(SUM(v) AS DOUBLE) AS value_sum,
       CAST(MIN(v) AS DOUBLE) AS value_min,
       CAST(MAX(v) AS DOUBLE) AS value_max,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS value_mean
FROM e, t GROUP BY 1, 2, 3
""",
    "group_cap": """
SELECT signal_id, ts_us, event_id, value FROM (
  SELECT user_id AS signal_id, epoch_us(ts) AS ts_us,
         CAST(event_id AS BIGINT) AS event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
  FROM events
) WHERE rk <= 3
""",
    "dataset_split": f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, {_split_case_sql('doc_id')} AS split
FROM documents
""",
    "split_contamination": f"""
WITH pairs AS ({{minhash}}),
labeled AS (
  SELECT doc_a, doc_b, jaccard,
         {_split_case_sql('doc_a')} AS split_a,
         {_split_case_sql('doc_b')} AS split_b
  FROM pairs
)
SELECT * FROM labeled WHERE split_a <> split_b
""".replace("{minhash}", _minhash_sql()),
    "repetition": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(greatest(length(text) - 9, 0) AS BIGINT) AS n_grams,
       CASE WHEN length(text) >= 10 THEN (
         SELECT CAST(COUNT(DISTINCT substring(d.text, gs.i, 10)) AS BIGINT)
         FROM (SELECT unnest(generate_series(1, length(d.text) - 9)) AS i) gs(i)
       ) ELSE 0 END AS n_distinct,
       CASE WHEN length(text) >= 10 THEN 1.0 - (
         SELECT CAST(COUNT(DISTINCT substring(d.text, gs.i, 10)) AS DOUBLE)
         FROM (SELECT unnest(generate_series(1, length(d.text) - 9)) AS i) gs(i)
       ) / (length(text) - 9) ELSE 0.0 END AS rep_ratio
FROM documents d
""",
    "top_users": """
SELECT user_id, COUNT(*) AS n_obs FROM events
GROUP BY user_id ORDER BY n_obs DESC, user_id LIMIT 10
""",
    "order_segments_join": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""",
    "orders_by_segment": """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    "doc_bytes": """
SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
""",
    "knn_all": """
WITH sims AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 4) AS sim
  FROM embeddings a, embeddings b
  WHERE a.vec_id <> b.vec_id
)
SELECT vec_id, neighbor_id, sim FROM (
  SELECT vec_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, neighbor_id) AS rk
  FROM sims
) WHERE rk <= 5
""",
    "similarity_topk": """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS embedding
           FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    (SELECT embedding FROM q)), 4) AS sim
FROM embeddings e
ORDER BY sim DESC, vec_id
LIMIT 10
""",
}
