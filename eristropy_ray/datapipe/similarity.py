"""Similarity search over an embedding column.

- ``knn_topk_batch``: brute-force cosine top-k per query batch against a
  broadcast unit-normalized matrix (the baseline; numpy matmul per batch,
  matrix shipped once via ``ray.put``).
- ``IVFIndex``: inverted-file index — seeded numpy k-means (no sklearn),
  vectors assigned to their nearest centroid; queries probe the
  ``n_probe`` nearest cells. The scale path: the index build is a single
  pass + small iterations, queries touch ~n_probe/n_cells of the data.
  Recall is tested against the brute-force baseline in
  ``tests/test_datapipe.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def unit_rows(x: np.ndarray) -> np.ndarray:
    n = np.sqrt((x * x).sum(axis=1, keepdims=True))
    return x / np.maximum(n, 1e-30)


def knn_topk_batch(
    queries: np.ndarray, corpus_unit: np.ndarray, ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(ids, sims) of the top-k corpus rows per query (cosine, exact).

    Ties broken by ascending id after descending similarity."""
    q = unit_rows(queries)
    sims = q @ corpus_unit.T
    k_eff = min(k, sims.shape[1])
    # argpartition then exact ordering of the head by (-sim, id)
    part = np.argpartition(-sims, k_eff - 1, axis=1)[:, :k_eff]
    out_ids = np.empty((q.shape[0], k_eff), dtype=ids.dtype)
    out_sims = np.empty((q.shape[0], k_eff))
    for i in range(q.shape[0]):
        cand = part[i]
        order = np.lexsort((ids[cand], -sims[i, cand]))
        sel = cand[order]
        out_ids[i] = ids[sel]
        out_sims[i] = sims[i, sel]
    return out_ids, out_sims


def _kmeans(x: np.ndarray, n_cells: int, seed: int, n_iter: int = 10) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence([seed])))
    n = x.shape[0]
    centroids = x[rng.choice(n, size=min(n_cells, n), replace=False)].copy()
    for _ in range(n_iter):
        d = x @ centroids.T
        assign = d.argmax(axis=1)  # unit rows: max dot = min angle
        for c in range(centroids.shape[0]):
            members = x[assign == c]
            if members.size:
                m = members.mean(axis=0)
                norm = np.sqrt((m * m).sum())
                if norm > 0:
                    centroids[c] = m / norm
    return centroids


def supercell_assign(
    centroids: np.ndarray, n_super: int, seed: int = 11
) -> np.ndarray:
    """Cluster the IVF centroids themselves into ``n_super`` proximity
    groups ("supercells"). Because a query's ``n_probe`` nearest cells
    are by construction angularly close, they mostly land in ONE
    supercell — so routing by supercell ships each query vector ~1-2x
    through the shuffle instead of n_probe x (measured in
    tests/test_datapipe.py). Returns the supercell id per cell."""
    sc = _kmeans(centroids, n_super, seed)
    return (centroids @ sc.T).argmax(axis=1).astype(np.int64)


@dataclass
class IVFIndex:
    centroids: np.ndarray  # (C, d) unit rows
    cell_ids: list[np.ndarray]  # per cell: row ids
    cell_vecs: list[np.ndarray]  # per cell: unit vectors

    @classmethod
    def build(
        cls, emb: np.ndarray, ids: np.ndarray, n_cells: int = 16, seed: int = 7
    ) -> "IVFIndex":
        unit = unit_rows(np.asarray(emb, dtype=np.float64))
        centroids = _kmeans(unit, n_cells, seed)
        assign = (unit @ centroids.T).argmax(axis=1)
        cell_ids, cell_vecs = [], []
        for c in range(centroids.shape[0]):
            mask = assign == c
            cell_ids.append(np.asarray(ids)[mask])
            cell_vecs.append(unit[mask])
        return cls(centroids, cell_ids, cell_vecs)

    def search(
        self, queries: np.ndarray, k: int = 10, n_probe: int = 4
    ) -> tuple[list[np.ndarray], list[np.ndarray]]:
        q = unit_rows(np.asarray(queries, dtype=np.float64))
        cell_rank = (q @ self.centroids.T).argsort(axis=1)[:, ::-1][:, :n_probe]
        out_ids, out_sims = [], []
        for i in range(q.shape[0]):
            ids_cat = np.concatenate([self.cell_ids[c] for c in cell_rank[i]])
            vecs_cat = np.concatenate([self.cell_vecs[c] for c in cell_rank[i]])
            if ids_cat.size == 0:
                out_ids.append(np.empty(0, dtype=np.int64))
                out_sims.append(np.empty(0))
                continue
            # rank on ROUNDED similarity with id tie-break — the same
            # reproducible total order the distributed q_ann_ivf and the
            # SQL oracle use (raw-sim ranking is BLAS-layout-sensitive
            # in the last ulp; 4-decimal selection is stable). O(C)
            # selection: argpartition to the k-th rounded value, widen
            # to all boundary ties, full sort only on that small head.
            sims = np.round(vecs_cat @ q[i], 4)
            k_eff = min(k, sims.size)
            if sims.size > k_eff:
                head = np.argpartition(-sims, k_eff - 1)[:k_eff]
                cand = np.flatnonzero(sims >= sims[head].min())
            else:
                cand = np.arange(sims.size)
            order = np.lexsort((ids_cat[cand], -sims[cand]))
            sel = cand[order[:k_eff]]
            out_ids.append(ids_cat[sel])
            out_sims.append(sims[sel])
        return out_ids, out_sims
