"""From-scratch deterministic HNSW — the reference's core data structure,
re-implemented so the per-partition ANN path is REAL instead of an exact
stand-in.

The reference delegates everything to hnswlib's C++ HNSW (executor.py:49
`hnswlib.Index(space, dim)`, :66-70 `init_index(max_elements,
ef_construction, M)`, :112 `knn_query(embs, k)`); hnswlib is not in this
container, so r01-r04 used an exact numpy argpartition kernel with the
identical pack/merge topology (similarity.partitioned_topk_merge) and
documented the plug-in point. This module closes that divergence with a
pure-numpy Hierarchical Navigable Small World graph (Malkov & Yashunin,
arXiv:1603.09320 — the public paper hnswlib implements):

- layered graph, geometric level assignment with multiplier 1/ln(M)
  (paper §4.1; hnswlib's mult_)
- greedy descent through upper layers, beam (ef) search at each build
  level, best-first with a bounded result heap (paper Alg. 2)
- neighbor selection by the distance heuristic (paper Alg. 4; hnswlib's
  getNeighborsByHeuristic2): a candidate is kept only if it is closer to
  the query than to every already-kept neighbor — this is what keeps the
  graph navigable on clustered data
- Mmax = M on upper layers, 2M on layer 0 (hnswlib's maxM0_), overflow
  re-pruned with the same heuristic

DETERMINISM (the property hnswlib does NOT give): levels derive from
md5(external id) instead of an RNG stream, inserts happen in ascending
external-id order, and every heap/selection tie breaks on id — so the
same rows produce the same graph and the same query results on any
partitioning, any engine, any run. That is what lets a driver query
carry an invariant oracle.

Scale role: ONE HNSW never spans 100 TB — the production shape is an
index per partition + k-per-partition merge, exactly
similarity.partitioned_topk_merge's topology with this kernel slotted in
(similarity.hnsw_partitioned_topk). Build is O(n log n) distance evals
per partition and stays in one executor's memory; queries scatter to
partitions and gather k rows each.
"""

from __future__ import annotations

import hashlib
import heapq
import math

import numpy as np


def _unit_from_id(ext_id: int, seed: int) -> float:
    """Deterministic uniform(0,1] from an external id — replaces hnswlib's
    RNG level draw so graphs are reproducible across runs/engines."""
    h = hashlib.md5(f"{seed}:{ext_id}".encode()).digest()
    v = int.from_bytes(h[:8], "big")
    return (v + 1) / float(1 << 64)


class HNSW:
    """Deterministic in-memory HNSW over a fixed batch of vectors.

    Metrics follow the reference's hnswlib semantics (executor.py:259-275):
    'l2' = SQUARED euclidean, 'cosine' = 1 - cos (vectors normalized at
    add time, like hnswlib), 'ip' = 1 - <a, b>.
    """

    def __init__(
        self,
        dim: int,
        *,
        metric: str = "cosine",
        m: int = 16,
        ef_construction: int = 200,
        seed: int = 42,
    ) -> None:
        if metric not in ("l2", "cosine", "ip"):
            raise ValueError(f"unknown metric {metric!r}")
        if m < 2:
            # m=1 would make mult = 1/log(1) a ZeroDivisionError and m=0
            # an unnavigable graph; fail with the module's loud-gate style
            raise ValueError(f"m must be >= 2, got {m}")
        self.dim = dim
        self.metric = metric
        self.m = m
        self.m0 = 2 * m
        self.ef_construction = ef_construction
        self.seed = seed
        self.mult = 1.0 / math.log(m)
        self.ids: np.ndarray | None = None  # external ids, ascending
        self.vecs: np.ndarray | None = None  # (n, dim) float64 (normalized for cosine)
        self.levels: list[int] = []
        # neighbors[node] = list over levels 0..levels[node] of int lists
        self.neighbors: list[list[list[int]]] = []
        self.entry: int = -1
        self.max_level: int = -1

    # -- distances (vectorized over node index arrays) ----------------------

    def _dist_many(self, q: np.ndarray, idxs) -> np.ndarray:
        rows = self.vecs[idxs]
        if self.metric == "l2":
            diff = rows - q
            return np.einsum("ij,ij->i", diff, diff)
        # cosine (pre-normalized) and ip share the 1 - dot form
        return 1.0 - rows @ q

    # -- build ---------------------------------------------------------------

    def build(self, ids: np.ndarray, vecs: np.ndarray) -> "HNSW":
        order = np.argsort(ids, kind="stable")  # insertion order := id order
        self.ids = ids[order].astype(np.int64)
        v = vecs[order].astype(np.float64)
        if self.metric == "cosine":
            norms = np.linalg.norm(v, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            v = v / norms
        self.vecs = v
        n = len(self.ids)
        self.levels = [
            int(-math.log(_unit_from_id(int(e), self.seed)) * self.mult)
            for e in self.ids
        ]
        self.neighbors = [
            [[] for _ in range(lvl + 1)] for lvl in self.levels
        ]
        for i in range(n):
            self._insert(i)
        return self

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int, lev: int):
        """Paper Alg. 2: best-first beam, bounded result heap. Returns
        [(dist, idx)] sorted ascending; ties break on idx (determinism)."""
        dists = self._dist_many(q, eps)
        visited = set(eps)
        cand = [(float(d), int(e)) for d, e in zip(dists, eps)]
        heapq.heapify(cand)
        result = [(-d, e) for d, e in cand]
        heapq.heapify(result)
        while len(result) > ef:
            heapq.heappop(result)
        while cand:
            d, c = heapq.heappop(cand)
            if d > -result[0][0] and len(result) >= ef:
                break
            fresh = [e for e in self.neighbors[c][lev] if e not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            for dn, e in zip(self._dist_many(q, fresh), fresh):
                dn = float(dn)
                if len(result) < ef or dn < -result[0][0]:
                    heapq.heappush(cand, (dn, e))
                    heapq.heappush(result, (-dn, e))
                    if len(result) > ef:
                        heapq.heappop(result)
        return sorted((-nd, e) for nd, e in result)

    def _select_heuristic(self, cands, m: int) -> list[int]:
        """Paper Alg. 4 / hnswlib getNeighborsByHeuristic2: keep a
        candidate only if it is closer to the query than to every
        already-kept neighbor."""
        kept: list[int] = []
        for d, e in cands:  # ascending distance
            if len(kept) >= m:
                break
            if not kept:
                kept.append(e)
                continue
            d_to_kept = self._dist_many(self.vecs[e], kept)
            if (d_to_kept > d).all():
                kept.append(e)
        return kept

    def _insert(self, i: int) -> None:
        level = self.levels[i]
        if self.entry < 0:
            self.entry = i
            self.max_level = level
            return
        q = self.vecs[i]
        ep = [self.entry]
        for lev in range(self.max_level, level, -1):
            ep = [self._search_layer(q, ep, 1, lev)[0][1]]
        for lev in range(min(level, self.max_level), -1, -1):
            found = self._search_layer(q, ep, self.ef_construction, lev)
            mmax = self.m0 if lev == 0 else self.m
            sel = self._select_heuristic(found, self.m)
            self.neighbors[i][lev] = list(sel)
            for e in sel:
                nb = self.neighbors[e][lev]
                nb.append(i)
                if len(nb) > mmax:  # overflow: re-prune with the heuristic
                    d_nb = self._dist_many(self.vecs[e], nb)
                    ranked = sorted(zip(d_nb, nb), key=lambda t: (t[0], t[1]))
                    self.neighbors[e][lev] = self._select_heuristic(ranked, mmax)
            ep = [e for _, e in found]
        if level > self.max_level:
            self.max_level = level
            self.entry = i

    # -- query ---------------------------------------------------------------

    def search(self, q: np.ndarray, k: int, ef: int = 50):
        """(ids, dists) of the approximate k nearest, ascending distance,
        ties on id — the knn_query contract (executor.py:112)."""
        if self.entry < 0:
            return np.array([], np.int64), np.array([], np.float64)
        q = np.asarray(q, np.float64)
        if self.metric == "cosine":
            n = np.linalg.norm(q)
            if n > 0:
                q = q / n
        ep = [self.entry]
        for lev in range(self.max_level, 0, -1):
            ep = [self._search_layer(q, ep, 1, lev)[0][1]]
        found = self._search_layer(q, ep, max(ef, k), 0)[:k]
        idx = [e for _, e in found]
        return self.ids[idx], np.array([d for d, _ in found], np.float64)

    def search_batch(self, qmat: np.ndarray, k: int, ef: int = 50):
        """Batch form of search: returns (query_row, id, dist) arrays."""
        rows, out_ids, out_d = [], [], []
        for r in range(len(qmat)):
            ids, ds = self.search(qmat[r], k, ef)
            rows.extend([r] * len(ids))
            out_ids.extend(ids.tolist())
            out_d.extend(ds.tolist())
        return (
            np.array(rows, np.int64),
            np.array(out_ids, np.int64),
            np.array(out_d, np.float64),
        )
