"""Optional compiled kernel for the HNSW construction beam walk.

The per-insertion ef-beam (search_layer) is the per-shard cost floor of
HNSW construction: profiling shows >85% of build wall is numpy-call and
heap overhead inside that loop, not arithmetic. This module compiles a
~100-line C implementation of the SAME walk (greedy beam with cand
min-heap / best max-heap, identical admission and termination rules) at
first use with the system C compiler and loads it through ctypes.

Strictly an optimization seam: no algorithm change, no new dependency —
when no compiler/headers are available (or the compile fails for any
reason) ``load()`` returns None and callers keep the pure-numpy path.
Graphs built by the two paths can differ in float last-ulp tie-breaks
(C accumulates dot products sequentially, numpy pairwise); correctness
is recall-gated, not bit-pinned (tests/test_hnsw.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_C_SRC = r"""
#include <stdint.h>
#include <stdlib.h>

typedef struct { float d; int32_t id; } pair_t;

/* min-heap on d (cand) */
static void mh_push(pair_t *h, int *sz, float d, int32_t id) {
    int i = (*sz)++;
    while (i > 0) {
        int p = (i - 1) >> 1;
        if (h[p].d <= d) break;
        h[i] = h[p]; i = p;
    }
    h[i].d = d; h[i].id = id;
}
static pair_t mh_pop(pair_t *h, int *sz) {
    pair_t top = h[0];
    pair_t last = h[--(*sz)];
    int i = 0, n = *sz;
    for (;;) {
        int l = 2 * i + 1, r = l + 1, m = i;
        float md = last.d;
        if (l < n && h[l].d < md) { m = l; md = h[l].d; }
        if (r < n && h[r].d < md) { m = r; }
        if (m == i) break;
        h[i] = h[m]; i = m;
    }
    h[i] = last;
    return top;
}
/* max-heap on d (best) */
static void xh_push(pair_t *h, int *sz, float d, int32_t id) {
    int i = (*sz)++;
    while (i > 0) {
        int p = (i - 1) >> 1;
        if (h[p].d >= d) break;
        h[i] = h[p]; i = p;
    }
    h[i].d = d; h[i].id = id;
}
static void xh_pop(pair_t *h, int *sz) {
    pair_t last = h[--(*sz)];
    int i = 0, n = *sz;
    for (;;) {
        int l = 2 * i + 1, r = l + 1, m = i;
        float md = last.d;
        if (l < n && h[l].d > md) { m = l; md = h[l].d; }
        if (r < n && h[r].d > md) { m = r; }
        if (m == i) break;
        h[i] = h[m]; i = m;
    }
    h[i] = last;
}

static float dist_to(const float *V, int d, int32_t i, const float *q) {
    const float *v = V + (int64_t)i * d;
    float acc = 0.0f;
    for (int j = 0; j < d; j++) acc += v[j] * q[j];
    return 1.0f - acc;
}

static int cmp_pair(const void *a, const void *b) {
    const pair_t *x = (const pair_t *)a, *y = (const pair_t *)b;
    if (x->d < y->d) return -1;
    if (x->d > y->d) return 1;
    if (x->id < y->id) return -1;
    if (x->id > y->id) return 1;
    return 0;
}

/* One ef-beam at a single level over the fixed-capacity neighbor matrix.
   Returns the number of results written to out (ascending distance). */
int search_layer(const float *V, int d, int64_t n,
                 const int32_t *nbrmat, const int32_t *counts, int cap,
                 const float *q, int32_t entry, int ef,
                 int64_t *stamp, int64_t epoch,
                 int32_t *out_ids, float *out_d) {
    pair_t *cand = (pair_t *)malloc(sizeof(pair_t) * 64);
    int cand_cap = 64, cand_sz = 0;
    pair_t *best = (pair_t *)malloc(sizeof(pair_t) * (ef + 1));
    int best_sz = 0;

    stamp[entry] = epoch;
    float d0 = dist_to(V, d, entry, q);
    mh_push(cand, &cand_sz, d0, entry);
    xh_push(best, &best_sz, d0, entry);

    while (cand_sz > 0) {
        pair_t c = mh_pop(cand, &cand_sz);
        if (c.d > best[0].d) break;
        int cnt = counts[c.id];
        const int32_t *nb = nbrmat + (int64_t)c.id * cap;
        for (int t = 0; t < cnt; t++) {
            int32_t e = nb[t];
            if (stamp[e] == epoch) continue;
            stamp[e] = epoch;
            float de = dist_to(V, d, e, q);
            if (best_sz < ef || de < best[0].d) {
                if (cand_sz + 1 > cand_cap) {
                    cand_cap *= 2;
                    cand = (pair_t *)realloc(cand, sizeof(pair_t) * cand_cap);
                }
                mh_push(cand, &cand_sz, de, e);
                xh_push(best, &best_sz, de, e);
                if (best_sz > ef) xh_pop(best, &best_sz);
            }
        }
    }
    qsort(best, best_sz, sizeof(pair_t), cmp_pair);
    for (int i = 0; i < best_sz; i++) {
        out_ids[i] = best[i].id;
        out_d[i] = best[i].d;
    }
    free(cand);
    free(best);
    return best_sz;
}

/* Greedy single-best descent used on the upper layers. Writes the new
   entry id and its distance; returns 0. */
int greedy_step(const float *V, int d,
                const int32_t *nbrmat, const int32_t *counts, int cap,
                const float *q, int32_t entry, float entry_dist,
                int32_t *out_id, float *out_d) {
    int32_t ep = entry;
    float dep = entry_dist;
    for (;;) {
        int cnt = counts[ep];
        if (cnt == 0) break;
        const int32_t *nb = nbrmat + (int64_t)ep * cap;
        int32_t bi = -1;
        float bd = dep;
        for (int t = 0; t < cnt; t++) {
            float de = dist_to(V, d, nb[t], q);
            if (de < bd) { bd = de; bi = nb[t]; }
        }
        if (bi < 0) break;
        dep = bd; ep = bi;
    }
    *out_id = ep;
    *out_d = dep;
    return 0;
}
"""

_lib = None
_tried = False


def load():
    """The compiled kernel (ctypes CDLL) or None when unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        h = hashlib.sha1(_C_SRC.encode()).hexdigest()[:16]
        d = os.path.join(tempfile.gettempdir(), f"lucene_spark_hnswc_{h}")
        so = os.path.join(d, "hnswc.so")
        if not os.path.exists(so):
            os.makedirs(d, exist_ok=True)
            src = os.path.join(d, "hnswc.c")
            with open(src, "w") as f:
                f.write(_C_SRC)
            tmp = os.path.join(d, f"hnswc_{os.getpid()}.so")
            subprocess.run(
                ["cc", "-O3", "-fPIC", "-shared", "-o", tmp, src],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)  # atomic: concurrent workers race safely
        lib = ctypes.CDLL(so)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.search_layer.restype = ctypes.c_int
        lib.search_layer.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int64,
            i32p, i32p, ctypes.c_int,
            f32p, ctypes.c_int32, ctypes.c_int,
            i64p, ctypes.c_int64,
            i32p, f32p,
        ]
        lib.greedy_step.restype = ctypes.c_int
        lib.greedy_step.argtypes = [
            f32p, ctypes.c_int,
            i32p, i32p, ctypes.c_int,
            f32p, ctypes.c_int32, ctypes.c_float,
            i32p, f32p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
