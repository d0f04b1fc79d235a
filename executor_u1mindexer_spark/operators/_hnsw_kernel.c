/* C build/search kernel for the deterministic HNSW (operators/hnsw.py).
 *
 * WHY THIS EXISTS (VERDICT r05 #2): the pure-Python build loop pays
 * ~5-10us of interpreter/numpy-dispatch tax per neighbor expansion;
 * at a realistic 50k-1M-row bucket that is minutes-to-hours per
 * partition. This file is the SAME algorithm with the tax removed.
 *
 * BIT-IDENTITY CONTRACT: every floating-point operation is routed
 * through the numpy-bundled OpenBLAS, called with EXACTLY the shapes
 * the Python kernel produces — a (k x dim) row gather fed to
 * cblas_dgemv for k >= 2, cblas_ddot for k == 1 (numpy dispatches
 * 1-row matvec to ddot; measured, and the two differ in the last ulp
 * for some dims), gather buffers 64-byte aligned (dgemv kernel
 * selection is A-alignment-sensitive; measured). The subsequent
 * `1.0 - y` is a single IEEE op. Heap pop order is fully determined
 * by the (dist, id) comparator because entries are unique, so any
 * correct binary heap reproduces Python heapq's sequence.
 *
 * l2 (r07, closing the r06 gate): the squared-euclidean distance is
 * computed by the EXPLICITLY ORDERED expansion
 *     d = (sq[x] - 2.0*dot(x, q)) + sq[q]
 * where sq[] are per-node squared norms PRECOMPUTED ONCE in Python and
 * passed in (both kernels consume the same bits, so how they were
 * produced is irrelevant to bit-identity), dot() is the same
 * dgemv/ddot call the cosine path makes, 2.0*dot is an exact power-of-
 * two scaling, and the two remaining ops are single IEEE add/subs in a
 * pinned order. The Python kernel computes the identical elementwise
 * expression — no einsum reduction anywhere in the distance path.
 *
 * The function pointers for cblas_dgemv64_/cblas_ddot64_ (the ILP64
 * symbols of numpy's bundled OpenBLAS) are resolved in Python via
 * ctypes and passed in, so this file links against nothing.
 *
 * Algorithm parity: Malkov & Yashunin, arXiv:1603.09320 (Alg. 2 beam
 * search, Alg. 4 selection heuristic), as implemented in hnsw.py —
 * reference parity notes live there (executor.py:49, 66-70, 112).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef void (*dgemv_t)(int order, int trans, int64_t m, int64_t n,
                        double alpha, const double *a, int64_t lda,
                        const double *x, int64_t incx, double beta,
                        double *y, int64_t incy);
typedef double (*ddot_t)(int64_t n, const double *x, int64_t incx,
                         const double *y, int64_t incy);

#define CBLAS_ROW_MAJOR 101
#define CBLAS_NO_TRANS 111

typedef struct {
    double d;
    int64_t e;
} Ent;

/* min order: (d, e) ascending — Python heapq over (dist, id) */
static inline int lt_min(const Ent *a, const Ent *b) {
    return a->d < b->d || (a->d == b->d && a->e < b->e);
}
/* result-heap order: pops LARGEST d first (tie: smallest e) — Python
 * heapq over (-dist, id) */
static inline int lt_res(const Ent *a, const Ent *b) {
    return a->d > b->d || (a->d == b->d && a->e < b->e);
}

static void push_min(Ent *h, int64_t *n, Ent v) {
    int64_t i = (*n)++;
    h[i] = v;
    while (i > 0) {
        int64_t p = (i - 1) >> 1;
        if (lt_min(&h[i], &h[p])) {
            Ent t = h[i];
            h[i] = h[p];
            h[p] = t;
            i = p;
        } else
            break;
    }
}

static Ent pop_min(Ent *h, int64_t *n) {
    Ent top = h[0];
    h[0] = h[--(*n)];
    int64_t i = 0;
    for (;;) {
        int64_t l = 2 * i + 1, r = l + 1, s = i;
        if (l < *n && lt_min(&h[l], &h[s])) s = l;
        if (r < *n && lt_min(&h[r], &h[s])) s = r;
        if (s == i) break;
        Ent t = h[i];
        h[i] = h[s];
        h[s] = t;
        i = s;
    }
    return top;
}

static void push_res(Ent *h, int64_t *n, Ent v) {
    int64_t i = (*n)++;
    h[i] = v;
    while (i > 0) {
        int64_t p = (i - 1) >> 1;
        if (lt_res(&h[i], &h[p])) {
            Ent t = h[i];
            h[i] = h[p];
            h[p] = t;
            i = p;
        } else
            break;
    }
}

static void pop_res(Ent *h, int64_t *n) {
    h[0] = h[--(*n)];
    int64_t i = 0;
    for (;;) {
        int64_t l = 2 * i + 1, r = l + 1, s = i;
        if (l < *n && lt_res(&h[l], &h[s])) s = l;
        if (r < *n && lt_res(&h[r], &h[s])) s = r;
        if (s == i) break;
        Ent t = h[i];
        h[i] = h[s];
        h[s] = t;
        i = s;
    }
}

static int cmp_asc(const void *pa, const void *pb) {
    const Ent *a = (const Ent *)pa, *b = (const Ent *)pb;
    if (a->d < b->d) return -1;
    if (a->d > b->d) return 1;
    if (a->e < b->e) return -1;
    if (a->e > b->e) return 1;
    return 0;
}

typedef struct {
    int64_t n, dim, m, m0;
    const double *vecs;
    const double *sq; /* per-node squared norms (l2 only) */
    int64_t is_l2;
    int64_t *nbr;
    const int64_t *noff;
    int64_t *cnt;
    const int64_t *coff;
    int64_t *stamp;
    int64_t gen;
    dgemv_t dgemv;
    ddot_t ddot;
    /* scratch */
    double *gbuf;  /* maxrows x dim row gather, 64B aligned */
    double *ybuf;  /* maxrows: raw dot products */
    double *dbuf;  /* maxrows: 1 - dot distances */
    double *kbuf;  /* (m0 x dim) kept rows for the selection heuristic */
    int64_t *fresh;
    int64_t *eplist;
    Ent *found;
    Ent *rank;
    int64_t *selbuf, *selbuf2;
    Ent *cand, *res;
    int64_t maxrows;
} Ctx;

static inline int64_t *nbr_block(Ctx *c, int64_t node, int64_t lev) {
    int64_t off = c->noff[node];
    if (lev == 0) return c->nbr + off;
    return c->nbr + off + (c->m0 + 1) + (lev - 1) * (c->m + 1);
}

static inline int64_t *cnt_at(Ctx *c, int64_t node, int64_t lev) {
    return c->cnt + c->coff[node] + lev;
}

/* distances against q with numpy's exact dispatch: ddot for a single
 * row, dgemv on a 64B-aligned contiguous gather otherwise. cosine/ip:
 * 1 - dot; l2: (sq[x] - 2.0*dot) + qq, the pinned-order expansion. */
static void dist_batch(Ctx *c, const double *q, double qq,
                       const int64_t *idxs, int64_t k, double *out) {
    if (k == 1) {
        double y = c->ddot(c->dim, c->vecs + idxs[0] * c->dim, 1, q, 1);
        out[0] = c->is_l2 ? (c->sq[idxs[0]] - 2.0 * y) + qq : 1.0 - y;
        return;
    }
    for (int64_t i = 0; i < k; i++)
        memcpy(c->gbuf + i * c->dim, c->vecs + idxs[i] * c->dim,
               c->dim * sizeof(double));
    c->dgemv(CBLAS_ROW_MAJOR, CBLAS_NO_TRANS, k, c->dim, 1.0, c->gbuf,
             c->dim, q, 1, 0.0, c->ybuf, 1);
    if (c->is_l2)
        for (int64_t i = 0; i < k; i++)
            out[i] = (c->sq[idxs[i]] - 2.0 * c->ybuf[i]) + qq;
    else
        for (int64_t i = 0; i < k; i++) out[i] = 1.0 - c->ybuf[i];
}

/* Paper Alg. 2 — mirrors hnsw.py _search_layer: same entry batch, same
 * full-unvisited-adjacency distance batches, same admission checks.
 * Returns results sorted ascending (d, e) in `out`. */
static int64_t search_layer(Ctx *c, const double *q, double qq,
                            const int64_t *eps, int64_t neps, int64_t ef,
                            int64_t lev, Ent *out) {
    c->gen++;
    int64_t gen = c->gen;
    for (int64_t i = 0; i < neps; i++) c->stamp[eps[i]] = gen;
    dist_batch(c, q, qq, eps, neps, c->dbuf);
    int64_t ncand = 0, nres = 0;
    for (int64_t i = 0; i < neps; i++) {
        Ent v = {c->dbuf[i], eps[i]};
        push_min(c->cand, &ncand, v);
        push_res(c->res, &nres, v);
    }
    while (nres > ef) pop_res(c->res, &nres);
    while (ncand) {
        Ent t = pop_min(c->cand, &ncand);
        if (t.d > c->res[0].d && nres >= ef) break;
        int64_t k = *cnt_at(c, t.e, lev);
        if (!k) continue;
        const int64_t *nb = nbr_block(c, t.e, lev);
        int64_t nf = 0;
        for (int64_t j = 0; j < k; j++) {
            int64_t e = nb[j];
            if (c->stamp[e] != gen) {
                c->stamp[e] = gen;
                c->fresh[nf++] = e;
            }
        }
        if (!nf) continue;
        dist_batch(c, q, qq, c->fresh, nf, c->dbuf);
        for (int64_t j = 0; j < nf; j++) {
            double dn = c->dbuf[j];
            if (nres < ef || dn < c->res[0].d) {
                Ent v = {dn, c->fresh[j]};
                push_min(c->cand, &ncand, v);
                push_res(c->res, &nres, v);
                if (nres > ef) pop_res(c->res, &nres);
            }
        }
    }
    memcpy(out, c->res, nres * sizeof(Ent));
    qsort(out, nres, sizeof(Ent), cmp_asc);
    return nres;
}

/* Paper Alg. 4 — mirrors hnsw.py _select_heuristic: kept rows accumulate
 * in kbuf; each check is one (nk x dim) product (ddot when nk == 1). */
static int64_t select_heuristic(Ctx *c, const Ent *cands, int64_t ncand,
                                int64_t mlimit, int64_t *kept) {
    int64_t nk = 0;
    for (int64_t j = 0; j < ncand && nk < mlimit; j++) {
        double d = cands[j].d;
        int64_t e = cands[j].e;
        const double *row = c->vecs + e * c->dim;
        if (nk == 0) {
            kept[0] = e;
            memcpy(c->kbuf, row, c->dim * sizeof(double));
            nk = 1;
            continue;
        }
        int ok = 1;
        if (nk == 1) {
            double y = c->ddot(c->dim, c->kbuf, 1, row, 1);
            double dd = c->is_l2 ? (c->sq[kept[0]] - 2.0 * y) + c->sq[e]
                                 : 1.0 - y;
            if (!(dd > d)) ok = 0;
        } else {
            c->dgemv(CBLAS_ROW_MAJOR, CBLAS_NO_TRANS, nk, c->dim, 1.0,
                     c->kbuf, c->dim, row, 1, 0.0, c->ybuf, 1);
            for (int64_t i = 0; i < nk; i++) {
                double dd = c->is_l2
                                ? (c->sq[kept[i]] - 2.0 * c->ybuf[i]) + c->sq[e]
                                : 1.0 - c->ybuf[i];
                if (!(dd > d)) {
                    ok = 0;
                    break;
                }
            }
        }
        if (ok) {
            memcpy(c->kbuf + nk * c->dim, row, c->dim * sizeof(double));
            kept[nk++] = e;
        }
    }
    return nk;
}

static void insert_node(Ctx *c, int64_t i, const int64_t *levels,
                        int64_t efc, int64_t *entry, int64_t *max_level) {
    int64_t level = levels[i];
    if (*entry < 0) {
        *entry = i;
        *max_level = level;
        return;
    }
    const double *q = c->vecs + i * c->dim;
    double qq = c->is_l2 ? c->sq[i] : 0.0;
    c->eplist[0] = *entry;
    int64_t nep = 1;
    for (int64_t lev = *max_level; lev > level; lev--) {
        search_layer(c, q, qq, c->eplist, nep, 1, lev, c->found);
        c->eplist[0] = c->found[0].e;
        nep = 1;
    }
    int64_t start = level < *max_level ? level : *max_level;
    for (int64_t lev = start; lev >= 0; lev--) {
        int64_t nfound =
            search_layer(c, q, qq, c->eplist, nep, efc, lev, c->found);
        int64_t mmax = lev == 0 ? c->m0 : c->m;
        int64_t nsel = select_heuristic(c, c->found, nfound, c->m, c->selbuf);
        int64_t *mine = nbr_block(c, i, lev);
        memcpy(mine, c->selbuf, nsel * sizeof(int64_t));
        *cnt_at(c, i, lev) = nsel;
        for (int64_t s = 0; s < nsel; s++) {
            int64_t e = c->selbuf[s];
            int64_t *blk = nbr_block(c, e, lev);
            int64_t ke = *cnt_at(c, e, lev);
            blk[ke++] = i;
            if (ke > mmax) { /* overflow: re-prune with the heuristic */
                dist_batch(c, c->vecs + e * c->dim,
                           c->is_l2 ? c->sq[e] : 0.0, blk, ke, c->dbuf);
                for (int64_t j = 0; j < ke; j++) {
                    c->rank[j].d = c->dbuf[j];
                    c->rank[j].e = blk[j];
                }
                qsort(c->rank, ke, sizeof(Ent), cmp_asc);
                int64_t np = select_heuristic(c, c->rank, ke, mmax, c->selbuf2);
                memcpy(blk, c->selbuf2, np * sizeof(int64_t));
                *cnt_at(c, e, lev) = np;
            } else {
                *cnt_at(c, e, lev) = ke;
            }
        }
        for (int64_t j = 0; j < nfound; j++) c->eplist[j] = c->found[j].e;
        nep = nfound;
    }
    if (level > *max_level) {
        *max_level = level;
        *entry = i;
    }
}

static int ctx_init(Ctx *c, int64_t n, int64_t dim, int64_t m, int64_t m0,
                    int64_t maxrows, const double *vecs, const double *sq,
                    int64_t is_l2, int64_t *nbr, const int64_t *noff,
                    int64_t *cnt, const int64_t *coff, void *dgemv_f,
                    void *ddot_f) {
    memset(c, 0, sizeof(*c));
    c->n = n;
    c->dim = dim;
    c->m = m;
    c->m0 = m0;
    c->vecs = vecs;
    c->sq = sq;
    c->is_l2 = is_l2;
    c->nbr = nbr;
    c->noff = noff;
    c->cnt = cnt;
    c->coff = coff;
    c->dgemv = (dgemv_t)dgemv_f;
    c->ddot = (ddot_t)ddot_f;
    c->maxrows = maxrows;
    c->stamp = calloc(n, sizeof(int64_t));
    c->gbuf = aligned_alloc(64, ((maxrows * dim * 8 + 63) / 64) * 64);
    c->kbuf = aligned_alloc(64, (((m0 + 1) * dim * 8 + 63) / 64) * 64);
    c->ybuf = malloc(maxrows * sizeof(double));
    c->dbuf = malloc(maxrows * sizeof(double));
    c->fresh = malloc((m0 + 2) * sizeof(int64_t));
    c->eplist = malloc(maxrows * sizeof(int64_t));
    c->found = malloc(maxrows * sizeof(Ent));
    c->rank = malloc((m0 + 2) * sizeof(Ent));
    c->selbuf = malloc((m0 + 2) * sizeof(int64_t));
    c->selbuf2 = malloc((m0 + 2) * sizeof(int64_t));
    c->cand = malloc((n + maxrows + 8) * sizeof(Ent));
    c->res = malloc((maxrows + 2) * sizeof(Ent));
    if (!c->stamp || !c->gbuf || !c->kbuf || !c->ybuf || !c->dbuf ||
        !c->fresh || !c->eplist || !c->found || !c->rank || !c->selbuf ||
        !c->selbuf2 || !c->cand || !c->res)
        return -1;
    return 0;
}

static void ctx_free(Ctx *c) {
    free(c->stamp);
    free(c->gbuf);
    free(c->kbuf);
    free(c->ybuf);
    free(c->dbuf);
    free(c->fresh);
    free(c->eplist);
    free(c->found);
    free(c->rank);
    free(c->selbuf);
    free(c->selbuf2);
    free(c->cand);
    free(c->res);
}

/* Build the full graph. vecs already ordered/normalized by the Python
 * wrapper; adjacency + counts are written into the numpy-owned flat
 * arrays. entry_maxlev receives [entry, max_level]. Returns 0 on
 * success, -1 on allocation failure. */
int hnsw_build(int64_t n, int64_t dim, const double *vecs, const double *sq,
               int64_t is_l2, const int64_t *levels, int64_t m, int64_t m0,
               int64_t efc, int64_t *nbr, const int64_t *noff, int64_t *cnt,
               const int64_t *coff, int64_t *entry_maxlev, void *dgemv_f,
               void *ddot_f) {
    Ctx c;
    int64_t maxrows = efc + m0 + 8;
    if (ctx_init(&c, n, dim, m, m0, maxrows, vecs, sq, is_l2, nbr, noff, cnt,
                 coff, dgemv_f, ddot_f))
        return -1;
    int64_t entry = -1, max_level = -1;
    for (int64_t i = 0; i < n; i++)
        insert_node(&c, i, levels, efc, &entry, &max_level);
    entry_maxlev[0] = entry;
    entry_maxlev[1] = max_level;
    ctx_free(&c);
    return 0;
}

/* Batch search over a built graph. qmat rows already normalized by the
 * wrapper. Writes up to nq*k (row, internal-idx, dist) triples; returns
 * the number written, or -1 on allocation failure. */
int64_t hnsw_search_batch(int64_t n, int64_t dim, const double *vecs,
                          const double *sq, int64_t is_l2, int64_t m,
                          int64_t m0, int64_t *nbr, const int64_t *noff,
                          int64_t *cnt, const int64_t *coff, int64_t entry,
                          int64_t max_level, const double *qmat, int64_t nq,
                          int64_t k, int64_t ef, int64_t *out_rows,
                          int64_t *out_idx, double *out_dist, void *dgemv_f,
                          void *ddot_f) {
    if (entry < 0) return 0;
    Ctx c;
    int64_t efq = ef > k ? ef : k;
    int64_t maxrows = efq + m0 + 8;
    if (ctx_init(&c, n, dim, m, m0, maxrows, vecs, sq, is_l2, nbr, noff, cnt,
                 coff, dgemv_f, ddot_f))
        return -1;
    int64_t t = 0;
    for (int64_t r = 0; r < nq; r++) {
        const double *q = qmat + r * dim;
        /* numpy's np.dot(q, q) on the Python side is the same ddot */
        double qq = is_l2 ? c.ddot(dim, q, 1, q, 1) : 0.0;
        c.eplist[0] = entry;
        for (int64_t lev = max_level; lev > 0; lev--) {
            search_layer(&c, q, qq, c.eplist, 1, 1, lev, c.found);
            c.eplist[0] = c.found[0].e;
        }
        int64_t nf = search_layer(&c, q, qq, c.eplist, 1, efq, 0, c.found);
        int64_t kk = nf < k ? nf : k;
        for (int64_t j = 0; j < kk; j++) {
            out_rows[t] = r;
            out_idx[t] = c.found[j].e;
            out_dist[t] = c.found[j].d;
            t++;
        }
    }
    ctx_free(&c);
    return t;
}
