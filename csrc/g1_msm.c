/* Native host kernels: BLS12-377 Fq Montgomery arithmetic + G1 Pippenger MSM.
 *
 * The TPU-native replacement for the reference's native CPU/CUDA layer
 * (blst + sppark, algorithms/cuda/): the accelerator runs the batched
 * limb-plane kernels; this library covers the host-side runtime (SRS
 * setup, KZG commits, verifier accumulation) where Python-int EC math
 * would dominate. CIOS Montgomery multiplication over 6x64 limbs with
 * __int128 accumulators; Jacobian double/add; windowed Pippenger.
 *
 * ABI (ctypes, see snarkvm_tpu/utils/native.py):
 *   void g1_msm(const uint64_t *xs, const uint64_t *ys, const uint8_t *inf,
 *               const uint64_t *scalars, size_t n, size_t scalar_words,
 *               uint64_t *out)   -- out: 18 words, X,Y,Z canonical Jacobian
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>
#include <stdlib.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

#define NL 6  /* number of 64-bit limbs in Fq */

/* BLS12-377 base field modulus (little-endian u64 limbs) */
static const u64 Q[NL] = {
    0x8508c00000000001ULL, 0x170b5d4430000000ULL, 0x1ef3622fba094800ULL,
    0x1a22d9f300f5138fULL, 0xc63b05c06ca1493bULL, 0x01ae3a4617c510eaULL,
};
/* -Q^{-1} mod 2^64 */
static const u64 Q_INV = 0x8508bfffffffffffULL;
/* R^2 mod Q (R = 2^384) */
static const u64 R2[NL] = {
    0xb786686c9400cd22ULL, 0x0329fcaab00431b1ULL, 0x22a5f11162d6b46dULL,
    0xbfdf7d03827dc3acULL, 0x837e92f041790bf9ULL, 0x006dfccb1e914b88ULL,
};
/* 1 in Montgomery form: R mod Q */
static const u64 R1[NL] = {
    0x02cdffffffffff68ULL, 0x51409f837fffffb1ULL, 0x9f7db3a98a7d3ff2ULL,
    0x7b4e97b76e7c6305ULL, 0x4cf495bf803c84e8ULL, 0x008d6661e2fdf49aULL,
};

typedef struct { u64 v[NL]; } fq;

static inline int fq_is_zero(const fq *a) {
    u64 acc = 0;
    for (int i = 0; i < NL; i++) acc |= a->v[i];
    return acc == 0;
}

static inline int fq_gte_q(const fq *a) {
    for (int i = NL - 1; i >= 0; i--) {
        if (a->v[i] > Q[i]) return 1;
        if (a->v[i] < Q[i]) return 0;
    }
    return 1;
}

static inline void fq_sub_q(fq *a) {
    u128 borrow = 0;
    for (int i = 0; i < NL; i++) {
        u128 t = (u128)a->v[i] - Q[i] - borrow;
        a->v[i] = (u64)t;
        borrow = (t >> 64) ? 1 : 0;
    }
}

static inline void fq_add(fq *out, const fq *a, const fq *b) {
    u128 carry = 0;
    for (int i = 0; i < NL; i++) {
        u128 t = (u128)a->v[i] + b->v[i] + carry;
        out->v[i] = (u64)t;
        carry = t >> 64;
    }
    if (carry || fq_gte_q(out)) fq_sub_q(out);
}

static inline void fq_sub(fq *out, const fq *a, const fq *b) {
    u128 borrow = 0;
    fq t;
    for (int i = 0; i < NL; i++) {
        u128 d = (u128)a->v[i] - b->v[i] - borrow;
        t.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < NL; i++) {
            u128 s = (u128)t.v[i] + Q[i] + carry;
            t.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
    *out = t;
}

/* CIOS Montgomery multiplication */
static void fq_mul(fq *out, const fq *a, const fq *b) {
    u64 t[NL + 2];
    memset(t, 0, sizeof(t));
    for (int i = 0; i < NL; i++) {
        u128 carry = 0;
        for (int j = 0; j < NL; j++) {
            u128 s = (u128)t[j] + (u128)a->v[i] * b->v[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[NL] + carry;
        t[NL] = (u64)s;
        t[NL + 1] = (u64)(s >> 64);

        u64 m = t[0] * Q_INV;
        carry = ((u128)t[0] + (u128)m * Q[0]) >> 64;
        for (int j = 1; j < NL; j++) {
            u128 s2 = (u128)t[j] + (u128)m * Q[j] + carry;
            t[j - 1] = (u64)s2;
            carry = s2 >> 64;
        }
        s = (u128)t[NL] + carry;
        t[NL - 1] = (u64)s;
        t[NL] = t[NL + 1] + (u64)(s >> 64);
        t[NL + 1] = 0;
    }
    fq r;
    memcpy(r.v, t, sizeof(r.v));
    if (t[NL] || fq_gte_q(&r)) fq_sub_q(&r);
    *out = r;
}

static inline void fq_dbl(fq *out, const fq *a) { fq_add(out, a, a); }

static void fq_to_mont(fq *out, const fq *a) {
    fq r2; memcpy(r2.v, R2, sizeof(R2));
    fq_mul(out, a, &r2);
}

static void fq_from_mont(fq *out, const fq *a) {
    fq one; memset(one.v, 0, sizeof(one.v)); one.v[0] = 1;
    fq_mul(out, a, &one);
}

/* ---- G1 Jacobian (a=0) ---- */
typedef struct { fq X, Y, Z; } g1;

static void g1_set_inf(g1 *p) {
    memcpy(p->X.v, R1, sizeof(R1));
    memcpy(p->Y.v, R1, sizeof(R1));
    memset(p->Z.v, 0, sizeof(p->Z.v));
}

static inline int g1_is_inf(const g1 *p) { return fq_is_zero(&p->Z); }

static void g1_double(g1 *out, const g1 *p) {
    if (g1_is_inf(p)) { *out = *p; return; }
    fq A, B, C, D, E, F, t, X3, Y3, Z3;
    fq_mul(&A, &p->X, &p->X);
    fq_mul(&B, &p->Y, &p->Y);
    fq_mul(&C, &B, &B);
    fq_add(&t, &p->X, &B);
    fq_mul(&t, &t, &t);
    fq_sub(&t, &t, &A);
    fq_sub(&t, &t, &C);
    fq_dbl(&D, &t);
    fq_dbl(&E, &A); fq_add(&E, &E, &A);
    fq_mul(&F, &E, &E);
    fq_dbl(&t, &D);
    fq_sub(&X3, &F, &t);
    fq_sub(&t, &D, &X3);
    fq_mul(&Y3, &E, &t);
    fq c8; fq_dbl(&c8, &C); fq_dbl(&c8, &c8); fq_dbl(&c8, &c8);
    fq_sub(&Y3, &Y3, &c8);
    fq_mul(&Z3, &p->Y, &p->Z);
    fq_dbl(&Z3, &Z3);
    out->X = X3; out->Y = Y3; out->Z = Z3;
}

static void g1_add(g1 *out, const g1 *p, const g1 *q) {
    if (g1_is_inf(p)) { *out = *q; return; }
    if (g1_is_inf(q)) { *out = *p; return; }
    fq Z1Z1, Z2Z2, U1, U2, S1, S2, H, r, I, J, V, t, X3, Y3, Z3;
    fq_mul(&Z1Z1, &p->Z, &p->Z);
    fq_mul(&Z2Z2, &q->Z, &q->Z);
    fq_mul(&U1, &p->X, &Z2Z2);
    fq_mul(&U2, &q->X, &Z1Z1);
    fq_mul(&S1, &p->Y, &q->Z); fq_mul(&S1, &S1, &Z2Z2);
    fq_mul(&S2, &q->Y, &p->Z); fq_mul(&S2, &S2, &Z1Z1);
    fq_sub(&H, &U2, &U1);
    fq_sub(&r, &S2, &S1);
    if (fq_is_zero(&H)) {
        if (fq_is_zero(&r)) { g1_double(out, p); return; }
        g1_set_inf(out); return;
    }
    fq_dbl(&t, &H);
    fq_mul(&I, &t, &t);
    fq_mul(&J, &H, &I);
    fq_dbl(&r, &r);
    fq_mul(&V, &U1, &I);
    fq_mul(&X3, &r, &r);
    fq_sub(&X3, &X3, &J);
    fq_dbl(&t, &V);
    fq_sub(&X3, &X3, &t);
    fq_sub(&t, &V, &X3);
    fq_mul(&Y3, &r, &t);
    fq_mul(&t, &S1, &J);
    fq_dbl(&t, &t);
    fq_sub(&Y3, &Y3, &t);
    fq_add(&Z3, &p->Z, &q->Z);
    fq_mul(&Z3, &Z3, &Z3);
    fq_sub(&Z3, &Z3, &Z1Z1);
    fq_sub(&Z3, &Z3, &Z2Z2);
    fq_mul(&Z3, &Z3, &H);
    out->X = X3; out->Y = Y3; out->Z = Z3;
}

/* ---- Pippenger MSM (window-parallel over pthreads) ---- */
#include <pthread.h>
#include <unistd.h>

typedef struct {
    const g1 *pts;
    const u64 *scalars;
    size_t n, scalar_words, windows;
    int c;
    g1 *window_sums;        /* one per window */
    size_t next_window;     /* work-stealing counter */
    pthread_mutex_t lock;
} msm_job;

static void msm_window(const msm_job *job, size_t w, g1 *buckets, g1 *wsum_out) {
    int c = job->c;
    size_t nbuckets = ((size_t)1 << c) - 1;
    for (size_t b = 0; b < nbuckets; b++) g1_set_inf(&buckets[b]);
    size_t bit = w * c;
    for (size_t i = 0; i < job->n; i++) {
        size_t word = bit / 64, ofs = bit % 64;
        u64 d = job->scalars[i * job->scalar_words + word] >> ofs;
        if (ofs + c > 64 && word + 1 < job->scalar_words)
            d |= job->scalars[i * job->scalar_words + word + 1] << (64 - ofs);
        d &= (((u64)1 << c) - 1);
        if (d) g1_add(&buckets[d - 1], &buckets[d - 1], &job->pts[i]);
    }
    g1 running, wsum; g1_set_inf(&running); g1_set_inf(&wsum);
    for (size_t b = nbuckets; b-- > 0;) {
        g1_add(&running, &running, &buckets[b]);
        g1_add(&wsum, &wsum, &running);
    }
    *wsum_out = wsum;
}

static void *msm_worker(void *arg) {
    msm_job *job = (msm_job *)arg;
    size_t nbuckets = ((size_t)1 << job->c) - 1;
    g1 *buckets = (g1 *)malloc(nbuckets * sizeof(g1));
    for (;;) {
        pthread_mutex_lock(&job->lock);
        size_t w = job->next_window;
        if (w >= job->windows) { pthread_mutex_unlock(&job->lock); break; }
        job->next_window = w + 1;
        pthread_mutex_unlock(&job->lock);
        msm_window(job, w, buckets, &job->window_sums[w]);
    }
    free(buckets);
    return NULL;
}

void g1_msm(const u64 *xs, const u64 *ys, const uint8_t *inf,
            const u64 *scalars, size_t n, size_t scalar_words, u64 *out) {
    int c = 4;
    if (n >= 32) c = 8;
    if (n >= 4096) c = 12;
    if (n >= (1 << 18)) c = 16;
    size_t nbits = scalar_words * 64;
    size_t windows = (nbits + c - 1) / c;

    g1 *pts = (g1 *)malloc(n * sizeof(g1));
    for (size_t i = 0; i < n; i++) {
        if (inf && inf[i]) { g1_set_inf(&pts[i]); continue; }
        fq x, y;
        memcpy(x.v, xs + i * NL, sizeof(x.v));
        memcpy(y.v, ys + i * NL, sizeof(y.v));
        fq_to_mont(&pts[i].X, &x);
        fq_to_mont(&pts[i].Y, &y);
        memcpy(pts[i].Z.v, R1, sizeof(R1));
    }

    msm_job job = {pts, scalars, n, scalar_words, windows, c, NULL, 0,
                   PTHREAD_MUTEX_INITIALIZER};
    job.window_sums = (g1 *)malloc(windows * sizeof(g1));

    long ncpu = sysconf(_SC_NPROCESSORS_ONLN);
    size_t nthreads = ncpu > 1 ? (size_t)ncpu : 1;
    if (nthreads > windows) nthreads = windows;
    if (n < 256) nthreads = 1;   /* tiny MSMs: thread spawn not worth it */
    if (nthreads <= 1) {
        msm_worker(&job);
    } else {
        pthread_t *tids = (pthread_t *)malloc(nthreads * sizeof(pthread_t));
        for (size_t t = 0; t < nthreads; t++)
            pthread_create(&tids[t], NULL, msm_worker, &job);
        for (size_t t = 0; t < nthreads; t++)
            pthread_join(tids[t], NULL);
        free(tids);
    }

    /* Horner combine of window sums */
    g1 total; g1_set_inf(&total);
    for (size_t w = windows; w-- > 0;) {
        if (w != windows - 1)
            for (int k = 0; k < c; k++) g1_double(&total, &total);
        g1_add(&total, &total, &job.window_sums[w]);
    }
    free(job.window_sums);
    free(pts);

    fq X, Y, Z;
    fq_from_mont(&X, &total.X);
    fq_from_mont(&Y, &total.Y);
    fq_from_mont(&Z, &total.Z);
    memcpy(out, X.v, sizeof(X.v));
    memcpy(out + NL, Y.v, sizeof(Y.v));
    memcpy(out + 2 * NL, Z.v, sizeof(Z.v));
}

/* Fixed-base powers: out[i] = base * scalar^i ... not needed; instead
 * batch scalar-mul for SRS setup: out[i] = k_i * P (shared base). */
/* Fixed-base batch scalar-mul: full 8-bit window table (table[w][d] =
 * d * 2^(8w) * G), then 32 adds per scalar — ~10x fewer EC ops than
 * double-and-add per scalar; scalars split across pthreads. */
typedef struct {
    const g1 *table;          /* [windows][255] */
    const u64 *scalars;
    size_t n, scalar_words, windows;
    u64 *out;
    size_t next;
    pthread_mutex_t lock;
} fb_job;

static void *fb_worker(void *arg) {
    fb_job *job = (fb_job *)arg;
    const size_t CHUNK = 64;
    for (;;) {
        pthread_mutex_lock(&job->lock);
        size_t start = job->next;
        if (start >= job->n) { pthread_mutex_unlock(&job->lock); break; }
        job->next = start + CHUNK;
        pthread_mutex_unlock(&job->lock);
        size_t end = start + CHUNK < job->n ? start + CHUNK : job->n;
        for (size_t i = start; i < end; i++) {
            g1 acc; g1_set_inf(&acc);
            for (size_t w = 0; w < job->windows; w++) {
                size_t bit = w * 8;
                u64 limb = job->scalars[i * job->scalar_words + bit / 64];
                int d = (int)((limb >> (bit % 64)) & 0xFF);
                if (d) g1_add(&acc, &acc, &job->table[w * 255 + (d - 1)]);
            }
            fq X, Y, Z;
            fq_from_mont(&X, &acc.X);
            fq_from_mont(&Y, &acc.Y);
            fq_from_mont(&Z, &acc.Z);
            memcpy(job->out + i * 3 * NL, X.v, sizeof(X.v));
            memcpy(job->out + i * 3 * NL + NL, Y.v, sizeof(Y.v));
            memcpy(job->out + i * 3 * NL + 2 * NL, Z.v, sizeof(Z.v));
        }
    }
    return NULL;
}

void g1_batch_scalar_mul(const u64 *px, const u64 *py,
                         const u64 *scalars, size_t n, size_t scalar_words,
                         u64 *out /* n * 18 words canonical Jacobian */) {
    fq x, y;
    memcpy(x.v, px, sizeof(x.v));
    memcpy(y.v, py, sizeof(y.v));
    g1 base;
    fq_to_mont(&base.X, &x);
    fq_to_mont(&base.Y, &y);
    memcpy(base.Z.v, R1, sizeof(R1));

    size_t windows = scalar_words * 8;
    g1 *table = (g1 *)malloc(windows * 255 * sizeof(g1));
    g1 cur = base;
    for (size_t w = 0; w < windows; w++) {
        table[w * 255] = cur;
        for (int d = 1; d < 255; d++)
            g1_add(&table[w * 255 + d], &table[w * 255 + d - 1], &cur);
        /* next window base: 2^8 * cur = table entry 255*cur + cur */
        g1 t;
        g1_add(&t, &table[w * 255 + 254], &cur);
        cur = t;
    }

    fb_job job = {table, scalars, n, scalar_words, windows, out, 0,
                  PTHREAD_MUTEX_INITIALIZER};
    long ncpu = sysconf(_SC_NPROCESSORS_ONLN);
    size_t nthreads = ncpu > 1 ? (size_t)ncpu : 1;
    if (n < 128) nthreads = 1;
    if (nthreads <= 1) {
        fb_worker(&job);
    } else {
        pthread_t *tids = (pthread_t *)malloc(nthreads * sizeof(pthread_t));
        for (size_t t = 0; t < nthreads; t++)
            pthread_create(&tids[t], NULL, fb_worker, &job);
        for (size_t t = 0; t < nthreads; t++)
            pthread_join(tids[t], NULL);
        free(tids);
    }
    free(table);
}
