/* Native host NTT over BLS12-377 Fr (the snarkvm-algorithms fft analog,
 * algorithms/src/fft/domain.rs — radix-2 in-place, CPU path).
 *
 * Fr = 0x12ab655e9a2ca55660b44d1e5c37b00159aa76fed0000001a11800000000001
 * 4 x u64 limbs (LE), CIOS Montgomery with __int128.
 *
 * API (all values canonical 4x u64 LE words):
 *   void fr_ntt(uint64_t *values, size_t n, const uint64_t *omega,
 *               int inverse, const uint64_t *n_inv);
 *     - in-place radix-2 NTT of n (power of two) field elements;
 *     - omega: n-th root of unity for the domain (inverse root when
 *       inverse != 0); n_inv: 1/n (applied when inverse != 0).
 *   void fr_batch_mul(uint64_t *a, const uint64_t *b, size_t n);
 *     - pointwise a[i] *= b[i]
 *   void fr_batch_inv(uint64_t *a, size_t n);
 *     - batch inversion (Montgomery trick); zeros stay zero.
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>
#include <stdlib.h>

typedef uint64_t u64;
typedef unsigned __int128 u128;

#define NL 4

static const u64 RMOD[NL] = {
    0x0a11800000000001ULL, 0x59aa76fed0000001ULL,
    0x60b44d1e5c37b001ULL, 0x12ab655e9a2ca556ULL,
};
static const u64 N0 = 0x0a117fffffffffffULL;
/* 2^256 mod r */
static const u64 R1[NL] = {
    0x7d1c7ffffffffff3ULL, 0x7257f50f6ffffff2ULL,
    0x16d81575512c0feeULL, 0x0d4bda322bbb9a9dULL,
};
/* (2^256)^2 mod r */
static const u64 R2[NL] = {
    0x25d577bab861857bULL, 0xcc2c27b58860591fULL,
    0xa7cc008fe5dc8593ULL, 0x011fdae7eff1c939ULL,
};

typedef struct { u64 v[NL]; } fr;

static int fr_is_zero(const fr *a) {
    return (a->v[0] | a->v[1] | a->v[2] | a->v[3]) == 0;
}

static int fr_gte_r(const fr *a) {
    for (int i = NL - 1; i >= 0; i--) {
        if (a->v[i] > RMOD[i]) return 1;
        if (a->v[i] < RMOD[i]) return 0;
    }
    return 1;
}

static void fr_sub_r(fr *a) {
    u128 borrow = 0;
    for (int i = 0; i < NL; i++) {
        u128 t = (u128)a->v[i] - RMOD[i] - borrow;
        a->v[i] = (u64)t;
        borrow = (t >> 64) ? 1 : 0;
    }
}

static void fr_add(fr *out, const fr *a, const fr *b) {
    u128 carry = 0;
    for (int i = 0; i < NL; i++) {
        u128 t = (u128)a->v[i] + b->v[i] + (u64)carry;
        out->v[i] = (u64)t;
        carry = t >> 64;
    }
    if (carry || fr_gte_r(out)) fr_sub_r(out);
}

static void fr_sub(fr *out, const fr *a, const fr *b) {
    u128 borrow = 0;
    fr t;
    for (int i = 0; i < NL; i++) {
        u128 d = (u128)a->v[i] - b->v[i] - (u64)borrow;
        t.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < NL; i++) {
            u128 s = (u128)t.v[i] + RMOD[i] + (u64)carry;
            t.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
    *out = t;
}

/* CIOS Montgomery multiply */
static void fr_mul(fr *out, const fr *a, const fr *b) {
    u64 t[NL + 2] = {0};
    for (int i = 0; i < NL; i++) {
        u128 carry = 0;
        for (int j = 0; j < NL; j++) {
            u128 cur = (u128)a->v[j] * b->v[i] + t[j] + (u64)carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[NL] + (u64)carry;
        t[NL] = (u64)cur;
        t[NL + 1] = (u64)(cur >> 64);

        u64 m = t[0] * N0;
        carry = ((u128)m * RMOD[0] + t[0]) >> 64;
        for (int j = 1; j < NL; j++) {
            u128 cur2 = (u128)m * RMOD[j] + t[j] + (u64)carry;
            t[j - 1] = (u64)cur2;
            carry = cur2 >> 64;
        }
        cur = (u128)t[NL] + (u64)carry;
        t[NL - 1] = (u64)cur;
        t[NL] = t[NL + 1] + (u64)(cur >> 64);
        t[NL + 1] = 0;
    }
    fr res;
    memcpy(res.v, t, sizeof(res.v));
    if (t[NL] || fr_gte_r(&res)) fr_sub_r(&res);
    *out = res;
}

static void fr_to_mont(fr *out, const fr *a) {
    fr r2;
    memcpy(r2.v, R2, sizeof(r2.v));
    fr_mul(out, a, &r2);
}

static void fr_from_mont(fr *out, const fr *a) {
    fr one = {{1, 0, 0, 0}};
    fr_mul(out, a, &one);
}

static void fr_pow(fr *out, const fr *base_m, u64 e) {
    fr acc;
    memcpy(acc.v, R1, sizeof(acc.v));   /* one in Montgomery form */
    fr b = *base_m;
    while (e) {
        if (e & 1) fr_mul(&acc, &acc, &b);
        fr_mul(&b, &b, &b);
        e >>= 1;
    }
    *out = acc;
}

void fr_ntt(u64 *values, size_t n, const u64 *omega, int inverse,
            const u64 *n_inv) {
    fr *a = (fr *)values;
    /* to Montgomery */
    for (size_t i = 0; i < n; i++) fr_to_mont(&a[i], &a[i]);

    /* bit-reverse permutation */
    unsigned log_n = 0;
    while ((1ULL << log_n) < n) log_n++;
    for (size_t i = 0; i < n; i++) {
        size_t j = 0;
        for (unsigned b = 0; b < log_n; b++) j |= ((i >> b) & 1) << (log_n - 1 - b);
        if (j > i) { fr tmp = a[i]; a[i] = a[j]; a[j] = tmp; }
    }

    fr om;
    memcpy(om.v, omega, sizeof(om.v));
    fr om_m;
    fr_to_mont(&om_m, &om);

    for (unsigned s = 1; s <= log_n; s++) {
        size_t m = 1ULL << s;
        size_t half = m >> 1;
        fr wm;
        fr_pow(&wm, &om_m, (u64)(n / m));   /* m-th root */
        for (size_t k = 0; k < n; k += m) {
            fr w;
            memcpy(w.v, R1, sizeof(w.v));
            for (size_t j = 0; j < half; j++) {
                fr t, u;
                fr_mul(&t, &a[k + j + half], &w);
                u = a[k + j];
                fr_add(&a[k + j], &u, &t);
                fr_sub(&a[k + j + half], &u, &t);
                fr_mul(&w, &w, &wm);
            }
        }
    }

    if (inverse) {
        fr ni;
        memcpy(ni.v, n_inv, sizeof(ni.v));
        fr ni_m;
        fr_to_mont(&ni_m, &ni);
        for (size_t i = 0; i < n; i++) fr_mul(&a[i], &a[i], &ni_m);
    }

    for (size_t i = 0; i < n; i++) fr_from_mont(&a[i], &a[i]);
}

void fr_batch_mul(u64 *av, const u64 *bv, size_t n) {
    fr *a = (fr *)av;
    const fr *b = (const fr *)bv;
    for (size_t i = 0; i < n; i++) {
        fr am, bm;
        fr_to_mont(&am, &a[i]);
        fr_to_mont(&bm, &b[i]);
        fr_mul(&am, &am, &bm);
        fr_from_mont(&a[i], &am);
    }
}

void fr_batch_inv(u64 *av, size_t n) {
    fr *a = (fr *)av;
    /* Montgomery trick over nonzero entries (values in canonical form:
     * convert to Montgomery, prefix products, single inversion via
     * Fermat, walk back). */
    if (n == 0) return;
    fr *m = (fr *)malloc(n * sizeof(fr));
    fr *pref = (fr *)malloc(n * sizeof(fr));
    fr acc;
    memcpy(acc.v, R1, sizeof(acc.v));
    for (size_t i = 0; i < n; i++) {
        fr_to_mont(&m[i], &a[i]);
        pref[i] = acc;
        if (!fr_is_zero(&m[i])) fr_mul(&acc, &acc, &m[i]);
    }
    /* acc^-1 = acc^(r-2) */
    fr inv = acc;
    fr e;
    /* exponent r-2 */
    u64 exp[NL];
    memcpy(exp, RMOD, sizeof(exp));
    /* subtract 2 */
    if (exp[0] >= 2) exp[0] -= 2;
    fr res;
    memcpy(res.v, R1, sizeof(res.v));
    for (int word = NL - 1; word >= 0; word--) {
        for (int bit = 63; bit >= 0; bit--) {
            fr_mul(&res, &res, &res);
            if ((exp[word] >> bit) & 1) fr_mul(&res, &res, &inv);
        }
    }
    (void)e;
    inv = res;   /* acc^-1 in Montgomery form */
    for (size_t i = n; i-- > 0;) {
        if (fr_is_zero(&m[i])) continue;
        fr out;
        fr_mul(&out, &pref[i], &inv);
        fr_mul(&inv, &inv, &m[i]);
        fr_from_mont(&a[i], &out);
    }
    free(m);
    free(pref);
}

/* ---------------------------------------------------------------------------
 * AHP indexer kernels (round-4): the arithmetization hot loops the
 * reference runs with rayon over nonzeros (algorithms/src/snark/varuna/
 * ahp/indexer/{indexer.rs:46, matrices.rs:138}) — domain element powers
 * and the row/col/row_col/row_col_val evaluation tables.
 * All i/o canonical 4 x u64 LE words.
 * ------------------------------------------------------------------------- */

/* out[i] = g^i for i in [0, n) (canonical). */
void fr_powers(u64 *out, const u64 *g, size_t n) {
    fr gm, acc;
    memcpy(&gm, g, sizeof(fr));
    fr_to_mont(&gm, &gm);
    fr one; memset(&one, 0, sizeof(fr)); one.v[0] = 1;
    fr_to_mont(&acc, &one);
    for (size_t i = 0; i < n; i++) {
        fr c; fr_from_mont(&c, &acc);
        memcpy(out + 4 * i, &c, sizeof(fr));
        fr_mul(&acc, &acc, &gm);
    }
}

/* out[i][j] = 16-bit limb j (stored as u32) of the MONTGOMERY residue
 * (c * g^i) * R mod p — exactly the [n, 16] twiddle/power planes the
 * TPU limb kernels consume (ops/ntt.py Domain twiddles; replaces the
 * per-element Python bigint loop that cost ~77 s at n = 2^22). */
void fr_powers_mont16(uint32_t *out, const u64 *g, const u64 *c, size_t n) {
    fr gm, acc;
    memcpy(&gm, g, sizeof(fr));
    fr_to_mont(&gm, &gm);
    memcpy(&acc, c, sizeof(fr));
    fr_to_mont(&acc, &acc);       /* acc = mont(c); words are c*R mod p */
    for (size_t i = 0; i < n; i++) {
        for (int j = 0; j < 16; j++)
            out[16 * i + j] =
                (uint32_t)((acc.v[j >> 2] >> (16 * (j & 3))) & 0xFFFF);
        fr_mul(&acc, &acc, &gm);  /* mont(c*g^i) -> mont(c*g^(i+1)) */
    }
}

/* reindex_by_subdomain (fft/domain.rs:322). */
static size_t reindex_sub(size_t self_size, size_t other_size, size_t idx) {
    size_t period = self_size / other_size;
    if (idx < other_size) return idx * period;
    size_t i = idx - other_size;
    size_t x = period - 1;
    return i + (i / x) + 1;
}

/* matrices.rs:115 — per-nonzero evaluation tables.
 *   vals:   [nnz][4] canonical matrix values
 *   rows:   [nnz] constraint row indices
 *   cols:   [nnz] UN-reindexed column indices
 *   c_elems: [cd][4] canonical constraint-domain elements
 *   v_elems: [vd][4] canonical variable-domain elements
 *   variable_size/input_size: reindex_by_subdomain parameters
 *   pad_to: non_zero_size; rows beyond nnz pad to (1,1,1,0)
 * Outputs row_o/col_o/rc_o/rcv_o: [pad_to][4] canonical. */
void fr_matrix_evals(const u64 *vals, const uint32_t *rows,
                     const uint32_t *cols, size_t nnz,
                     const u64 *c_elems, const u64 *v_elems,
                     size_t variable_size, size_t input_size,
                     size_t pad_to, u64 *row_o, u64 *col_o, u64 *rc_o,
                     u64 *rcv_o) {
    for (size_t i = 0; i < nnz; i++) {
        fr r, c, v, rc, rcv;
        memcpy(&r, c_elems + 4 * (size_t)rows[i], sizeof(fr));
        size_t ci = reindex_sub(variable_size, input_size, (size_t)cols[i]);
        memcpy(&c, v_elems + 4 * ci, sizeof(fr));
        memcpy(&v, vals + 4 * i, sizeof(fr));
        fr rm, cm, vm;
        fr_to_mont(&rm, &r);
        fr_to_mont(&cm, &c);
        fr_to_mont(&vm, &v);
        fr_mul(&rc, &rm, &cm);            /* r*c (mont) */
        fr_mul(&rcv, &rc, &vm);           /* r*c*v (mont) */
        fr rc_c, rcv_c;
        fr_from_mont(&rc_c, &rc);
        fr_from_mont(&rcv_c, &rcv);
        memcpy(row_o + 4 * i, &r, sizeof(fr));
        memcpy(col_o + 4 * i, &c, sizeof(fr));
        memcpy(rc_o + 4 * i, &rc_c, sizeof(fr));
        memcpy(rcv_o + 4 * i, &rcv_c, sizeof(fr));
    }
    for (size_t i = nnz; i < pad_to; i++) {
        memset(row_o + 4 * i, 0, sizeof(fr)); row_o[4 * i] = 1;
        memset(col_o + 4 * i, 0, sizeof(fr)); col_o[4 * i] = 1;
        memset(rc_o + 4 * i, 0, sizeof(fr));  rc_o[4 * i] = 1;
        memset(rcv_o + 4 * i, 0, sizeof(fr));
    }
}
