// moai_host — native host-side kernels for the moai_tpu CKKS library.
//
// TPU-native replacement for the host-side parts of the reference's
// native stack (reference: thirdparty/SEAL-4.1-bs/native/src/seal/ —
// the CKKSEncoder's exact big-int rounding path ckks.h:457-560, and the
// util/ntt.* negacyclic NTT used as the unit-test oracle).  The device
// compute path is JAX/Pallas; this library accelerates and
// cross-checks the client/host side:
//
//   * encode_residues: exact RNS residues of float64 coefficients of any
//     magnitude (mantissa * 2^exp mod q via 128-bit mulmod) — removes the
//     |coeff| < 2^62 fast-path limit of the numpy encoder.
//   * decode_centered: exact CRT composition of RNS residues into
//     centered float64 values (per-coefficient, 64-bit limb bignum).
//   * ntt_negacyclic / intt_negacyclic: an independent iterative
//     Cooley-Tukey negacyclic NTT oracle over 32-bit primes (bit-reversed
//     output convention), used by tests to validate the JAX 4-step NTT.
//
// Exposed with a plain C ABI for ctypes.  Build: native/Makefile.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

typedef unsigned __int128 u128;

static inline uint64_t mulmod64(uint64_t a, uint64_t b, uint64_t q) {
    return (uint64_t)((u128)a * b % q);
}

static inline uint64_t powmod64(uint64_t b, uint64_t e, uint64_t q) {
    uint64_t r = 1 % q;
    b %= q;
    while (e) {
        if (e & 1) r = mulmod64(r, b, q);
        b = mulmod64(b, b, q);
        e >>= 1;
    }
    return r;
}

extern "C" {

// ---------------------------------------------------------------------------
// Exact encode: residues of round-to-nearest float64 coefficients.
// coeffs: [n] float64 (already scaled; may exceed 2^62 in magnitude —
// doubles are exact integers once |x| >= 2^52).
// primes: [n_q] uint64 (< 2^32 in practice, but 64-bit safe).
// out:    [n_q, n] uint32 standard-representation residues.
// ---------------------------------------------------------------------------
void encode_residues(const double* coeffs, int64_t n,
                     const uint64_t* primes, int64_t n_q,
                     uint32_t* out) {
    for (int64_t i = 0; i < n_q; ++i) {
        const uint64_t q = primes[i];
        uint32_t* row = out + i * n;
        for (int64_t k = 0; k < n; ++k) {
            double c = coeffs[k];
            double r = std::nearbyint(c);
            bool neg = r < 0;
            double a = neg ? -r : r;
            uint64_t res;
            if (a < 9.007199254740992e15) {     // 2^53: exact in uint64
                res = (uint64_t)a % q;
            } else {
                int e;
                double m = std::frexp(a, &e);   // a = m * 2^e, m in [0.5,1)
                // take 53 mantissa bits exactly
                uint64_t mant = (uint64_t)std::ldexp(m, 53);
                int shift = e - 53;             // a = mant * 2^shift
                uint64_t p2 = powmod64(2, (uint64_t)shift, q);
                res = mulmod64(mant % q, p2, q);
            }
            if (neg && res) res = q - res;
            row[k] = (uint32_t)res;
        }
    }
}

// ---------------------------------------------------------------------------
// Exact decode: centered CRT composition -> float64.
// residues: [n_q, n] uint32 standard rep; primes: [n_q]; out: [n] float64
// value of the centered representative (|v| < Q/2), rounded to double.
// Uses a 64-bit limb accumulator of fixed capacity (supports Q up to
// 64*MAX_LIMBS bits).
// ---------------------------------------------------------------------------
void decode_centered(const uint32_t* residues, int64_t n,
                     const uint64_t* primes, int64_t n_q,
                     double* out) {
    const int ML = 64;                       // up to 4096-bit Q
    std::vector<uint64_t> Q(ML, 0), half(ML, 0), acc(ML), tmp(ML);
    int qlimbs = 1;
    Q[0] = 1;
    for (int64_t i = 0; i < n_q; ++i) {      // Q *= q_i
        uint64_t carry = 0;
        for (int j = 0; j < qlimbs; ++j) {
            u128 p = (u128)Q[j] * primes[i] + carry;
            Q[j] = (uint64_t)p;
            carry = (uint64_t)(p >> 64);
        }
        if (carry) Q[qlimbs++] = carry;
    }
    // half = Q >> 1
    for (int j = 0; j < qlimbs; ++j)
        half[j] = (Q[j] >> 1) | (j + 1 < qlimbs ? (Q[j + 1] << 63) : 0);

    // per-prime: hat_i = Q / q_i (big), hatinv_i = hat_i^{-1} mod q_i
    std::vector<std::vector<uint64_t>> hat(n_q,
                                           std::vector<uint64_t>(ML, 0));
    std::vector<uint64_t> hatinv(n_q);
    for (int64_t i = 0; i < n_q; ++i) {
        // big divide Q by q_i
        uint64_t rem = 0;
        for (int j = qlimbs - 1; j >= 0; --j) {
            u128 cur = ((u128)rem << 64) | Q[j];
            hat[i][j] = (uint64_t)(cur / primes[i]);
            rem = (uint64_t)(cur % primes[i]);
        }
        uint64_t hm = 0;                      // hat_i mod q_i
        for (int j = qlimbs - 1; j >= 0; --j)
            hm = (uint64_t)((((u128)hm << 64) | hat[i][j]) % primes[i]);
        hatinv[i] = powmod64(hm, primes[i] - 2, primes[i]); // q prime
    }

    for (int64_t k = 0; k < n; ++k) {
        std::fill(acc.begin(), acc.begin() + qlimbs + 1, 0);
        for (int64_t i = 0; i < n_q; ++i) {
            uint64_t lam = mulmod64(residues[i * n + k], hatinv[i],
                                    primes[i]);
            // acc += hat_i * lam
            uint64_t carry = 0;
            for (int j = 0; j < qlimbs; ++j) {
                u128 p = (u128)hat[i][j] * lam + acc[j] + carry;
                acc[j] = (uint64_t)p;
                carry = (uint64_t)(p >> 64);
            }
            acc[qlimbs] += carry;
        }
        // acc mod Q (acc < n_q * Q, so subtract Q at most n_q times —
        // use schoolbook conditional subtract loop)
        auto geq = [&](const std::vector<uint64_t>& a,
                       const std::vector<uint64_t>& b, int nl) {
            for (int j = nl - 1; j >= 0; --j) {
                if (a[j] != b[j]) return a[j] > b[j];
            }
            return true;
        };
        std::vector<uint64_t> Qext(qlimbs + 1, 0);
        std::copy(Q.begin(), Q.begin() + qlimbs, Qext.begin());
        auto sub_inplace = [&](std::vector<uint64_t>& a,
                               const std::vector<uint64_t>& b, int nl) {
            uint64_t borrow = 0;
            for (int j = 0; j < nl; ++j) {
                u128 need = (u128)b[j] + borrow;
                if ((u128)a[j] >= need) {
                    a[j] = (uint64_t)((u128)a[j] - need);
                    borrow = 0;
                } else {
                    a[j] = (uint64_t)(((u128)1 << 64) + a[j] - need);
                    borrow = 1;
                }
            }
        };
        while (acc[qlimbs] != 0 || geq(acc, Qext, qlimbs + 1))
            sub_inplace(acc, Qext, qlimbs + 1);
        // centered: if acc > Q/2, value = acc - Q (negative)
        bool negv = false;
        std::vector<uint64_t> hext(qlimbs + 1, 0);
        std::copy(half.begin(), half.begin() + qlimbs, hext.begin());
        bool eq_half = acc[qlimbs] == 0 &&
            std::equal(half.begin(), half.begin() + qlimbs, acc.begin());
        if (geq(acc, hext, qlimbs + 1) && !eq_half) {
            std::vector<uint64_t> qcopy(Qext);
            sub_inplace(qcopy, acc, qlimbs + 1);   // Q - acc
            std::copy(qcopy.begin(), qcopy.begin() + qlimbs, acc.begin());
            acc[qlimbs] = 0;
            negv = true;
        }
        // to double — ldexp per nonzero limb: a naive running base *= 2^64
        // overflows to inf past 1024-bit Q and 0*inf poisons the sum with
        // NaN; skipping zero limbs keeps the result finite whenever the
        // centered value itself fits in a double
        double v = 0.0;
        for (int j = 0; j < qlimbs; ++j) {
            if (acc[j]) v += std::ldexp((double)acc[j], 64 * j);
        }
        out[k] = negv ? -v : v;
    }
}

// ---------------------------------------------------------------------------
// Negacyclic NTT oracle (independent of the JAX 4-step path).
// data: [batch, N] uint64 standard rep (in-place); q: 32-bit NTT prime
// with 2N | q-1; psi: primitive 2N-th root of unity mod q.
// Forward: X_k = sum_j x_j psi^(2k+1)j? — convention: classic
// psi-twisted CT with bit-reversed OUTPUT order (matches per-stage
// butterflies; the inverse undoes it exactly).
// ---------------------------------------------------------------------------
void ntt_negacyclic(uint64_t* data, int64_t batch, int64_t N,
                    uint64_t q, uint64_t psi) {
    // precompute psi powers in bit-reversed order
    int logn = 0;
    while ((1LL << logn) < N) ++logn;
    std::vector<uint64_t> w(N);
    uint64_t cur = 1;
    std::vector<uint64_t> pw(N);
    for (int64_t i = 0; i < N; ++i) { pw[i] = cur; cur = mulmod64(cur, psi, q); }
    for (int64_t i = 0; i < N; ++i) {
        // bit-reverse i over logn bits
        int64_t r = 0;
        for (int b = 0; b < logn; ++b) if (i & (1LL << b)) r |= 1LL << (logn - 1 - b);
        w[i] = pw[r];
    }
    for (int64_t bidx = 0; bidx < batch; ++bidx) {
        uint64_t* x = data + bidx * N;
        int64_t t = N;
        for (int64_t m = 1; m < N; m <<= 1) {
            t >>= 1;
            for (int64_t i = 0; i < m; ++i) {
                uint64_t s = w[m + i];
                int64_t j1 = 2 * i * t;
                for (int64_t j = j1; j < j1 + t; ++j) {
                    uint64_t u = x[j];
                    uint64_t v = mulmod64(x[j + t], s, q);
                    x[j] = (u + v) % q;
                    x[j + t] = (u + q - v) % q;
                }
            }
        }
    }
}

void intt_negacyclic(uint64_t* data, int64_t batch, int64_t N,
                     uint64_t q, uint64_t psi) {
    int logn = 0;
    while ((1LL << logn) < N) ++logn;
    uint64_t psi_inv = powmod64(psi, q - 2, q);
    std::vector<uint64_t> w(N), pw(N);
    uint64_t cur = 1;
    for (int64_t i = 0; i < N; ++i) { pw[i] = cur; cur = mulmod64(cur, psi_inv, q); }
    for (int64_t i = 0; i < N; ++i) {
        int64_t r = 0;
        for (int b = 0; b < logn; ++b) if (i & (1LL << b)) r |= 1LL << (logn - 1 - b);
        w[i] = pw[r];
    }
    uint64_t ninv = powmod64(N % q, q - 2, q);
    for (int64_t bidx = 0; bidx < batch; ++bidx) {
        uint64_t* x = data + bidx * N;
        int64_t t = 1;
        for (int64_t m = N >> 1; m >= 1; m >>= 1) {
            int64_t j1 = 0;
            for (int64_t i = 0; i < m; ++i) {
                uint64_t s = w[m + i];
                for (int64_t j = j1; j < j1 + t; ++j) {
                    uint64_t u = x[j];
                    uint64_t v = x[j + t];
                    x[j] = (u + v) % q;
                    x[j + t] = mulmod64((u + q - v) % q, s, q);
                }
                j1 += 2 * t;
            }
            t <<= 1;
        }
        for (int64_t j = 0; j < N; ++j) x[j] = mulmod64(x[j], ninv, q);
    }
}

}  // extern "C"
