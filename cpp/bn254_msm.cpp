// Multi-scalar multiplication (Pippenger) over BN254 G1 and BLS12-381 G1 —
// the native hot loops behind the SNARK wrapper's KZG commitments/openings
// (utils/plonk.py; reference: bellman CRS MSMs,
// src/proof_wrapper_utils/wrapper.rs) and the EIP-4844 blob commitments
// (utils/kzg.py; reference: kzg/src/lib.rs:195-217 rayon-parallel MSM).
// Montgomery limb arithmetic templated on limb count (4x64 for BN254,
// 6x64 for BLS12-381), Jacobian point ops, 8-bit unsigned windows.
//
// Build: part of libzkhashers.so (cpp/Makefile).

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace msm {

// field parameters per curve base field
struct Bn254Params {
  static const int N = 4;
  static const u64 P[4], R2[4], R1[4], PINV;
};
const u64 Bn254Params::P[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                               0xb85045b68181585dULL, 0x30644e72e131a029ULL};
const u64 Bn254Params::R2[4] = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                                0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};
const u64 Bn254Params::R1[4] = {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                                0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};
const u64 Bn254Params::PINV = 0x87d20782e4866389ULL;

struct Bls381Params {
  static const int N = 6;
  static const u64 P[6], R2[6], R1[6], PINV;
};
const u64 Bls381Params::P[6] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
const u64 Bls381Params::R2[6] = {
    0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
    0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL};
const u64 Bls381Params::R1[6] = {
    0x760900000002fffdULL, 0xebf4000bc40c0002ULL, 0x5f48985753c758baULL,
    0x77ce585370525745ULL, 0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL};
const u64 Bls381Params::PINV = 0x89f3fffcfffcfffdULL;

template <typename C>
struct Fp {
  u64 v[C::N];
};

template <typename C>
static inline bool geq_p(const u64* a) {
  for (int i = C::N - 1; i >= 0; --i) {
    if (a[i] > C::P[i]) return true;
    if (a[i] < C::P[i]) return false;
  }
  return true;
}

template <typename C>
static inline void sub_p(u64* a) {
  u128 borrow = 0;
  for (int i = 0; i < C::N; ++i) {
    u128 d = (u128)a[i] - C::P[i] - (u64)borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

template <typename C>
static inline void fp_add(Fp<C>& r, const Fp<C>& a, const Fp<C>& b) {
  u128 carry = 0;
  for (int i = 0; i < C::N; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + (u64)carry;
    r.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq_p<C>(r.v)) sub_p<C>(r.v);
}

template <typename C>
static inline void fp_sub(Fp<C>& r, const Fp<C>& a, const Fp<C>& b) {
  u128 borrow = 0;
  for (int i = 0; i < C::N; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - (u64)borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < C::N; ++i) {
      u128 s = (u128)r.v[i] + C::P[i] + (u64)carry;
      r.v[i] = (u64)s;
      carry = s >> 64;
    }
  }
}

// CIOS Montgomery multiplication: r = a*b*R^-1 mod p
template <typename C>
static inline void fp_mul(Fp<C>& r, const Fp<C>& a, const Fp<C>& b) {
  const int N = C::N;
  u64 t[C::N + 2];
  std::memset(t, 0, sizeof(t));
  for (int i = 0; i < N; ++i) {
    u128 carry = 0;
    for (int j = 0; j < N; ++j) {
      u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + (u64)carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[N] + (u64)carry;
    t[N] = (u64)s;
    t[N + 1] = (u64)(s >> 64);
    u64 m = t[0] * C::PINV;
    carry = ((u128)t[0] + (u128)m * C::P[0]) >> 64;
    for (int j = 1; j < N; ++j) {
      u128 s2 = (u128)t[j] + (u128)m * C::P[j] + (u64)carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[N] + (u64)carry;
    t[N - 1] = (u64)s;
    t[N] = t[N + 1] + (u64)(s >> 64);
  }
  for (int i = 0; i < N; ++i) r.v[i] = t[i];
  if (t[N] || geq_p<C>(r.v)) sub_p<C>(r.v);
}

template <typename C>
static inline void fp_sqr(Fp<C>& r, const Fp<C>& a) {
  fp_mul<C>(r, a, a);
}

template <typename C>
static inline bool fp_is_zero(const Fp<C>& a) {
  u64 acc = 0;
  for (int i = 0; i < C::N; ++i) acc |= a.v[i];
  return acc == 0;
}

template <typename C>
static inline void fp_set_zero(Fp<C>& a) {
  std::memset(a.v, 0, sizeof(a.v));
}

template <typename C>
static inline void fp_to_mont(Fp<C>& r, const Fp<C>& a) {
  Fp<C> r2;
  std::memcpy(r2.v, C::R2, sizeof(r2.v));
  fp_mul<C>(r, a, r2);
}

template <typename C>
static inline void fp_from_mont(Fp<C>& r, const Fp<C>& a) {
  Fp<C> one;
  fp_set_zero(one);
  one.v[0] = 1;
  fp_mul<C>(r, a, one);
}

// Jacobian point (X, Y, Z); infinity encoded as Z == 0. Formulas are
// curve-b independent (dbl-2009-l / add-2007-bl).
template <typename C>
struct Pt {
  Fp<C> X, Y, Z;
};

template <typename C>
static inline void pt_set_inf(Pt<C>& p) {
  fp_set_zero(p.X);
  fp_set_zero(p.Y);
  fp_set_zero(p.Z);
}

template <typename C>
static inline bool pt_is_inf(const Pt<C>& p) {
  return fp_is_zero(p.Z);
}

template <typename C>
static void pt_double(Pt<C>& r, const Pt<C>& p) {
  // alias-safe (r may be p): all reads of p complete before writing `o`
  if (pt_is_inf(p)) { r = p; return; }
  Pt<C> o;
  Fp<C> A, B, Cc, D, E, F, t;
  fp_sqr<C>(A, p.X);
  fp_sqr<C>(B, p.Y);
  fp_sqr<C>(Cc, B);
  fp_add<C>(t, p.X, B);
  fp_sqr<C>(t, t);
  fp_sub<C>(t, t, A);
  fp_sub<C>(t, t, Cc);
  fp_add<C>(D, t, t);
  fp_add<C>(E, A, A);
  fp_add<C>(E, E, A);
  fp_sqr<C>(F, E);
  Fp<C> z2;
  fp_mul<C>(z2, p.Y, p.Z);
  fp_add<C>(o.Z, z2, z2);
  fp_sub<C>(o.X, F, D);
  fp_sub<C>(o.X, o.X, D);
  Fp<C> c8;
  fp_add<C>(c8, Cc, Cc);
  fp_add<C>(c8, c8, c8);
  fp_add<C>(c8, c8, c8);
  fp_sub<C>(t, D, o.X);
  Fp<C> y2;
  fp_mul<C>(y2, E, t);
  fp_sub<C>(o.Y, y2, c8);
  r = o;
}

template <typename C>
static void pt_add(Pt<C>& r, const Pt<C>& p, const Pt<C>& q) {
  if (pt_is_inf(p)) { r = q; return; }
  if (pt_is_inf(q)) { r = p; return; }
  Fp<C> Z1Z1, Z2Z2, U1, U2, S1, S2, t;
  fp_sqr<C>(Z1Z1, p.Z);
  fp_sqr<C>(Z2Z2, q.Z);
  fp_mul<C>(U1, p.X, Z2Z2);
  fp_mul<C>(U2, q.X, Z1Z1);
  fp_mul<C>(t, q.Z, Z2Z2);
  fp_mul<C>(S1, p.Y, t);
  fp_mul<C>(t, p.Z, Z1Z1);
  fp_mul<C>(S2, q.Y, t);
  Fp<C> H, Rr;
  fp_sub<C>(H, U2, U1);
  fp_sub<C>(Rr, S2, S1);
  if (fp_is_zero(H)) {
    if (fp_is_zero(Rr)) { pt_double<C>(r, p); return; }
    pt_set_inf(r);
    return;
  }
  Pt<C> o;
  Fp<C> I, J, V;
  fp_add<C>(t, H, H);
  fp_sqr<C>(I, t);
  fp_mul<C>(J, H, I);
  fp_add<C>(Rr, Rr, Rr);
  fp_mul<C>(V, U1, I);
  Fp<C> r2;
  fp_sqr<C>(r2, Rr);
  fp_sub<C>(o.X, r2, J);
  fp_sub<C>(o.X, o.X, V);
  fp_sub<C>(o.X, o.X, V);
  Fp<C> s1j;
  fp_mul<C>(s1j, S1, J);
  fp_add<C>(s1j, s1j, s1j);
  fp_sub<C>(t, V, o.X);
  fp_mul<C>(o.Y, Rr, t);
  fp_sub<C>(o.Y, o.Y, s1j);
  Fp<C> zz;
  fp_add<C>(zz, p.Z, q.Z);
  fp_sqr<C>(zz, zz);
  fp_sub<C>(zz, zz, Z1Z1);
  fp_sub<C>(zz, zz, Z2Z2);
  fp_mul<C>(o.Z, zz, H);
  r = o;
}

template <typename C>
static void fp_inv(Fp<C>& r, const Fp<C>& a) {
  // Fermat: a^(p-2) over the Montgomery domain
  u64 e[C::N];
  std::memcpy(e, C::P, sizeof(e));
  u128 borrow = 2;
  for (int i = 0; i < C::N; ++i) {
    u128 d = (u128)e[i] - (u64)borrow;
    e[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  Fp<C> base = a, acc;
  std::memcpy(acc.v, C::R1, sizeof(acc.v));
  for (int limb = 0; limb < C::N; ++limb) {
    for (int bit = 0; bit < 64; ++bit) {
      if ((e[limb] >> bit) & 1) fp_mul<C>(acc, acc, base);
      fp_sqr<C>(base, base);
    }
  }
  r = acc;
}

// points: n * 2N u64 (affine x limbs || y limbs, little-endian limb order,
// non-Montgomery); x==y==0 means infinity. scalars: n * 4 u64.
// out: 2N u64 affine; all-zero means infinity.
template <typename C>
static void msm_impl(const u64* points, const u64* scalars, u64 n, u64* out) {
  const int N = C::N;
  const int W = 8;
  const int NWIN = (256 + W - 1) / W;
  std::vector<Pt<C>> pts(n);
  for (u64 i = 0; i < n; ++i) {
    Fp<C> x, y;
    std::memcpy(x.v, points + 2 * N * i, 8 * N);
    std::memcpy(y.v, points + 2 * N * i + N, 8 * N);
    if (fp_is_zero(x) && fp_is_zero(y)) {
      pt_set_inf(pts[i]);
      continue;
    }
    fp_to_mont<C>(pts[i].X, x);
    fp_to_mont<C>(pts[i].Y, y);
    std::memcpy(pts[i].Z.v, C::R1, 8 * N);
  }
  Pt<C> acc;
  pt_set_inf(acc);
  std::vector<Pt<C>> buckets(1 << W);
  for (int win = NWIN - 1; win >= 0; --win) {
    for (int d = 0; d < W; ++d) pt_double<C>(acc, acc);
    for (auto& b : buckets) pt_set_inf(b);
    int bitpos = win * W;
    for (u64 i = 0; i < n; ++i) {
      int limb = bitpos / 64, off = bitpos % 64;
      u64 frag = scalars[4 * i + limb] >> off;
      if (off && limb < 3) frag |= scalars[4 * i + limb + 1] << (64 - off);
      u64 idx = frag & ((1ULL << W) - 1);
      if (idx) pt_add<C>(buckets[idx], buckets[idx], pts[i]);
    }
    Pt<C> sum, running;
    pt_set_inf(sum);
    pt_set_inf(running);
    for (int b = (1 << W) - 1; b >= 1; --b) {
      pt_add<C>(running, running, buckets[b]);
      pt_add<C>(sum, sum, running);
    }
    pt_add<C>(acc, acc, sum);
  }
  if (pt_is_inf(acc)) {
    std::memset(out, 0, 16 * N);
    return;
  }
  Fp<C> zinv, zinv2, zinv3, xa, ya;
  fp_inv<C>(zinv, acc.Z);
  fp_sqr<C>(zinv2, zinv);
  fp_mul<C>(zinv3, zinv2, zinv);
  fp_mul<C>(xa, acc.X, zinv2);
  fp_mul<C>(ya, acc.Y, zinv3);
  fp_from_mont<C>(xa, xa);
  fp_from_mont<C>(ya, ya);
  std::memcpy(out, xa.v, 8 * N);
  std::memcpy(out + N, ya.v, 8 * N);
}

}  // namespace msm

extern "C" {

void bn254_msm(const uint64_t* points, const uint64_t* scalars, uint64_t n,
               uint64_t* out) {
  msm::msm_impl<msm::Bn254Params>(points, scalars, n, out);
}

void bls12381_msm(const uint64_t* points, const uint64_t* scalars,
                  uint64_t n, uint64_t* out) {
  msm::msm_impl<msm::Bls381Params>(points, scalars, n, out);
}

}  // extern "C"
