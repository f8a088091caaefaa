// BN254 G1 multi-scalar multiplication (Pippenger) — the native hot loop
// behind the SNARK wrapper's KZG commitments/openings (utils/plonk.py) and
// the reference's bellman CRS MSMs (src/proof_wrapper_utils/wrapper.rs
// create_setup / create_proof). 4x64-limb Montgomery field arithmetic,
// Jacobian point ops, 8-bit unsigned windows.
//
// Build: part of libzkhashers.so (cpp/Makefile).

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace bn254 {

static const u64 P[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                         0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 R2[4] = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                          0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};
static const u64 R1[4] = {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                          0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};
static const u64 PINV = 0x87d20782e4866389ULL;

struct Fp {
  u64 v[4];
};

static inline bool geq_p(const u64 a[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > P[i]) return true;
    if (a[i] < P[i]) return false;
  }
  return true;  // equal
}

static inline void sub_p(u64 a[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - P[i] - (u64)borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

static inline void fp_add(Fp& r, const Fp& a, const Fp& b) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + (u64)carry;
    r.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq_p(r.v)) sub_p(r.v);
}

static inline void fp_sub(Fp& r, const Fp& a, const Fp& b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - (u64)borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)r.v[i] + P[i] + (u64)carry;
      r.v[i] = (u64)s;
      carry = s >> 64;
    }
  }
}

// CIOS Montgomery multiplication: r = a*b*R^-1 mod p
static inline void fp_mul(Fp& r, const Fp& a, const Fp& b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + (u64)carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[4] + (u64)carry;
    t[4] = (u64)s;
    t[5] = (u64)(s >> 64);
    u64 m = t[0] * PINV;
    carry = ((u128)t[0] + (u128)m * P[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 s2 = (u128)t[j] + (u128)m * P[j] + (u64)carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[4] + (u64)carry;
    t[3] = (u64)s;
    t[4] = t[5] + (u64)(s >> 64);
  }
  for (int i = 0; i < 4; ++i) r.v[i] = t[i];
  if (t[4] || geq_p(r.v)) sub_p(r.v);
}

static inline void fp_sqr(Fp& r, const Fp& a) { fp_mul(r, a, a); }

static inline bool fp_is_zero(const Fp& a) {
  return !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
}

static inline void fp_set_zero(Fp& a) { a.v[0] = a.v[1] = a.v[2] = a.v[3] = 0; }

static inline void fp_to_mont(Fp& r, const Fp& a) {
  Fp r2;
  std::memcpy(r2.v, R2, sizeof(r2.v));
  fp_mul(r, a, r2);
}

static inline void fp_from_mont(Fp& r, const Fp& a) {
  Fp one;
  one.v[0] = 1; one.v[1] = one.v[2] = one.v[3] = 0;
  fp_mul(r, a, one);
}

// Jacobian point (X, Y, Z); infinity encoded as Z == 0.
struct Pt {
  Fp X, Y, Z;
};

static inline void pt_set_inf(Pt& p) {
  fp_set_zero(p.X);
  fp_set_zero(p.Y);
  fp_set_zero(p.Z);
}

static inline bool pt_is_inf(const Pt& p) { return fp_is_zero(p.Z); }

static void pt_double(Pt& r, const Pt& p) {
  // alias-safe (r may be p): all reads of p complete before writing `o`
  if (pt_is_inf(p)) { r = p; return; }
  Pt o;
  Fp A, B, C, D, E, F, t;
  fp_sqr(A, p.X);                 // A = X^2
  fp_sqr(B, p.Y);                 // B = Y^2
  fp_sqr(C, B);                   // C = B^2
  fp_add(t, p.X, B);
  fp_sqr(t, t);
  fp_sub(t, t, A);
  fp_sub(t, t, C);
  fp_add(D, t, t);                // D = 2((X+B)^2 - A - C)
  fp_add(E, A, A);
  fp_add(E, E, A);                // E = 3A
  fp_sqr(F, E);                   // F = E^2
  Fp z2;
  fp_mul(z2, p.Y, p.Z);
  fp_add(o.Z, z2, z2);            // Z' = 2YZ
  fp_sub(o.X, F, D);
  fp_sub(o.X, o.X, D);            // X' = F - 2D
  Fp c8;
  fp_add(c8, C, C);
  fp_add(c8, c8, c8);
  fp_add(c8, c8, c8);             // 8C
  fp_sub(t, D, o.X);
  Fp y2;
  fp_mul(y2, E, t);
  fp_sub(o.Y, y2, c8);            // Y' = E(D - X') - 8C
  r = o;
}

static void pt_add(Pt& r, const Pt& p, const Pt& q) {
  if (pt_is_inf(p)) { r = q; return; }
  if (pt_is_inf(q)) { r = p; return; }
  Fp Z1Z1, Z2Z2, U1, U2, S1, S2, t;
  fp_sqr(Z1Z1, p.Z);
  fp_sqr(Z2Z2, q.Z);
  fp_mul(U1, p.X, Z2Z2);
  fp_mul(U2, q.X, Z1Z1);
  fp_mul(t, q.Z, Z2Z2);
  fp_mul(S1, p.Y, t);
  fp_mul(t, p.Z, Z1Z1);
  fp_mul(S2, q.Y, t);
  Fp H, Rr;
  fp_sub(H, U2, U1);
  fp_sub(Rr, S2, S1);
  if (fp_is_zero(H)) {
    if (fp_is_zero(Rr)) { pt_double(r, p); return; }
    pt_set_inf(r);
    return;
  }
  Fp I, J, V;
  fp_add(t, H, H);
  fp_sqr(I, t);                    // I = (2H)^2
  fp_mul(J, H, I);                 // J = H*I
  fp_add(Rr, Rr, Rr);              // r = 2(S2-S1)
  fp_mul(V, U1, I);                // V = U1*I
  Fp r2;
  fp_sqr(r2, Rr);
  fp_sub(r.X, r2, J);
  fp_sub(r.X, r.X, V);
  fp_sub(r.X, r.X, V);             // X3 = r^2 - J - 2V
  Fp s1j;
  fp_mul(s1j, S1, J);
  fp_add(s1j, s1j, s1j);           // 2*S1*J
  fp_sub(t, V, r.X);
  fp_mul(r.Y, Rr, t);
  fp_sub(r.Y, r.Y, s1j);           // Y3 = r(V - X3) - 2 S1 J
  Fp zz;
  fp_add(zz, p.Z, q.Z);
  fp_sqr(zz, zz);
  fp_sub(zz, zz, Z1Z1);
  fp_sub(zz, zz, Z2Z2);
  fp_mul(r.Z, zz, H);              // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) * H
}

static void fp_inv(Fp& r, const Fp& a) {
  // Fermat: a^(p-2) via square-and-multiply over the Montgomery domain
  u64 e[4];
  std::memcpy(e, P, sizeof(e));
  // e = p - 2
  u128 borrow = 2;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)e[i] - (u64)borrow;
    e[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  Fp base = a, acc;
  std::memcpy(acc.v, R1, sizeof(acc.v));  // 1 in Montgomery form
  for (int limb = 0; limb < 4; ++limb) {
    for (int bit = 0; bit < 64; ++bit) {
      if ((e[limb] >> bit) & 1) fp_mul(acc, acc, base);
      fp_sqr(base, base);
    }
  }
  r = acc;
}

}  // namespace bn254

extern "C" {

// points: n * 8 u64 (affine x limbs || y limbs, little-endian limb order,
//         non-Montgomery); a point with x==y==0 is treated as infinity.
// scalars: n * 4 u64.
// out: 8 u64 affine (x||y); all-zero means infinity.
void bn254_msm(const uint64_t* points, const uint64_t* scalars, uint64_t n,
               uint64_t* out) {
  using namespace bn254;
  const int W = 8;                   // window bits
  const int NWIN = (256 + W - 1) / W;
  std::vector<Pt> pts(n);
  for (u64 i = 0; i < n; ++i) {
    Fp x, y;
    std::memcpy(x.v, points + 8 * i, 32);
    std::memcpy(y.v, points + 8 * i + 4, 32);
    if (fp_is_zero(x) && fp_is_zero(y)) {
      pt_set_inf(pts[i]);
      continue;
    }
    fp_to_mont(pts[i].X, x);
    fp_to_mont(pts[i].Y, y);
    std::memcpy(pts[i].Z.v, R1, 32);  // Z = 1 (Montgomery)
  }
  Pt acc;
  pt_set_inf(acc);
  std::vector<Pt> buckets(1 << W);
  for (int win = NWIN - 1; win >= 0; --win) {
    for (int d = 0; d < W; ++d) pt_double(acc, acc);
    for (auto& b : buckets) pt_set_inf(b);
    int bitpos = win * W;
    for (u64 i = 0; i < n; ++i) {
      int limb = bitpos / 64, off = bitpos % 64;
      u64 frag = scalars[4 * i + limb] >> off;
      if (off && limb < 3) frag |= scalars[4 * i + limb + 1] << (64 - off);
      u64 idx = frag & ((1ULL << W) - 1);
      if (idx) pt_add(buckets[idx], buckets[idx], pts[i]);
    }
    Pt sum, running;
    pt_set_inf(sum);
    pt_set_inf(running);
    for (int b = (1 << W) - 1; b >= 1; --b) {
      pt_add(running, running, buckets[b]);
      pt_add(sum, sum, running);
    }
    pt_add(acc, acc, sum);
  }
  if (pt_is_inf(acc)) {
    std::memset(out, 0, 64);
    return;
  }
  Fp zinv, zinv2, zinv3, xa, ya;
  fp_inv(zinv, acc.Z);
  fp_sqr(zinv2, zinv);
  fp_mul(zinv3, zinv2, zinv);
  fp_mul(xa, acc.X, zinv2);
  fp_mul(ya, acc.Y, zinv3);
  fp_from_mont(xa, xa);
  fp_from_mont(ya, ya);
  std::memcpy(out, xa.v, 32);
  std::memcpy(out + 4, ya.v, 32);
}

}  // extern "C"
