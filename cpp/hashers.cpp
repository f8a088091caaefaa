// Native batch hashers for witness generation: keccak256 + blake2s.
//
// The reference runs its whole witness path natively (Rust); here the
// sequential VM stays Python (for now) but the hash-heavy witness steps —
// EIP-4844 linear hashes, L1-message hashing (keccak256), storage-tree
// node/leaf hashing (blake2s, src/witness/tree/mod.rs Blake2s256 hasher) —
// call into this library via ctypes. Batch entry points hash many
// fixed-size inputs per call to amortize FFI overhead.
//
// Build: make -C cpp   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// --------------------------------------------------------------------------
// keccak-f[1600] / keccak256 (Ethereum padding 0x01)
// --------------------------------------------------------------------------

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static inline uint64_t rol64(uint64_t x, int s) {
  return (x << s) | (x >> (64 - s));
}

static void keccak_f(uint64_t st[25]) {
  // lane index: st[x + 5*y]
  static const int rho[5][5] = {{0, 36, 3, 41, 18},
                                {1, 44, 10, 45, 2},
                                {62, 6, 43, 15, 61},
                                {28, 55, 25, 21, 56},
                                {27, 20, 39, 8, 14}};
  uint64_t b[25], c[5], d[5];
  for (int r = 0; r < 24; r++) {
    for (int x = 0; x < 5; x++)
      c[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rol64(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) st[x + 5 * y] ^= d[x];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rol64(st[x + 5 * y], rho[x][y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        st[x + 5 * y] =
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
    st[0] ^= RC[r];
  }
}

void keccak256(const uint8_t* data, uint64_t len, uint8_t* out32) {
  uint64_t st[25];
  std::memset(st, 0, sizeof(st));
  const uint64_t rate = 136;
  uint64_t off = 0;
  while (len - off >= rate) {
    for (int i = 0; i < 17; i++) {
      uint64_t lane;
      std::memcpy(&lane, data + off + 8 * i, 8);
      st[i] ^= lane;
    }
    keccak_f(st);
    off += rate;
  }
  uint8_t block[136];
  std::memset(block, 0, sizeof(block));
  std::memcpy(block, data + off, len - off);
  block[len - off] = 0x01;
  block[135] ^= 0x80;
  for (int i = 0; i < 17; i++) {
    uint64_t lane;
    std::memcpy(&lane, block + 8 * i, 8);
    st[i] ^= lane;
  }
  keccak_f(st);
  std::memcpy(out32, st, 32);
}

// hash `count` inputs of fixed `stride` bytes each
void keccak256_batch(const uint8_t* data, uint64_t stride, uint64_t count,
                     uint8_t* out) {
  for (uint64_t i = 0; i < count; i++)
    keccak256(data + i * stride, stride, out + i * 32);
}

// --------------------------------------------------------------------------
// blake2s-256 (RFC 7693), unkeyed
// --------------------------------------------------------------------------

static const uint32_t B2S_IV[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                                   0xa54ff53a, 0x510e527f, 0x9b05688c,
                                   0x1f83d9ab, 0x5be0cd19};

static const uint8_t SIGMA[10][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0}};

static inline uint32_t ror32(uint32_t x, int s) {
  return (x >> s) | (x << (32 - s));
}

static void b2s_compress(uint32_t h[8], const uint8_t* block, uint64_t t,
                         bool last) {
  uint32_t m[16], v[16];
  std::memcpy(m, block, 64);
  for (int i = 0; i < 8; i++) v[i] = h[i];
  for (int i = 0; i < 8; i++) v[8 + i] = B2S_IV[i];
  v[12] ^= (uint32_t)t;
  v[13] ^= (uint32_t)(t >> 32);
  if (last) v[14] = ~v[14];
#define G(a, b, c, d, x, y)                                            \
  v[a] = v[a] + v[b] + (x); v[d] = ror32(v[d] ^ v[a], 16);             \
  v[c] = v[c] + v[d];       v[b] = ror32(v[b] ^ v[c], 12);             \
  v[a] = v[a] + v[b] + (y); v[d] = ror32(v[d] ^ v[a], 8);              \
  v[c] = v[c] + v[d];       v[b] = ror32(v[b] ^ v[c], 7);
  for (int r = 0; r < 10; r++) {
    const uint8_t* s = SIGMA[r];
    G(0, 4, 8, 12, m[s[0]], m[s[1]]);
    G(1, 5, 9, 13, m[s[2]], m[s[3]]);
    G(2, 6, 10, 14, m[s[4]], m[s[5]]);
    G(3, 7, 11, 15, m[s[6]], m[s[7]]);
    G(0, 5, 10, 15, m[s[8]], m[s[9]]);
    G(1, 6, 11, 12, m[s[10]], m[s[11]]);
    G(2, 7, 8, 13, m[s[12]], m[s[13]]);
    G(3, 4, 9, 14, m[s[14]], m[s[15]]);
  }
#undef G
  for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[8 + i];
}

void blake2s256(const uint8_t* data, uint64_t len, uint8_t* out32) {
  uint32_t h[8];
  for (int i = 0; i < 8; i++) h[i] = B2S_IV[i];
  h[0] ^= 0x01010000 ^ 32;  // digest_length=32, fanout=depth=1
  uint64_t off = 0;
  uint64_t t = 0;
  while (len > 64 && len - off > 64) {
    t += 64;
    b2s_compress(h, data + off, t, false);
    off += 64;
  }
  uint8_t block[64];
  std::memset(block, 0, sizeof(block));
  uint64_t rem = len - off;
  std::memcpy(block, data + off, rem);
  t += rem;
  b2s_compress(h, block, t, true);
  std::memcpy(out32, h, 32);
}

void blake2s256_batch(const uint8_t* data, uint64_t stride, uint64_t count,
                      uint8_t* out) {
  for (uint64_t i = 0; i < count; i++)
    blake2s256(data + i * stride, stride, out + i * 32);
}

// storage-tree node layer: hash consecutive 64-byte (left||right) pairs
void tree_node_layer(const uint8_t* children, uint64_t count, uint8_t* out) {
  for (uint64_t i = 0; i < count; i++)
    blake2s256(children + i * 64, 64, out + i * 32);
}

}  // extern "C"
