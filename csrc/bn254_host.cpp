// Native host-side BN254 tower arithmetic + reduced Tate pairing.
//
// Role: the reference's native arithmetic backend (constantine) serves its
// verifier pairing and host point algebra (`groth16/bn128/curves.nim:218-221`,
// `groth16/verifier.nim:41-52`).  In this framework the device (TPU) owns
// every throughput-critical op; the pairing is O(1) per proof and lives on
// the host — this file is its native implementation (~100-1000x the pure
// Python fallback in `groth16_tpu/utils/pairing.py`, which stays as the
// oracle and the no-compiler fallback).
//
// Algorithms mirror utils/pairing.py EXACTLY (same Fp12 = Fp2[w]/(w^6 - xi)
// basis, xi = 9 + u, same numerator/denominator Miller loop over r, same
// affine line evaluations), so the two implementations are bitwise
// cross-checkable; only the word-level arithmetic differs (4x64-bit
// Montgomery CIOS with __uint128 accumulators vs Python ints).
//
// ABI (all buffers little-endian, 32 bytes per Fp element, STANDARD form;
// an all-zero affine point means infinity):
//   bn254_miller_loop(g1[64], g2[128], out[384])  -> 0 ok
//   bn254_fp12_pow(a[384], exp_le, nbytes, out[384])
//   bn254_fp12_mul(a[384], b[384], out[384])
//   bn254_fp12_inv(a[384], out[384])
//   bn254_fp12_is_one(a[384]) -> 1/0
//   bn254_g1_mul(p[64], k[32], out[64])  (affine scalar mul, host points)
//   bn254_g2_mul(p[128], k[32], out[128])
//   bn254_g1_add(p[64], q[64], out[64])
//   bn254_g2_add(p[128], q[128], out[128])
//
// Build: g++ -O2 -shared -fPIC -o libbn254host.so bn254_host.cpp
// (driven lazily by groth16_tpu/utils/native.py).

#include <cstdint>
#include <cstring>

typedef uint64_t u64;
typedef __uint128_t u128;

struct Fp { u64 v[4]; };

static const Fp PRIME = {{0x3c208c16d87cfd47ull, 0x97816a916871ca8dull,
                          0xb85045b68181585dull, 0x30644e72e131a029ull}};
static const u64 PINV = 0x87d20782e4866389ull;  // -p^-1 mod 2^64
static const Fp R2 = {{0xf32cfc5b538afa89ull, 0xb5e71911d44501fbull,
                       0x47ab1eff0a417ff6ull, 0x06d89f71cab8351full}};
static const Fp FONE = {{0xd35d438dc58f0d9dull, 0x0a78eb28f5c70b3dull,
                         0x666ea36f7879462cull, 0x0e0a77c19a07df2full}};
static const Fp FZERO = {{0, 0, 0, 0}};
// group order r (Miller loop bound), standard form
static const u64 ORDER_R[4] = {0x43e1f593f0000001ull, 0x2833e84879b97091ull,
                               0xb85045b68181585dull, 0x30644e72e131a029ull};

static inline bool is_zero(const Fp &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool eq(const Fp &a, const Fp &b) {
  return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
         a.v[3] == b.v[3];
}

static inline bool geq_p(const Fp &a) {
  for (int i = 3; i >= 0; --i) {
    if (a.v[i] > PRIME.v[i]) return true;
    if (a.v[i] < PRIME.v[i]) return false;
  }
  return true;  // equal
}

static inline void sub_p(Fp &a) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - PRIME.v[i] - borrow;
    a.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static inline Fp add(const Fp &a, const Fp &b) {
  Fp r;
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq_p(r)) sub_p(r);
  return r;
}

static inline Fp sub(const Fp &a, const Fp &b) {
  Fp r;
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {  // += p
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)r.v[i] + PRIME.v[i] + carry;
      r.v[i] = (u64)s;
      carry = s >> 64;
    }
  }
  return r;
}

static inline Fp neg(const Fp &a) { return is_zero(a) ? a : sub(FZERO, a); }

// Montgomery CIOS product (a*b*R^-1 mod p)
static inline Fp mul(const Fp &a, const Fp &b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[4] + carry;
    t[4] = (u64)s;
    t[5] = (u64)(s >> 64);

    u64 m = t[0] * PINV;
    carry = ((u128)t[0] + (u128)m * PRIME.v[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 s2 = (u128)t[j] + (u128)m * PRIME.v[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[4] + carry;
    t[3] = (u64)s;
    t[4] = t[5] + (u64)(s >> 64);
    t[5] = 0;
  }
  Fp r = {{t[0], t[1], t[2], t[3]}};
  if (t[4] || geq_p(r)) sub_p(r);
  return r;
}

static inline Fp sqr(const Fp &a) { return mul(a, a); }

static inline Fp to_mont(const Fp &a) { return mul(a, R2); }

static inline Fp from_mont(const Fp &a) {
  Fp one_std = {{1, 0, 0, 0}};
  return mul(a, one_std);
}

static Fp fp_pow(const Fp &a, const u64 *e, int limbs) {
  Fp result = FONE, base = a;
  for (int i = 0; i < limbs * 64; ++i) {
    if ((e[i / 64] >> (i % 64)) & 1) result = mul(result, base);
    base = sqr(base);
  }
  return result;
}

static Fp fp_inv(const Fp &a) {  // Fermat: a^(p-2)
  u64 e[4];
  memcpy(e, PRIME.v, sizeof(e));
  e[0] -= 2;  // p is odd, p-2 never borrows past limb 0
  return fp_pow(a, e, 4);
}

// ---------------------------------------------------------------------------
// Fp2 = Fp[u]/(u^2 + 1)
// ---------------------------------------------------------------------------

struct Fp2 { Fp c0, c1; };

static const Fp2 F2ZERO = {FZERO, FZERO};
static const Fp2 F2ONE = {FONE, FZERO};

static inline bool is_zero2(const Fp2 &a) { return is_zero(a.c0) && is_zero(a.c1); }
static inline bool eq2(const Fp2 &a, const Fp2 &b) { return eq(a.c0, b.c0) && eq(a.c1, b.c1); }
static inline Fp2 add2(const Fp2 &a, const Fp2 &b) { return {add(a.c0, b.c0), add(a.c1, b.c1)}; }
static inline Fp2 sub2(const Fp2 &a, const Fp2 &b) { return {sub(a.c0, b.c0), sub(a.c1, b.c1)}; }
static inline Fp2 neg2(const Fp2 &a) { return {neg(a.c0), neg(a.c1)}; }

static inline Fp2 mul2(const Fp2 &a, const Fp2 &b) {
  Fp v0 = mul(a.c0, b.c0), v1 = mul(a.c1, b.c1);
  Fp t = mul(add(a.c0, a.c1), add(b.c0, b.c1));
  return {sub(v0, v1), sub(sub(t, v0), v1)};
}

static inline Fp2 sqr2(const Fp2 &a) { return mul2(a, a); }

static inline Fp2 inv2(const Fp2 &a) {
  Fp norm = add(mul(a.c0, a.c0), mul(a.c1, a.c1));
  Fp ni = fp_inv(norm);
  return {mul(a.c0, ni), neg(mul(a.c1, ni))};
}

static Fp2 XI;  // 9 + u (Montgomery), set in init()

// ---------------------------------------------------------------------------
// Fp12 = Fp2[w]/(w^6 - xi), basis {1, w, ..., w^5} (matches utils/pairing.py)
// ---------------------------------------------------------------------------

struct Fp12 { Fp2 c[6]; };

static Fp12 F12ONE;

static inline Fp12 mul12(const Fp12 &a, const Fp12 &b) {
  Fp2 acc[11];
  for (int k = 0; k < 11; ++k) acc[k] = F2ZERO;
  for (int i = 0; i < 6; ++i) {
    if (is_zero2(a.c[i])) continue;
    for (int j = 0; j < 6; ++j) {
      if (is_zero2(b.c[j])) continue;
      acc[i + j] = add2(acc[i + j], mul2(a.c[i], b.c[j]));
    }
  }
  Fp12 r;
  for (int k = 0; k < 6; ++k) r.c[k] = acc[k];
  for (int k = 6; k < 11; ++k)
    r.c[k - 6] = add2(r.c[k - 6], mul2(XI, acc[k]));
  return r;
}

static inline Fp12 sqr12(const Fp12 &a) { return mul12(a, a); }

static inline Fp12 neg12(const Fp12 &a) {
  Fp12 r;
  for (int k = 0; k < 6; ++k) r.c[k] = neg2(a.c[k]);
  return r;
}

// Fp6 = Fp2[v]/(v^3 - xi) helpers for the tower inversion (A + Bw, v = w^2)
struct Fp6 { Fp2 c[3]; };

static inline Fp6 mul6(const Fp6 &a, const Fp6 &b) {
  Fp2 t0 = mul2(a.c[0], b.c[0]), t1 = mul2(a.c[1], b.c[1]), t2 = mul2(a.c[2], b.c[2]);
  Fp6 r;
  r.c[0] = add2(t0, mul2(XI, sub2(mul2(add2(a.c[1], a.c[2]), add2(b.c[1], b.c[2])), add2(t1, t2))));
  r.c[1] = add2(sub2(mul2(add2(a.c[0], a.c[1]), add2(b.c[0], b.c[1])), add2(t0, t1)), mul2(XI, t2));
  r.c[2] = add2(sub2(mul2(add2(a.c[0], a.c[2]), add2(b.c[0], b.c[2])), add2(t0, t2)), t1);
  return r;
}

static inline Fp6 inv6(const Fp6 &a) {
  Fp2 c0 = sub2(sqr2(a.c[0]), mul2(XI, mul2(a.c[1], a.c[2])));
  Fp2 c1 = sub2(mul2(XI, sqr2(a.c[2])), mul2(a.c[0], a.c[1]));
  Fp2 c2 = sub2(sqr2(a.c[1]), mul2(a.c[0], a.c[2]));
  Fp2 norm = add2(mul2(a.c[0], c0),
                  mul2(XI, add2(mul2(a.c[2], c1), mul2(a.c[1], c2))));
  Fp2 ni = inv2(norm);
  return {{mul2(c0, ni), mul2(c1, ni), mul2(c2, ni)}};
}

static Fp12 inv12(const Fp12 &a) {
  Fp6 A = {{a.c[0], a.c[2], a.c[4]}};
  Fp6 B = {{a.c[1], a.c[3], a.c[5]}};
  Fp6 v = {{F2ZERO, F2ONE, F2ZERO}};
  Fp6 b2v = mul6(mul6(B, B), v);
  Fp6 A2 = mul6(A, A);
  Fp6 norm = {{sub2(A2.c[0], b2v.c[0]), sub2(A2.c[1], b2v.c[1]),
               sub2(A2.c[2], b2v.c[2])}};
  Fp6 ni = inv6(norm);
  Fp6 An = mul6(A, ni);
  Fp6 Bn = mul6({{neg2(B.c[0]), neg2(B.c[1]), neg2(B.c[2])}}, ni);
  return {{An.c[0], Bn.c[0], An.c[1], Bn.c[1], An.c[2], Bn.c[2]}};
}

static Fp12 pow12(const Fp12 &a, const uint8_t *e, int nbytes) {
  Fp12 result = F12ONE, base = a;
  for (int i = 0; i < nbytes * 8; ++i) {
    if ((e[i / 8] >> (i % 8)) & 1) result = mul12(result, base);
    base = sqr12(base);
  }
  return result;
}

// ---------------------------------------------------------------------------
// Miller loop (reduced Tate), affine over G1 with the untwisted Q in Fp12.
// Mirrors utils/pairing.py miller_loop/_line_eval/_vertical_eval.
// ---------------------------------------------------------------------------

struct G1Aff { Fp x, y; bool inf; };

// untwisted Q coordinates enter lines only via w^2/w^3 slots:
// qx12 = x' w^2, qy12 = y' w^3 with x', y' in Fp2.

static inline Fp12 embed_fp(const Fp &c) {
  Fp12 r;
  for (int k = 0; k < 6; ++k) r.c[k] = F2ZERO;
  r.c[0] = {c, FZERO};
  return r;
}

struct LineCtx { Fp2 qx, qy; };  // twist-affine Q

static Fp12 line_plus_const(const Fp2 &q, int slot, const Fp &cst) {
  // q w^slot + cst  (slot 2 for x, 3 for y)
  Fp12 r = embed_fp(cst);
  r.c[slot] = q;
  return r;
}

static Fp12 add12(const Fp12 &a, const Fp12 &b) {
  Fp12 r;
  for (int k = 0; k < 6; ++k) r.c[k] = add2(a.c[k], b.c[k]);
  return r;
}

static Fp12 line_eval(const G1Aff &t, const G1Aff &s, const LineCtx &q,
                      G1Aff &out) {
  if (t.inf) { out = s; return F12ONE; }
  if (s.inf) { out = t; return F12ONE; }
  if (eq(t.x, s.x) && is_zero(add(t.y, s.y))) {
    out.inf = true;
    return line_plus_const(q.qx, 2, neg(t.x));  // vertical: xQ - x1
  }
  Fp lam;
  if (eq(t.x, s.x) && eq(t.y, s.y)) {
    Fp x2 = sqr(t.x);
    lam = mul(add(add(x2, x2), x2), fp_inv(add(t.y, t.y)));
  } else {
    lam = mul(sub(s.y, t.y), fp_inv(sub(s.x, t.x)));
  }
  out.inf = false;
  out.x = sub(sub(sqr(lam), t.x), s.x);
  out.y = sub(mul(lam, sub(t.x, out.x)), t.y);
  // l(Q) = (yQ - y1) - lam (xQ - x1)
  Fp12 ly = line_plus_const(q.qy, 3, neg(t.y));
  Fp12 lx = line_plus_const(q.qx, 2, neg(t.x));
  Fp12 lamf = embed_fp(lam);
  return add12(ly, neg12(mul12(lamf, lx)));
}

static Fp12 vertical_eval(const G1Aff &t, const LineCtx &q) {
  if (t.inf) return F12ONE;
  return line_plus_const(q.qx, 2, neg(t.x));
}

// ---------------------------------------------------------------------------
// byte I/O
// ---------------------------------------------------------------------------

static Fp read_fp(const uint8_t *b) {  // 32B LE standard -> Montgomery
  Fp a;
  memcpy(a.v, b, 32);
  return to_mont(a);
}

static void write_fp(uint8_t *b, const Fp &a) {
  Fp s = from_mont(a);
  memcpy(b, s.v, 32);
}

static Fp2 read_fp2(const uint8_t *b) { return {read_fp(b), read_fp(b + 32)}; }

static void write_fp2(uint8_t *b, const Fp2 &a) {
  write_fp(b, a.c0);
  write_fp(b + 32, a.c1);
}

static Fp12 read_fp12(const uint8_t *b) {
  Fp12 a;
  for (int k = 0; k < 6; ++k) a.c[k] = read_fp2(b + 64 * k);
  return a;
}

static void write_fp12(uint8_t *b, const Fp12 &a) {
  for (int k = 0; k < 6; ++k) write_fp2(b + 64 * k, a.c[k]);
}

static bool INIT_DONE = false;
static void init() {
  if (INIT_DONE) return;
  Fp nine = {{9, 0, 0, 0}};
  Fp one = {{1, 0, 0, 0}};
  XI = {to_mont(nine), to_mont(one)};
  for (int k = 0; k < 6; ++k) F12ONE.c[k] = F2ZERO;
  F12ONE.c[0] = F2ONE;
  INIT_DONE = true;
}

extern "C" {

int bn254_miller_loop(const uint8_t *g1, const uint8_t *g2, uint8_t *out) {
  init();
  G1Aff p = {read_fp(g1), read_fp(g1 + 32), false};
  p.inf = is_zero(p.x) && is_zero(p.y);
  LineCtx q = {read_fp2(g2), read_fp2(g2 + 64)};
  if (p.inf || (is_zero2(q.qx) && is_zero2(q.qy))) {
    write_fp12(out, F12ONE);
    return 0;
  }
  Fp12 f_num = F12ONE, f_den = F12ONE;
  G1Aff t = p;
  int top = 253;  // r is 254 bits; skip the leading 1
  for (int i = top - 1; i >= 0; --i) {
    f_num = sqr12(f_num);
    f_den = sqr12(f_den);
    G1Aff t2;
    Fp12 line = line_eval(t, t, q, t2);
    t = t2;
    f_num = mul12(f_num, line);
    f_den = mul12(f_den, vertical_eval(t, q));
    if ((ORDER_R[i / 64] >> (i % 64)) & 1) {
      line = line_eval(t, p, q, t2);
      t = t2;
      f_num = mul12(f_num, line);
      f_den = mul12(f_den, vertical_eval(t, q));
    }
  }
  if (!t.inf) return 1;  // P not of order r
  write_fp12(out, mul12(f_num, inv12(f_den)));
  return 0;
}

int bn254_fp12_pow(const uint8_t *a, const uint8_t *exp_le, int nbytes,
                   uint8_t *out) {
  init();
  write_fp12(out, pow12(read_fp12(a), exp_le, nbytes));
  return 0;
}

int bn254_fp12_mul(const uint8_t *a, const uint8_t *b, uint8_t *out) {
  init();
  write_fp12(out, mul12(read_fp12(a), read_fp12(b)));
  return 0;
}

int bn254_fp12_inv(const uint8_t *a, uint8_t *out) {
  init();
  write_fp12(out, inv12(read_fp12(a)));
  return 0;
}

int bn254_fp12_is_one(const uint8_t *a) {
  init();
  Fp12 x = read_fp12(a);
  if (!eq2(x.c[0], F2ONE)) return 0;
  for (int k = 1; k < 6; ++k)
    if (!is_zero2(x.c[k])) return 0;
  return 1;
}

// --- host affine EC ops (G1 over Fp, G2 over Fp2) --------------------------
// (0,0) = infinity at the byte boundary, matching hostmath.py / the wire
// convention (curves.nim:49-50).

static void g1_add_aff(const G1Aff &a, const G1Aff &b, G1Aff &r) {
  if (a.inf) { r = b; return; }
  if (b.inf) { r = a; return; }
  Fp lam;
  if (eq(a.x, b.x)) {
    if (!eq(a.y, b.y) || is_zero(a.y)) { r.inf = true; return; }
    Fp x2 = sqr(a.x);
    lam = mul(add(add(x2, x2), x2), fp_inv(add(a.y, a.y)));
  } else {
    lam = mul(sub(b.y, a.y), fp_inv(sub(b.x, a.x)));
  }
  r.inf = false;
  r.x = sub(sub(sqr(lam), a.x), b.x);
  r.y = sub(mul(lam, sub(a.x, r.x)), a.y);
}

struct G2Aff { Fp2 x, y; bool inf; };

static void g2_add_aff(const G2Aff &a, const G2Aff &b, G2Aff &r) {
  if (a.inf) { r = b; return; }
  if (b.inf) { r = a; return; }
  Fp2 lam;
  if (eq2(a.x, b.x)) {
    if (!eq2(a.y, b.y) || is_zero2(a.y)) { r.inf = true; return; }
    Fp2 x2 = sqr2(a.x);
    lam = mul2(add2(add2(x2, x2), x2), inv2(add2(a.y, a.y)));
  } else {
    lam = mul2(sub2(b.y, a.y), inv2(sub2(b.x, a.x)));
  }
  r.inf = false;
  r.x = sub2(sub2(sqr2(lam), a.x), b.x);
  r.y = sub2(mul2(lam, sub2(a.x, r.x)), a.y);
}

int bn254_g1_add(const uint8_t *pa, const uint8_t *pb, uint8_t *out) {
  init();
  G1Aff a = {read_fp(pa), read_fp(pa + 32), false};
  G1Aff b = {read_fp(pb), read_fp(pb + 32), false};
  a.inf = is_zero(a.x) && is_zero(a.y);
  b.inf = is_zero(b.x) && is_zero(b.y);
  G1Aff r;
  g1_add_aff(a, b, r);
  if (r.inf) { memset(out, 0, 64); return 0; }
  write_fp(out, r.x);
  write_fp(out + 32, r.y);
  return 0;
}

int bn254_g1_mul(const uint8_t *pa, const uint8_t *k, uint8_t *out) {
  init();
  G1Aff a = {read_fp(pa), read_fp(pa + 32), false};
  a.inf = is_zero(a.x) && is_zero(a.y);
  G1Aff acc = {FZERO, FZERO, true};
  for (int i = 255; i >= 0; --i) {
    G1Aff t;
    g1_add_aff(acc, acc, t);
    acc = t;
    if ((k[i / 8] >> (i % 8)) & 1) {
      g1_add_aff(acc, a, t);
      acc = t;
    }
  }
  if (acc.inf) { memset(out, 0, 64); return 0; }
  write_fp(out, acc.x);
  write_fp(out + 32, acc.y);
  return 0;
}

int bn254_g2_add(const uint8_t *pa, const uint8_t *pb, uint8_t *out) {
  init();
  G2Aff a = {read_fp2(pa), read_fp2(pa + 64), false};
  G2Aff b = {read_fp2(pb), read_fp2(pb + 64), false};
  a.inf = is_zero2(a.x) && is_zero2(a.y);
  b.inf = is_zero2(b.x) && is_zero2(b.y);
  G2Aff r;
  g2_add_aff(a, b, r);
  if (r.inf) { memset(out, 0, 128); return 0; }
  write_fp2(out, r.x);
  write_fp2(out + 64, r.y);
  return 0;
}

int bn254_g2_mul(const uint8_t *pa, const uint8_t *k, uint8_t *out) {
  init();
  G2Aff a = {read_fp2(pa), read_fp2(pa + 64), false};
  a.inf = is_zero2(a.x) && is_zero2(a.y);
  G2Aff acc = {F2ZERO, F2ZERO, true};
  for (int i = 255; i >= 0; --i) {
    G2Aff t;
    g2_add_aff(acc, acc, t);
    acc = t;
    if ((k[i / 8] >> (i % 8)) & 1) {
      g2_add_aff(acc, a, t);
      acc = t;
    }
  }
  if (acc.inf) { memset(out, 0, 128); return 0; }
  write_fp2(out, acc.x);
  write_fp2(out + 64, acc.y);
  return 0;
}

}  // extern "C"
