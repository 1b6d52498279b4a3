// BN254 (alt_bn128) host-side crypto: Fq Montgomery arithmetic, G1 group
// ops, and the optimal ate pairing — the native twin of the repo's pure-
// Python `fieldmath/hostcurve.py` + `plonk/pairing.py` (same tower, same
// Miller-loop structure, cross-checked by tests/test_native.py).
//
// Role: the VERIFIER/keygen host path (transcript replay, multiopen RLC
// G1 muls, the final pairing check) — the part the reference runs as
// native Rust (halo2curves). Proving never calls into here; the TPU limb
// engine owns that. Built as a plain shared library and driven through
// ctypes (`fieldmath/native.py`); no pybind11 dependency by design.
//
// ABI: field elements are 32-byte little-endian buffers (non-Montgomery);
// G1 points are x||y (64 bytes), G2 points x0||x1||y0||y1 (128 bytes);
// the point at infinity is encoded as all-zero (0,0) — not on either
// curve, so unambiguous.

#include <cstdint>
#include <cstring>
#include <cstdlib>

typedef uint64_t u64;
typedef unsigned __int128 u128;
typedef uint8_t u8;

// ---------------------------------------------------------------------------
// Fq: 4x64-bit Montgomery form
// ---------------------------------------------------------------------------

static const u64 PMOD[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                            0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 PM2[4] = {0x3c208c16d87cfd45ULL, 0x97816a916871ca8dULL,
                           0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 R2[4] = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                          0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};
static const u64 PINV = 0x87d20782e4866389ULL;  // -P^-1 mod 2^64

struct Fq { u64 v[4]; };

static const Fq FQ_ZERO = {{0, 0, 0, 0}};
// 2^256 mod P (Montgomery representation of 1)
static const Fq FQ_ONE = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                           0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}};

static inline bool fq_is_zero(const Fq &a) {
    return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool fq_eq(const Fq &a, const Fq &b) {
    return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
           a.v[3] == b.v[3];
}

static inline bool geq_p(const u64 t[4]) {
    for (int i = 3; i >= 0; i--) {
        if (t[i] > PMOD[i]) return true;
        if (t[i] < PMOD[i]) return false;
    }
    return true;  // equal
}

static inline void sub_p(u64 t[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 cur = (u128)t[i] - PMOD[i] - borrow;
        t[i] = (u64)cur;
        borrow = (cur >> 64) ? 1 : 0;
    }
}

static inline void fq_add(Fq &r, const Fq &a, const Fq &b) {
    u64 t[4];
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 cur = (u128)a.v[i] + b.v[i] + carry;
        t[i] = (u64)cur;
        carry = cur >> 64;
    }
    if (carry || geq_p(t)) sub_p(t);
    memcpy(r.v, t, 32);
}

static inline void fq_sub(Fq &r, const Fq &a, const Fq &b) {
    u128 borrow = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 cur = (u128)a.v[i] - b.v[i] - borrow;
        t[i] = (u64)cur;
        borrow = (cur >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 cur = (u128)t[i] + PMOD[i] + carry;
            t[i] = (u64)cur;
            carry = cur >> 64;
        }
    }
    memcpy(r.v, t, 32);
}

static inline void fq_neg(Fq &r, const Fq &a) {
    if (fq_is_zero(a)) { r = a; return; }
    fq_sub(r, FQ_ZERO, a);
}

// interleaved CIOS Montgomery multiplication
static void fq_mul(Fq &r, const Fq &a, const Fq &b) {
    u64 t[4] = {0, 0, 0, 0};
    u64 t4 = 0, t5 = 0;
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t4 + carry;
        t4 = (u64)cur;
        t5 = (u64)(cur >> 64);
        u64 m = t[0] * PINV;
        carry = ((u128)m * PMOD[0] + t[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            cur = (u128)t[j] + (u128)m * PMOD[j] + carry;
            t[j - 1] = (u64)cur;
            carry = cur >> 64;
        }
        cur = (u128)t4 + carry;
        t[3] = (u64)cur;
        t4 = t5 + (u64)(cur >> 64);
    }
    if (t4 || geq_p(t)) sub_p(t);
    memcpy(r.v, t, 32);
}

static inline void fq_sqr(Fq &r, const Fq &a) { fq_mul(r, a, a); }

static void fq_pow_limbs(Fq &r, const Fq &base, const u64 e[4]) {
    Fq acc = FQ_ONE, b = base;
    for (int limb = 0; limb < 4; limb++) {
        u64 w = e[limb];
        for (int bit = 0; bit < 64; bit++) {
            if (w & 1) fq_mul(acc, acc, b);
            fq_sqr(b, b);
            w >>= 1;
        }
    }
    r = acc;
}

static inline void fq_inv(Fq &r, const Fq &a) { fq_pow_limbs(r, a, PM2); }

static void fq_from_bytes(Fq &r, const u8 *le32) {
    Fq raw;
    for (int i = 0; i < 4; i++) {
        u64 w = 0;
        for (int j = 7; j >= 0; j--) w = (w << 8) | le32[i * 8 + j];
        raw.v[i] = w;
    }
    Fq r2 = {{R2[0], R2[1], R2[2], R2[3]}};
    fq_mul(r, raw, r2);  // to Montgomery
}

static void fq_to_bytes(u8 *le32, const Fq &a) {
    Fq one_raw = {{1, 0, 0, 0}};
    Fq out;
    fq_mul(out, a, one_raw);  // from Montgomery
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 8; j++)
            le32[i * 8 + j] = (u8)(out.v[i] >> (8 * j));
}

// ---------------------------------------------------------------------------
// G1 (jacobian, a = 0, b = 3)
// ---------------------------------------------------------------------------

struct G1 { Fq x, y, z; };  // z == 0 -> identity

static const G1 G1_ID = {FQ_ZERO, FQ_ONE, FQ_ZERO};

static inline bool g1_is_id(const G1 &p) { return fq_is_zero(p.z); }

// dbl-2009-l
static void g1_dbl(G1 &r, const G1 &p) {
    if (g1_is_id(p)) { r = p; return; }
    Fq A, B, C, D, E, F, t;
    fq_sqr(A, p.x);
    fq_sqr(B, p.y);
    fq_sqr(C, B);
    fq_add(D, p.x, B);
    fq_sqr(D, D);
    fq_sub(D, D, A);
    fq_sub(D, D, C);
    fq_add(D, D, D);
    fq_add(E, A, A);
    fq_add(E, E, A);
    fq_sqr(F, E);
    fq_sub(r.x, F, D);
    fq_sub(r.x, r.x, D);
    fq_sub(t, D, r.x);
    fq_mul(t, E, t);
    Fq c8;
    fq_add(c8, C, C);
    fq_add(c8, c8, c8);
    fq_add(c8, c8, c8);
    Fq yz;
    fq_mul(yz, p.y, p.z);
    fq_sub(r.y, t, c8);
    fq_add(r.z, yz, yz);
}

// add-2007-bl
static void g1_add(G1 &r, const G1 &p, const G1 &q) {
    if (g1_is_id(p)) { r = q; return; }
    if (g1_is_id(q)) { r = p; return; }
    Fq z1z1, z2z2, u1, u2, s1, s2, t;
    fq_sqr(z1z1, p.z);
    fq_sqr(z2z2, q.z);
    fq_mul(u1, p.x, z2z2);
    fq_mul(u2, q.x, z1z1);
    fq_mul(s1, p.y, q.z);
    fq_mul(s1, s1, z2z2);
    fq_mul(s2, q.y, p.z);
    fq_mul(s2, s2, z1z1);
    if (fq_eq(u1, u2)) {
        if (fq_eq(s1, s2)) { g1_dbl(r, p); return; }
        r = G1_ID;
        return;
    }
    Fq h, i, j, rr, v;
    fq_sub(h, u2, u1);
    fq_add(i, h, h);
    fq_sqr(i, i);
    fq_mul(j, h, i);
    fq_sub(rr, s2, s1);
    fq_add(rr, rr, rr);
    fq_mul(v, u1, i);
    fq_sqr(r.x, rr);
    fq_sub(r.x, r.x, j);
    fq_sub(r.x, r.x, v);
    fq_sub(r.x, r.x, v);
    fq_sub(t, v, r.x);
    fq_mul(t, rr, t);
    Fq s1j;
    fq_mul(s1j, s1, j);
    fq_add(s1j, s1j, s1j);
    fq_sub(r.y, t, s1j);
    fq_add(t, p.z, q.z);
    fq_sqr(t, t);
    fq_sub(t, t, z1z1);
    fq_sub(t, t, z2z2);
    fq_mul(r.z, t, h);
}

static void g1_from_bytes(G1 &r, const u8 *xy64, bool *ok) {
    bool allz = true;
    for (int i = 0; i < 64; i++) if (xy64[i]) { allz = false; break; }
    if (allz) { r = G1_ID; *ok = true; return; }
    fq_from_bytes(r.x, xy64);
    fq_from_bytes(r.y, xy64 + 32);
    r.z = FQ_ONE;
    // y^2 == x^3 + 3 (3 in Montgomery = ONE+ONE+ONE)
    Fq y2, x3, three;
    fq_sqr(y2, r.y);
    fq_sqr(x3, r.x);
    fq_mul(x3, x3, r.x);
    fq_add(three, FQ_ONE, FQ_ONE);
    fq_add(three, three, FQ_ONE);
    fq_add(x3, x3, three);
    *ok = fq_eq(y2, x3);
}

static void g1_to_bytes(u8 *xy64, const G1 &p) {
    if (g1_is_id(p)) { memset(xy64, 0, 64); return; }
    Fq zinv, zinv2, zinv3, ax, ay;
    fq_inv(zinv, p.z);
    fq_sqr(zinv2, zinv);
    fq_mul(zinv3, zinv2, zinv);
    fq_mul(ax, p.x, zinv2);
    fq_mul(ay, p.y, zinv3);
    fq_to_bytes(xy64, ax);
    fq_to_bytes(xy64 + 32, ay);
}

static void g1_scalar_mul(G1 &r, const G1 &p, const u8 *sc32le) {
    G1 acc = G1_ID;
    for (int byte = 31; byte >= 0; byte--) {
        for (int bit = 7; bit >= 0; bit--) {
            g1_dbl(acc, acc);
            if ((sc32le[byte] >> bit) & 1) g1_add(acc, acc, p);
        }
    }
    r = acc;
}

// ---------------------------------------------------------------------------
// Fq2 / Fq6 / Fq12 tower (mirrors plonk/pairing.py)
// ---------------------------------------------------------------------------

struct Fq2 { Fq c0, c1; };
struct Fq6 { Fq2 c0, c1, c2; };
struct Fq12 { Fq6 c0, c1; };

static const Fq2 F2_ZERO_ = {FQ_ZERO, FQ_ZERO};
static const Fq2 F2_ONE_ = {FQ_ONE, FQ_ZERO};

static inline void f2_add(Fq2 &r, const Fq2 &a, const Fq2 &b) {
    fq_add(r.c0, a.c0, b.c0);
    fq_add(r.c1, a.c1, b.c1);
}

static inline void f2_sub(Fq2 &r, const Fq2 &a, const Fq2 &b) {
    fq_sub(r.c0, a.c0, b.c0);
    fq_sub(r.c1, a.c1, b.c1);
}

static inline void f2_neg(Fq2 &r, const Fq2 &a) {
    fq_neg(r.c0, a.c0);
    fq_neg(r.c1, a.c1);
}

static void f2_mul(Fq2 &r, const Fq2 &a, const Fq2 &b) {
    Fq t0, t1, t2, sa, sb;
    fq_mul(t0, a.c0, b.c0);
    fq_mul(t1, a.c1, b.c1);
    fq_add(sa, a.c0, a.c1);
    fq_add(sb, b.c0, b.c1);
    fq_mul(t2, sa, sb);
    fq_sub(r.c0, t0, t1);
    fq_sub(t2, t2, t0);
    fq_sub(r.c1, t2, t1);
}

static inline void f2_sqr(Fq2 &r, const Fq2 &a) { f2_mul(r, a, a); }

static void f2_inv(Fq2 &r, const Fq2 &a) {
    Fq d, t0, t1;
    fq_sqr(t0, a.c0);
    fq_sqr(t1, a.c1);
    fq_add(d, t0, t1);
    fq_inv(d, d);
    fq_mul(r.c0, a.c0, d);
    fq_mul(t0, a.c1, d);
    fq_neg(r.c1, t0);
}

static inline void f2_conj(Fq2 &r, const Fq2 &a) {
    r.c0 = a.c0;
    fq_neg(r.c1, a.c1);
}

static inline bool f2_is_zero(const Fq2 &a) {
    return fq_is_zero(a.c0) && fq_is_zero(a.c1);
}

static inline bool f2_eq(const Fq2 &a, const Fq2 &b) {
    return fq_eq(a.c0, b.c0) && fq_eq(a.c1, b.c1);
}

// xi = 9 + u
static void f2_mul_xi(Fq2 &r, const Fq2 &a) {
    // (a0 + a1 u)(9 + u) = (9 a0 - a1) + (a0 + 9 a1) u
    Fq nine_a0, nine_a1, t;
    Fq nine;
    fq_add(nine, FQ_ONE, FQ_ONE);       // 2
    fq_add(nine, nine, nine);           // 4
    fq_add(nine, nine, nine);           // 8
    fq_add(nine, nine, FQ_ONE);         // 9
    fq_mul(nine_a0, a.c0, nine);
    fq_mul(nine_a1, a.c1, nine);
    fq_sub(t, nine_a0, a.c1);
    fq_add(r.c1, a.c0, nine_a1);
    r.c0 = t;
}

static inline void f6_add(Fq6 &r, const Fq6 &a, const Fq6 &b) {
    f2_add(r.c0, a.c0, b.c0);
    f2_add(r.c1, a.c1, b.c1);
    f2_add(r.c2, a.c2, b.c2);
}

static inline void f6_sub(Fq6 &r, const Fq6 &a, const Fq6 &b) {
    f2_sub(r.c0, a.c0, b.c0);
    f2_sub(r.c1, a.c1, b.c1);
    f2_sub(r.c2, a.c2, b.c2);
}

static inline void f6_neg(Fq6 &r, const Fq6 &a) {
    f2_neg(r.c0, a.c0);
    f2_neg(r.c1, a.c1);
    f2_neg(r.c2, a.c2);
}

static void f6_mul(Fq6 &r, const Fq6 &a, const Fq6 &b) {
    Fq2 t0, t1, t2, s1, s2, u1, u2, x;
    f2_mul(t0, a.c0, b.c0);
    f2_mul(t1, a.c1, b.c1);
    f2_mul(t2, a.c2, b.c2);
    // c0 = t0 + xi*((a1+a2)(b1+b2) - t1 - t2)
    f2_add(s1, a.c1, a.c2);
    f2_add(s2, b.c1, b.c2);
    f2_mul(x, s1, s2);
    f2_sub(x, x, t1);
    f2_sub(x, x, t2);
    f2_mul_xi(x, x);
    Fq2 c0;
    f2_add(c0, t0, x);
    // c1 = (a0+a1)(b0+b1) - t0 - t1 + xi*t2
    f2_add(u1, a.c0, a.c1);
    f2_add(u2, b.c0, b.c1);
    f2_mul(x, u1, u2);
    f2_sub(x, x, t0);
    f2_sub(x, x, t1);
    Fq2 xit2;
    f2_mul_xi(xit2, t2);
    Fq2 c1;
    f2_add(c1, x, xit2);
    // c2 = (a0+a2)(b0+b2) - t0 - t2 + t1
    f2_add(u1, a.c0, a.c2);
    f2_add(u2, b.c0, b.c2);
    f2_mul(x, u1, u2);
    f2_sub(x, x, t0);
    f2_sub(x, x, t2);
    f2_add(r.c2, x, t1);
    r.c0 = c0;
    r.c1 = c1;
}

static void f6_mul_by_v(Fq6 &r, const Fq6 &a) {
    Fq2 t;
    f2_mul_xi(t, a.c2);
    r.c2 = a.c1;
    r.c1 = a.c0;
    r.c0 = t;
}

static void f12_mul(Fq12 &r, const Fq12 &a, const Fq12 &b) {
    Fq6 t0, t1, s, sa, sb, vt1;
    f6_mul(t0, a.c0, b.c0);
    f6_mul(t1, a.c1, b.c1);
    f6_mul_by_v(vt1, t1);
    Fq6 c0;
    f6_add(c0, t0, vt1);
    f6_add(sa, a.c0, a.c1);
    f6_add(sb, b.c0, b.c1);
    f6_mul(s, sa, sb);
    f6_sub(s, s, t0);
    f6_sub(r.c1, s, t1);
    r.c0 = c0;
}

static inline void f12_sqr(Fq12 &r, const Fq12 &a) { f12_mul(r, a, a); }

static bool f12_is_one(const Fq12 &a) {
    return f2_eq(a.c0.c0, F2_ONE_) && f2_is_zero(a.c0.c1) &&
           f2_is_zero(a.c0.c2) && f2_is_zero(a.c1.c0) &&
           f2_is_zero(a.c1.c1) && f2_is_zero(a.c1.c2);
}

// ---------------------------------------------------------------------------
// G2 affine over Fq2 + Miller loop (mirrors pairing.py structure)
// ---------------------------------------------------------------------------

struct G2A { Fq2 x, y; bool id; };

static void g2_add(G2A &r, const G2A &p, const G2A &q) {
    if (p.id) { r = q; return; }
    if (q.id) { r = p; return; }
    Fq2 lam, t, d;
    if (f2_eq(p.x, q.x)) {
        Fq2 s;
        f2_add(s, p.y, q.y);
        if (f2_is_zero(s)) { r.id = true; return; }
        // lam = 3 x^2 / (2 y)
        f2_sqr(t, p.x);
        Fq2 three_x2;
        f2_add(three_x2, t, t);
        f2_add(three_x2, three_x2, t);
        Fq2 two_y;
        f2_add(two_y, p.y, p.y);
        f2_inv(d, two_y);
        f2_mul(lam, three_x2, d);
    } else {
        Fq2 dy, dx;
        f2_sub(dy, q.y, p.y);
        f2_sub(dx, q.x, p.x);
        f2_inv(d, dx);
        f2_mul(lam, dy, d);
    }
    Fq2 x3, y3;
    f2_sqr(x3, lam);
    f2_sub(x3, x3, p.x);
    f2_sub(x3, x3, q.x);
    f2_sub(t, p.x, x3);
    f2_mul(y3, lam, t);
    f2_sub(y3, y3, p.y);
    r.x = x3;
    r.y = y3;
    r.id = false;
}

// line through pq/r (tangent if equal) evaluated at embedded G1 (px, py)
static void line_eval(Fq12 &out, const G2A &t, const G2A &q, const Fq &px,
                      const Fq &py) {
    Fq2 lam;
    if (f2_eq(t.x, q.x) && f2_eq(t.y, q.y)) {
        Fq2 x2, three_x2, two_y, d;
        f2_sqr(x2, t.x);
        f2_add(three_x2, x2, x2);
        f2_add(three_x2, three_x2, x2);
        f2_add(two_y, t.y, t.y);
        f2_inv(d, two_y);
        f2_mul(lam, three_x2, d);
    } else if (f2_eq(t.x, q.x)) {
        // vertical: px - x1 * w^2
        memset(&out, 0, sizeof(out));
        out.c0.c0.c0 = px;
        f2_neg(out.c0.c1, t.x);
        return;
    } else {
        Fq2 dy, dx, d;
        f2_sub(dy, q.y, t.y);
        f2_sub(dx, q.x, t.x);
        f2_inv(d, dx);
        f2_mul(lam, dy, d);
    }
    // py + [-lam*px] w + [lam*x1 - y1] w^3   (w^3 = v*w)
    memset(&out, 0, sizeof(out));
    out.c0.c0.c0 = py;
    Fq2 lam_px;
    fq_mul(lam_px.c0, lam.c0, px);
    fq_mul(lam_px.c1, lam.c1, px);
    f2_neg(out.c1.c0, lam_px);
    Fq2 lx1;
    f2_mul(lx1, lam, t.x);
    f2_sub(out.c1.c1, lx1, t.y);
}

// frobenius twist coefficients gamma12 = xi^((p-1)/3), gamma13 = xi^((p-1)/2)
static Fq2 G12_C, G13_C;
static bool FROB_INIT = false;

static void f2_pow_bytes(Fq2 &r, const Fq2 &a, const u8 *be, int len) {
    Fq2 acc = F2_ONE_, b = a;
    for (int i = len - 1; i >= 0; i--) {
        u8 w = be[i];
        for (int bit = 0; bit < 8; bit++) {
            if (w & 1) f2_mul(acc, acc, b);
            f2_sqr(b, b);
            w >>= 1;
        }
    }
    r = acc;
}

static int hexval(char c) {
    if (c >= '0' && c <= '9') return c - '0';
    if (c >= 'a' && c <= 'f') return c - 'a' + 10;
    return c - 'A' + 10;
}

static void init_frobenius() {
    if (FROB_INIT) return;
    // (p-1)/3 and (p-1)/2 as big-endian bytes (computed from PMOD)
    // p - 1:
    u8 pm1[32];
    {
        u64 t[4];
        memcpy(t, PMOD, 32);
        t[0] -= 1;  // p is odd, no borrow
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 8; j++)
                pm1[31 - (i * 8 + j)] = (u8)(t[i] >> (8 * j));
    }
    // divide big-endian byte string by small k
    auto divsmall = [](const u8 *in, u8 *out, int len, int k) {
        int rem = 0;
        for (int i = 0; i < len; i++) {
            int cur = rem * 256 + in[i];
            out[i] = (u8)(cur / k);
            rem = cur % k;
        }
    };
    u8 e3[32], e2[32];
    divsmall(pm1, e3, 32, 3);
    divsmall(pm1, e2, 32, 2);
    Fq2 xi;
    {
        Fq nine;
        fq_add(nine, FQ_ONE, FQ_ONE);
        fq_add(nine, nine, nine);
        fq_add(nine, nine, nine);
        fq_add(nine, nine, FQ_ONE);
        xi.c0 = nine;
        xi.c1 = FQ_ONE;
    }
    f2_pow_bytes(G12_C, xi, e3, 32);
    f2_pow_bytes(G13_C, xi, e2, 32);
    FROB_INIT = true;
}

static void g2_frobenius(G2A &r, const G2A &q) {
    init_frobenius();
    Fq2 cx, cy;
    f2_conj(cx, q.x);
    f2_conj(cy, q.y);
    f2_mul(r.x, cx, G12_C);
    f2_mul(r.y, cy, G13_C);
    r.id = false;
}

// ate loop 6t+2 = 29793968203157093288 = 0x19D797039BE763BA8
static const u64 ATE_LOOP_LO = 0x9D797039BE763BA8ULL;
static const u64 ATE_LOOP_HI = 0x1ULL;  // 65-bit value

static void miller_loop(Fq12 &f, const G2A &q, const Fq &px, const Fq &py) {
    // MSB-first over the 65-bit loop constant, skipping the leading 1
    f.c0.c0 = F2_ONE_;
    f.c0.c1 = F2_ZERO_;
    f.c0.c2 = F2_ZERO_;
    memset(&f.c1, 0, sizeof(f.c1));
    G2A t = q;
    Fq12 l;
    // bits: total 65, skip top bit -> 64 iterations
    for (int i = 63; i >= 0; i--) {
        f12_sqr(f, f);
        line_eval(l, t, t, px, py);
        f12_mul(f, f, l);
        g2_add(t, t, t);
        int bit = (i >= 64) ? (int)((ATE_LOOP_HI >> (i - 64)) & 1)
                            : (int)((ATE_LOOP_LO >> i) & 1);
        if (bit) {
            line_eval(l, t, q, px, py);
            f12_mul(f, f, l);
            g2_add(t, t, q);
        }
    }
    G2A q1, q2;
    g2_frobenius(q1, q);
    g2_frobenius(q2, q1);
    f2_neg(q2.y, q2.y);
    line_eval(l, t, q1, px, py);
    f12_mul(f, f, l);
    g2_add(t, t, q1);
    line_eval(l, t, q2, px, py);
    f12_mul(f, f, l);
}

// (p^12 - 1) / r, big-endian hex (2790 bits)
static const char *FINAL_EXP_HEX =
"2f4b6dc97020fddadf107d20bc842d43bf6369b1ff6a1c71015f3f7be2e1e30a73bb94fec0daf1"
"5466b2383a5d3ec3d15ad524d8f70c54efee1bd8c3b21377e563a09a1b705887e72eceaddea379"
"0364a61f676baaf977870e88d5c6c8fef0781361e443ae77f5b63a2a2264487f2940a8b1ddb3d1"
"5062cd0fb2015dfc6668449aed3cc48a82d0d602d268c7daab6a41294c0cc4ebe5664568dfc50e"
"1648a45a4a1e3a5195846a3ed011a337a02088ec80e0ebae8755cfe107acf3aafb40494e406f80"
"4216bb10cf430b0f37856b42db8dc5514724ee93dfb10826f0dd4a0364b9580291d2cd65664814"
"fde37ca80bb4ea44eacc5e641bbadf423f9a2cbf813b8d145da90029baee7ddadda71c7f3811c4"
"105262945bba1668c3be69a3c230974d83561841d766f9c9d570bb7fbe04c7e8a6c3c760c0de81"
"def35692da361102b6b9b2b918837fa97896e84abb40a4efb7e54523a486964b64ca86f120";

static void final_exponentiation(Fq12 &r, const Fq12 &f) {
    // parse hex once
    static u8 exp_bytes[512];
    static int exp_len = 0;
    if (!exp_len) {
        int hl = (int)strlen(FINAL_EXP_HEX);
        exp_len = (hl + 1) / 2;
        int k = 0;
        int i = 0;
        if (hl & 1) {  // odd-length: first nibble alone
            exp_bytes[k++] = (u8)hexval(FINAL_EXP_HEX[0]);
            i = 1;
        }
        for (; i < hl; i += 2)
            exp_bytes[k++] = (u8)((hexval(FINAL_EXP_HEX[i]) << 4) |
                                  hexval(FINAL_EXP_HEX[i + 1]));
        exp_len = k;
    }
    Fq12 acc;
    memset(&acc, 0, sizeof(acc));
    acc.c0.c0 = F2_ONE_;
    for (int i = 0; i < exp_len; i++) {
        u8 w = exp_bytes[i];
        for (int bit = 7; bit >= 0; bit--) {
            f12_sqr(acc, acc);
            if ((w >> bit) & 1) f12_mul(acc, acc, f);
        }
    }
    r = acc;
}

// ---------------------------------------------------------------------------
// exported C ABI
// ---------------------------------------------------------------------------

extern "C" {

// out = a + b; returns 0 on success, -1 if an input is off-curve
int ez_g1_add(const u8 *a, const u8 *b, u8 *out) {
    G1 pa, pb, r;
    bool ok1, ok2;
    g1_from_bytes(pa, a, &ok1);
    g1_from_bytes(pb, b, &ok2);
    if (!ok1 || !ok2) return -1;
    g1_add(r, pa, pb);
    g1_to_bytes(out, r);
    return 0;
}

// out = scalar * p (scalar: 32-byte LE, already reduced mod r by caller)
int ez_g1_mul(const u8 *p, const u8 *scalar, u8 *out) {
    G1 pp, r;
    bool ok;
    g1_from_bytes(pp, p, &ok);
    if (!ok) return -1;
    g1_scalar_mul(r, pp, scalar);
    g1_to_bytes(out, r);
    return 0;
}

// out = sum_i scalars[i] * points[i]; points: n*64 bytes, scalars: n*32
int ez_g1_msm(const u8 *points, const u8 *scalars, size_t n, u8 *out) {
    G1 acc = G1_ID;
    for (size_t i = 0; i < n; i++) {
        G1 p, t;
        bool ok;
        g1_from_bytes(p, points + 64 * i, &ok);
        if (!ok) return -1;
        g1_scalar_mul(t, p, scalars + 32 * i);
        g1_add(acc, acc, t);
    }
    g1_to_bytes(out, acc);
    return 0;
}

// prod_i e(P_i, Q_i) == 1 ?  g1s: n*64, g2s: n*128 (x0 x1 y0 y1 LE each 32)
// returns 1 yes, 0 no, -1 on malformed input
int ez_pairing_check(const u8 *g1s, const u8 *g2s, size_t n) {
    init_frobenius();
    Fq12 f;
    memset(&f, 0, sizeof(f));
    f.c0.c0 = F2_ONE_;
    for (size_t i = 0; i < n; i++) {
        const u8 *p = g1s + 64 * i;
        const u8 *q = g2s + 128 * i;
        bool pz = true, qz = true;
        for (int j = 0; j < 64; j++) if (p[j]) { pz = false; break; }
        for (int j = 0; j < 128; j++) if (q[j]) { qz = false; break; }
        if (pz || qz) continue;  // identity factor = 1
        G1 pp;
        bool ok;
        g1_from_bytes(pp, p, &ok);
        if (!ok) return -1;
        // affine G1 coords for the line evaluations
        u8 aff[64];
        g1_to_bytes(aff, pp);
        Fq px, py;
        fq_from_bytes(px, aff);
        fq_from_bytes(py, aff + 32);
        G2A qq;
        fq_from_bytes(qq.x.c0, q);
        fq_from_bytes(qq.x.c1, q + 32);
        fq_from_bytes(qq.y.c0, q + 64);
        fq_from_bytes(qq.y.c1, q + 96);
        qq.id = false;
        Fq12 m;
        miller_loop(m, qq, px, py);
        f12_mul(f, f, m);
    }
    Fq12 out;
    final_exponentiation(out, f);
    return f12_is_one(out) ? 1 : 0;
}

int ez_version() { return 1; }

}  // extern "C"
