"""Radix-2 NTT / coset-FFT over BN254 Fr, vectorized for the TPU VPU.

Replaces the reference's `EvaluationDomain` FFT machinery which lives in the
halo2 fork (+ ICICLE CUDA NTT when `gpu-accelerated`); see SURVEY.md §2.1 and
`/root/reference/src/circuit/modules/polycommit.rs:52` for where the
reference crosses into it.

TPU-first design:

* Data layout ``(16, n)`` uint32 Montgomery limbs (limb axis first) so every
  butterfly stage is a single broadcasted ``mont_mul`` over ``n/2`` lanes plus
  vectorized add/sub — no scalar loops, no dynamic shapes.
* Decimation-in-time with ONE static bit-reversal gather up front, then
  ``log2(n)`` stages of pure reshape + concat (XLA-friendly, fuses well).
* Twiddles are computed ON DEVICE by repeated squaring/doubling
  (``limbs.powers``) and cached per (field, n, direction); stage twiddles are
  static strided slices of the master table.
* Inverse NTT = forward with omega^{-1} twiddles + one scale by n^{-1}.
* Coset FFT multiplies by powers of the coset generator (zeta) first —
  exactly the trick the fork's `precompute-coset` feature caches
  (`/root/reference/Cargo.toml:218`).

Multi-chip: `ntt` composes with shard_map by running local NTTs on shards
and combining via the four-step (Bailey) decomposition in
`ezkl_tpu.parallel.ntt_sharded`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fieldmath import limbs
from ..fieldmath.spec import FieldSpec, LIMB_BITS, LIMB_MASK, NLIMBS, bn254_fr


# ---------------------------------------------------------------------------
# twiddle caches (host-cached device arrays, keyed by (spec, k, inverse))
# ---------------------------------------------------------------------------

def root_of_unity(spec: FieldSpec, k: int, inverse: bool = False) -> int:
    """Primitive 2^k-th root of unity in the field (as a Python int)."""
    assert k <= spec.two_adicity, f"domain 2^{k} exceeds field 2-adicity"
    w = pow(spec.root_of_unity, 1 << (spec.two_adicity - k), spec.modulus)
    if inverse:
        w = pow(w, -1, spec.modulus)
    return w


def _host_powers(spec: FieldSpec, w: int, n: int) -> np.ndarray:
    """[w^0 .. w^(n-1)] as HOST (16, n) Montgomery limbs.

    Computed with Python bigints (host numpy, never device): lru-cached
    constants must be concrete — `jax.ensure_compile_time_eval()` does NOT
    force concreteness under a shard_map trace, so a device-side compute
    here would cache a ShardMapTracer when the NTT first runs inside
    `parallel.sharded.ntt_sharded` and poison every later jit.

    Vectorized: log2(n) doubling rounds build the power ladder as
    object-array multiplies (P[m:2m] = P[:m] * w^m), then Montgomery-scale
    and slice limbs in NLIMBS vectorized passes — no per-element
    `int_to_limbs` loop (~20x faster at n=2^20 than the naive loop)."""
    p = spec.modulus
    pw = np.array([1], dtype=object)
    while len(pw) < n:
        m = len(pw)
        pw = np.concatenate([pw, (pw * pow(w, m, p)) % p])
    pw = (pw[:n] * spec.r) % p  # to Montgomery form, vectorized
    out = np.zeros((NLIMBS, n), np.uint32)
    for i in range(NLIMBS):
        out[i] = (pw & LIMB_MASK).astype(np.uint32)
        pw = pw >> LIMB_BITS
    return out


@functools.lru_cache(maxsize=64)
def _twiddles_host(spec: FieldSpec, k: int, inverse: bool) -> np.ndarray:
    """Master table [w^0 .. w^(n/2 - 1)] as HOST (16, n/2) Montgomery limbs.

    NUMPY result on purpose. lru-caching a `jnp.asarray` here is the
    round-4 regression: under a jit trace `jnp.asarray(np_array)` returns a
    DynamicJaxprTracer, the cache retains it, and every later distinct jit
    of the same size dies with UnexpectedTracerError. Device residency is
    handled separately by `_dev_cached`, which refuses to memoize tracers."""
    n = 1 << k
    w = root_of_unity(spec, k, inverse)
    return _host_powers(spec, w, max(n // 2, 1))


_DEV_MEMO: dict = {}


def _dev_cached(key, host: np.ndarray) -> jnp.ndarray:
    """Device-resident constant memo that CANNOT be poisoned by tracers.

    `jnp.asarray(host)` inside an active trace yields a Tracer; storing one
    breaks every subsequent jit that touches the same table (the r4 HEAD
    regression). We only memoize when the result is a concrete array —
    under a trace we return the per-trace staged constant uncached, which
    is correct (XLA folds it) and costs one host->device transfer per
    compile, not per call."""
    hit = _DEV_MEMO.get(key)
    if hit is not None:
        return hit
    arr = jnp.asarray(host)
    if not isinstance(arr, jax.core.Tracer):
        _DEV_MEMO[key] = arr
    return arr


def _twiddles(spec: FieldSpec, k: int, inverse: bool) -> jnp.ndarray:
    return _dev_cached(("tw", spec, k, inverse), _twiddles_host(spec, k, inverse))


@functools.lru_cache(maxsize=64)
def _bitrev_perm(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


@functools.lru_cache(maxsize=64)
def _n_inv_const(spec: FieldSpec, k: int) -> np.ndarray:
    ninv = pow(1 << k, -1, spec.modulus)
    return np.asarray(limbs.encode(spec, [ninv]))[:, 0]  # (16,) mont


# ---------------------------------------------------------------------------
# core transform
# ---------------------------------------------------------------------------

def ntt(spec: FieldSpec, coeffs: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """In-order radix-2 NTT along the LAST axis of (16, *batch, n) Montgomery
    limbs; n a power of two.

    Forward: evals[i] = sum_j coeffs[j] * w^(i*j). Inverse includes the
    1/n scaling (true inverse of `ntt(..., inverse=False)`).

    Large sizes use the four-step (Bailey) decomposition: early radix-2
    stages on a minor-most data axis force (…, n/m, m) layouts with m < 128
    whose XLA tile relayouts cost more than the arithmetic (measured 378 ms
    at 2^18, docs/PERF.md). Splitting n = n1*n2 keeps every butterfly on a
    SECOND-minor axis with a >=128-wide contiguous minor axis: column NTT,
    twiddle multiply, transpose, column NTT, transpose.
    """
    n = coeffs.shape[-1]
    assert coeffs.shape[0] == NLIMBS
    k = int(n).bit_length() - 1
    assert (1 << k) == n, "n must be a power of two"
    if n == 1:
        return coeffs
    if _use_fourstep(k):
        return _ntt_four_step(spec, coeffs, k, inverse)
    return _ntt_radix2(spec, coeffs, k, inverse)


def _use_fourstep(k: int) -> bool:
    import os
    if k < 2 * _FOURSTEP_MIN_K:
        return False
    env = os.environ.get("EZKL_TPU_FOURSTEP")
    if env is not None:
        return env not in ("0", "false")
    # measured on v5e: 1.5x faster at 2^18 (14.8 vs 21.9 ms), but SLOWER at
    # 2^20 (transpose + 5-D stage relayouts dominate) — docs/PERF.md r4
    return k <= 19 and limbs._use_pallas_field()


def _ntt_radix2(spec: FieldSpec, coeffs: jnp.ndarray, k: int,
                inverse: bool) -> jnp.ndarray:
    n = 1 << k
    bdims = coeffs.ndim - 2  # batch dims between limb axis and data axis

    tw = _twiddles(spec, k, inverse)  # (16, n/2)
    x = coeffs[..., _bitrev_perm(k)]  # static gather

    use_bfly = (limbs._use_pallas_field()
                and (n // 2) * max(int(np.prod(x.shape[1:-1])), 1)
                >= limbs._PL_MIN)
    for s in range(1, k + 1):
        m = 1 << s
        half = m // 2
        xr = x.reshape(x.shape[:-1] + (n // m, m))
        a = xr[..., :half]
        b = xr[..., half:]
        # stage twiddles: w_m^j = w_n^(j * n/m), j in [0, half)
        w = tw[:, :: (n // m)]                       # (16, half)
        wb = w.reshape((NLIMBS,) + (1,) * (bdims + 1) + (half,))
        if use_bfly:
            # fused t = b*w; (a+t, a-t): one pallas pass instead of three
            from . import pntt
            wfull = jnp.broadcast_to(wb, a.shape)
            hi, lo = pntt.bfly(spec, a, b, wfull)
        else:
            t = limbs.mont_mul(spec, b, wb)
            hi, lo = limbs.add(spec, a, t), limbs.sub(spec, a, t)
        x = jnp.concatenate([hi, lo], axis=-1).reshape(x.shape)

    if inverse:
        ninv = _dev_cached(("ninv", spec, k), _n_inv_const(spec, k))
        ninv = ninv.reshape((NLIMBS,) + (1,) * (bdims + 1))
        x = limbs.mont_mul(spec, x, jnp.broadcast_to(ninv, x.shape))
    return x


_FOURSTEP_MIN_K = 7   # each factor >= 2^7: keeps the minor axis >= 128


@functools.lru_cache(maxsize=64)
def _fourstep_twiddle(spec: FieldSpec, k: int, inverse: bool) -> jnp.ndarray:
    """W[i1, i2] = w_n^(i1*i2) as (16, n1, n2) Montgomery limbs.

    Built from the master power table P = [w^0 .. w^(n-1)] (n host bigint
    muls + one vectorized encode), then indexed as P[(i1*i2) mod n] with a
    pure-numpy u32 gather."""
    k1 = k // 2
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    n = 1 << k
    w = root_of_unity(spec, k, inverse)
    P = _host_powers(spec, w, n)                             # (16, n)
    idx = (np.arange(n1, dtype=np.int64)[:, None]
           * np.arange(n2, dtype=np.int64)[None, :]) % n
    # NUMPY result: a jnp array built during an outer jit trace would cache
    # a tracer (UnexpectedTracerError on reuse); callers lift per-trace
    return np.ascontiguousarray(P[:, idx])


def _column_ntt(spec: FieldSpec, x: jnp.ndarray, inverse: bool,
                tw_full: jnp.ndarray) -> jnp.ndarray:
    """Radix-2 NTT along AXIS -2 of (16, L, m, n2): butterflies slice the
    second-minor axis, the contiguous minor axis rides every kernel at
    full width. tw_full: (16, m/2) master twiddles for size m."""
    from . import pntt
    L, m, n2 = x.shape[1], x.shape[2], x.shape[3]
    x = x[:, :, _bitrev_perm(int(m).bit_length() - 1), :]
    use_bfly = limbs._use_pallas_field()
    for s in range(1, int(m).bit_length()):
        blk = 1 << s
        half = blk // 2
        xr = x.reshape(NLIMBS, L, m // blk, blk, n2)
        a = xr[:, :, :, :half, :]
        b = xr[:, :, :, half:, :]
        w = tw_full[:, :: (m // blk)]                 # (16, half)
        wb = w[:, None, None, :, None]
        if use_bfly:
            hi, lo = pntt.bfly(spec, a, b,
                               jnp.broadcast_to(wb, a.shape))
        else:
            t = limbs.mont_mul(spec, b, jnp.broadcast_to(wb, a.shape))
            hi, lo = limbs.add(spec, a, t), limbs.sub(spec, a, t)
        x = jnp.concatenate([hi, lo], axis=3).reshape(NLIMBS, L, m, n2)
    return x


def _ntt_four_step(spec: FieldSpec, coeffs: jnp.ndarray, k: int,
                   inverse: bool) -> jnp.ndarray:
    shape = coeffs.shape
    lead = shape[1:-1]
    L = int(np.prod(lead, dtype=np.int64)) if lead else 1
    n = 1 << k
    k1 = k // 2
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    x = coeffs.reshape(NLIMBS, L, n1, n2)
    # Derivation: x[i] = X[i1, i2] with i = i1*n2 + i2. out[j] =
    # sum_i x[i] w^(i j). Write j = j1 + n1*j2 (j1 < n1, j2 < n2):
    #   out[j1 + n1 j2]
    #     = sum_{i2} w^(i2 (j1 + n1 j2)) * sum_{i1} X[i1, i2] w^(n2 i1 j1)
    # inner sum: length-n1 DFT over i1 (columns of X) at j1 (w^n2 = w_n1);
    # then twiddle w^(j1 i2); then length-n2 DFT over i2 at j2
    # (w^(n1 n2 i2 j2) = w_{n2}^(i2 j2)).
    tw1 = _twiddles(spec, k1, inverse)
    y = _column_ntt(spec, x, inverse, tw1)            # (16, L, j1, i2)
    wt = _dev_cached(("fs", spec, k, inverse),
                     _fourstep_twiddle(spec, k, inverse))  # (16,n1,n2): w^(j1*i2)
    y = limbs.mont_mul(spec, y, wt[:, None])
    y = jnp.swapaxes(y, 2, 3)                         # (16, L, i2, j1)
    tw2 = _twiddles(spec, k2, inverse)
    z = _column_ntt(spec, y, inverse, tw2)            # (16, L, j2, j1)
    # out[j1 + n1 j2] = z[j2, j1]: flattening (j2-major, j1-minor) gives
    # index n1*j2 + j1 directly
    out = z.reshape(NLIMBS, L, n)
    if inverse:
        ninv = _dev_cached(("ninv", spec, k), _n_inv_const(spec, k))[:, None, None]
        out = limbs.mont_mul(spec, out, jnp.broadcast_to(ninv, out.shape))
    return out.reshape(shape)


def intt(spec: FieldSpec, evals: jnp.ndarray) -> jnp.ndarray:
    return ntt(spec, evals, inverse=True)


@functools.lru_cache(maxsize=16)
def _jitted_transform(spec: FieldSpec, which: str):
    fn = {
        "ntt": lambda x: ntt(spec, x),
        "intt": lambda x: intt(spec, x),
        "coset_ntt": lambda x: coset_ntt(spec, x),
        "coset_intt": lambda x: coset_intt(spec, x),
    }[which]
    return jax.jit(fn)


def ntt_jit(spec, x):
    return _jitted_transform(spec, "ntt")(x)


def intt_jit(spec, x):
    return _jitted_transform(spec, "intt")(x)


def coset_ntt_jit(spec, x):
    return _jitted_transform(spec, "coset_ntt")(x)


def coset_intt_jit(spec, x):
    return _jitted_transform(spec, "coset_intt")(x)


# ---------------------------------------------------------------------------
# coset extension (for quotient-polynomial evaluation)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _coset_powers_host(spec: FieldSpec, n: int, inverse: bool) -> np.ndarray:
    """[g^0, .., g^(n-1)] for the coset generator g (field multiplicative
    generator), HOST Montgomery (16, n). Numpy on purpose — see
    `_twiddles_host` for why caching a device array here is a bug."""
    g = spec.generator if not inverse else pow(spec.generator, -1, spec.modulus)
    return _host_powers(spec, g, n)


def _coset_powers(spec: FieldSpec, n: int, inverse: bool) -> jnp.ndarray:
    return _dev_cached(("coset", spec, n, inverse),
                       _coset_powers_host(spec, n, inverse))


def coset_ntt(spec: FieldSpec, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate poly over the coset g*H where |H| = len(coeffs).

    evals[i] = P(g * w^i): scale coeff j by g^j, then plain NTT.
    """
    n = coeffs.shape[-1]
    gp = _coset_powers(spec, n, inverse=False)
    gp = gp.reshape((NLIMBS,) + (1,) * (coeffs.ndim - 2) + (n,))
    return ntt(spec, limbs.mont_mul(spec, coeffs, gp))


def coset_intt(spec: FieldSpec, evals: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `coset_ntt`: interpolate over g*H back to coefficients."""
    n = evals.shape[-1]
    coeffs = intt(spec, evals)
    gp = _coset_powers(spec, n, inverse=True)
    gp = gp.reshape((NLIMBS,) + (1,) * (evals.ndim - 2) + (n,))
    return limbs.mont_mul(spec, coeffs, gp)


# ---------------------------------------------------------------------------
# host reference (test oracle)
# ---------------------------------------------------------------------------

def host_ntt(spec: FieldSpec, values: list[int], inverse: bool = False) -> list[int]:
    """O(n^2) bigint DFT for tests."""
    n = len(values)
    k = n.bit_length() - 1
    w = root_of_unity(spec, k, inverse)
    p = spec.modulus
    out = [sum(v * pow(w, i * j, p) for j, v in enumerate(values)) % p for i in range(n)]
    if inverse:
        ninv = pow(n, -1, p)
        out = [(v * ninv) % p for v in out]
    return out
