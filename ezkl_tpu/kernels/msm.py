"""Pippenger multi-scalar multiplication over BN254 G1, TPU-vectorized.

Replaces the MSM inside the reference's halo2 fork / ICICLE CUDA backend
(SURVEY.md §2.1; dispatch seam `/root/reference/src/execute.rs:84-97`;
consumer example `/root/reference/src/circuit/modules/polycommit.rs:45-81`).

TPU-first design — no scatters, no data-dependent control flow, small
compiled graphs, and few sequential steps:

* Window digits for all windows are extracted up-front with static shifts
  over the 16-bit limb representation: (W, N) uint32.
* Windows are processed in GROUPS batched through every kernel: the sort,
  the prefix scan, the bucket fold all carry a window axis, so sequential
  scan-step latency is amortized across windows (the dominant cost at
  small/medium N).
* Per window group:
    1. `argsort` digits (batched XLA sort), gather points into digit order,
    2. log-depth inclusive prefix scan of point adds (associative_scan of
       the complete group law: full vector width at every level),
    3. telescoped bucket phase: with exclusive prefix E and bucket start
       offsets s_b, sum_b b*S_b = (B-1)*Total - sum_{b>=1} E[s_b] — one
       batched gather + one fold, no per-bucket diffs or suffix scans.
* Window combination by Horner (c doublings + add per window), with the
  (B-1)*Total term folded in per window via U = 2^c*T - T.

Multi-chip: shard the point axis; each chip runs this kernel on its shard
and partial results are tree-added after an all_gather
(`ezkl_tpu.parallel.msm_sharded`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fieldmath import limbs, curve
from ..fieldmath.curve import PointP
from ..fieldmath.spec import bn254_fq, bn254_fr, NLIMBS, LIMB_BITS

_U32 = jnp.uint32

# Point-add dispatch: on TPU EVERY add/dbl rides the pallas VMEM kernel
# (`kernels/pcurve.py`). One inlined XLA-graph copy of the group law is
# ~40k HLO ops and costs the XLA *TPU* compiler ~2-5 minutes per
# instantiation (measured; the round-2 bench timed out on exactly this),
# while a pallas_call is one opaque custom call whose Mosaic kernel is
# compiled once per block shape. Narrow batches are padded up to one
# sublane tile (128 lanes) — the runtime waste is nil next to compile time.
_PAD_MIN = 128


def _use_pallas() -> bool:
    import os
    env = os.environ.get("EZKL_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false")
    return jax.default_backend() == "tpu"


def _batch_n(p: PointP) -> int:
    n = 1
    for d in p.x.shape[1:]:
        n *= d
    return n


def _padd(p: PointP, q: PointP) -> PointP:
    if _use_pallas() and p.x.shape == q.x.shape:
        from . import pcurve
        return pcurve.add(p, q)
    return curve.add(p, q)


def _pdbl(p: PointP) -> PointP:
    if _use_pallas():
        from . import pcurve
        return pcurve.dbl(p)
    return curve.dbl(p)


def _use_signed() -> bool:
    import os
    return os.environ.get("EZKL_TPU_SIGNED", "1") not in ("0", "false")


def default_window_bits(n: int, signed: bool | None = None) -> int:
    """Window size: minimize n_windows * (linear work + bucket work).

    Costs measured on v5e (docs/PERF.md r4): per-point sort+gather+scan
    ≈ 60 ns (packed-gather), per-bucket (boundary gathers + combine +
    fold) ≈ 190 ns. Signed digits halve the bucket count per window
    (magnitudes in [0, 2^(c-1)]) and shave windows at odd c.
    """
    if signed is None:
        signed = _use_signed()
    best_c, best_t = 2, float("inf")
    for c in range(2, 21):
        w = len(_signed_windows(c)) if signed else -(-254 // c)
        nb = (1 << (c - 1)) if signed else (1 << c)
        t = w * (n * 60e-9 + nb * 190e-9)
        if t < best_t:
            best_c, best_t = c, t
    return best_c


def default_group(n: int, c: int) -> int:
    """Windows per batch group. Measured on TPU v5e: window batching does
    NOT pay (the kernel is VPU-compute-bound, and grouped gathers add
    traffic), so the default is sequential windows; grouping stays
    available for latency-bound (small-N) cases via the `group` param."""
    return 1


def extract_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(16, N) raw (non-Montgomery) scalar limbs -> (W, N) window digits.

    Window w holds bits [w*c, (w+1)*c) of the scalar, little-endian.
    """
    nbits = NLIMBS * LIMB_BITS
    W = -(-nbits // c)
    mask = _U32((1 << c) - 1)
    padded = jnp.concatenate(
        [scalars, jnp.zeros((2,) + scalars.shape[1:], dtype=_U32)], axis=0
    )
    outs = []
    for w in range(W):
        lo = w * c
        i, r = divmod(lo, LIMB_BITS)
        d = padded[i] >> _U32(r)
        got = LIMB_BITS - r
        while got < c:
            i += 1
            d = d | (padded[i] << _U32(got))
            got += LIMB_BITS
        outs.append(d & mask)
    return jnp.stack(outs, axis=0)


@functools.lru_cache(maxsize=32)
def _signed_windows(c: int) -> range:
    """Number of c-bit SIGNED windows covering any reduced Fr scalar.

    W starts at ceil(254/c); the recoding carry out of the top window must
    vanish, which needs max_top_digit + 1 <= 2^(c-1) — verified against
    the actual modulus (e.g. c=17: W=15, top digit <= p>>238 ~ 2^15.6)."""
    p = bn254_fr().modulus
    W = -(-254 // c)
    while ((p - 1) >> ((W - 1) * c)) + 1 > (1 << (c - 1)):
        W += 1
    return range(W)


def extract_digits_signed(scalars: jnp.ndarray, c: int):
    """(16, N) raw Fr limbs -> (mags, negs), each (W, N).

    Signed recoding: scalar = sum_w s_w * mags[w] * 2^(c*w) with
    s_w = -1 where negs[w] else +1 and mags in [0, 2^(c-1)]. Digits above
    2^(c-1) borrow from the next window (d -> d - 2^c, carry 1), so every
    window needs only 2^(c-1) buckets — half the unsigned count."""
    raw = extract_digits(scalars, c)
    W0 = raw.shape[0]
    M = _U32(1 << (c - 1))
    full = _U32(1 << c)
    mags, negs = [], []
    carry = jnp.zeros(raw.shape[1:], dtype=_U32)
    for w in _signed_windows(c):
        d = (raw[w] if w < W0 else jnp.zeros_like(carry)) + carry
        ng = d > M
        mags.append(jnp.where(ng, full - d, d))
        negs.append(ng)
        carry = ng.astype(_U32)
    return jnp.stack(mags, axis=0), jnp.stack(negs, axis=0)


def _pack2(a: jnp.ndarray) -> jnp.ndarray:
    """(16, ...) u32 arrays holding 16-bit limbs -> (8, ...) packed u32.

    The TPU gather unit is per-ELEMENT bound (~1.2 ns/elem regardless of
    layout, docs/PERF.md r4), so gathering coordinates packed two limbs
    per u32 halves the MSM's dominant per-window cost."""
    return a[0::2] | (a[1::2] << _U32(16))


def _unpack2(a: jnp.ndarray) -> jnp.ndarray:
    """(8, ...) packed -> (16, ...) 16-bit limbs (inverse of _pack2)."""
    out = jnp.stack([a & _U32(0xFFFF), a >> _U32(16)], axis=1)
    return out.reshape((a.shape[0] * 2,) + a.shape[1:])


# ---------------------------------------------------------------------------
# prefix scan / tree fold of point additions (batched over leading dims)
#
# Design constraint (measured): one inlined copy of the group law costs the
# XLA *compiler* dearly (a 32-wide associative_scan of curve.add takes ~8min
# to compile on the CPU backend), so every O(N) chain lives inside a
# lax.scan body — compiled ONCE — running at width N/BLOCK, and the
# recursion on block totals adds only log_BLOCK(N) small levels.
# ---------------------------------------------------------------------------

_BLOCK = 32  # sequential steps per level; width per step = n / _BLOCK


def _seq_inclusive(p: PointP) -> PointP:
    """Inclusive prefix along the LAST axis via one lax.scan (batched)."""
    xs = jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0), p)

    def body(acc, x):
        acc = _padd(acc, x)
        return acc, acc

    init = curve.identity(p.batch_shape[:-1])
    _, pref = jax.lax.scan(body, init, xs)
    return jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), pref)


def prefix_scan_points(p: PointP) -> PointP:
    """Inclusive prefix sum of points along the last batch axis.

    Blocked scan: reshape to (m, BLOCK), one lax.scan of BLOCK full-width
    (m-lane) steps, recurse on the m block totals, then one combine add.
    Work ~2N, depth ~BLOCK * log_BLOCK(N), compile size O(log_BLOCK N)."""
    n = p.x.shape[-1]
    if n <= _BLOCK:
        return _seq_inclusive(p)
    assert n % _BLOCK == 0, "prefix_scan_points: need n % BLOCK == 0"
    m = n // _BLOCK
    pr = jax.tree.map(lambda a: a.reshape(a.shape[:-1] + (m, _BLOCK)), p)
    local = _seq_inclusive(pr)                                  # (.., m, B)
    totals = jax.tree.map(lambda a: a[..., -1], local)          # (.., m)
    tot_pref = prefix_scan_points(totals)

    def shift(a):
        z = jnp.zeros_like(a[..., :1])
        return jnp.concatenate([z, a[..., :-1]], axis=-1)

    offs = PointP(shift(tot_pref.x), shift(tot_pref.y), shift(tot_pref.z))
    offs = curve.select_point(jnp.arange(m) == 0,
                              curve.identity(offs.batch_shape), offs)
    offs_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[..., None], local.x.shape), offs)
    combined = _padd(local, offs_b)
    return jax.tree.map(lambda a: a.reshape(a.shape[:-2] + (n,)), combined)


def fold_points(p: PointP) -> PointP:
    """Sum of points along the last axis (any length).

    Blocked: (m, BLOCK) accumulate via one lax.scan (width m), recurse on
    the m totals. Work ~N, compile size O(log_BLOCK N)."""
    n = p.x.shape[-1]
    while n > _BLOCK:
        m = -(-n // _BLOCK)
        if m * _BLOCK != n:
            pad = m * _BLOCK - n
            idp = curve.identity(p.batch_shape[:-1] + (pad,))
            p = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=-1), p, idp)
        pr = jax.tree.map(
            lambda a: a.reshape(a.shape[:-1] + (m, _BLOCK)), p)
        xs = jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0), pr)

        def body(acc, x):
            return _padd(acc, x), None

        init = curve.identity(pr.batch_shape[:-1])
        p, _ = jax.lax.scan(body, init, xs)                     # (.., m)
        n = m
    # final short fold: one sequential scan of <= BLOCK steps
    xs = jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0), p)

    def body2(acc, x):
        return _padd(acc, x), None

    out, _ = jax.lax.scan(body2, curve.identity(p.batch_shape[:-1]), xs)
    return out


# ---------------------------------------------------------------------------
# the MSM
# ---------------------------------------------------------------------------

def msm(points: PointP, scalars: jnp.ndarray, c: int | None = None,
        group: int | None = None, affine: bool = False,
        signed: bool | None = None) -> PointP:
    """sum_i scalars[i] * points[i].

    points: projective PointP with batch shape (N,), N a power of two
    (identity lanes OK — see `pad_msm_inputs`; affine=True requires
    z == 1 everywhere instead).
    scalars: (16, N) RAW (non-Montgomery) Fr limbs.
    Returns a single projective PointP (batch shape ()).
    """
    res = msm_multi(points, scalars[None], c=c, group=group, affine=affine,
                    signed=signed)
    return jax.tree.map(lambda a: a[..., 0], res)


def msm_multi(points: PointP, scalars: jnp.ndarray, c: int | None = None,
              group: int | None = None, affine: bool = False,
              signed: bool | None = None) -> PointP:
    """Batched-column MSM: out[t] = sum_i scalars[t, i] * points[i].

    scalars: (C, 16, N) RAW limbs over a SHARED point set; returns PointP
    with batch shape (C,). All C*W window digit sets ride one
    sort/scan/fold pipeline and the Horner combine is batched over columns
    — this is the prover's "commit every column of a phase in one MSM"
    path (amortizes kernel dispatch and, with `group`>1, widens the
    sequential scan steps at small n).

    affine=True asserts every point has z == 1 (SRS bases): the kernel
    then gathers only (x, y) and runs 11-mul mixed adds — measured ~35%
    faster end-to-end (docs/PERF.md).

    signed=True (default via EZKL_TPU_SIGNED) uses signed window digits:
    magnitudes in [0, 2^(c-1)] with per-point y-negation, halving bucket
    work and dropping a window at c=17 (15 windows over 254 bits).
    """
    if signed is None:
        signed = _use_signed()
    if _use_pallas():
        return _msm_multi_fused(points, scalars, c=c, group=group,
                                affine=affine, signed=signed)
    C = scalars.shape[0]
    n = scalars.shape[-1]
    assert (n & (n - 1)) == 0, "msm: pad N to a power of two"
    if c is None:
        c = default_window_bits(n, signed)
    if group is None:
        group = default_group(n, c)
    if signed:
        mags, negs = jax.vmap(
            lambda s: extract_digits_signed(s, c))(scalars)   # (C, W, N) x2
        digits = mags
        n_bound = 1 << (c - 1)         # magnitudes reach 2^(c-1) inclusive
    else:
        digits = jax.vmap(lambda s: extract_digits(s, c))(scalars)
        negs = jnp.zeros_like(digits, dtype=bool)
        n_bound = (1 << c) - 1
    W = digits.shape[1]
    # pad W (per column) to a multiple of the group size with all-zero
    # windows, so groups never span two columns
    Wp = -(-W // group) * group
    if Wp != W:
        digits = jnp.concatenate(
            [digits, jnp.zeros((C, Wp - W, n), dtype=_U32)], axis=1)
        negs = jnp.concatenate(
            [negs, jnp.zeros((C, Wp - W, n), dtype=bool)], axis=1)
    dgroups = digits.reshape(C * Wp // group, group, n)
    ngroups = negs.reshape(C * Wp // group, group, n)

    fq = bn254_fq()
    b_queries = jnp.arange(1, n_bound + 1, dtype=_U32)

    def group_body(_, d_ng):
        d, ng = d_ng                                          # (G, N) each
        order = jnp.argsort(d, axis=-1)
        sorted_d = jnp.take_along_axis(d, order, axis=-1)
        # points coords (16, N) gathered with (G, N) -> (16, G, N)
        sorted_pts = jax.tree.map(lambda a: jnp.take(a, order, axis=-1), points)
        if signed:
            sn = jnp.take_along_axis(ng, order, axis=-1)      # (G, N)
            sorted_pts = PointP(sorted_pts.x,
                                limbs.select(sn, limbs.neg(fq, sorted_pts.y),
                                             sorted_pts.y),
                                sorted_pts.z)
        starts = jax.vmap(lambda sd: jnp.searchsorted(sd, b_queries))(sorted_d)
        safe = jnp.maximum(starts, 1) - 1                     # (G, B)
        # prefix values are only needed at the bucket-boundary positions:
        # take block-local inclusive prefixes + block-offset prefixes and
        # combine AT THOSE POSITIONS only — saves the N-wide combine add
        # per window (~25% of MSM adds at large N).
        if n > _BLOCK:
            m = n // _BLOCK
            pr = jax.tree.map(
                lambda a: a.reshape(a.shape[:-1] + (m, _BLOCK)), sorted_pts)
            local = _seq_inclusive(pr)                        # (..,G,m,B)
            totals = jax.tree.map(lambda a: a[..., -1], local)
            tot_incl = prefix_scan_points(totals)             # (..,G,m)
            t_w = jax.tree.map(lambda a: a[..., -1], tot_incl)  # (16, G)
            loc_flat = jax.tree.map(
                lambda a: a.reshape(a.shape[:-2] + (n,)), local)
            e_loc = jax.tree.map(
                lambda a: jnp.take_along_axis(a, safe[None], axis=-1),
                loc_flat)                                     # (16,G,B)
            blk = safe // _BLOCK                              # (G, B)
            # offset = inclusive prefix of the PREVIOUS block's total
            e_off = jax.tree.map(
                lambda a: jnp.take_along_axis(
                    a, (jnp.maximum(blk, 1) - 1)[None], axis=-1), tot_incl)
            e_off = curve.select_point(blk == 0,
                                       curve.identity(blk.shape), e_off)
            e_pts = _padd(e_loc, e_off)
        else:
            incl = prefix_scan_points(sorted_pts)
            t_w = jax.tree.map(lambda a: a[..., -1], incl)    # (16, G)
            e_pts = jax.tree.map(
                lambda a: jnp.take_along_axis(a, safe[None], axis=-1), incl)
            e_pts = curve.PointP(*e_pts)
            t_w = curve.PointP(*t_w)
        e_pts = curve.select_point(starts == 0,
                                   curve.identity(starts.shape), e_pts)
        return None, (fold_points(e_pts), t_w)                # (16, G) x2

    _, (f_groups, t_groups) = jax.lax.scan(
        group_body, None, (dgroups, ngroups))
    # leaves are (C*Wp/G, 16, G); window w = outer*G + inner -> (16, C, Wp)
    f_w = jax.tree.map(
        lambda a: jnp.moveaxis(a, 1, 0).reshape(NLIMBS, C, Wp), f_groups)
    t_w = jax.tree.map(
        lambda a: jnp.moveaxis(a, 1, 0).reshape(NLIMBS, C, Wp), t_groups)

    def dbl_n(p, n_dbl):
        def body(acc, _):
            return _pdbl(acc), None
        out, _ = jax.lax.scan(body, p, None, length=n_dbl)
        return out

    # V_w = B * T_w - sum_q prefix_before_q = sum_q suffix_q
    #     = sum_m m * bucket_m   over this window's B buckets, where T_w is
    # the window's own signed total (the scan's last element — free).
    if signed:
        u = dbl_n(t_w, c - 1)                      # B = 2^(c-1) exactly
    else:
        u = _padd(dbl_n(t_w, c), _neg_point(t_w))  # B = 2^c - 1
    v = _padd(u, _neg_point(f_w))                  # (16, C, Wp)

    # Horner MSB-first (padded windows have all-zero digits -> V_w = 0)
    def horner_body(acc, vw):
        return _padd(dbl_n(acc, c), curve.PointP(*vw)), None

    rev = jax.tree.map(lambda a: a[..., ::-1], v)          # (16, C, Wp)
    xs = jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0), rev)  # (Wp, 16, C)
    res, _ = jax.lax.scan(horner_body, curve.identity((C,)), xs)
    return res


def _neg_point(p: PointP) -> PointP:
    fq = bn254_fq()
    return PointP(p.x, limbs.neg(fq, p.y), p.z)


# ---------------------------------------------------------------------------
# fused-kernel MSM (the TPU path)
#
# Measured (docs/PERF.md, v5e): each pallas_call issued per lax.scan step
# costs ~1 ms of dispatch/loop-carry overhead, so the blocked prefix scans
# above (32 calls per level) ran at 2.6x below the standalone add kernel,
# and per-window folds cost ~96 calls. This path moves every sequential
# chain into single pallas_calls whose GRID iterates the steps on-core
# (`pcurve.prefix_scan_steps/fold_lanes/horner_combine/dbl_pow2`), keeping
# the accumulators in VMEM scratch.
# ---------------------------------------------------------------------------

_FUSED_S = 128   # local-scan steps per lane (one kernel, grid = (m/blk, S))


def _fused_group(n: int, W: int) -> int:
    """Windows per outer step: widen small-n MSMs (latency-bound), keep
    G * (bucket gather) memory bounded."""
    g = max(1, (1 << 20) // max(n, 1))
    g = min(g, 32, W)
    while W % g:
        g -= 1
    return g


def _prefix_points_fused(p: PointP) -> PointP:
    """Inclusive prefix of projective points along the LAST axis (any
    leading batch axes), via fused scan kernels + log recursion."""
    from . import pcurve
    m = p.x.shape[-1]
    S = 32 if m <= 1024 else _FUSED_S
    lead = p.x.shape[1:-1]
    if m <= S:
        pr = jax.tree.map(lambda a: a.reshape(NLIMBS, -1, m), p)
        out = pcurve.prefix_scan_steps(pr)
        return jax.tree.map(lambda a: a.reshape(p.x.shape), out)
    assert m % S == 0, f"prefix_points_fused: {m} % {S}"
    pr = jax.tree.map(lambda a: a.reshape(NLIMBS, -1, S), p)
    local = pcurve.prefix_scan_steps(pr)                # (16, lead*m/S, S)
    tots = jax.tree.map(
        lambda a: a[..., -1].reshape((NLIMBS,) + lead + (m // S,)), local)
    tp = _prefix_points_fused(tots)                     # (16, *lead, m/S)

    def shift(a):
        z = jnp.zeros_like(a[..., :1])
        return jnp.concatenate([z, a[..., :-1]], axis=-1)

    offs = PointP(shift(tp.x), shift(tp.y), shift(tp.z))
    first = jnp.arange(m // S) == 0
    offs = curve.select_point(
        jnp.broadcast_to(first, lead + (m // S,)),
        curve.identity(lead + (m // S,)), offs)
    offs_b = jax.tree.map(
        lambda a: jnp.broadcast_to(
            a.reshape(a.shape[:1] + (-1, 1)), local.x.shape), offs)
    comb = pcurve.add(local, offs_b)
    return jax.tree.map(lambda a: a.reshape(p.x.shape), comb)


def _msm_multi_fused(points: PointP, scalars: jnp.ndarray,
                     c: int | None = None, group: int | None = None,
                     affine: bool = False, signed: bool = True) -> PointP:
    from . import pcurve

    C = scalars.shape[0]
    n = scalars.shape[-1]
    assert (n & (n - 1)) == 0, "msm: pad N to a power of two"
    if c is None:
        c = default_window_bits(n, signed)
    if signed:
        mags, negs = jax.vmap(
            lambda s: extract_digits_signed(s, c))(scalars)  # (C, W, N) x2
        digits = mags
        n_bound = 1 << (c - 1)
    else:
        digits = jax.vmap(lambda s: extract_digits(s, c))(scalars)
        negs = jnp.zeros_like(digits, dtype=bool)
        n_bound = (1 << c) - 1
    W = digits.shape[1]
    G = group if group is not None else _fused_group(n, W)
    Wp = -(-W // G) * G
    if Wp != W:
        digits = jnp.concatenate(
            [digits, jnp.zeros((C, Wp - W, n), dtype=_U32)], axis=1)
        negs = jnp.concatenate(
            [negs, jnp.zeros((C, Wp - W, n), dtype=bool)], axis=1)
    dgroups = digits.reshape(C * Wp // G, G, n)
    ngroups = negs.reshape(C * Wp // G, G, n)
    S = min(_FUSED_S, n)

    fq = bn254_fq()
    # packed coordinates: the gather unit is per-element bound, so gather
    # 8 packed u32 rows instead of 16 limb rows (halves the dominant cost)
    px, py = _pack2(points.x), _pack2(points.y)
    pz = None if affine else _pack2(points.z)

    b_queries = jnp.arange(1, n_bound + 1, dtype=_U32)
    # bucket partials fold target: pad the B bucket sums up to a fold-block
    # multiple with identities, fold per window
    fold_blk = 1024 if n_bound >= 2048 else 128
    pad_to = -(-n_bound // fold_blk) * fold_blk

    def group_body(_, d_ng):
        d, ng = d_ng                                     # (G, N) each
        if affine:
            # one sort yields key AND permutation (saves the sorted_d
            # re-gather); coords stay PACKED through the gather and are
            # unpacked + sign-negated inside the scan kernel
            iota = jnp.broadcast_to(
                jnp.arange(n, dtype=_U32), d.shape)
            sorted_d, order = jax.lax.sort_key_val(d, iota)
            spx = jnp.take(px, order, axis=-1)           # (8, G, N)
            spy = jnp.take(py, order, axis=-1)
            if signed:
                sn = jnp.take_along_axis(
                    ng.astype(_U32), order, axis=-1)     # (G, N)
            else:
                sn = jnp.zeros(d.shape, dtype=_U32)
            local = pcurve.prefix_scan_packed(
                spx.reshape(NLIMBS // 2, -1, S),
                spy.reshape(NLIMBS // 2, -1, S),
                sn.reshape(-1, S))                       # (16, G*N/S, S)
        else:
            order = jnp.argsort(d, axis=-1)
            sorted_d = jnp.take_along_axis(d, order, axis=-1)
            sx = _unpack2(jnp.take(px, order, axis=-1))  # (16, G, N)
            sy = _unpack2(jnp.take(py, order, axis=-1))
            if signed:
                sn = jnp.take_along_axis(ng, order, axis=-1)  # (G, N)
                sy = limbs.select(sn, limbs.neg(fq, sy), sy)
            sz = _unpack2(jnp.take(pz, order, axis=-1))
            sp = PointP(sx.reshape(NLIMBS, -1, S),
                        sy.reshape(NLIMBS, -1, S),
                        sz.reshape(NLIMBS, -1, S))
            local = pcurve.prefix_scan_steps(sp)         # (16, G*N/S, S)
        totals = jax.tree.map(
            lambda a: a[..., -1].reshape(NLIMBS, G, n // S), local)
        tot_incl = _prefix_points_fused(totals)          # (16, G, n/S)
        t_w = jax.tree.map(lambda a: a[..., -1], tot_incl)  # (16, G)

        starts = jax.vmap(lambda sd: jnp.searchsorted(sd, b_queries))(sorted_d)
        safe = jnp.maximum(starts, 1) - 1                # (G, B)
        loc_flat = jax.tree.map(
            lambda a: a.reshape(NLIMBS, G, n), local)
        e_loc = jax.tree.map(
            lambda a: jnp.take_along_axis(a, safe[None], axis=-1), loc_flat)
        blk = safe // S                                  # (G, B)
        e_off = jax.tree.map(
            lambda a: jnp.take_along_axis(
                a, (jnp.maximum(blk, 1) - 1)[None], axis=-1), tot_incl)
        e_off = curve.select_point(blk == 0,
                                   curve.identity(blk.shape), e_off)
        e_pts = pcurve.add(e_loc, e_off)                 # (16, G, B)
        e_pts = curve.select_point(starts == 0,
                                   curve.identity(starts.shape), e_pts)
        # pad B -> pad_to with identity, then per-window lane fold
        idp = curve.identity((G, pad_to - n_bound))
        e_pts = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=-1), e_pts, idp)
        part = pcurve.fold_lanes(e_pts, blk=fold_blk)    # (16, G, fold_blk)
        return None, (part, t_w)

    _, (parts, t_groups) = jax.lax.scan(group_body, None, (dgroups, ngroups))
    # parts leaves: (C*Wp/G, 16, G, fold_blk) -> (16, C*Wp, fold_blk)
    parts = jax.tree.map(
        lambda a: jnp.moveaxis(a, 1, 0).reshape(NLIMBS, C * Wp, fold_blk),
        parts)
    f_w = pcurve.reduce_pairwise(parts)                  # (16, C*Wp)
    f_w = jax.tree.map(lambda a: a.reshape(NLIMBS, C, Wp), f_w)
    t_w = jax.tree.map(
        lambda a: jnp.moveaxis(a, 1, 0).reshape(NLIMBS, C, Wp), t_groups)

    # V_w = B * T_w - F_w = sum_m m * bucket_m over this window's buckets,
    # with T_w the window's own (signed) total from the scan's last element
    if signed:
        u = pcurve.dbl_pow2(t_w, c - 1)                  # B = 2^(c-1)
    else:
        u = pcurve.add(pcurve.dbl_pow2(t_w, c), _neg_point(t_w))
    v = pcurve.add(u, _neg_point(f_w))                   # (16, C, Wp)
    v_msb = jax.tree.map(lambda a: jnp.moveaxis(a[..., ::-1], 1, 2), v)
    return pcurve.horner_combine(v_msb, c)               # (16, C)


@functools.lru_cache(maxsize=16)
def _jitted_msm(c: int, group: int | None, affine: bool, signed: bool):
    return jax.jit(functools.partial(msm, c=c, group=group, affine=affine,
                                     signed=signed))


def msm_jit(points: PointP, scalars: jnp.ndarray, c: int | None = None,
            group: int | None = None, affine: bool = False,
            signed: bool | None = None) -> PointP:
    if signed is None:
        signed = _use_signed()
    n = scalars.shape[-1]
    if c is None:
        c = default_window_bits(n, signed)
    return _jitted_msm(c, group, affine, signed)(points, scalars)


@functools.lru_cache(maxsize=16)
def _jitted_msm_multi(c: int, group: int | None, affine: bool, signed: bool):
    return jax.jit(functools.partial(msm_multi, c=c, group=group,
                                     affine=affine, signed=signed))


def msm_multi_jit(points: PointP, scalars: jnp.ndarray, c: int | None = None,
                  group: int | None = None, affine: bool = False,
                  signed: bool | None = None) -> PointP:
    if signed is None:
        signed = _use_signed()
    n = scalars.shape[-1]
    if c is None:
        c = default_window_bits(n, signed)
    return _jitted_msm_multi(c, group, affine, signed)(points, scalars)


def pad_msm_inputs(points: PointP, scalars: jnp.ndarray):
    """Pad N to the next power of two with identity points / zero scalars."""
    n = scalars.shape[-1]
    target = 1 if n == 0 else 1 << (n - 1).bit_length()
    if target == n:
        return points, scalars
    extra = target - n
    idp = curve.identity((extra,))
    points = jax.tree.map(lambda a, b: jnp.concatenate([a, b], -1), points, idp)
    scalars = jnp.concatenate(
        [scalars, jnp.zeros((NLIMBS, extra), dtype=_U32)], axis=-1
    )
    return points, scalars
