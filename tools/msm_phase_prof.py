"""Per-phase MSM wall-time breakdown at a given N (default 2^20) on TPU.

Times each stage of the fused Pippenger pipeline (`kernels/msm.py
_msm_multi_fused`) as a separately-jitted function over ONE window, then
scales by the window count, so optimization effort lands on the measured
hot spot instead of the cost model. Forces host copies of small dependent
slices for timing (block_until_ready returns early on axon).

Usage: python tools/msm_phase_prof.py [log2_n] [c]
"""

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ezkl_tpu.fieldmath import curve, limbs  # noqa: E402
from ezkl_tpu.fieldmath.spec import bn254_fq, bn254_fr  # noqa: E402
from ezkl_tpu.kernels import msm as msmmod  # noqa: E402
from ezkl_tpu.kernels import pcurve  # noqa: E402

NLIMBS = limbs.NLIMBS


def sync(x):
    leaves = jax.tree.leaves(x)
    np.asarray(leaves[0].ravel()[:1])


def timeit(fn, *args, iters=3):
    out = fn(*args)
    sync(out)  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << logn
    c = (int(sys.argv[2]) if len(sys.argv) > 2 else
         msmmod.default_window_bits(n, True))
    W = len(msmmod._signed_windows(c))
    S = min(msmmod._FUSED_S, n)
    fq = bn254_fq()
    print(f"n=2^{logn} c={c} W={W} S={S} dev={jax.devices()[0].platform}")

    # host-side inputs
    rng = np.random.default_rng(5)
    n_base = 1 << 13
    xs, ys, _ = None, None, None
    from ezkl_tpu.fieldmath import hostcurve as hc
    pts = []
    p = hc.G1
    for _ in range(n_base):
        pts.append(p)
        p = hc.g1_add(p, hc.G1)
    xs = limbs.encode(fq, [q[0] for q in pts])
    ys = limbs.encode(fq, [q[1] for q in pts])
    reps = n // n_base
    px_l = jnp.asarray(np.tile(xs, reps))
    py_l = jnp.asarray(np.tile(ys, reps))
    sc = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint64).astype(np.uint32)
    sc[15] &= 0x03FF
    sc = jnp.asarray(sc)

    # phase 1: digit extraction (all W windows)
    f_dig = jax.jit(lambda s: msmmod.extract_digits_signed(s, c))
    t_dig, (mags, negs) = timeit(f_dig, sc)
    print(f"digits (all {W} windows): {t_dig*1e3:8.1f} ms")

    d0, ng0 = mags[0], negs[0]

    # phase 2: argsort of one window's digits
    f_sort = jax.jit(lambda d: jnp.argsort(d))
    t_sort, order = timeit(f_sort, d0)
    print(f"argsort   (x{W}): {t_sort*1e3:8.1f} ms/window")

    # phase 3: packed gather + unpack + signed y-select
    px, py = msmmod._pack2(px_l), msmmod._pack2(py_l)

    def gather(px, py, order, ng):
        sx = msmmod._unpack2(jnp.take(px, order, axis=-1))
        sy = msmmod._unpack2(jnp.take(py, order, axis=-1))
        sn = jnp.take(ng, order, axis=-1)
        sy = limbs.select(sn, limbs.neg(fq, sy), sy)
        return sx, sy

    f_gat = jax.jit(gather)
    t_gat, (sx, sy) = timeit(f_gat, px, py, order, ng0)
    print(f"gather+neg(x{W}): {t_gat*1e3:8.1f} ms/window")

    # phase 4: local prefix scans + block-total recursion
    def scan(sx, sy):
        sp = (sx.reshape(NLIMBS, -1, S), sy.reshape(NLIMBS, -1, S))
        local = pcurve.prefix_scan_steps(sp)
        totals = jax.tree.map(
            lambda a: a[..., -1].reshape(NLIMBS, 1, n // S), local)
        tot_incl = msmmod._prefix_points_fused(totals)
        return local, tot_incl

    f_scan = jax.jit(scan)
    t_scan, (local, tot_incl) = timeit(f_scan, sx, sy)
    print(f"prefixscan(x{W}): {t_scan*1e3:8.1f} ms/window")

    # phase 5: bucket boundaries: searchsorted + boundary gathers + combine
    n_bound = 1 << (c - 1)
    b_queries = jnp.arange(1, n_bound + 1, dtype=jnp.uint32)
    sorted_d = jnp.sort(d0)

    def bounds(sorted_d, local, tot_incl):
        starts = jnp.searchsorted(sorted_d, b_queries)[None]
        safe = jnp.maximum(starts, 1) - 1
        loc_flat = jax.tree.map(lambda a: a.reshape(NLIMBS, 1, n), local)
        e_loc = jax.tree.map(
            lambda a: jnp.take_along_axis(a, safe[None], axis=-1), loc_flat)
        blk = safe // S
        e_off = jax.tree.map(
            lambda a: jnp.take_along_axis(
                a, (jnp.maximum(blk, 1) - 1)[None], axis=-1), tot_incl)
        e_off = curve.select_point(blk == 0, curve.identity(blk.shape), e_off)
        e_pts = pcurve.add(e_loc, e_off)
        return curve.select_point(starts == 0,
                                  curve.identity(starts.shape), e_pts)

    f_bnd = jax.jit(bounds)
    t_bnd, e_pts = timeit(f_bnd, sorted_d, local, tot_incl)
    print(f"boundaries(x{W}): {t_bnd*1e3:8.1f} ms/window")

    # phase 6: per-window fold
    fold_blk = 1024 if n_bound >= 2048 else 128
    pad_to = -(-n_bound // fold_blk) * fold_blk

    def fold(e_pts):
        idp = curve.identity((1, pad_to - n_bound))
        ep = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=-1), e_pts, idp)
        return pcurve.fold_lanes(ep, blk=fold_blk)

    f_fold = jax.jit(fold)
    t_fold, part = timeit(f_fold, e_pts)
    print(f"fold      (x{W}): {t_fold*1e3:8.1f} ms/window")

    # phase 7: whole-MSM reference run
    P = curve.PointP(px_l, py_l,
                     jnp.broadcast_to(jnp.asarray(limbs.encode(fq, [1])),
                                      px_l.shape))
    f_msm = lambda s: msmmod.msm_jit(P, s, c=c, affine=True, signed=True)
    t_all, _ = timeit(f_msm, sc)
    per_w = t_dig + W * (t_sort + t_gat + t_scan + t_bnd + t_fold)
    print(f"\nsum of phases x{W} windows: {per_w*1e3:8.1f} ms")
    print(f"whole msm measured:        {t_all*1e3:8.1f} ms "
          f"({n/t_all/1e3:.0f}k pts/s)")


if __name__ == "__main__":
    main()
