"""Native host-crypto library vs the pure-Python oracles.

`native/host_crypto.cpp` (built via `make -C native`, loaded with ctypes)
is the native twin of hostcurve/pairing — the verifier/keygen host path
the reference runs as native Rust (halo2curves). These tests pin it to
the Python-bigint implementations.
"""

import random

import pytest

from ezkl_tpu.fieldmath import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built")

rng = random.Random(42)


def _pyhost():
    """The pure-Python implementations (bypass the native fast path)."""
    from ezkl_tpu.fieldmath import hostcurve as hc
    return hc


def test_g1_ops_match_python():
    hc = _pyhost()
    for _ in range(10):
        a = hc.g1_add(hc.G1, hc.g1_add(hc.G1, hc.G1))  # 3G via adds
        k = rng.randrange(1, 1 << 254)
        b = native.g1_mul(hc.G1, k)
        # python double-and-add without the native path
        acc, p, kk = None, hc.G1, k % hc.R
        while kk:
            if kk & 1:
                acc = hc.g1_add(acc, p)
            p = hc.g1_add(p, p)
            kk >>= 1
        assert b == acc
        assert native.g1_add(a, b) == hc.g1_add(a, b)
    assert native.g1_add(None, hc.G1) == hc.G1
    assert native.g1_mul(hc.G1, 0) is None


def test_msm_matches_python():
    hc = _pyhost()
    pts = [native.g1_mul(hc.G1, i + 2) for i in range(8)] + [None]
    scs = [rng.randrange(1 << 250) for _ in range(9)]
    want = None
    for pt, s in zip(pts, scs):
        if pt is None:
            continue
        want = hc.g1_add(want, native.g1_mul(pt, s))
    assert native.g1_msm(pts, scs) == want


def test_pairing_matches_python():
    from ezkl_tpu.fieldmath import hostcurve as hc
    from ezkl_tpu.plonk import pairing, srs as srsmod
    s = srsmod.gen_srs(4)
    good = [(hc.G1, s.g2), (hc.g1_neg(hc.G1), s.g2)]
    bad = [(native.g1_mul(hc.G1, 5), s.g2), (hc.g1_neg(hc.G1), s.g2)]
    for pairs, want in ((good, True), (bad, False)):
        # python reference (explicit, bypassing the native dispatch)
        f = pairing.F12_ONE
        for p1, q2 in pairs:
            f = pairing.f12_mul(f, pairing.miller_loop(q2, p1))
        py = pairing.final_exponentiation(f) == pairing.F12_ONE
        assert py == want
        assert native.pairing_check(pairs) == want


def test_tau_relation():
    """e(tau G1, G2) == e(G1, tau G2) through the native pairing."""
    import jax
    from ezkl_tpu.fieldmath import curve, hostcurve as hc
    from ezkl_tpu.plonk import srs as srsmod
    s = srsmod.gen_srs(4)
    tau_g1 = curve.decode_points(
        jax.tree.map(lambda a: a[..., 1:2], s.g1))[0]
    assert native.pairing_check(
        [(tau_g1, s.g2), (hc.g1_neg(hc.G1), s.s_g2)])
    assert not native.pairing_check(
        [(tau_g1, s.g2), (hc.g1_neg(hc.G1), s.g2)])
