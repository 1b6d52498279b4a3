"""Pallas TPU kernel paths exercised on CPU via interpret mode.

The fused MSM pipeline (packed 2x16-bit coordinate gathers, in-kernel
signed-digit y-negation, lazy <2p residue domain, fused scan/fold) only
runs when `_use_pallas()` is true — i.e. on TPU — so the host-oracle MSM
tests never covered it (r4 ADVICE, medium). EZKL_TPU_PALLAS_INTERPRET=1
routes every `pallas_call` through the interpreter, so the exact TPU
kernel code runs (slowly) on the CPU box and is checked against the host
bigint oracle. Subprocess tests: the env must be set before the lru-cached
kernel builders first run.
"""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

_PRELUDE = """
import os, pathlib, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["EZKL_TPU_PALLAS"] = "1"
os.environ["EZKL_TPU_PALLAS_INTERPRET"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import ezkl_tpu
_c = pathlib.Path(ezkl_tpu.cache_dir()); _c.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_c))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
""".format(repo=str(REPO))


def _run(body: str, timeout: int = 1200) -> None:
    proc = subprocess.run(
        [sys.executable, "-c", _PRELUDE + body],
        capture_output=True, text=True, timeout=timeout, cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"interpret-mode subprocess failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}")


def test_fused_msm_interpret_matches_host_oracle():
    """The TPU fused MSM (affine=True packed path, signed digits) must be
    bit-correct vs the host bigint MSM — including a non-power-of-two N
    through pad_msm_inputs and the all-zero-scalar identity case."""
    _run("""
import random
import numpy as np
import jax
import jax.numpy as jnp
from ezkl_tpu.fieldmath import limbs, curve, hostcurve
from ezkl_tpu.fieldmath.spec import bn254_fr
from ezkl_tpu.kernels import msm as msmmod
assert msmmod._use_pallas(), "pallas must be forced on"
FR = bn254_fr()
rng = random.Random(13)
n = 24                                   # non-power-of-two -> padded
pts_host = [hostcurve.g1_mul(hostcurve.G1, rng.randrange(1, 1 << 60))
            for _ in range(n)]
sc = [rng.randrange(FR.modulus) for _ in range(n)]
P = curve.encode_points(pts_host)
S = jnp.asarray(limbs.encode(FR, sc, mont=False))
Pp, Sp = msmmod.pad_msm_inputs(P, S)
out = msmmod.msm(Pp, Sp, c=4, affine=True, signed=True)
got = curve.decode_points(jax.tree.map(lambda a: a[..., None], out))[0]
want = hostcurve.g1_msm(pts_host, sc)
assert got == want, (got, want)
# zero scalars -> identity through the same kernels
Z = jnp.asarray(limbs.encode(FR, [0] * n, mont=False))
Pp, Zp = msmmod.pad_msm_inputs(P, Z)
z = msmmod.msm(Pp, Zp, c=4, affine=True, signed=True)
assert curve.decode_points(jax.tree.map(lambda a: a[..., None], z))[0] is None
print("fused interpret MSM OK")
""")


def test_scan_packed_matches_scan_steps_interpret():
    """prefix_scan_packed (in-kernel unpack + signed y-negation) must equal
    prefix_scan_steps on the unpacked, pre-negated points — covering the
    packing layout and the p-y negation branch."""
    _run("""
import random
import numpy as np
import jax
import jax.numpy as jnp
from ezkl_tpu.fieldmath import limbs, curve, hostcurve
from ezkl_tpu.fieldmath.spec import bn254_fq, FQ_MODULUS
from ezkl_tpu.kernels import pcurve
FQ = bn254_fq()
rng = random.Random(29)
m, S = 5, 2                              # m=5: non-block-multiple padding
pts = [[hostcurve.g1_mul(hostcurve.G1, rng.randrange(1, 1 << 50))
        for _ in range(S)] for _ in range(m)]
neg = [[rng.randrange(2) for _ in range(S)] for _ in range(m)]
xs = limbs.encode(FQ, [[p[0] for p in row] for row in pts])   # (16, m, S)
ys = limbs.encode(FQ, [[p[1] for p in row] for row in pts])
# pack 2x16-bit limbs per u32 with the MSM's own packer (layout parity)
from ezkl_tpu.kernels.msm import _pack2
px = _pack2(jnp.asarray(xs)); py = _pack2(jnp.asarray(ys))
sn = jnp.asarray(np.asarray(neg, np.uint32))
got = pcurve.prefix_scan_packed(px, py, sn)
# oracle: host prefix over the (possibly negated) points
acc = None
exp = []
for i in range(m):
    row = []
    for s in range(S):
        pt = pts[i][s]
        if neg[i][s]:
            pt = hostcurve.g1_neg(pt)
        row.append(pt)
    exp.append(row)
want = [[None] * S for _ in range(m)]
for s in range(S):
    acc = None
    for i in range(m):
        acc = exp[i][s] if acc is None else hostcurve.g1_add(acc, exp[i][s])
        want[i][s] = acc
got_dec = curve.decode_points(got)
flat_want = [want[i][s] for i in range(m) for s in range(S)]
assert got_dec == flat_want, (got_dec[:3], flat_want[:3])
print("prefix_scan_packed vs host OK")
""")
