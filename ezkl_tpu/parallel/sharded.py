"""shard_map-based multi-chip MSM and NTT.

* `msm_sharded`: points/scalars sharded on the batch axis; each device runs
  the full local Pippenger (`ezkl_tpu.kernels.msm.msm`); partial results are
  all_gathered (D projective points, ~6KB) and tree-folded on every device.
  Communication volume is O(D), so scaling efficiency is compute-bound.

* `ntt_sharded`: four-step NTT of N = R x C. Data lives as an (R, C) matrix
  M[r, c] = x[r + R*c], rows (r) sharded. Steps: (1) local C-point NTTs
  along rows; (2) elementwise twiddle w^(r*c2); (3) all_to_all transpose to
  column sharding; (4) local R-point NTTs. Output Z[r2, c2] = X[C*r2 + c2]
  is the natural-order eval matrix, sharded on the last axis. One
  all_to_all of the full N elements is the only cross-chip traffic.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..fieldmath import limbs, curve
from ..fieldmath.curve import PointP
from ..fieldmath.spec import FieldSpec, bn254_fr, NLIMBS
from ..kernels import msm as msmmod
from ..kernels import ntt as nttmod

AXIS = "shards"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


# ---------------------------------------------------------------------------
# active-mesh registry: set a mesh here (or EZKL_TPU_MESH=<n>) and the
# prover's KZG commits dispatch through `msm_sharded` — multi-chip proving
# as a create_proof capability, not a side demo.
# ---------------------------------------------------------------------------

_ACTIVE_MESH: Mesh | None = None
_ENV_CHECKED = False


def set_mesh(mesh: Mesh | None):
    """Install (or clear, with None) the mesh used by prover commits."""
    global _ACTIVE_MESH, _ENV_CHECKED
    _ACTIVE_MESH = mesh
    _ENV_CHECKED = True


def active_mesh() -> Mesh | None:
    global _ACTIVE_MESH, _ENV_CHECKED
    if not _ENV_CHECKED:
        _ENV_CHECKED = True
        import os
        env = os.environ.get("EZKL_TPU_MESH")
        if env:
            n = int(env)
            if n > 1 and len(jax.devices()) >= n:
                _ACTIVE_MESH = make_mesh(n)
    return _ACTIVE_MESH


# ---------------------------------------------------------------------------
# MSM
# ---------------------------------------------------------------------------

def msm_sharded(mesh: Mesh, points: PointP, scalars: jnp.ndarray,
                c: int | None = None) -> PointP:
    """Data-parallel MSM. N must be divisible by mesh size and the local
    shard size must be a power of two. Returns a replicated PointP ()."""
    d = mesh.devices.size
    n = scalars.shape[-1]
    assert n % d == 0 and ((n // d) & (n // d - 1)) == 0, "bad shard size"
    if c is None:
        c = msmmod.default_window_bits(n // d)

    pt_spec = PointP(P(None, AXIS), P(None, AXIS), P(None, AXIS))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(pt_spec, P(None, AXIS)),
        out_specs=PointP(P(), P(), P()),
        check_vma=False,
    )
    def run(pts, sc):
        local = msmmod.msm(pts, sc, c=c)                      # batch ()
        gathered = jax.tree.map(
            lambda a: jnp.moveaxis(jax.lax.all_gather(a, AXIS), 0, -1), local
        )                                                      # (16, D)
        # fold the D partials with a scan (one add in the compiled body)
        return msmmod.fold_points(gathered)

    return run(points, scalars)


# ---------------------------------------------------------------------------
# NTT (four-step)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _step2_twiddles(spec: FieldSpec, R: int, C: int, inverse: bool) -> jnp.ndarray:
    """w^(r*c2) table, (16, R, C) Montgomery: gather of the master power
    table at exponents (r*c2) mod N (device-built, no host bigint loop)."""
    n = R * C
    k = n.bit_length() - 1
    w = nttmod.root_of_unity(spec, k, inverse)
    idx = (np.outer(np.arange(R, dtype=np.int64), np.arange(C, dtype=np.int64)) % n)
    with jax.ensure_compile_time_eval():
        master = limbs.jitted(spec).powers(w, n)  # (16, n)
        return master[:, idx]


def ntt_sharded(mesh: Mesh, spec: FieldSpec, mat: jnp.ndarray,
                inverse: bool = False) -> jnp.ndarray:
    """Four-step NTT. `mat` is (16, R, C) with M[r, c] = x[r + R*c], rows
    sharded over the mesh. Returns (16, R, C) with out[r2, c2] =
    X[C*r2 + c2] (natural order, LAST axis sharded).

    For the inverse transform, pass the eval matrix in the same layout with
    inverse=True; output is the coefficient matrix (including 1/N scaling).
    """
    d = mesh.devices.size
    _, R, C = mat.shape
    assert R % d == 0 and C % d == 0
    tw = _step2_twiddles(spec, R, C, inverse)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, AXIS, None), P(None, AXIS, None)),
        out_specs=P(None, None, AXIS),
        check_vma=False,
    )
    def run(m, t):
        # step 1: C-point NTTs along last axis (rows local); for inverse the
        # two local 1/C and 1/R scalings compose to the required 1/N
        y = nttmod.ntt(spec, m, inverse=inverse)               # (16, Rl, C)
        # step 2: twiddle w^(r*c2)
        y = limbs.mont_mul(spec, y, t)
        # step 3: transpose reshard: split C, concat R
        y = jax.lax.all_to_all(y, AXIS, split_axis=2, concat_axis=1, tiled=True)
        # y: (16, R, C/d); step 4: R-point NTTs along axis 1
        y = jnp.moveaxis(y, 1, -1)                             # (16, Cl, R)
        z = nttmod.ntt(spec, y, inverse=inverse)
        return jnp.moveaxis(z, -1, 1)                          # (16, R, Cl)

    return run(mat, tw)


def to_fourstep_layout(x: jnp.ndarray, R: int, C: int) -> jnp.ndarray:
    """(16, N) natural coeffs -> (16, R, C) with M[r, c] = x[r + R*c]."""
    return jnp.swapaxes(x.reshape(NLIMBS, C, R), 1, 2)


def from_fourstep_layout(z: jnp.ndarray) -> jnp.ndarray:
    """(16, R, C) output (X[C*r2 + c2]) -> (16, N) natural order."""
    _, R, C = z.shape
    return z.reshape(NLIMBS, R * C)
