"""Circuit assignments: concrete column values + copy constraints.

The analog of the reference's assigned-region state (RegionCtx /
VarTensor assignment, SURVEY.md §2.2), flattened: the graph layer writes
whole columns at once (vectorized), never cell-by-cell.

Columns are held as numpy (16, n) RAW limb arrays host-side and converted
to device Montgomery form in one batch at proving time.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..fieldmath import limbs
from ..fieldmath.spec import bn254_fr, NLIMBS
from .cs import ConstraintSystem, Column, FIXED, ADVICE, INSTANCE

FR = bn254_fr()


@jax.jit
def _to_mont_stack(raw: jnp.ndarray) -> jnp.ndarray:
    """(C, 16, n) raw -> (C, 16, n) Montgomery (limb axis moved internally)."""
    v = jnp.moveaxis(raw, 1, 0)
    return jnp.moveaxis(limbs.to_mont(FR, v), 0, 1)


@dataclasses.dataclass
class Assignment:
    cs: ConstraintSystem
    k: int
    fixed: np.ndarray            # (num_fixed, 16, n) raw limbs
    advice: np.ndarray           # (num_advice, 16, n) raw limbs
    instance: list[list[int]]    # host ints per instance column
    copies: list[tuple]          # batches (col_a, rows_a[np], col_b, rows_b[np])
    # phase-1 witness callback: challenges {idx: int} ->
    #   {advice_col_index: list[int] field values (length n)}
    phase_callback: object = None

    @classmethod
    def empty(cls, cs: ConstraintSystem, k: int) -> "Assignment":
        n = 1 << k
        return cls(
            cs=cs,
            k=k,
            fixed=np.zeros((cs.num_fixed, NLIMBS, n), np.uint32),
            advice=np.zeros((cs.num_advice, NLIMBS, n), np.uint32),
            instance=[[] for _ in range(cs.num_instance)],
            copies=[],
        )

    @property
    def n(self) -> int:
        return 1 << self.k

    # -- writes -------------------------------------------------------------

    def _store(self, col: Column):
        return self.fixed if col.kind == FIXED else self.advice

    def set_ints(self, col: Column, row0: int, values):
        """Assign Python ints (any magnitude) starting at row0."""
        arr = limbs.encode(FR, [v % FR.modulus for v in values], mont=False)
        self._store(col)[col.index][:, row0:row0 + arr.shape[1]] = arr

    def set_i64(self, col: Column, row0: int, values: np.ndarray):
        """Assign an int64 ndarray (fast path)."""
        arr = limbs.encode_i64(FR, values)
        self._store(col)[col.index][:, row0:row0 + arr.shape[-1]] = arr

    def set_ints_at(self, col: Column, rows: list[int], values):
        """Assign Python ints at scattered rows."""
        arr = limbs.encode(FR, [v % FR.modulus for v in values], mont=False)
        self._store(col)[col.index][:, rows] = arr

    def apply_phase1(self, challenges: dict[int, int]):
        """Fill phase-1 advice columns via the witness callback."""
        if self.phase_callback is None:
            return
        cols = self.phase_callback(challenges)
        for idx, values in cols.items():
            self.set_ints(Column(ADVICE, idx), 0, values)

    def set_instance(self, col: Column, values):
        assert col.kind == INSTANCE
        self.instance[col.index] = [int(v) % FR.modulus for v in values]

    def copy(self, a: Column, arow: int, b: Column, brow: int):
        self.copies.append((a, np.asarray([arow], np.int64),
                            b, np.asarray([brow], np.int64)))

    # -- reads (host ints, for debugging / instance prep) ---------------------

    def get_int(self, col: Column, row: int) -> int:
        if col.kind == INSTANCE:
            vals = self.instance[col.index]
            return vals[row] if row < len(vals) else 0
        a = self._store(col)[col.index][:, row:row + 1]
        return int(limbs.decode(FR, a, mont=False)[0])

    # -- device conversion ----------------------------------------------------

    def device_columns(self, which: str) -> jnp.ndarray:
        """(num_cols, 16, n) device MONTGOMERY lagrange evals."""
        raw = {FIXED: self.fixed, ADVICE: self.advice}[which]
        return _to_mont_stack(jnp.asarray(raw))

    def instance_device(self) -> jnp.ndarray:
        """(num_instance, 16, n) device Montgomery (zero-padded)."""
        n = self.n
        out = np.zeros((self.cs.num_instance, NLIMBS, n), np.uint32)
        for i, vals in enumerate(self.instance):
            if vals:
                out[i][:, :len(vals)] = limbs.encode(FR, vals, mont=False)
        return _to_mont_stack(jnp.asarray(out))
