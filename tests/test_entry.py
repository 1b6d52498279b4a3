"""Driver-hook validation: run the EXACT graphs the driver compile-checks.

`dryrun_multichip(8)` on the 8-device virtual CPU mesh is what the driver
runs (MULTICHIP_r{N}.json); executing it here both tests it and seeds the
repo-local persistent compile cache with the very executables the driver
will look up — round-1 failed on a cold-cache compile timeout (rc=124).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_entry_single_chip():
    fn, args = graft.entry()
    import jax

    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
