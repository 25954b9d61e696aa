"""Golden-trajectory parity gate vs the Fortran reference.

BASELINE.md's north-star correctness check: blom_tpu's prognostic state
must stay allclose to the Fortran reference over 100 fuk95 steps.  The
golden archives are produced OUTSIDE this container (no Fortran
compiler here — PARITY.md documents the recipe and
tools/record_goldens.py the conversion); the test auto-skips until
`goldens/fuk95_step*.npz` are dropped into the repository, at which
point the gate becomes active with no code changes.
"""

import glob
import os
import re

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), '..', 'goldens')
GOLDENS = sorted(glob.glob(os.path.join(GOLDEN_DIR, 'fuk95_step*.npz')))

# BASELINE tolerance: "allclose (bitwise-tolerance)" — f64 forward
# trajectories of the same discrete equations; the fuk95 front grows
# roundoff differences ~8x/step (measured, tests/test_sharding.py), so
# per-checkpoint tolerances widen with step count.
RTOL0 = 1e-9
GROWTH = 8.0


@pytest.mark.skipif(not GOLDENS, reason='no golden archives recorded '
                    '(see PARITY.md / tools/record_goldens.py)')
def test_fuk95_golden_trajectory():
    from blom_tpu.drivers import standalone

    model = standalone.build_fuk95()
    s = model.state
    steps_done = 0
    for path in GOLDENS:
        step = int(re.search(r'step(\d+)', path).group(1))
        s, _ = standalone.run(
            standalone.Model(**{**model.__dict__, 'state': s}),
            step - steps_done)
        steps_done = step
        n = 1 - (steps_done % 2)
        gold = np.load(path)
        rtol = min(1e-3, RTOL0 * GROWTH ** (steps_done / 10.))
        for name in ('dp', 'temp', 'saln', 'u', 'v', 'pb'):
            if name not in gold:
                continue
            got = np.asarray(getattr(s, name)[n])
            want = gold[name]
            if want.ndim == got.ndim + 1:
                want = want[n]
            np.testing.assert_allclose(
                got, want, rtol=rtol, atol=rtol * np.abs(want).max(),
                err_msg=f'{name} at step {steps_done}')
