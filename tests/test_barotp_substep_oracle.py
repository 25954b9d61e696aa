"""Double-entry parity: barotp substeps vs the loop-level Fortran
transcription (tests/oracles/barotp_substep_oracle.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blom_tpu.drivers import standalone
from blom_tpu.dynamics import barotp as bt
from tests.oracles import barotp_substep_oracle as orc


@pytest.mark.parametrize('mommth', ['enscon', 'enecon'])
def test_substep_chain_matches_oracle(mommth):
    """Three chained substeps (odd, even, odd — both solve orders and
    the slot alternation) match the transcription at 1e-9."""
    model = standalone.build_fuk95(itdm=32, jtdm=12, kdm=6)
    s, _ = standalone.run(model, 4)
    grid = model.grid
    par = bt.BarotpParams(cwbdts=1e-5, mommth=mommth)
    n, m = 1, 0
    rng = np.random.default_rng(1)
    ut = jnp.asarray(rng.uniform(-1e-3, 1e-3, grid.shape)) * grid.iu
    vt = jnp.asarray(rng.uniform(-1e-3, 1e-3, grid.shape)) * grid.iv

    fld = jax.jit(lambda g, st: bt._prologue(g, st, ut, vt, m, n, par))(
        grid, s)
    sub = bt.make_substep(fld, bt.global_shifts(grid), model.par.lstep,
                          model.par.dlt, par)
    weights = bt.substep_weights(model.par.lstep)

    fld_np = {k: np.asarray(v, np.float64) for k, v in fld.items()}
    z = jnp.zeros_like(fld['pb_t'][0])
    carry = (fld['pb_t'], fld['ubflx_t'], fld['vbflx_t'], z, z, z, z)
    zn = np.zeros(grid.shape)
    ocarry = (np.asarray(fld['pb_t'], np.float64),
              np.asarray(fld['ubflx_t'], np.float64),
              np.asarray(fld['vbflx_t'], np.float64),
              zn.copy(), zn.copy(), zn.copy(), zn.copy())

    iu = np.asarray(grid.iu) > 0
    iv = np.asarray(grid.iv) > 0
    ip = np.asarray(grid.ip) > 0
    masks = [(ip, ip), (iu, iu), (iv, iv), (iu, iu), (iv, iv),
             (iu, iu), (iv, iv)]
    names = ['pb_t', 'ubflx_t', 'vbflx_t', 'us', 'vs', 'uc', 'vc']

    for lll in (1, 2, 3):
        carry = sub(1, carry, jnp.asarray(lll))
        wo, wm, wn = weights(1, lll)
        ocarry = orc.oracle_substep(
            fld_np, *ocarry, lll=lll, wo=float(wo), wm=float(wm),
            wn=float(wn), dlt=float(model.par.dlt), mommth=mommth)
        for nm, a, b, (mk, _) in zip(names, carry, ocarry, masks):
            a = np.asarray(a, np.float64)
            b = np.asarray(b)
            if a.ndim == 3:
                a, b = a[:, mk], b[:, mk]
            else:
                a, b = a[mk], b[mk]
            scale = max(1.0, np.abs(b).max())
            np.testing.assert_allclose(
                a, b, rtol=1e-9, atol=1e-9 * scale,
                err_msg=f'{nm} after substep lll={lll} ({mommth})')
