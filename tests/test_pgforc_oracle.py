"""Double-entry parity: the geopotential-method PGF vs the loop-level
Fortran transcription (tests/oracles/pgforc_oracle.py)."""

import numpy as np
import jax.numpy as jnp

from blom_tpu.drivers import standalone
from blom_tpu.dynamics.pgforc import pgforc
from tests.oracles import pgforc_oracle as orc


def test_pgforc_geopotential_matches_oracle():
    model = standalone.build_fuk95(itdm=32, jtdm=12, kdm=8)
    # a few steps so dp/temp columns and predicted pressures are
    # nontrivial (vanishing layers, tilted interfaces)
    s, _ = standalone.run(model, 4)
    n = 1
    grid = model.grid

    out = pgforc(grid, model.e, s, 0, n, 'geopotential')

    ip = np.asarray(grid.ip)
    iu = np.asarray(grid.iu)
    iv = np.asarray(grid.iv)
    want = orc.oracle_pgforc_geo(
        ip, iu, iv,
        np.asarray(s.dp[n]), np.asarray(s.temp[n]),
        np.asarray(s.saln[n]), np.asarray(s.phi[grid.kk]),
        np.asarray(s.pb_p), np.asarray(s.pbu_p), np.asarray(s.pbv_p))

    # dpu/dpv refresh
    np.testing.assert_allclose(np.asarray(out.dpu[n]) * iu,
                               want['dpu'] * iu, rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.dpv[n]) * iv,
                               want['dpv'] * iv, rtol=1e-9, atol=1e-6)
    # interface geopotential at wet columns
    np.testing.assert_allclose(
        np.asarray(out.phi)[:, ip > 0], want['phi'][:, ip > 0],
        rtol=1e-9, atol=1e-8)
    # layer and vertically averaged PGF + bottom-pressure sensitivities
    for nm, mask in (('pgfx', iu), ('pgfy', iv)):
        a = np.asarray(getattr(out, nm)[n]) * mask
        b = want[nm] * mask
        np.testing.assert_allclose(a, b, rtol=1e-9,
                                   atol=1e-9 * max(1., np.abs(b).max()),
                                   err_msg=nm)
    for nm, mask in (('pgfxm', iu), ('pgfym', iv), ('xixp', iu),
                     ('xixm', iu), ('xiyp', iv), ('xiym', iv)):
        a = np.asarray(getattr(out, nm)[n]) * mask
        b = want[nm] * mask
        np.testing.assert_allclose(a, b, rtol=1e-9,
                                   atol=1e-9 * max(1., np.abs(b).max()),
                                   err_msg=nm)
