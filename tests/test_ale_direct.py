"""ALE 'direct' regrid method (regrid_cntiso_hybrid_direct_jslice,
mod_ale_regrid_remap.F90:286-560) + the hor3map root-finding regrid."""

import numpy as np
import jax.numpy as jnp

from blom_tpu.core.constants import onem
from blom_tpu.drivers import standalone
from blom_tpu.dynamics import ale as A
from blom_tpu.ops import hor3map as h3


def test_regrid_crossings_analytic():
    """Crossing pressures of a known monotone parabola profile."""
    kk, H = 4, (3,)
    p = jnp.asarray(np.linspace(0., 4., kk + 1))[:, None] * jnp.ones(H)
    # linear profile sigma = p  (c0 = p_k, c1 = dx, c2 = 0)
    tm = jnp.asarray(.5 * (np.asarray(p)[1:] + np.asarray(p)[:-1]))
    rc = h3.ppm_reconstruct(p, tm, h3.MONOTONIC)
    trg = jnp.asarray(np.array([.5, 1.5, 2.25, 3.5, 99.]))[:, None] \
        * jnp.ones((5,) + H)
    got = np.asarray(h3.regrid_crossings(rc, trg))
    # interior layers reconstruct the linear profile exactly
    np.testing.assert_allclose(got[1], 1.5, atol=1e-10)
    np.testing.assert_allclose(got[2], 2.25, atol=1e-10)
    # boundary cells keep their (monotone) boundary parabola: the
    # crossing stays inside the containing layer
    assert ((got[0] >= 0.) & (got[0] <= 1.)).all()
    assert ((got[3] >= 3.) & (got[3] <= 4.)).all()
    # denser than the reconstruction's bottom value -> missing (the
    # caller's bounded fill sends these interfaces to the sea floor)
    assert (got[4] <= .5 * h3.REGRID_MVAL).all()


def test_regrid_direct_places_interfaces_at_targets():
    """On a smooth stratified column the direct method places interior
    interfaces where the (monotonized) density equals the target, up to
    the plevel/dpmin clamps; output is monotone and bounded."""
    model = standalone.build_fuk95(itdm=32, jtdm=12, kdm=10)
    s, _ = standalone.run(model, 2)
    n = 1
    grid = model.grid
    ale = model.par.ale._replace(regrid_method='direct')
    from blom_tpu.core.state import cumulative_p
    p_src = cumulative_p(s.dp[n]) * grid.ip
    p_dst, sf = A.regrid_direct(grid, model.e, ale, p_src, s.sigma[n],
                                s.sigmar)
    pd = np.asarray(p_dst)
    ps = np.asarray(p_src)
    ip = np.asarray(grid.ip) > 0
    # bounded and monotone with the interior minimum thickness
    assert np.allclose(pd[0], ps[0])
    assert np.allclose(pd[-1][ip], ps[-1][ip])
    dmin = min(ale.plevel[1] - ale.plevel[0], ale.dpmin_interior)
    d = np.diff(pd, axis=0)[:, ip]
    at_bot = pd[1:][:, ip] >= ps[-1][ip][None] - 1e-6
    assert (d[~at_bot] >= dmin - 1e-6).all()
    assert (d >= -1e-9).all()


def test_regrid_direct_runs_e2e():
    """A fuk95 step loop with regrid_method='direct' stays finite and
    conserves mass."""
    model = standalone.build_fuk95(itdm=32, jtdm=12, kdm=8)
    model.par = model.par._replace(
        ale=model.par.ale._replace(regrid_method='direct'))
    grid = model.grid
    m0 = float((np.asarray(model.state.dp[1]).sum(0)
                * np.asarray(grid.scp2) * np.asarray(grid.ip)).sum())
    s, _ = standalone.run(model, 10)
    for f in ('dp', 'temp', 'saln', 'u', 'v'):
        assert np.isfinite(np.asarray(getattr(s, f))).all(), f
    m1 = float((np.asarray(s.dp[1]).sum(0)
                * np.asarray(grid.scp2) * np.asarray(grid.ip)).sum())
    assert abs(m1 - m0) / m0 < 1e-12
