"""E2E smoke tests for the channel and single_column experiments —
mirrors the reference's `run single_column` meson suite
(/root/reference/tests/single_column/meson.build) and exercises the
channel configuration (channel/mod_channel.F90)."""

import numpy as np
import pytest

from blom_tpu.drivers import standalone


def test_single_column_day():
    model = standalone.build_single_column()
    g = model.grid
    s0 = model.state
    assert float(np.asarray(s0.pb[0])[0, 0]) > 0.
    s, clock = standalone.run(model, 48)   # 1 model day at baclin=1800
    for f in ('dp', 'temp', 'saln', 'u', 'v', 'pb'):
        assert np.isfinite(np.asarray(getattr(s, f))).all(), f
    # stratification persists; no spurious horizontal motion
    t = np.asarray(s.temp[1])[:, 0, 0]
    dp = np.asarray(s.dp[1])[:, 0, 0]
    wet = dp > 1.
    assert t[wet][0] > t[wet][-1] + 5.  # thermocline survives the day
    assert np.abs(np.asarray(s.u)).max() < 1e-6
    # heat conservation (no forcing)
    h0 = float((np.asarray(s0.temp[1]) * np.asarray(s0.dp[1])).sum())
    h1 = float((np.asarray(s.temp[1]) * np.asarray(s.dp[1])).sum())
    assert abs(h1 - h0) / abs(h0) < 1e-6


def test_channel_spinup():
    # small version of the channel for test cost
    model = standalone.build_channel(itdm=64, jtdm=96, kdm=12)
    g = model.grid
    ip = np.asarray(g.ip)
    # walls at first/last j rows; periodic in i
    assert ip[0].sum() == 0 and ip[-1].sum() == 0 and ip[1:-1].min() >= 0
    mass0 = float((np.asarray(model.state.dp[1]).sum(0)
                   * np.asarray(g.scp2) * ip).sum())
    s, clock = standalone.run(model, 30)
    for f in ('dp', 'temp', 'saln', 'u', 'v', 'pb'):
        assert np.isfinite(np.asarray(getattr(s, f))).all(), f
    mass = float((np.asarray(s.dp[1]).sum(0) * np.asarray(g.scp2) * ip).sum())
    assert abs(mass - mass0) / mass0 < 1e-9
    # wind stress must accelerate a zonal current
    assert np.abs(np.asarray(s.u[1]) + np.asarray(s.ub[1])[None]).max() > 1e-4
    assert np.abs(np.asarray(s.u)).max() < 2.0


def test_fuk95_isopyc_bulkml():
    # the isopycnic bulk-mixed-layer vertical coordinate (the reference's
    # historical default regime): convec + diapfl + mxlayr path
    model = standalone.build_fuk95(vcoord='isopyc_bulkml',
                                   itdm=64, jtdm=16, kdm=12)
    g = model.grid
    ip = np.asarray(g.ip)
    mass0 = float((np.asarray(model.state.dp[1]).sum(0)
                   * np.asarray(g.scp2) * ip).sum())
    s, _ = standalone.run(model, 30)
    for f in ('dp', 'temp', 'saln', 'u', 'v', 'pb'):
        assert np.isfinite(np.asarray(getattr(s, f))).all(), f
    mass = float((np.asarray(s.dp[1]).sum(0) * np.asarray(g.scp2) * ip).sum())
    assert abs(mass - mass0) / mass0 < 1e-9
    # mixed layer stays near the minimum thickness (no forcing)
    dp1 = np.asarray(s.dp[1])
    ml = (dp1[0] + dp1[1])[ip > 0] / 9806.
    assert ml.min() > 2. and ml.max() < 12.
    # substantial interior layers BELOW the first physical layer stay
    # on their reference densities; layer kfpl (and kfpl+1 when its
    # density is past the class midpoint) is excluded from restoration
    # by the reference scheme (rstdns, mod_diapfl.F90:150-156), so the
    # criterion starts at kfpl+2
    sig = np.asarray(s.sigma[1])
    sigr = np.asarray(s.sigmar)
    dpw = np.asarray(s.dp[1])
    kfpl = np.asarray(s.kfpla[1])
    thick = dpw > 9806. * 2.
    interior = thick & (np.arange(12)[:, None, None] >= kfpl[None] + 2) \
        & (ip[None] > 0)
    assert interior.any()
    assert np.abs((sig - sigr)[interior]).max() < .05


def test_fuk95_enedis_scheme():
    """mommth='enedis' (Sadourny energy-conserving with dissipation,
    mod_momtum.F90:765-812) runs stably and conserves mass."""
    import dataclasses
    import numpy as np
    from blom_tpu.drivers import standalone
    from blom_tpu.dynamics.momtum import MomtumParams

    model = standalone.build_fuk95(itdm=32, jtdm=16, kdm=8)
    model.par = model.par._replace(
        momtum=dataclasses.replace(model.par.momtum, mommth='enedis')
        if dataclasses.is_dataclass(model.par.momtum)
        else model.par.momtum._replace(mommth='enedis'))
    grid = model.grid
    m0 = float((np.asarray(model.state.dp[1]).sum(0) * grid.scp2
                * grid.ip).sum())
    s, clock = standalone.run(model, 5)
    for name in ('dp', 'u', 'v', 'pb'):
        assert np.isfinite(np.asarray(getattr(s, name))).all(), name
    m1 = float((np.asarray(s.dp[0]).sum(0) * grid.scp2 * grid.ip).sum())
    assert abs(m1 - m0) / m0 < 1e-12
