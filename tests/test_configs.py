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
