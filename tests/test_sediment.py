"""Sediment module tests: tridiagonal solver, pore-water chemistry
conservation, diffusion equilibration, burial shifting."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.bgc import chemistry as chem
from blom_tpu.bgc import sediment as sd
from blom_tpu.bgc.params import NBGC, BgcParams, BgcTracers as T


@pytest.fixture(scope='module')
def par():
    return BgcParams()


def _setup(jj=3, ii=4):
    H = (jj, ii)
    sed = sd.init_sediment(H)
    # some solids
    sed = dataclasses.replace(
        sed,
        sedlay=sed.sedlay.at[sd.SedSolid.sso12].set(1.e-4)
        .at[sd.SedSolid.ssc12].set(1.e-2)
        .at[sd.SedSolid.sssil].set(1.e-2)
        .at[sd.SedSolid.sster].set(500.))
    kk = 6
    oc = jnp.zeros((NBGC, kk, jj, ii))
    oc = (oc.at[T.sco212].set(2.25e-3).at[T.alkali].set(2.35e-3)
          .at[T.phosph].set(2.e-6).at[T.oxygen].set(1.5e-4)
          .at[T.ano3].set(25.e-6).at[T.silica].set(60.e-6)
          .at[T.gasnit].set(8.e-4))
    kbo = jnp.full(H, kk - 1, jnp.int32)
    kbo_onehot = (jnp.arange(kk)[:, None, None] == kbo[None]).astype(float)
    bolay = jnp.full(H, 50.)
    omask = jnp.ones(H)
    saln_bot = jnp.full(H, 35.)
    rrho_bot = jnp.full(H, 1.027)
    keq = chem.kequi(jnp.full(H, 2.), saln_bot, jnp.full(H, 400.))
    zflx = jnp.zeros(H)
    flx = {'prorca': zflx + 1.e-8, 'prcaca': zflx + 5.e-9,
           'silpro': zflx + 1.e-8, 'produs': zflx + 1.e-9}
    return sed, oc, flx, keq, bolay, kbo_onehot, omask, saln_bot, rrho_bot


def test_powadi_uniform_steady():
    """With zero dissolution and uniform concentrations the implicit
    diffusion leaves the profile unchanged."""
    H = (2, 3)
    bolay = jnp.full(H, 10.)
    omask = jnp.ones(H)
    c0 = 3.e-4
    seddw_w = jnp.asarray(sd.SEDDW * sd.PORWAT)[:, None, None]
    sedb1 = jnp.concatenate([(bolay * c0)[None],
                             seddw_w * c0 * jnp.ones((sd.KS,) + H)])
    solrat = jnp.zeros((sd.KS,) + H)
    out = np.asarray(sd.powadi(solrat, sedb1, bolay, omask, 1800.))
    np.testing.assert_allclose(out, c0, rtol=1e-12)


def test_powadi_diffuses_toward_bottom_water():
    """An empty pore water column under rich bottom water gains tracer
    monotonically from above."""
    H = (2, 2)
    bolay = jnp.full(H, 10.)
    omask = jnp.ones(H)
    seddw_w = jnp.asarray(sd.SEDDW * sd.PORWAT)[:, None, None]
    sedb1 = jnp.concatenate([(bolay * 1.e-3)[None],
                             0. * seddw_w * jnp.ones((sd.KS,) + H)])
    out = np.asarray(sd.powadi(jnp.zeros((sd.KS,) + H), sedb1, bolay,
                               omask, 1800.))
    assert (out >= -1e-18).all()
    assert out[0, 0, 0] > out[1, 0, 0] > out[5, 0, 0]


def test_powach_conserves_and_directions(par):
    """One powach step: opal dissolution raises pore-water silicate,
    POC remineralization consumes O2 and produces PO4/NO3; the bottom
    water exchanges accordingly; everything stays finite and
    non-negative where it must."""
    sed, oc, flx, keq, bolay, kbo1, omask, sal, rho = _setup()
    sed2, oc2 = sd.powach(sed, oc, flx, keq, bolay, kbo1, omask, sal,
                          rho, 1800., par)
    for a in (sed2.sedlay, sed2.powtra, sed2.sedhpl):
        assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(oc2)).all()
    # POC declined (remineralized), pore-water PO4 increased
    assert (np.asarray(sed2.sedlay[sd.SedSolid.sso12]).mean()
            < np.asarray(sed.sedlay[sd.SedSolid.sso12]).mean() + 1e-5)
    assert (np.asarray(sed2.powtra[sd.SedPow.aph]).mean()
            > np.asarray(sed.powtra[sd.SedPow.aph]).mean())
    # oxygen consumed somewhere in the column
    assert (np.asarray(sed2.powtra[sd.SedPow.aox]).min()
            < np.asarray(sed.powtra[sd.SedPow.aox]).max())
    assert (np.asarray(sed2.powtra[sd.SedPow.aox]) > -1e-12).all()
    # pore-water pH state updated and bounded
    hp = np.asarray(sed2.sedhpl)
    assert (hp > 0.).all() and (hp < 1e-4).all()


def test_dipowa_equilibrates(par):
    """Pure pore-water diffusion pulls the profile toward the bottom-
    water value and conserves total tracer (pore + bottom box)."""
    sed, oc, flx, keq, bolay, kbo1, omask, sal, rho = _setup()
    sed = dataclasses.replace(
        sed, powtra=sed.powtra.at[sd.SedPow.asi].set(0.))
    inv0 = (float(np.asarray(
        (jnp.asarray(sd.SEDDW * sd.PORWAT)[:, None, None]
         * sed.powtra[sd.SedPow.asi]).sum()))
        + float(np.asarray((bolay * 60.e-6).sum())))
    sed2, oc2 = sd.dipowa(sed, oc, bolay, kbo1, omask, 1800.)
    pw = np.asarray(sed2.powtra[sd.SedPow.asi])
    assert (pw > 0.).all()          # gained from the bottom water
    bot = np.asarray(oc2[T.silica][-1])
    assert (bot < 60.e-6 + 1e-12).all()   # bottom water lost tracer
    inv1 = (float(np.asarray(
        (jnp.asarray(sd.SEDDW * sd.PORWAT)[:, None, None]
         * sed2.powtra[sd.SedPow.asi]).sum()))
        + float(np.asarray((bolay * oc2[T.silica][-1]).sum())))
    np.testing.assert_allclose(inv1, inv0, rtol=1e-10)


def test_sedshi_shifts_and_buries():
    """Overfilled surface layer sheds solids downward; an overfilled
    column buries; total solid inventory (layers + burial) conserved."""
    H = (2, 2)
    sed = sd.init_sediment(H)
    # overfill the top layer with clay and add POC tracer
    sed = dataclasses.replace(
        sed, sedlay=sed.sedlay.at[sd.SedSolid.sster, 0].set(5200.)
        .at[sd.SedSolid.sso12, 0].set(1.e-3))
    omask = jnp.ones(H)

    def poc_inv(s):
        lay = np.asarray(s.sedlay[sd.SedSolid.sso12])
        w = (sd.SEDDW * sd.PORSOL)[:, None, None]
        return float((lay * w).sum()) + float(
            np.asarray(s.burial[sd.SedSolid.sso12]).sum())

    inv0 = poc_inv(sed)
    sed2 = sd.sedshi(sed, omask)
    # downward shift happened
    assert (np.asarray(sed2.sedlay[sd.SedSolid.sster, 1]) > 0.).all()
    vol0 = np.asarray(sd.CLAFA * sed2.sedlay[sd.SedSolid.sster, 0])
    assert (vol0 <= 1. + 1e-6).all()
    # POC (no source in sedshi) is conserved through all shifts
    np.testing.assert_allclose(poc_inv(sed2), inv0, rtol=1e-10)
    # the sediment-volume deficit is topped up with clay from below
    # (the reference's open clay boundary, mo_sedshi.F90:120-140)
    assert (np.asarray(sed2.sedlay[sd.SedSolid.sster, -1]) > 0.).all()
    assert np.isfinite(np.asarray(sed2.burial)).all()


def test_hamocc_step_with_sediment_e2e(par):
    """Full BGC step + sediment on the fuk95 model: finite state,
    sediment gains POC from the particle rain, bottom fluxes no longer
    redistributed."""
    import jax
    from blom_tpu.bgc.step import (hamocc_step_with_sediment,
                                   init_bgc_tracers, zero_bgc_forcing)
    from blom_tpu.drivers import standalone

    model = standalone.build_fuk95(itdm=16, jtdm=8, kdm=8, use_bgc=True)
    s = model.state
    # seed detritus so the rain is nonzero
    s = dataclasses.replace(
        s, trc=s.trc.at[:, model.par.itrbgc + T.det].set(1.e-6))
    sed = sd.init_sediment(model.grid.shape)
    f = zero_bgc_forcing(model.grid.shape)

    step = jax.jit(lambda s, sed: hamocc_step_with_sediment(
        model.grid, model.e, par, s, f, sed, model.par.itrbgc, 0, 1,
        1800.)[:2])
    s1, sed1 = step(s, sed)
    for _ in range(3):
        s1, sed1 = step(s1, sed1)
    assert np.isfinite(np.asarray(s1.trc)).all()
    assert np.isfinite(np.asarray(sed1.powtra)).all()
    wet = np.asarray(model.grid.ip) > 0
    poc = np.asarray(sed1.sedlay[sd.SedSolid.sso12, 0])[wet]
    assert (poc > 0.).all(), 'sediment gained no POC from the rain'
