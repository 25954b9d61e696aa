"""Namelist-driven case builder + run loop tests."""

import os

import numpy as np
import pytest

LIMITS_DECK = """
&LIMITS
  NDAY1    = 0
  NDAY2    = 1
  IDATE    = 20000101
  IDATE0   = 20000101
  RUNID    = 'tc001'
  EXPCNF   = 'fuk95'
  BACLIN   = 180.
  BATROP   = 6.
  MOMMTH   = 'enscon'
  PGFMTH   = 'dynamic enthalpy'
  ADVMTH   = 'cppm'
  VSC2HI   = .2
  VSC2LO   = .2
  CBAR     = .05
  CB       = .002
  CWBDTS   = 0.
  CWBDLS   = 25.
  RSTFRQ   = 30
/
&VCOORD
  VCOORD_TYPE = 'cntiso_hybrid'
/
"""


@pytest.mark.slow
def test_build_and_run_case(tmp_path):
    """An unmodified-format BLOM limits deck builds a model; a short
    run produces diagnostics, a restart, run.status and a checksum
    (program blom protocol, drivers/nocoupler/blom.F:20-67)."""
    from blom_tpu.drivers import case

    deck = tmp_path / 'limits'
    deck.write_text(LIMITS_DECK)
    model, cfg = case.build_case(str(deck))
    assert cfg.runid == 'tc001'
    assert model.par.momtum.mommth == 'enscon'
    assert model.par.advmth == 'cppm'

    s, clock, crc = case.run_case(model, cfg, rundir=str(tmp_path),
                                  nsteps=3)
    assert np.isfinite(np.asarray(s.dp)).all()
    assert isinstance(crc, int)
    assert (tmp_path / 'run.status').read_text().strip() == 'success'
    dia_files = [f for f in os.listdir(tmp_path)
                 if f.startswith('tc001_hd_') and f.endswith('.nc')]
    assert dia_files
    assert (tmp_path / 'rstdate.txt').exists()
    # a rotating restart was written
    rsts = [f for f in os.listdir(tmp_path) if 'restphy' in f]
    assert rsts


def test_gridfile_expcnf_dispatch(tmp_path):
    """The expcnf dispatch builds a runnable model for a grid-file
    configuration (ben02clim) with GRFILE from the deck and a uniform
    stratified IC fallback (mod_rdlim.F90 GRFILE/ICFILE path)."""
    import numpy as np
    from blom_tpu.core.config import RunConfig
    from blom_tpu.drivers import case as case_mod
    from blom_tpu.drivers import standalone

    # synthesize a small grid archive from the fuk95 grid
    m0 = standalone.build_fuk95(itdm=24, jtdm=12, kdm=6)
    g = m0.grid
    path = tmp_path / 'grid.npz'
    np.savez(path,
             pdx=np.asarray(g.scpx), pdy=np.asarray(g.scpy),
             udx=np.asarray(g.scux), udy=np.asarray(g.scuy),
             vdx=np.asarray(g.scvx), vdy=np.asarray(g.scvy),
             qdx=np.asarray(g.scqx), qdy=np.asarray(g.scqy),
             plat=np.asarray(g.plat), plon=np.asarray(g.plon),
             qlat=np.asarray(g.plat), pdepth=np.asarray(g.depths))

    cfg = RunConfig()
    cfg.expcnf = 'ben02clim'
    cfg.grfile = str(path)
    cfg.kdm = 6
    cfg.baclin = 180.
    cfg.batrop = 6.
    model, cfg = case_mod.build_case(cfg=cfg)
    assert model.grid.kk == 6
    s, clock = standalone.run(model, 4)
    for name in ('dp', 'temp', 'saln', 'u', 'v'):
        assert np.isfinite(np.asarray(getattr(s, name))).all(), name
