"""Namelist-driven case builder + run loop tests."""

import os

import numpy as np

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
