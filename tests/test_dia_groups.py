"""Multi-group diagnostics: DIAPHY parsing, in-step accumulation,
alarms and per-group output files (mod_dia.F90:278-344, 2200-2311)."""

import os

import numpy as np
import pytest

DECK = """
&LIMITS
  NDAY1 = 0
  NDAY2 = 1
  RUNID = 'dg001'
  EXPCNF = 'fuk95'
  BACLIN = 180.
  BATROP = 6.
  RSTFRQ = 0
/
&DIAPHY
  GLB_FNAMETAG = 'hd','hm'
  GLB_AVEPERIO = -240, 1
  GLB_FILEFREQ = 1, 30
  GLB_COMPFLAG = 0, 1
  GLB_NCFORMAT = 0, 0
  H2D_SST = 1, 1
  H2D_SSS = 1, 0
  H2D_MLDL82 = 0, 1
  H2D_MLDL82MX = 1, 0
  H2D_TAUX = 1, 0
  LYR_TEMP = 0, 1
  LVL_SALN = 0, 1
  MSC_TEMPGA = 1, 1
/
"""


def test_load_diaphy(tmp_path):
    from blom_tpu.core import config as cfg_mod

    deck = tmp_path / 'limits'
    deck.write_text(DECK)
    cfg = cfg_mod.load_limits(str(deck))
    assert len(cfg.dia_groups) == 2
    g0, g1 = cfg.dia_groups
    assert g0.fnametag == 'hd' and g0.aveperio == -240
    assert ('sst', 'ave') in g0.fields
    assert ('mldl82', 'max') in g0.fields     # H2D_MLDL82MX -> max op
    assert ('taux', 'ave') in g0.fields
    assert ('temp', 'ave') in g1.fields       # LYR_TEMP
    assert ('salnlvl', 'ave') in g1.fields    # LVL_SALN
    assert ('tempga', 'msc') in g0.fields     # MSC derived id


def test_run_case_multigroup(tmp_path):
    """Sub-daily alarms fire mid-run: with aveperio=-240 (240/day, i.e.
    every 2 steps at baclin=180) a 4-step run writes 2 'hd' files."""
    from blom_tpu.core import config as cfg_mod
    from blom_tpu.drivers import case

    deck = tmp_path / 'limits'
    deck.write_text(DECK)
    model, cfg = case.build_case(str(deck))
    s, clock, crc = case.run_case(model, cfg, rundir=str(tmp_path),
                                  nsteps=4)
    files = sorted(os.listdir(tmp_path))
    hd = [f for f in files if f.startswith('dg001_hd_')]
    hm = [f for f in files if f.startswith('dg001_hm_')]
    assert len(hd) == 2
    assert len(hm) == 1       # end-of-run flush

    from scipy.io import netcdf_file
    with netcdf_file(str(tmp_path / hd[-1]), 'r') as f:
        assert 'sst' in f.variables
        assert 'tempga' in f.variables
        sst = f.variables['sst'][0]
        assert np.isfinite(sst[np.asarray(model.grid.ip) > 0]).all()
    # the hm group is wet-point compressed (COMPFLAG=1)
    with netcdf_file(str(tmp_path / hm[0]), 'r') as f:
        assert 'pcomp' in f.dimensions
        assert 'temp' in f.variables
        assert 'salnlvl' in f.variables


def test_calendar_alarm_codes():
    """GLB_AVEPERIO calendar codes (mod_rdlim.F90:1197-1203 +
    diaout_alarms, mod_dia.F90:2290-2305): 30 fires only on entering
    day 1 of a month at a day boundary; 360..366 only on entering
    Jan 1; plain values use the fixed step period."""
    from blom_tpu.core import modeltime
    from blom_tpu.io.dia import DiaGroupCfg

    clock = modeltime.init_timevars('fuk95', 4320., 60.,
                                    20000115, 20000115)
    nspd = clock.nstep_in_day
    mon = DiaGroupCfg(aveperio=30)
    ann = DiaGroupCfg(aveperio=365)
    day = DiaGroupCfg(aveperio=1)
    assert mon.monthly and not mon.annual
    assert ann.annual and not ann.monthly

    fired_mon, fired_ann, fired_day = [], [], []
    done = 0
    for step in range(nspd * 50):        # ~50 model days from Jan 15
        clock = clock.step()
        done += 1
        if mon.alarm(clock, done, nspd):
            fired_mon.append(clock.date.to_ymd())
        if ann.alarm(clock, done, nspd):
            fired_ann.append(clock.date.to_ymd())
        if day.alarm(clock, done, nspd):
            fired_day.append(clock.date.to_ymd())
    assert fired_mon == [20000201, 20000301], fired_mon
    assert fired_ann == []
    assert len(fired_day) == 50
