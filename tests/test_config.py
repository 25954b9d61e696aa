"""Config / namelist loader tests against the reference fuk95 deck."""

import pathlib

from blom_tpu.core import config, namelist

FUK95_LIMITS = '/root/reference/tests/fuk95/limits'


def test_parse_reference_deck():
    groups = namelist.read_namelist_file(FUK95_LIMITS)
    assert 'LIMITS' in groups and 'VCOORD' in groups
    lim = groups['LIMITS']
    assert lim['BACLIN'] == 180.0
    assert lim['BATROP'] == 6.0
    assert lim['EXPCNF'] == 'fuk95'
    assert lim['MOMMTH'] == 'enscon'
    assert lim['APTFLX'] is False
    assert lim['ITEST'] == 78


def test_load_limits_fuk95():
    cfg = config.load_limits(FUK95_LIMITS)
    assert cfg.expcnf == 'fuk95'
    assert cfg.baclin == 180.0
    assert cfg.batrop == 6.0
    assert cfg.vsc2hi == .2
    assert cfg.cbar == .05
    assert cfg.cb == .002
    assert cfg.pgfmth == 'dynamic enthalpy'
    assert cfg.advmth == 'cppm'
    assert cfg.cppm_limiting == 'non_oscillatory'
    assert cfg.vcoord.vcoord_type == 'cntiso_hybrid'
    assert cfg.ale.reconstruction_method == 'ppm'
    assert cfg.ale.dpmin_interior == .1
    assert cfg.diffusion.eitmth == 'gm'
    assert cfg.diffusion.egmxdf == 1500.


def test_parse_repeated_and_lists():
    groups = namelist.parse_namelists("""
&G
  A = 3*1.5
  B = 'x', 'y'
  C = 2
/
""")
    assert groups['G']['A'] == [1.5, 1.5, 1.5]
    assert groups['G']['B'] == ['x', 'y']
    assert groups['G']['C'] == 2
