"""Calendar and model-clock tests (vs mod_calendar.F90 / mod_time.F90)."""

import datetime

import pytest

from blom_tpu.core import calendar as cal
from blom_tpu.core import modeltime


def test_gregorian_matches_python_datetime():
    # CJDN differences must match python date arithmetic for modern dates.
    d1, d2 = cal.Date(2000, 1, 1), cal.Date(2026, 8, 17)
    py = (datetime.date(2026, 8, 17) - datetime.date(2000, 1, 1)).days
    assert cal.daynum_diff('standard', d1, d2) == py


def test_gregorian_epoch():
    # CJDN of 2000-01-01 in the Gregorian calendar is 2451545.
    assert cal.date_to_daynum('standard', cal.Date(2000, 1, 1)) == 2451545


def test_julian_gregorian_transition():
    # 1582-10-04 (Julian) is immediately followed by 1582-10-15 (Gregorian).
    d4 = cal.date_to_daynum('standard', cal.Date(1582, 10, 4))
    d15 = cal.date_to_daynum('standard', cal.Date(1582, 10, 15))
    assert d15 - d4 == 1
    with pytest.raises(ValueError):
        cal.date_to_daynum('standard', cal.Date(1582, 10, 10))


@pytest.mark.parametrize('calendar', ['standard', 'proleptic_gregorian',
                                      'julian', 'noleap', 'all_leap',
                                      '360_day'])
def test_roundtrip(calendar):
    last_dec = 19991230 if calendar == '360_day' else 19991231
    for ymd in (20000101, 20000229 if calendar in ('all_leap',) else 20000228,
                last_dec, 20260817, 18150630):
        d = cal.Date.from_ymd(ymd)
        dn = cal.date_to_daynum(calendar, d)
        assert cal.daynum_to_date(calendar, dn) == d


def test_360_day_year_length():
    assert cal.days_in_year('360_day', 2000) == 360
    assert cal.days_in_year('noleap', 2000) == 365
    assert cal.days_in_year('all_leap', 1999) == 366
    assert cal.days_in_year('standard', 2000) == 366
    assert cal.days_in_year('standard', 1900) == 365


def test_date_offset_month_rollover_360():
    d = cal.Date(2000, 1, 30)
    assert cal.date_offset('360_day', d, 1) == cal.Date(2000, 2, 1)
    assert cal.date_offset('360_day', d, 360) == cal.Date(2001, 1, 30)


def test_init_timevars_fuk95():
    # fuk95 deck: BACLIN=180, BATROP=6 -> 480 steps/day, lstep=30, dlt=6
    # (tests/fuk95/limits:141-143; mod_time.F90:102-127).
    t = modeltime.init_timevars('fuk95', 180., 6., 20000101, 20000101)
    assert t.calendar == '360_day'
    assert t.nstep_in_day == 480
    assert t.lstep == 30
    assert t.dlt == 6.0
    assert t.delt1 == 180.0      # first step forward
    t = t.step()
    assert t.nstep == 1
    assert t.delt1 == 180.0      # nstep<=1 still forward
    t = t.step()
    assert t.delt1 == 360.0      # leap-frog afterwards


def test_step_time_day_rollover():
    t = modeltime.init_timevars('fuk95', 180., 6., 20000130, 20000101)
    for _ in range(480):
        t = t.step()
    assert t.date == cal.Date(2000, 2, 1)   # 360_day calendar rollover
    assert t.ymd_tod() == (20000201, 0)


def test_lstep_even():
    # lstep must be even (mod_time.F90:118-123): baclin=3600, batrop=75
    # gives 3600/75=48 -> even already; baclin=3600, batrop=80 -> 2*ceil(22.5)=46.
    t = modeltime.init_timevars('noforcing', 3600., 80., 20000101, 20000101)
    assert t.lstep == 46
    assert t.lstep % 2 == 0
