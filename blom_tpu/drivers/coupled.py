"""Coupled-mode ocean cap: import/export field translation and the
coupling advance loop.

TPU-native counterpart of the reference coupling stack: the NUOPC cap
(/root/reference/drivers/nuopc/ocn_comp_nuopc.F90:100-950 SetServices/
InitializeAdvertise/DataInitialize/ModelAdvance), the import/export
translation (/root/reference/drivers/nuopc/ocn_import_export.F90:
237-330 field lists, ocn_import/ocn_export), the CESM forcing adapter
(/root/reference/cesm/mod_cesm.F90:61-330 two-slot time smoothing
getfrc_cesm) and the coupled-mode thermodynamics
(/root/reference/cesm/mod_thermf_cesm.F90:60-260 thermf_cesm,
mod_swtfrz freezing temperature).

The ESMF mesh/redistribution machinery is replaced by plain pytrees on
the model grid: the coupler hands fields already mapped to the ocean
grid (the mediator's job), and the cap translates, time-smooths, and
steps the pure model function.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import eos
from ..core.constants import grav, onem
from ..core.grid import Grid
from ..core.state import State, cumulative_p
from ..phys.forcing import Forcing

SPCIFH = 3990.
T0DEG = 273.15
SREF = 34.65
ALPHA0 = 1.e-3


class ImportFields(NamedTuple):
    """Coupler -> ocean fields, all (jdm, idm), on the ocean grid
    (fldsToOcn, ocn_import_export.F90:237-300)."""
    taux: jax.Array      # Foxx_taux [N m-2]
    tauy: jax.Array      # Foxx_tauy
    swnet: jax.Array     # Foxx_swnet [W m-2], positive down
    lat: jax.Array       # Foxx_lat latent
    sen: jax.Array       # Foxx_sen sensible
    lwup: jax.Array      # Foxx_lwup
    lwdn: jax.Array      # Faxa_lwdn
    rain: jax.Array      # Faxa_rain [kg m-2 s-1]
    snow: jax.Array      # Faxa_snow
    evap: jax.Array      # Foxx_evap
    rofl: jax.Array      # Foxx_rofl liquid runoff
    rofi: jax.Array      # Foxx_rofi frozen runoff
    melth: jax.Array     # Fioi_melth ice melt heat [W m-2]
    meltw: jax.Array     # Fioi_meltw ice melt water [kg m-2 s-1]
    salt: jax.Array      # Fioi_salt ice salt flux [kg m-2 s-1]
    ifrac: jax.Array     # Si_ifrac ice fraction
    pslv: jax.Array      # Sa_pslv sea-level pressure [Pa]
    duu10n: jax.Array    # So_duu10n 10-m wind speed squared [m2 s-2]
    # glc runoff (Forr_rofl_glc/Forr_rofi_glc, :251-252) - summed into
    # the liquid/frozen runoff
    rofl_glc: jax.Array
    rofi_glc: jax.Array
    # wave coupling (Sw_*, :266-269)
    lamult: jax.Array    # Langmuir enhancement factor []
    ustokes: jax.Array   # surface Stokes drift [m s-1]
    vstokes: jax.Array
    hstokes: jax.Array   # Stokes depth scale [m]
    # BGC-relevant atmosphere/ice fields (:244-288)
    bcpho: jax.Array     # Fioi_bcpho hydrophobic black carbon from ice
    bcphi: jax.Array     # Fioi_bcphi hydrophilic black carbon
    flxdst: jax.Array    # Fioi_flxdst dust from ice [kg m-2 s-1]
    ndep: jax.Array      # Faxa_ndep nitrogen deposition [kg N m-2 s-1]
    co2prog: jax.Array   # Sa_co2prog prognostic atm CO2 [ppmv]
    co2diag: jax.Array   # Sa_co2diag diagnostic atm CO2 [ppmv]
    # extended-N-cycle atmosphere deposition (Faxa_hmat/Faxa_hmat_oa/
    # Faxa_hlat, ocn_import_export.F90:280-284); zeros unless the
    # extNcycle/sediment options are active
    hmat: jax.Array = None       # matured ammonium deposition
    hmoa: jax.Array = None       # hmat, open-ocean share
    hlat: jax.Array = None       # latent ammonium deposition

N_IMPORTS = 33


def zero_imports(shape, dtype=jnp.float64) -> ImportFields:
    z = jnp.zeros(tuple(shape), dtype)
    one = jnp.ones(tuple(shape), dtype)
    flds = [z] * 18 + [z, z, one, z, z, z] + [z] * 9
    return ImportFields(*flds)


# z-levels for the ocn->glc export profiles
# (ocn_import_export.F90:73-89)
NLEV_EXPORT = 30
EXPORT_LEVELS = tuple(30. + 60. * i for i in range(NLEV_EXPORT))
EXPORT_LEVEL_BNDS = tuple((60. * i, 60. * (i + 1))
                          for i in range(NLEV_EXPORT))


class ExportFields(NamedTuple):
    """Ocean -> coupler fields (fldsFrOcn,
    ocn_import_export.F90:309-336)."""
    So_omask: jax.Array
    So_t: jax.Array       # surface temperature [K]
    So_s: jax.Array       # surface salinity
    So_u: jax.Array       # surface current
    So_v: jax.Array
    So_dhdx: jax.Array    # sea-level slope
    So_dhdy: jax.Array
    So_bldepth: jax.Array  # boundary-layer depth [m]
    Fioo_q: jax.Array     # freezing potential heat flux [W m-2]
    # BGC outgassing fluxes (:320-330); zeros when BGC is off
    Faoo_fco2_ocn: jax.Array   # CO2 flux [kg CO2 m-2 s-1]
    Faoo_fdms_ocn: jax.Array   # DMS flux
    Faoo_fbrf_ocn: jax.Array   # bromoform flux
    # ocn->glc level profiles (:331-336), (NLEV_EXPORT, J, I)
    So_t_depth: jax.Array
    So_s_depth: jax.Array
    # extended-N-cycle outgassing (ocn_import_export.F90:323-324);
    # zeros when the extNcycle is off
    Faoo_fn2o_ocn: jax.Array = None   # N2O flux [kg N2O m-2 s-1]
    Faoo_fnh3_ocn: jax.Array = None   # NH3 flux [kg NH3 m-2 s-1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CesmForcing:
    """Two-slot forcing storage for coupling-interval time smoothing
    (mod_cesm.F90:67-100 *_da arrays; slot 0 = previous interval,
    slot 1 = current)."""
    swa: jax.Array       # (2, J, I)
    nsf: jax.Array
    hmlt: jax.Array
    lip: jax.Array
    sop: jax.Array
    eva: jax.Array
    rnf: jax.Array
    rfi: jax.Array
    fmltfz: jax.Array
    sfl: jax.Array
    ztx: jax.Array
    mty: jax.Array
    ustarw: jax.Array
    slp: jax.Array
    abswnd: jax.Array
    ficem: jax.Array
    lamult: jax.Array
    ustokes: jax.Array
    vstokes: jax.Array
    hstokes: jax.Array


def init_cesm_forcing(shape, dtype=jnp.float64) -> CesmForcing:
    z = jnp.zeros((2,) + tuple(shape), dtype)
    one = jnp.ones((2,) + tuple(shape), dtype)
    return CesmForcing(*([z] * 16 + [one, z, z, z]))


def import_forcing(cf: CesmForcing, imp: ImportFields) -> CesmForcing:
    """Rotate the slots and ingest a new coupling interval's fields
    (ocn_import -> the *_da slot writes, import_mct.F90 /
    ocn_import_export.F90 ocn_import)."""
    nsf = imp.lat + imp.sen + imp.lwup + imp.lwdn
    rho_air = 1.2
    ustarw = jnp.sqrt(jnp.sqrt(imp.taux ** 2 + imp.tauy ** 2) / 1000.)

    def put(two, new):
        return jnp.stack([two[1], new])

    return CesmForcing(
        swa=put(cf.swa, imp.swnet), nsf=put(cf.nsf, nsf),
        hmlt=put(cf.hmlt, imp.melth), lip=put(cf.lip, imp.rain),
        sop=put(cf.sop, imp.snow), eva=put(cf.eva, imp.evap),
        rnf=put(cf.rnf, imp.rofl + imp.rofl_glc),
        rfi=put(cf.rfi, imp.rofi + imp.rofi_glc),
        fmltfz=put(cf.fmltfz, imp.meltw), sfl=put(cf.sfl, imp.salt),
        ztx=put(cf.ztx, imp.taux), mty=put(cf.mty, imp.tauy),
        ustarw=put(cf.ustarw, ustarw), slp=put(cf.slp, imp.pslv),
        abswnd=put(cf.abswnd, jnp.sqrt(jnp.maximum(imp.duu10n, 0.))),
        ficem=put(cf.ficem, imp.ifrac),
        lamult=put(cf.lamult, imp.lamult),
        ustokes=put(cf.ustokes, imp.ustokes),
        vstokes=put(cf.vstokes, imp.vstokes),
        hstokes=put(cf.hstokes, imp.hstokes))


def getfrc_cesm(cf: CesmForcing, nstep_in_cpl: int, istep,
                smtfrc: bool = True):
    """Time-smoothed instantaneous forcing within a coupling interval
    (getfrc_cesm, mod_cesm.F90:202-330): cosine blend between the two
    stored intervals."""
    if smtfrc:
        w1 = .5 * (1. + jnp.cos((istep % nstep_in_cpl + 1) * jnp.pi
                                / nstep_in_cpl))
    else:
        w1 = 0.
    w2 = 1. - w1

    def blend(two):
        return w1 * two[0] + w2 * two[1]

    return {k: blend(getattr(cf, k)) for k in
            ('swa', 'nsf', 'hmlt', 'lip', 'sop', 'eva', 'rnf', 'rfi',
             'fmltfz', 'sfl', 'ztx', 'mty', 'ustarw', 'slp', 'abswnd',
             'ficem', 'lamult', 'ustokes', 'vstokes', 'hstokes')}


def thermf_cesm(grid: Grid, e: eos.EosParams, s: State, frc: dict,
                m: int, n: int, baclin: float):
    """Coupled-mode surface thermodynamics (thermf_cesm,
    mod_thermf_cesm.F90:60-260): assemble heat/salt fluxes from the
    coupler fields, virtual salt flux with deterministic global
    correction, and the freezing/melting potentials exported to the
    ice model."""
    dpotl = s.dp[n, 0]
    hotl = jnp.maximum(dpotl, 1.e-6) / onem
    totl = s.temp[n, 0] + T0DEG
    sotl = s.saln[n, 0]
    tice_f = eos.tfrz(e, sotl) + T0DEG
    tfrzm = eos.tfrz(e, .5 * (s.saln[m, 0] + s.saln[n, 0])) + T0DEG

    fwflx = (frc['eva'] + frc['lip'] + frc['sop'] + frc['rnf']
             + frc['rfi'] + frc['fmltfz'])
    brnflx = jnp.maximum(0., -sotl * frc['fmltfz'] * 1.e-3 + frc['sfl'])
    vrtsfl = -sotl * fwflx * 1.e-3

    area = jnp.sum(grid.scp2 * grid.ip)
    sflxc = jnp.sum(-(SREF * fwflx * 1.e-3 + vrtsfl) * grid.scp2
                    * grid.ip) / area
    salflx = -(vrtsfl + sflxc + frc['sfl']) * 1.e3

    # freezing/melting potentials (":94-101")
    frzpot = jnp.maximum(0., tice_f - totl) * SPCIFH * dpotl / (2. * grav)
    tm = .5 * (s.temp[m, 0] + s.temp[n, 0]) + T0DEG
    dpm = .5 * (s.dp[m, 0] + s.dp[n, 0])
    mltpot = jnp.minimum(0., tfrzm - tm) * SPCIFH * dpm / grav

    hmltfz = frc['hmlt'] + frzpot / baclin
    surflx = -(frc['swa'] + frc['nsf'] + hmltfz)
    sswflx = -frc['swa']

    flx = {'surflx': surflx * grid.ip, 'sswflx': sswflx * grid.ip,
           'salflx': salflx * grid.ip, 'brnflx': -brnflx * 1.e3 * grid.ip,
           'frzpot': frzpot * grid.ip, 'mltpot': mltpot * grid.ip,
           'ustar': frc['ustarw'] * grid.ip}
    return flx


def sfcstr_cesm(grid: Grid, frc: dict):
    """Surface stress at u/v points (mod_sfcstr_cesm.F90): average the
    p-point coupler stress onto the staggered points."""
    taux = .5 * (frc['ztx'] + grid.im1(frc['ztx'])) * grid.iu
    tauy = .5 * (frc['mty'] + grid.jm1(frc['mty'])) * grid.iv
    return taux, tauy


_SPVAL = 1.e30


def ocn_export(grid: Grid, e: eos.EosParams, s: State, n: int,
               frzpot, baclin: float,
               bgc_fluxes: dict = None) -> ExportFields:
    """Fields handed back to the coupler (ocn_export,
    ocn_import_export.F90 / export_mct.F90)."""
    u_srf = .5 * (s.u[n, 0] + s.ub[n] + grid.ip1(s.u[n, 0] + s.ub[n]))
    v_srf = .5 * (s.v[n, 0] + s.vb[n] + grid.jp1(s.v[n, 0] + s.vb[n]))
    dhdx = (grid.ip1(s.sealv) - grid.im1(s.sealv)) \
        / (2. * grid.scpx)
    dhdy = (grid.jp1(s.sealv) - grid.jm1(s.sealv)) \
        / (2. * grid.scpy)
    # boundary-layer depth proxy: depth of the top two layers
    bld = (s.dp[n, 0] + s.dp[n, 1]) / onem

    # ocn->glc level profiles at the standard 30 levels
    # (ocn_import_export.F90:73-89, acc_t_depth/acc_s_depth)
    from ..core.state import cumulative_p
    from ..io.merdia import to_zlev
    import numpy as _np
    bnds = _np.asarray(EXPORT_LEVEL_BNDS)
    p_i = cumulative_p(s.dp[n]) * grid.ip
    t_depth = to_zlev(s.temp[n], p_i, bnds=bnds, fill=_SPVAL)
    s_depth = to_zlev(s.saln[n], p_i, bnds=bnds, fill=_SPVAL)

    z2 = jnp.zeros_like(grid.ip)
    if bgc_fluxes is None:
        bgc_fluxes = {}
    return ExportFields(
        So_omask=grid.ip,
        So_t=(s.temp[n, 0] + T0DEG) * grid.ip,
        So_s=s.saln[n, 0] * grid.ip,
        So_u=u_srf * grid.ip, So_v=v_srf * grid.ip,
        So_dhdx=dhdx * grid.ip, So_dhdy=dhdy * grid.ip,
        So_bldepth=bld * grid.ip,
        Fioo_q=frzpot / baclin * grid.ip,
        Faoo_fco2_ocn=bgc_fluxes.get('co2flux', z2) * grid.ip,
        Faoo_fdms_ocn=bgc_fluxes.get('dmsflux', z2) * grid.ip,
        Faoo_fbrf_ocn=bgc_fluxes.get('brfflux', z2) * grid.ip,
        So_t_depth=t_depth, So_s_depth=s_depth,
        Faoo_fn2o_ocn=bgc_fluxes.get('n2oflux', z2) * grid.ip,
        Faoo_fnh3_ocn=bgc_fluxes.get('nh3flux', z2) * grid.ip)


class OcnCap:
    """The coupled driver loop (ModelAdvance,
    ocn_comp_nuopc.F90:886-950): per coupling interval, ingest
    imports, run nstep_in_cpl model steps with smoothed forcing, and
    produce exports."""

    def __init__(self, model, nstep_in_cpl: int, smtfrc: bool = True):
        self.model = model
        self.nstep_in_cpl = nstep_in_cpl
        self.smtfrc = smtfrc
        self.cf = init_cesm_forcing(model.grid.shape,
                                    model.state.dp.dtype)
        self.nstep = 0
        self.frzpot = jnp.zeros(model.grid.shape, model.state.dp.dtype)
        self.bgc_fluxes = {}

    def data_initialize(self) -> ExportFields:
        """The cap's DataInitialize phase (ocn_comp_nuopc.F90:367-560):
        export the initial ocean state to the mediator before the first
        ModelAdvance so other components can spin up against it."""
        model = self.model
        n = 1 - (self.nstep % 2)
        return ocn_export(model.grid, model.e, model.state, n,
                          self.frzpot, model.par.baclin,
                          self.bgc_fluxes)

    def advance(self, imp: ImportFields) -> ExportFields:
        from ..dynamics.step import blom_step
        model = self.model
        self.cf = import_forcing(self.cf, imp)
        s = model.state
        dfl = model.dfl
        for i in range(self.nstep_in_cpl):
            frc = getfrc_cesm(self.cf, self.nstep_in_cpl, self.nstep,
                              self.smtfrc)
            m = self.nstep % 2
            n = 1 - m
            flx = thermf_cesm(model.grid, model.e, s, frc, m, n,
                              model.par.baclin)
            taux, tauy = sfcstr_cesm(model.grid, frc)
            forcing = dataclasses.replace(
                model.forcing, taux=taux, tauy=tauy,
                surflx=flx['surflx'], sswflx=flx['sswflx'],
                salflx=flx['salflx'], brnflx=flx['brnflx'],
                lamult=frc['lamult'])
            delt1 = jnp.asarray(
                model.par.baclin if self.nstep == 0
                else 2. * model.par.baclin, s.pb.dtype)
            s, dfl = blom_step(model.grid, model.e, model.par,
                               model.coeffs_i, model.coeffs_j, s,
                               forcing, dfl, m, n, delt1, model.swabs)
            self.frzpot = flx['frzpot']
            self.nstep += 1
        model.state = s
        model.dfl = dfl
        # newest time level = the n of the last executed step
        n = 1 - ((self.nstep - 1) % 2)
        return ocn_export(model.grid, model.e, s, n, self.frzpot,
                          model.par.baclin, self.bgc_fluxes)
