"""Diagnostic accumulation and NetCDF output.

TPU-native re-design of the reference diagnostics system
(reference: /root/reference/phy/mod_dia.F90 — up to nphymax=10 output
groups, each with its own averaging period and a per-field selection of
~230 2-D/layer/z-level diagnostics with ave/min/max/sq accumulation ops;
NetCDF output via mod_nctools.F90).

Design: a registry of pure extractors over a `DiaCtx` (grid + state +
forcing + diffusion fields), jit-friendly device-side accumulators
carried through the step scan (diaacc in-step, mod_blom_step.F90:239),
per-group alarm logic (diaout_alarms, mod_dia.F90:2200-2311), and a
NetCDF3-classic writer (the same classic format the reference's
NCFORMAT=0 produces) with optional wet-point-compressed packing
(mod_nctools ncdimc/nccomp)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core.state import State


class DiaCtx(NamedTuple):
    """Extractor context: everything a diagnostic may read."""
    g: Grid
    s: State
    frc: object = None     # phys.forcing.Forcing
    dfl: object = None     # dynamics.diffusion_fields.DiffusionFields
    si: object = None      # phys.seaice.SeaiceState
    swabs: object = None   # phys.swabs.SwabsFields
    tridx: dict = None     # tracer indices {'itriag','itrtke','itrgls'}
    cesm: dict = None      # coupled-interval forcing (getfrc_cesm dict)
    e: object = None       # core.eos.EosParams (falls back to defaults)


def _cesm(name):
    """A coupled-forcing field (H2D_LIP/SOP/EVA/RNFFLX/RFIFLX/FMLTFZ/
    HMLTFZ/LAMULT/USTOKES/VSTOKES ids; zeros in uncoupled runs)."""
    def fn(c, n):
        if not c.cesm or name not in c.cesm:
            return jnp.zeros(c.g.shape, c.s.pb.dtype)
        return c.cesm[name]
    return fn


def _si(name):
    """Sea-ice slab field (H2D_FICE/HICE/HSNW/TICE/TSRF/IAGE,
    mod_dia.F90:204-219; zeros when no ice model is active)."""
    def fn(c, n):
        if c.si is None:
            return jnp.zeros(c.g.shape, c.s.pb.dtype)
        return getattr(c.si, name)
    return fn


def _swabs(name):
    """Shortwave-absorption profile field (H2D_SWFC1/SWFC2/SWAL1/SWAL2,
    mod_dia.F90; zeros when swabs fields are absent)."""
    def fn(c, n):
        if c.swabs is None:
            return jnp.zeros(c.g.shape, c.s.pb.dtype)
        return getattr(c.swabs, name)
    return fn


def _trc_by_index(key, floor=None):
    """A named tracer extracted from the dynamic tracer block by its
    registry index (LYR_TKE/GLS/IDLAGE, mod_dia.F90:220-240)."""
    def fn(c, n):
        idx = -1 if not c.tridx else c.tridx.get(key, -1)
        if idx is None or idx < 0:
            return jnp.zeros(c.s.temp.shape[1:], c.s.temp.dtype)
        v = c.s.trc[n, idx]
        return v if floor is None else jnp.maximum(v, floor)
    return fn


def _wflx(c, n):
    """Diagnosed vertical mass flux through interfaces [kg s-1]
    (LYR_WFLX, mod_dia.F90): cumulative horizontal flux divergence from
    the accumulated uflx/vflx, downward positive, top interface zero."""
    g = c.g
    div = (g.ip1(c.s.uflx[n]) - c.s.uflx[n]
           + g.jp1(c.s.vflx[n], 'v', True) - c.s.vflx[n])
    return jnp.cumsum(div, axis=0) * g.ip


def _wflx2(c, n):
    w = _wflx(c, n)
    return w * w


def _bottom(extract):
    """Deepest-wet-layer value of a layer field (the *BOT ids of
    mod_dia.F90: ACC_SBOT/ACC_TBOT; dpbot region, mod_dia.F90:246)."""
    def fn(c, n):
        a = extract(c, n)
        wet = c.s.dp[n] > 1.e-3
        kidx = jnp.arange(a.shape[0])[:, None, None]
        kbot = jnp.max(jnp.where(wet, kidx, 0), axis=0)
        onehot = (kidx == kbot[None]).astype(a.dtype)
        return jnp.sum(a * onehot, axis=0)
    return fn


def _bfsq(c, n):
    """Interface Brunt-Vaisala frequency from the layered density
    (cmnfld_bfsqf, mod_cmnfld_routines.F90:61-421)."""
    from ..core.constants import epsilp, grav
    dp_k = c.s.dp[n]
    sig = c.s.sigma[n]
    dp_mid = jnp.maximum(.5 * (dp_k[:-1] + dp_k[1:]), epsilp)
    bv = grav * grav * (sig[1:] - sig[:-1]) / dp_mid
    return jnp.concatenate([bv[:1], bv], axis=0)


def _ivol(stagger):
    """Ice volume at u/v-points [m] (ACC_IVOLU/IVOLV): hicem*ficem
    summed from the two p-cells adjacent to the edge
    (mod_dia.F90:1136,1141 util1/util3)."""
    def fn(c, n):
        if c.si is None:
            return jnp.zeros(c.g.shape, c.s.pb.dtype)
        hf = c.si.hicem * c.si.ficem
        if stagger == 'u':
            return (c.g.im1(hf) + hf) * c.g.iu
        return (c.g.jm1(hf) + hf) * c.g.iv
    return fn


def _dpvor(c, n):
    """Thickness used in the potential-vorticity definition
    (mod_momtum.F90:473-575 dpvor) — momtum evaluates it at the MID
    time level m = 1-n, so the diagnostic does too."""
    from ..dynamics.momtum import potvor_field
    m = 1 - n
    _, dpv = potvor_field(c.g, c.s.dp[m], c.s.u[m], c.s.v[m],
                          return_dpvor=True)
    return dpv



def _mfl_trc(mfl, trc, direction):
    """Eddy-induced / submesoscale tracer flux: mass flux times the
    edge-mean tracer (mod_eddtra.F90:1836-1905, LYR_U/VT/SFLTD/SM)."""
    def fn(c, n):
        t = getattr(c.s, trc)[n]
        nbr = c.g.im1(t) if direction == 'u' else c.g.jm1(t)
        return getattr(c.dfl, mfl)[1 - n] * .5 * (t + nbr)
    return fn


_ONECM = 98.06      # 1 cm of pressure thickness [Pa] (mod_constants)
_DBCL82 = 3.e-4     # Levitus (1982) buoyancy criterion [m s-2]
_DRCB04 = .03       # de Boyer Montegut (2004) density criterion [kg m-3]
_ZREFB04 = 10.      # de Boyer Montegut reference depth [m]


def _mld_walk(z_mid, crit_val, crit, wet, z_bot, z0, c0):
    """Shared crossing walk of both MLD estimators
    (cmnfld_mldl82/mldb04, mod_cmnfld_routines.F90:933-1084): step down
    through wet layers carrying the last sub-critical (z, value) pair;
    at the first layer whose criterion value exceeds `crit`,
    interpolate the crossing depth linearly in the criterion value;
    never crossing yields the bottom depth.  All (kk, H) dense."""
    from jax import lax

    def body(carry, xs):
        zup, cup, done, out = carry
        zlo, clo, w = xs
        cross = w & (clo > crit) & (~done)
        cupc = jnp.minimum(cup, crit - 1e-14)
        zx = (zup * (clo - crit) + zlo * (crit - cupc)) \
            / jnp.maximum(clo - cupc, 1e-30)
        out = jnp.where(cross, zx, out)
        done = done | cross
        adv = w & (~done)
        zup = jnp.where(adv, zlo, zup)
        cup = jnp.where(adv, clo, cup)
        return (zup, cup, done, out), None

    init = (z0, c0, jnp.zeros(z0.shape, bool), z_bot)
    (zu, cu, done, out), _ = lax.scan(
        body, init, (z_mid, crit_val, wet))
    return out


def _mldl82(c, n):
    """Levitus (1982) mixed-layer depth: buoyancy difference of the
    surface water displaced to the local mid-layer pressure exceeds
    dbcl82 (cmnfld_mldl82, mod_cmnfld_routines.F90:933-996).  Depth is
    taken as pressure/onem (the model carries p, not geometric z)."""
    from ..core import eos
    from ..core.constants import grav, onem
    from ..core.state import cumulative_p
    p = cumulative_p(c.s.dp[n]) * c.g.ip
    dp_k = c.s.dp[n]
    temp, saln = c.s.temp[n], c.s.saln[n]
    p_mid = p[:-1] + .5 * dp_k
    z_mid = p_mid / onem
    rho_srf = eos.rho(p_mid[1:], temp[0][None], saln[0][None])
    rho_loc = eos.rho(p_mid[1:], temp[1:], saln[1:])
    db = grav * (1. - rho_srf / jnp.maximum(rho_loc, 1.))
    wet = dp_k[1:] > _ONECM
    z_bot = p[-1] / onem
    out = _mld_walk(z_mid[1:], db, _DBCL82, wet, z_bot,
                    z_mid[0], jnp.zeros_like(z_bot))
    return out * c.g.ip


def _mldb04(c, n):
    """de Boyer Montegut et al. (2004) mixed-layer depth: potential
    density (sig0) exceeds its value at the 10 m reference depth by
    drcb04 (cmnfld_mldb04, mod_cmnfld_routines.F90:998-1084)."""
    from ..core import eos
    from ..core.constants import onem
    from ..core.state import cumulative_p
    e = c.e if c.e is not None else _default_eos()
    p = cumulative_p(c.s.dp[n]) * c.g.ip
    dp_k = c.s.dp[n]
    z_mid = (p[:-1] + .5 * dp_k) / onem
    s0 = eos.sig0(e, c.s.temp[n], c.s.saln[n])

    # sig0 at the reference depth: linear interpolation between the
    # bracketing mid-layer depths (mod_cmnfld_routines.F90:1029-1039)
    above = z_mid <= _ZREFB04
    nmax = jnp.maximum(jnp.sum(above.astype(jnp.int32), axis=0), 1)
    kup = nmax - 1                                   # deepest above ref
    kidx = jnp.arange(dp_k.shape[0])[
        (slice(None),) + (None,) * (dp_k.ndim - 1)]
    pick = lambda a, kq: jnp.sum(            # noqa: E731
        jnp.where(kidx == kq[None], a, 0.), axis=0)
    klo = jnp.minimum(kup + 1, dp_k.shape[0] - 1)
    zu, zl = pick(z_mid, kup), pick(z_mid, klo)
    su, sl = pick(s0, kup), pick(s0, klo)
    w = jnp.clip((_ZREFB04 - zu) / jnp.maximum(zl - zu, 1e-12), 0., 1.)
    sig0ref = (1. - w) * su + w * sl

    ds = s0 - sig0ref[None]
    wet = (dp_k > _ONECM) & (z_mid > _ZREFB04)
    z_bot = p[-1] / onem
    out = _mld_walk(z_mid, ds, _DRCB04, wet, z_bot,
                    jnp.full_like(z_bot, _ZREFB04),
                    jnp.zeros_like(z_bot))
    # shallow columns: full depth (mod_cmnfld_routines.F90:1014-1018)
    out = jnp.where(z_bot < _ZREFB04, z_bot, out)
    return out * c.g.ip


def _default_eos():
    global _EOS_DEFAULT
    try:
        return _EOS_DEFAULT
    except NameError:
        from ..core import eos
        _EOS_DEFAULT = eos.init_eos(pref=0.)
        return _EOS_DEFAULT


def _isotherm_depth(tcrit):
    """Depth [m] of an isotherm (ACC_T20D/ACC_T17D, mod_dia.F90)."""
    def fn(c, n):
        from ..core.constants import onem
        from ..core.state import cumulative_p
        p = cumulative_p(c.s.dp[n])
        z_mid = .5 * (p[:-1] + p[1:]) / onem
        colder = c.s.temp[n] < tcrit
        kk = c.s.dp.shape[1]
        return jnp.min(jnp.where(colder, z_mid, p[kk] / onem),
                       axis=0) * c.g.ip
    return fn


def _btmstr(c, n):
    """Barotropic mass streamfunction [kg s-1]: south-to-north cumsum of
    the barotropic u transport (ACC_BTMSTR, mod_dia.F90)."""
    ut = c.s.ub[n] * c.s.pbu[n] * c.g.scuy / 9.806
    return jnp.cumsum(ut, axis=-2) * c.g.iu


def _pv(c, n):
    """Layer potential vorticity (ACC_PV): (zeta + f) / dp."""
    from ..core.constants import epsilp
    g = c.g
    u, v = c.s.u[n], c.s.v[n]
    # circulation / area form of relative vorticity at q
    vy = v * g.scvy
    ux = u * g.scux
    vort = ((vy - g.im1(vy)) - (ux - g.jm1(ux))) * g.scq2i
    f = g.corioq
    dq = .25 * (c.s.dp[n] + g.im1(c.s.dp[n])
                + g.jm1(c.s.dp[n]) + g.im1(g.jm1(c.s.dp[n])))
    return (vort + f) / jnp.maximum(dq, epsilp) * g.iq


def _ustar(c, n):
    taux_p = .5 * (c.frc.taux + c.g.ip1(c.frc.taux))
    tauy_p = .5 * (c.frc.tauy + c.g.jp1(c.frc.tauy, 'v', True))
    return jnp.sqrt(jnp.sqrt(taux_p ** 2 + tauy_p ** 2) / 1000.)


def _frc(name):
    def fn(c, n):
        return getattr(c.frc, name)
    return fn


def _dfl2(name):
    def fn(c, n):
        return getattr(c.dfl, name)[n]
    return fn


def _dfl(name):
    def fn(c, n):
        return getattr(c.dfl, name)
    return fn


# field extractors: name -> (dims, fn(ctx, lvl) -> array)
# dims: '2d' (J, I), '3d' (K, J, I) layer, 'zlv' (ddm, J, I) z-level,
#       'tr3d' (ntr, K, J, I), 'scalar' ()
FIELD_REGISTRY: Dict[str, Tuple[str, Callable]] = {
    # ---- 2-D (H2D_* ids, mod_dia.F90:204-219) ----
    'sealv': ('2d', lambda c, n: c.s.sealv),
    'slvsq': ('2d', lambda c, n: c.s.sealv ** 2),
    'pbot': ('2d', lambda c, n: c.s.pb[n]),
    'psrf': ('2d', lambda c, n: c.s.p[0] if c.s.p.ndim == 3
             else jnp.zeros_like(c.s.pb[n])),
    'sst': ('2d', lambda c, n: c.s.temp[n][0]),
    'sstsq': ('2d', lambda c, n: c.s.temp[n][0] ** 2),
    'sss': ('2d', lambda c, n: c.s.saln[n][0]),
    'ssssq': ('2d', lambda c, n: c.s.saln[n][0] ** 2),
    'ub': ('2d', lambda c, n: c.s.ub[n]),
    'vb': ('2d', lambda c, n: c.s.vb[n]),
    'ustarb': ('2d', lambda c, n: c.s.ustarb),
    'pbu': ('2d', lambda c, n: c.s.pbu[n]),
    'pbv': ('2d', lambda c, n: c.s.pbv[n]),
    'ubflxs': ('2d', lambda c, n: c.s.ubflxs[1]),
    'vbflxs': ('2d', lambda c, n: c.s.vbflxs[1]),
    'sbot': ('2d', _bottom(lambda c, n: c.s.saln[n])),
    'tbot': ('2d', _bottom(lambda c, n: c.s.temp[n])),
    'sigmx': ('2d', lambda c, n: c.s.sigma[n][0]),
    'btmstr': ('2d', _btmstr),
    'mldl82': ('2d', _mldl82),
    'mldb04': ('2d', _mldb04),
    't20d': ('2d', _isotherm_depth(20.)),
    't17d': ('2d', _isotherm_depth(17.)),
    # forcing-sourced 2-D fields
    'taux': ('2d', _frc('taux')),
    'tauy': ('2d', _frc('tauy')),
    'ztx': ('2d', _frc('taux')),
    'mty': ('2d', _frc('tauy')),
    'swa': ('2d', _frc('sswflx')),
    'nsf': ('2d', _frc('surflx')),
    'surflx': ('2d', _frc('surflx')),
    'sfl': ('2d', _frc('salflx')),
    'salflx': ('2d', _frc('salflx')),
    'brnflx': ('2d', _frc('brnflx')),
    'surrlx': ('2d', _frc('surrlx')),
    'salrlx': ('2d', _frc('salrlx')),
    'abswnd': ('2d', lambda c, n: jnp.sqrt(jnp.sqrt(
        (.5 * (c.frc.taux + c.g.ip1(c.frc.taux))) ** 2
        + (.5 * (c.frc.tauy + c.g.jp1(c.frc.tauy, 'v', True))) ** 2))),
    'ustar': ('2d', _ustar),
    'ustar3': ('2d', lambda c, n: _ustar(c, n) ** 3),
    # ---- layer 3-D (LYR_* ids) ----
    'temp': ('3d', lambda c, n: c.s.temp[n]),
    'saln': ('3d', lambda c, n: c.s.saln[n]),
    'dp': ('3d', lambda c, n: c.s.dp[n]),
    'dz': ('3d', lambda c, n: c.s.dp[n]),
    'dpu': ('3d', lambda c, n: c.s.dpu[n]),
    'dpv': ('3d', lambda c, n: c.s.dpv[n]),
    'uvel': ('3d', lambda c, n: c.s.u[n] + c.s.ub[n][None]),
    'vvel': ('3d', lambda c, n: c.s.v[n] + c.s.vb[n][None]),
    'sigma': ('3d', lambda c, n: c.s.sigma[n]),
    'uflx': ('3d', lambda c, n: c.s.uflx[n]),
    'vflx': ('3d', lambda c, n: c.s.vflx[n]),
    'utflx': ('3d', lambda c, n: c.s.utflx[n]),
    'vtflx': ('3d', lambda c, n: c.s.vtflx[n]),
    'usflx': ('3d', lambda c, n: c.s.usflx[n]),
    'vsflx': ('3d', lambda c, n: c.s.vsflx[n]),
    'bfsq': ('3d', _bfsq),
    'pv': ('3d', _pv),
    # diffusivity / eddy-transport fields (LYR_DIF*, LYR_*MFLTD/SM)
    'difint': ('3d', _dfl('difint')),
    'difiso': ('3d', _dfl('difiso')),
    'difdia': ('3d', _dfl('difdia')),
    'umfltd': ('3d', _dfl2('umfltd')),
    'vmfltd': ('3d', _dfl2('vmfltd')),
    'umflsm': ('3d', _dfl2('umflsm')),
    'vmflsm': ('3d', _dfl2('vmflsm')),
    # all passive tracers (LYR_TRC)
    'trc': ('tr3d', lambda c, n: c.s.trc[n]),
    # ---- global scalars (MSC_* ids) ----
    'massgs': ('scalar', lambda c, n: jnp.sum(
        c.s.dp[n] * (c.g.scp2 * c.g.ip)[None]) / 9.806),
    'volgs': ('scalar', lambda c, n: jnp.sum(
        c.s.dp[n] * (c.g.scp2 * c.g.ip)[None]) / (9.806 * 1000.)),
    'tempga': ('scalar', lambda c, n: jnp.sum(
        c.s.temp[n] * c.s.dp[n] * (c.g.scp2 * c.g.ip)[None])
        / jnp.maximum(jnp.sum(c.s.dp[n] * (c.g.scp2 * c.g.ip)[None]),
                      1e-30)),
    'salnga': ('scalar', lambda c, n: jnp.sum(
        c.s.saln[n] * c.s.dp[n] * (c.g.scp2 * c.g.ip)[None])
        / jnp.maximum(jnp.sum(c.s.dp[n] * (c.g.scp2 * c.g.ip)[None]),
                      1e-30)),
    'sstga': ('scalar', lambda c, n: jnp.sum(
        c.s.temp[n][0] * c.g.scp2 * c.g.ip)
        / jnp.maximum(jnp.sum(c.g.scp2 * c.g.ip), 1e-30)),
    'sssga': ('scalar', lambda c, n: jnp.sum(
        c.s.saln[n][0] * c.g.scp2 * c.g.ip)
        / jnp.maximum(jnp.sum(c.g.scp2 * c.g.ip), 1e-30)),
    # ---- sea ice (H2D_FICE/HICE/HSNW/TICE/TSRF/IAGE) ----
    'fice': ('2d', _si('ficem')),
    'hice': ('2d', _si('hicem')),
    'hsnw': ('2d', _si('hsnwm')),
    'tice': ('2d', _si('ticem')),
    'tsrf': ('2d', _si('tsrfm')),
    'iage': ('2d', _si('iagem')),
    # ---- shortwave absorption profile (H2D_SWFC1/2, SWAL1/2) ----
    'swfc1': ('2d', _swabs('swfc1')),
    'swfc2': ('2d', _swabs('swfc2')),
    'swal1': ('2d', _swabs('swal1')),
    'swal2': ('2d', _swabs('swal2')),
    # ---- vertical mixing coefficients (LYR_DIFV*) ----
    'difvho': ('3d', _dfl('difvho')),
    'difvso': ('3d', _dfl('difvso')),
    'difvmo': ('3d', _dfl('difvmo')),
    # ---- named tracers (LYR_TKE/GLS/IDLAGE) ----
    'tke': ('3d', _trc_by_index('itrtke')),
    'gls': ('3d', _trc_by_index('itrgls')),
    'idlage': ('3d', _trc_by_index('itriag')),
    # ---- diagnosed vertical mass flux (LYR_WFLX/WFLX2) ----
    'wflx': ('3d', _wflx),
    'wflx2': ('3d', _wflx2),
    # ---- coupled forcing fields (H2D ids from mod_cesm slots) ----
    'lip': ('2d', _cesm('lip')),
    'sop': ('2d', _cesm('sop')),
    'eva': ('2d', _cesm('eva')),
    'rnfflx': ('2d', _cesm('rnf')),
    'rfiflx': ('2d', _cesm('rfi')),
    'fmltfz': ('2d', _cesm('fmltfz')),
    'hmltfz': ('2d', _cesm('hmlt')),
    'lamult': ('2d', _cesm('lamult')),
    'lasl': ('2d', _cesm('hstokes')),
    'ustokes': ('2d', _cesm('ustokes')),
    'vstokes': ('2d', _cesm('vstokes')),
    'slp': ('2d', _cesm('slp')),
    # ---- sea-ice drift/volume + albedo (H2D_UICE/VICE/IVOLU/IVOLV/
    # ALB, mod_dia.F90; mod_seaice.F90:40-41 uicem/vicem) ----
    'uice': ('2d', _si('uicem')),
    'vice': ('2d', _si('vicem')),
    'alb': ('2d', _si('albm')),
    'ivolu': ('2d', _ivol('u')),
    'ivolv': ('2d', _ivol('v')),
    # ---- KPP boundary-layer depth (H2D_BLD/MAXBLD, the bldepth of
    # mod_difest.F90's CVMix wrap) ----
    'bld': ('2d', lambda c, n: c.dfl.bld),
    'maxbld': ('2d', lambda c, n: c.dfl.bld),
    # ---- thickness used in potential vorticity (LYR_DPVOR,
    # mod_momtum.F90:473-575 dpvor) ----
    'dpvor': ('3d', _dpvor),
    # ---- component-wise tracer fluxes: eddy-induced (td,
    # mod_eddtra.F90:1836-1905), submesoscale (sm) and isopycnal
    # diffusion (ld, dynamics.diffus) ----
    'utfltd': ('3d', _mfl_trc('umfltd', 'temp', 'u')),
    'usfltd': ('3d', _mfl_trc('umfltd', 'saln', 'u')),
    'vtfltd': ('3d', _mfl_trc('vmfltd', 'temp', 'v')),
    'vsfltd': ('3d', _mfl_trc('vmfltd', 'saln', 'v')),
    'utflsm': ('3d', _mfl_trc('umflsm', 'temp', 'u')),
    'usflsm': ('3d', _mfl_trc('umflsm', 'saln', 'u')),
    'vtflsm': ('3d', _mfl_trc('vmflsm', 'temp', 'v')),
    'vsflsm': ('3d', _mfl_trc('vmflsm', 'saln', 'v')),
    'utflld': ('3d', lambda c, n: c.dfl.utflld),
    'usflld': ('3d', lambda c, n: c.dfl.usflld),
    'vtflld': ('3d', lambda c, n: c.dfl.vtflld),
    'vsflld': ('3d', lambda c, n: c.dfl.vsflld),
    # ---- mixed-layer TKE budget terms (H2D_MTKE*) ----
    'mtkeus': ('2d', lambda c, n: c.dfl.mtke[0]),
    'mtkeni': ('2d', lambda c, n: c.dfl.mtke[1]),
    'mtkebf': ('2d', lambda c, n: c.dfl.mtke[2]),
    'mtkers': ('2d', lambda c, n: c.dfl.mtke[3]),
    'mtkepe': ('2d', lambda c, n: c.dfl.mtke[4]),
    'mtkeke': ('2d', lambda c, n: c.dfl.mtke[5]),
}


def _zlv(extract):
    """Wrap a 3-D extractor to produce its z-level remap (LVL_* ids,
    mod_dia.F90:241-276 + ale_remap_diazlv)."""
    def fn(c, n):
        from ..core.state import cumulative_p
        from .merdia import to_zlev
        return to_zlev(extract(c, n), cumulative_p(c.s.dp[n]))
    return fn


# previous-leapfrog-level accumulated mass fluxes (ACC_UFLXOLD/
# VFLXOLD, mod_dia.F90:618 — they back the LVL_WFLX vertical-flux
# computation from the OLD fluxes; exposed as ids of their own here)
FIELD_REGISTRY['uflxold'] = ('3d', lambda c, n: c.s.uflx[1 - n])
FIELD_REGISTRY['vflxold'] = ('3d', lambda c, n: c.s.vflx[1 - n])

# z-level twins of the layer fields (LVL_* ids)
for _name in ('temp', 'saln', 'uvel', 'vvel', 'uflx', 'vflx', 'utflx',
              'vtflx', 'usflx', 'vsflx', 'bfsq', 'difint', 'difiso',
              'difdia', 'dz', 'pv', 'umfltd', 'vmfltd', 'umflsm',
              'vmflsm', 'difvho', 'difvso', 'difvmo', 'tke', 'gls',
              'idlage', 'wflx', 'wflx2',
              'utfltd', 'usfltd', 'vtfltd', 'vsfltd',
              'utflsm', 'usflsm', 'vtflsm', 'vsflsm',
              'utflld', 'usflld', 'vtflld', 'vsflld',
              'uflxold', 'vflxold'):
    _dims, _fn = FIELD_REGISTRY[_name]
    FIELD_REGISTRY[_name + 'lvl'] = ('zlv', _zlv(_fn))
del _name, _dims, _fn

def _trclvl(c, n):
    """LVL_TRC (mod_dia.F90:226): z-level twins of the full passive-
    tracer stack, written per tracer as trcNN in the reference's
    diaout."""
    from ..core.state import cumulative_p
    from .merdia import DEPTHSLEV, to_zlev
    ntr = c.s.trc.shape[1]
    if not ntr:
        return jnp.zeros((0, len(DEPTHSLEV)) + c.g.shape, c.s.pb.dtype)
    p_i = cumulative_p(c.s.dp[n])
    return jnp.stack([to_zlev(c.s.trc[n, i], p_i) for i in range(ntr)])


FIELD_REGISTRY['trclvl'] = ('trzlv', _trclvl)


# --- remaining H2D ids (round 5): auxiliary bulk-forcing fields,
# brine plume depth, GLS aliases and the reference's utility
# placeholder arrays ------------------------------------------------

def _aux(name):
    """ben02/NIW auxiliary field (H2D_DFL/HMAT/IDKEDT): read from the
    coupled-forcing dict (ben02 publishes its aux fields there) or the
    sea-ice slab when present; zeros otherwise (the reference gates
    these on allocated(...), mod_dia.F90:1628)."""
    def fn(c, n):
        if c.cesm and name in c.cesm:
            return c.cesm[name]
        v = getattr(c.si, name, None) if c.si is not None else None
        if v is not None:
            return v
        return jnp.zeros(c.g.shape, c.s.pb.dtype)
    return fn


def _brnpd(c, n):
    """Brine plume pressure depth (ACC_BRNPD; pbrnda of
    mod_mxlayr.F90:97,557): the bulk-ML scheme condenses the brine
    plume into layer 2, so the plume bottom is that layer's lower
    interface; zero where there is no brine flux."""
    p2 = (c.s.p[2] - c.s.p[0]) * c.g.ip
    if c.frc is None:
        return jnp.zeros_like(p2)
    return jnp.where(c.frc.brnflx > 0., p2, 0.)


def _zeros2d(c, n):
    return jnp.zeros(c.g.shape, c.s.pb.dtype)


def _zeros3d(c, n):
    return jnp.zeros_like(c.s.dp[n])


def _zeroszlv(c, n):
    from .merdia import DEPTHSLEV
    return jnp.zeros((len(DEPTHSLEV),) + c.g.shape, c.s.pb.dtype)


FIELD_REGISTRY.update({
    'dfl': ('2d', _aux('dfl')),          # d(nsf)/dT [W m-2 K-1]
    'hmat': ('2d', _aux('hmat')),        # material enthalpy flux
    'idkedt': ('2d', _aux('idkedt')),    # NIW KE tendency (phys/niw)
    'brnpd': ('2d', _brnpd),
    'gls_psi': FIELD_REGISTRY['gls'],    # ACC_GLS_PSI naming alias
    'gls_psilvl': FIELD_REGISTRY['glslvl'],
    # the reference's scratch output slots (util1-4 passthroughs)
    'utilh2d': ('2d', _zeros2d),
    'utillyr': ('3d', _zeros3d),
    'utillvl': ('zlv', _zeroszlv),
})

# ------------------------------------------------------------------ #
# MSC_* derived diagnostics (diamer global/meridional ids,
# mod_dia.F90:233-238, 4150-4340): computed at OUTPUT time from the
# group's accumulated means.  Each entry lists the accumulated base
# ids it consumes; init_group auto-accumulates missing deps.
# ------------------------------------------------------------------ #

_CP_SW = 3990.        # seawater heat capacity used by the heat ids
_GRAV = 9.806


def _msc_osf_layer(dep):
    def fn(means, grid, wlat):
        from .merdia import overturning_streamfunction
        return overturning_streamfunction(means[dep], wlat,
                                          scale=1. / _GRAV)
    return fn


def _msc_osf_depth(dep):
    def fn(means, grid, wlat):
        t = jnp.einsum('lji,dji->ld', wlat, means[dep]) / _GRAV
        zero = jnp.zeros_like(t[:, :1])
        return jnp.concatenate([zero, jnp.cumsum(t, axis=1)], axis=1)
    return fn


def _msc_mer(dep, scale):
    def fn(means, grid, wlat):
        from .merdia import meridional_transport
        return meridional_transport(means[dep], wlat, scale=scale)
    return fn


def _msc_mer_sum(deps, scale):
    def fn(means, grid, wlat):
        from .merdia import meridional_transport
        out = meridional_transport(means[deps[0]], wlat, scale=scale)
        for d in deps[1:]:
            out = out + meridional_transport(means[d], wlat,
                                             scale=scale)
        return out
    return fn


def _msc_massgs(means, grid, wlat):
    w = grid.scp2 * grid.ip
    return jnp.sum(jnp.sum(means['dp'], axis=0) * w) / _GRAV


def _msc_volgs(means, grid, wlat):
    from ..core.constants import alpha0
    return _msc_massgs(means, grid, wlat) * alpha0


def _msc_colga(dep):
    def fn(means, grid, wlat):
        w = grid.scp2 * grid.ip
        num = jnp.sum(jnp.sum(means[dep] * means['dp'], axis=0) * w)
        den = jnp.maximum(jnp.sum(jnp.sum(means['dp'], axis=0) * w),
                          1e-30)
        return num / den
    return fn


def _msc_srfga(dep):
    def fn(means, grid, wlat):
        w = grid.scp2 * grid.ip
        return jnp.sum(means[dep] * w) / jnp.maximum(jnp.sum(w), 1e-30)
    return fn


#: name -> (deps, dims tag, derive(means, grid, wlat))
MSC_REGISTRY: Dict[str, tuple] = {
    # overturning streamfunctions: layer space and depth space, for
    # the resolved, eddy-induced (TD) and submesoscale transports
    'mmflxl': (('vflx',), 'latsig1', _msc_osf_layer('vflx')),
    'mmftdl': (('vmfltd',), 'latsig1', _msc_osf_layer('vmfltd')),
    'mmfsml': (('vmflsm',), 'latsig1', _msc_osf_layer('vmflsm')),
    'mmflxd': (('vflxlvl',), 'latdep1', _msc_osf_depth('vflxlvl')),
    'mmftdd': (('vmfltdlvl',), 'latdep1', _msc_osf_depth('vmfltdlvl')),
    'mmfsmd': (('vmflsmlvl',), 'latdep1', _msc_osf_depth('vmflsmlvl')),
    # vertically integrated meridional heat/salt transports per
    # component (resolved / TD / submeso / lateral-diffusive)
    'mhflx': (('vtflx',), 'lat', _msc_mer('vtflx', _CP_SW / _GRAV)),
    'mhftd': (('vtfltd',), 'lat', _msc_mer('vtfltd', _CP_SW / _GRAV)),
    'mhfsm': (('vtflsm',), 'lat', _msc_mer('vtflsm', _CP_SW / _GRAV)),
    'mhfld': (('vtflld',), 'lat', _msc_mer('vtflld', _CP_SW / _GRAV)),
    'msflx': (('vsflx',), 'lat', _msc_mer('vsflx', 1e-3 / _GRAV)),
    'msftd': (('vsfltd',), 'lat', _msc_mer('vsfltd', 1e-3 / _GRAV)),
    'msfsm': (('vsflsm',), 'lat', _msc_mer('vsflsm', 1e-3 / _GRAV)),
    'msfld': (('vsflld',), 'lat', _msc_mer('vsflld', 1e-3 / _GRAV)),
    # total transports across latitude circles (the reference's
    # zigzag-section masstr/heattr/salttr)
    'masstr': (('vflx',), 'lat', _msc_mer('vflx', 1. / _GRAV)),
    'heattr': (('vtflx', 'vtfltd', 'vtflsm', 'vtflld'), 'lat',
               _msc_mer_sum(('vtflx', 'vtfltd', 'vtflsm', 'vtflld'),
                            _CP_SW / _GRAV)),
    'salttr': (('vsflx', 'vsfltd', 'vsflsm', 'vsflld'), 'lat',
               _msc_mer_sum(('vsflx', 'vsfltd', 'vsflsm', 'vsflld'),
                            1e-3 / _GRAV)),
    # global sums / averages
    'massgs': (('dp',), 'scalar', _msc_massgs),
    'volgs': (('dp',), 'scalar', _msc_volgs),
    'tempga': (('temp', 'dp'), 'scalar', _msc_colga('temp')),
    'salnga': (('saln', 'dp'), 'scalar', _msc_colga('saln')),
    'sstga': (('sst',), 'scalar', _msc_srfga('sst')),
    'sssga': (('sss',), 'scalar', _msc_srfga('sss')),
}


#: per-field accumulation operators (the ave/min/max/sq encoding of
#: mod_dia.F90's ACC_* tables; 'msc' marks an output-time derived id)
VALID_OPS = ('ave', 'min', 'max', 'sq', 'msc')


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DiaGroup:
    """One accumulation group (a GLB_FNAMETAG entry, mod_dia.F90:278-282)."""
    nacc: jax.Array                      # scalar accumulation count
    acc: dict                            # name -> running sum
    # static metadata
    fields: tuple = dataclasses.field(metadata=dict(static=True))



def _acc_key(name: str, op: str) -> str:
    """Accumulator/output key: the reference's derived-id naming for
    non-average ops (MLDL82MN/MX/SQ etc.), so one group can request
    several ops of the same field."""
    return name + {'min': 'mn', 'max': 'mx', 'sq': 'sq'}.get(op, '') \
        if op in ('min', 'max', 'sq') else name


def _norm_fields(fields):
    """Accept 'name' or ('name', op) entries; default op 'ave'."""
    out = []
    for f in fields:
        if isinstance(f, str):
            out.append((f, 'ave'))
        else:
            name, op = f
            assert op in VALID_OPS, op
            out.append((name, op))
    return tuple(out)


def init_group(grid: Grid, state: State, fields, dtype=jnp.float64,
               forcing=None, dfl=None, si=None, swabs=None, tridx=None,
               cesm=None):
    fields = _norm_fields(fields)
    # MSC ids are derived at output time from accumulated base fields;
    # auto-accumulate any base id the requested MSC entries need
    have = {n for n, op in fields if op != 'msc'}
    extra = []
    for name, op in fields:
        if op != 'msc':
            continue
        for dep in MSC_REGISTRY[name][0]:
            if dep not in have:
                have.add(dep)
                extra.append((dep, 'ave'))
    fields = fields + tuple(extra)
    c = DiaCtx(grid, state, forcing, dfl, si, swabs, tridx, cesm)
    acc = {}
    for name, op in fields:
        if op == 'msc':
            continue
        dims, fn = FIELD_REGISTRY[name]
        proto = fn(c, 0)
        key = _acc_key(name, op)
        if op == 'min':
            acc[key] = jnp.full_like(proto, jnp.inf)
        elif op == 'max':
            acc[key] = jnp.full_like(proto, -jnp.inf)
        else:
            acc[key] = jnp.zeros_like(proto)
    return DiaGroup(nacc=jnp.zeros((), dtype), acc=acc, fields=fields)


def accumulate(grid: Grid, group: DiaGroup, s: State, n: int,
               forcing=None, dfl=None, si=None, swabs=None,
               tridx=None, cesm=None) -> DiaGroup:
    """Add the current state to the running accumulators (diaacc,
    mod_dia.F90:1097-2200; op semantics of the ACC_* encoding)."""
    c = DiaCtx(grid, s, forcing, dfl, si, swabs, tridx, cesm)
    acc = dict(group.acc)
    for name, op in group.fields:
        if op == 'msc':
            continue
        dims, fn = FIELD_REGISTRY[name]
        v = fn(c, n)
        key = _acc_key(name, op)
        if op == 'ave':
            acc[key] = acc[key] + v
        elif op == 'sq':
            acc[key] = acc[key] + v * v
        elif op == 'min':
            acc[key] = jnp.minimum(acc[key], v)
        else:
            acc[key] = jnp.maximum(acc[key], v)
    return DiaGroup(nacc=group.nacc + 1., acc=acc, fields=group.fields)


def reset(group: DiaGroup) -> DiaGroup:
    acc = {}
    for name, op in group.fields:
        if op == 'msc':
            continue
        v = group.acc[_acc_key(name, op)]
        key = _acc_key(name, op)
        if op == 'min':
            acc[key] = jnp.full_like(v, jnp.inf)
        elif op == 'max':
            acc[key] = jnp.full_like(v, -jnp.inf)
        else:
            acc[key] = jnp.zeros_like(v)
    return DiaGroup(nacc=jnp.zeros_like(group.nacc), acc=acc,
                    fields=group.fields)


# ------------------------------------------------------------------ #
# multi-group configuration + alarms (GLB_* arrays + diaout_alarms,
# mod_dia.F90:278-282, 2200-2311)
# ------------------------------------------------------------------ #

@dataclasses.dataclass
class DiaGroupCfg:
    """Static config of one output group (one slot of the GLB_* arrays,
    mod_dia.F90:278-282)."""
    fnametag: str = 'hd'
    aveperio: int = 1      # >0: days per average; <0: -N averages/day
    filefreq: int = 30     # days of averages per file
    compflag: int = 0      # 1 = wet-point compressed output
    ncformat: int = 0      # 0 = classic NetCDF3
    sharded_output: bool = False   # True = per-device shard files
    #                    (write_netcdf_sharded, the PnetCDF analogue);
    #                    False = one host-gathered global file even for
    #                    sharded runs (mod_nctools.F90:93-218 single-
    #                    file collective path)
    fields: tuple = ()     # ('name' | (name, op), ...)

    def steps_per_output(self, nstep_in_day: int) -> int:
        if self.aveperio < 0:
            return max(1, nstep_in_day // (-self.aveperio))
        return max(1, self.aveperio * nstep_in_day)

    # GLB_AVEPERIO calendar codes (mod_rdlim.F90:1197-1203):
    # 30 -> calendar month, 360..366 -> calendar year
    @property
    def monthly(self) -> bool:
        return self.aveperio == 30

    @property
    def annual(self) -> bool:
        return 360 <= self.aveperio <= 366

    def alarm(self, clock, done_steps: int, nstep_in_day: int) -> bool:
        """diaout_alarms (mod_dia.F90:2290-2305): calendar-gated for
        monthly/annual groups — fire at a day boundary when the
        (already stepped) date has entered day 1 of a month / of the
        year — fixed step period otherwise."""
        at_day = done_steps % nstep_in_day == 0
        if self.annual:
            d = clock.date
            return at_day and d.month == 1 and d.day == 1
        if self.monthly:
            return at_day and clock.date.day == 1
        return done_steps % self.steps_per_output(nstep_in_day) == 0


_SUFFIX_OPS = {'mn': 'min', 'mx': 'max', 'sq': 'sq'}


def _nml_key_to_field(key: str) -> Optional[Tuple[str, str]]:
    """Map a DIAPHY namelist id (H2D_SST, LYR_TEMP, LVL_SALN,
    MSC_SSTGA, H2D_MLDL82MN, ...) to a (registry name, op) pair.
    Returns None for ids with no implemented counterpart."""
    key = key.lower()
    for pre in ('h2d_', 'lyr_', 'lvl_', 'msc_', 'acc_'):
        if key.startswith(pre):
            kind, name = pre[:-1], key[len(pre):]
            break
    else:
        return None
    op = 'ave'
    if name == 'maxbld':
        # ACC_MAXBLD accumulates the maximum by definition (mod_dia.F90)
        return ('maxbld', 'max')
    if kind == 'h2d' and name[-2:] in _SUFFIX_OPS \
            and name[:-2] in FIELD_REGISTRY:
        op = _SUFFIX_OPS[name[-2:]]
        name = name[:-2]
    if kind == 'lvl':
        name = name + 'lvl'
    if kind == 'msc':
        return (name, 'msc') if name in MSC_REGISTRY else None
    if name not in FIELD_REGISTRY:
        return None
    return name, op


def load_diaphy(groups: dict) -> list:
    """Build per-group configs from a parsed &DIAPHY namelist group
    (values are scalars or per-group lists, the GLB_* slot convention).

    Unimplemented field ids are ignored (and can be listed via
    `unsupported_diaphy_keys`)."""
    if 'DIAPHY' not in groups:
        return []
    g = {k.lower(): v for k, v in groups['DIAPHY'].items()}

    def aslist(x):
        return list(x) if isinstance(x, (list, tuple)) else [x]

    tags = aslist(g.get('glb_fnametag', ['hd']))
    nphy = len(tags)

    def per_group(key, default):
        v = aslist(g.get(key, [default] * nphy))
        return (v + [default] * nphy)[:nphy]

    ave = per_group('glb_aveperio', 1)
    ffq = per_group('glb_filefreq', 30)
    cmp_ = per_group('glb_compflag', 0)
    ncf = per_group('glb_ncformat', 0)

    fields = [[] for _ in range(nphy)]
    for key, val in g.items():
        if key.startswith('glb_'):
            continue
        mapped = _nml_key_to_field(key)
        if mapped is None:
            continue
        name, op = mapped
        for i, flag in enumerate(aslist(val)[:nphy]):
            if int(flag) != 0:
                fields[i].append((name, op))

    return [DiaGroupCfg(fnametag=str(tags[i]), aveperio=int(ave[i]),
                        filefreq=int(ffq[i]), compflag=int(cmp_[i]),
                        ncformat=int(ncf[i]), fields=tuple(fields[i]))
            for i in range(nphy)]


def unsupported_diaphy_keys(groups: dict) -> list:
    """DIAPHY ids requested by the deck that have no registry
    counterpart yet (for run-time warnings)."""
    if 'DIAPHY' not in groups:
        return []
    out = []
    for key in groups['DIAPHY']:
        kl = key.lower()
        if kl.startswith('glb_'):
            continue
        if _nml_key_to_field(kl) is None:
            out.append(key)
    return out


def diafnm(runid: str, fnametag: str, time_days: float) -> str:
    """Diagnostic file name (diafnm, mod_dia.F90:352-446 simplified)."""
    return f'{runid}_{fnametag}_{time_days:010.3f}.nc'


def write_netcdf(path: str, grid: Grid, group: DiaGroup, time_days: float,
                 fill_land=True, ncformat: int = 0):
    """Write the accumulated means to a single NetCDF file (diaout,
    mod_dia.F90:2311-3300 / mod_nctools ncwrtr): host-gathered, so
    mesh-sharded runs get one global file without the per-shard
    reassembler.  ncformat 0 = NetCDF3 classic, 1 = 64-bit-offset
    (the reference's GLB_NCFORMAT CDF/CDF2 options,
    mod_nctools.F90:93-218; the netCDF4 option maps to 64-bit offset
    here)."""
    from scipy.io import netcdf_file

    nacc = float(np.asarray(group.nacc))
    q = 1.0 / max(nacc, 1.0)
    jdm, idm = grid.shape
    ipm = np.asarray(grid.ip) > 0

    from .merdia import DEPTHSLEV

    with netcdf_file(path, 'w',
                     version=2 if ncformat else 1) as f:
        f.createDimension('time', None)
        f.createDimension('y', jdm)
        f.createDimension('x', idm)
        f.createDimension('sigma', grid.kk)
        f.createDimension('depth', len(DEPTHSLEV))

        tvar = f.createVariable('time', 'd', ('time',))
        tvar[0] = time_days
        tvar.units = 'days since 0001-01-01'

        dvar = f.createVariable('depth', 'd', ('depth',))
        dvar[:] = DEPTHSLEV
        dvar.units = 'm'

        lat = f.createVariable('plat', 'd', ('y', 'x'))
        lat[:] = np.asarray(grid.plat)
        lon = f.createVariable('plon', 'd', ('y', 'x'))
        lon[:] = np.asarray(grid.plon)

        ntr_made = False
        for name, op in _norm_fields(group.fields):
            if op == 'msc':
                continue
            dims, _ = FIELD_REGISTRY[name]
            name = _acc_key(name, op)
            mean = np.asarray(group.acc[name])
            if op in ('ave', 'sq'):
                mean = mean * q
            if dims == 'scalar':
                v = f.createVariable(name, 'd', ('time',))
                v[0] = mean
                continue
            if dims == '2d':
                shape = ('time', 'y', 'x')
                mask = ipm
            elif dims == 'zlv':
                shape = ('time', 'depth', 'y', 'x')
                mask = ipm[None]
            elif dims == 'tr3d':
                if not ntr_made:
                    f.createDimension('ntr', mean.shape[0])
                    ntr_made = True
                shape = ('time', 'ntr', 'sigma', 'y', 'x')
                mask = ipm[None, None]
            elif dims == 'trzlv':
                if mean.shape[0] == 0:
                    continue
                if not ntr_made:
                    f.createDimension('ntr', mean.shape[0])
                    ntr_made = True
                shape = ('time', 'ntr', 'depth', 'y', 'x')
                mask = ipm[None, None]
            else:
                shape = ('time', 'sigma', 'y', 'x')
                mask = ipm[None]
            v = f.createVariable(name, 'f', shape)
            out = mean.astype('f4')
            if fill_land:
                out = np.where(mask, out, np.float32(-1e33))
            v[0] = out
            v._FillValue = np.float32(-1e33)

        # ---- MSC_* derived diagnostics (diamer,
        # mod_dia.F90:4150-4340): overturning streamfunctions,
        # meridional transports and global means, computed from the
        # accumulated means at output time over 1-degree latitude
        # bins.  Requested via MSC_* ids; a legacy default emits the
        # mmflxl/mhflx/msflx trio whenever vflx was accumulated.
        names = {n for n, _ in _norm_fields(group.fields)}
        msc = [n for n, op in _norm_fields(group.fields) if op == 'msc']
        if not msc and 'vflx' in names:
            msc = [n for n in ('mmflxl', 'mhflx', 'msflx')
                   if all(d in names for d in MSC_REGISTRY[n][0])]
        if msc and grid.plat is not None:
            from .merdia import lat_bin_weights
            import jax.numpy as jnp
            lats = np.arange(-89.5, 90., 1.)
            wlat = lat_bin_weights(jnp.asarray(np.asarray(grid.plat)),
                                   jnp.asarray(lats))
            means = {n: jnp.asarray(np.asarray(group.acc[n]) * q)
                     for n in group.acc}
            dimmed = set()

            def need(dim, size):
                if dim not in dimmed:
                    f.createDimension(dim, size)
                    dimmed.add(dim)
                    if dim == 'lat':
                        lv = f.createVariable('lat', 'd', ('lat',))
                        lv[:] = lats
                        lv.units = 'degrees_north'

            from .merdia import DEPTHSLEV
            for n in msc:
                deps, tag, derive = MSC_REGISTRY[n]
                out = np.asarray(derive(means, grid, wlat))
                if tag == 'scalar':
                    v = f.createVariable(n, 'd', ('time',))
                    v[0] = out
                    continue
                need('lat', len(lats))
                if tag == 'latsig1':
                    need('sigma1', grid.kk + 1)
                    v = f.createVariable(n, 'f', ('time', 'lat',
                                                  'sigma1'))
                elif tag == 'latdep1':
                    need('depth1', len(DEPTHSLEV) + 1)
                    v = f.createVariable(n, 'f', ('time', 'lat',
                                                  'depth1'))
                else:
                    v = f.createVariable(n, 'f', ('time', 'lat'))
                v[0] = out.astype('f4')


def write_netcdf_compressed(path: str, grid: Grid, group: DiaGroup,
                            time_days: float):
    """Compressed (ocean-points-only) output: each field is packed
    into a 1-D 'pcomp' dimension holding only wet points, with the
    index map saved once (the NCFORMAT compressed path, mod_nctools
    ncdimc/ncpack/nccomp, mod_nctools.F90:140-2539)."""
    from scipy.io import netcdf_file

    nacc = float(np.asarray(group.nacc))
    q = 1.0 / max(nacc, 1.0)
    ipm = np.asarray(grid.ip) > 0
    idx = np.flatnonzero(ipm.ravel()).astype('i4')
    npts = idx.size

    from .merdia import DEPTHSLEV

    with netcdf_file(path, 'w') as f:
        f.createDimension('time', None)
        f.createDimension('pcomp', npts)
        f.createDimension('sigma', grid.kk)
        f.createDimension('depth', len(DEPTHSLEV))

        tvar = f.createVariable('time', 'd', ('time',))
        tvar[0] = time_days
        pvar = f.createVariable('pcomp', 'i', ('pcomp',))
        pvar[:] = idx
        pvar.compress = 'y x'

        for name, op in _norm_fields(group.fields):
            if op == 'msc':
                # derived meridional/global diagnostics are emitted by
                # the uncompressed writer only (they are not point
                # fields)
                continue
            dims, _ = FIELD_REGISTRY[name]
            name = _acc_key(name, op)
            mean = np.asarray(group.acc[name])
            if op in ('ave', 'sq'):
                mean = mean * q
            if dims == 'scalar':
                v = f.createVariable(name, 'd', ('time',))
                v[0] = mean
            elif dims == '2d':
                v = f.createVariable(name, 'f', ('time', 'pcomp'))
                v[0] = mean.ravel()[idx].astype('f4')
            elif dims == 'trzlv':
                if mean.shape[0] == 0:
                    continue
                flat = mean.reshape(mean.shape[0] * mean.shape[1],
                                    -1)[:, idx]
                if 'ntrdep' not in f.dimensions:
                    f.createDimension('ntrdep', flat.shape[0])
                v = f.createVariable(name, 'f', ('time', 'ntrdep',
                                                 'pcomp'))
                v[0] = flat.astype('f4')
            elif dims == 'tr3d':
                flat = mean.reshape(mean.shape[0] * mean.shape[1], -1)[:, idx]
                if 'ntrsig' not in f.dimensions:
                    f.createDimension('ntrsig', flat.shape[0])
                v = f.createVariable(name, 'f', ('time', 'ntrsig', 'pcomp'))
                v[0] = flat.astype('f4')
            else:
                zdim = 'depth' if dims == 'zlv' else 'sigma'
                v = f.createVariable(name, 'f', ('time', zdim, 'pcomp'))
                flat = mean.reshape(mean.shape[0], -1)[:, idx]
                v[0] = flat.astype('f4')


def write_netcdf_sharded(dirpath: str, grid: Grid, group: DiaGroup,
                         time_days: float):
    """Shard-parallel diagnostic output: one NetCDF3 file per device
    shard of the accumulators plus a JSON index, written WITHOUT
    gathering the global arrays to one host — the PnetCDF-parallel
    analogue of the reference's output path
    (mod_nctools.F90:93-218 #ifdef PNETCDF collective writes; here
    each host writes only the blocks it holds, multi-host safe because
    shard ownership is disjoint).  Use read_netcdf_sharded to
    reassemble."""
    import json as _json
    import os as _os
    from scipy.io import netcdf_file

    _os.makedirs(dirpath, exist_ok=True)
    nacc = float(np.asarray(group.nacc))
    q = 1.0 / max(nacc, 1.0)

    index = {'time_days': time_days, 'nacc': nacc, 'fields': {},
             'shards': []}
    shard_blocks = {}
    for name, op in group.fields:
        if op == 'msc':
            continue        # derived at reassembly/uncompressed output
        name = _acc_key(name, op)
        acc = group.acc[name]
        mean = acc * q if op in ('ave', 'sq') else acc
        index['fields'][name] = {'op': op,
                                 'shape': list(np.shape(mean))}
        shards = getattr(mean, 'addressable_shards', None)
        if not shards:
            shard_blocks.setdefault((0, (0, 0)), {})[name] = (
                np.asarray(mean), (0, 0))
            continue
        for sh in shards:
            # index shards by their (j, i) block origin
            idx = sh.index
            origin = tuple(sl.start or 0 for sl in idx[-2:])
            key = (sh.device.id, origin)
            shard_blocks.setdefault(key, {})[name] = (
                np.asarray(sh.data), origin)

    for si, ((dev, origin), fields) in enumerate(
            sorted(shard_blocks.items())):
        fname = f'shard_{si:04d}.nc'
        index['shards'].append({'file': fname, 'device': dev,
                                'origin': list(origin)})
        with netcdf_file(_os.path.join(dirpath, fname), 'w') as f:
            first = next(iter(fields.values()))[0]
            for name, (blk, orig) in fields.items():
                dims = []
                for ax, nsz in enumerate(blk.shape):
                    dn = f'{name}_d{ax}'
                    f.createDimension(dn, nsz)
                    dims.append(dn)
                v = f.createVariable(name, 'd', tuple(dims))
                v[:] = blk
                v.origin_j, v.origin_i = orig
    with open(_os.path.join(dirpath, 'index.json'), 'w') as f:
        _json.dump(index, f)


def read_netcdf_sharded(dirpath: str):
    """Reassemble a write_netcdf_sharded directory into
    {name: global numpy array}."""
    import json as _json
    import os as _os
    from scipy.io import netcdf_file

    with open(_os.path.join(dirpath, 'index.json')) as f:
        index = _json.load(f)
    out = {name: np.zeros(meta['shape'])
           for name, meta in index['fields'].items()}
    for sh in index['shards']:
        with netcdf_file(_os.path.join(dirpath, sh['file']), 'r',
                         mmap=False) as f:
            for name, var in f.variables.items():
                blk = var[:].copy()
                j0, i0 = int(var.origin_j), int(var.origin_i)
                sl = (Ellipsis,
                      slice(j0, j0 + blk.shape[-2]),
                      slice(i0, i0 + blk.shape[-1]))
                out[name][sl] = blk
    return out
