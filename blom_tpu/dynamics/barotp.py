"""Split-explicit barotropic solver.

TPU-native re-design of the reference barotropic integration
(reference: /root/reference/phy/mod_barotp.F90:148-1003 barotp).  The
forward-backward substep loop becomes `lax.scan`s: five weight blocks of
lstep/2 substeps each (mod_barotp.F90:328-358), advancing the barotropic
state one baroclinic leap-frog interval and then another half to predict
the transport sums of the next step.  The u/v solve order alternates per
substep (`lax.cond` on substep parity, matching mod_barotp.F90:381-384's
odd/even branches), and the two working time levels live on a leading
axis of size 2 whose ml/nl roles are locked to the substep parity.

Structure: `_prologue` computes the per-baroclinic-step fields
(velocity bounds, damping, barotropic PV) with global stencil ops;
`make_substep`/`run_blocks` is the substep machinery over an explicit
field bundle with injected shift functions, so the same core runs
(a) on global arrays (this module's `barotp`; GSPMD halos every
substep) and (b) on halo-widened local blocks under `shard_map` with
margin-k exchange every few substeps (barotp_shmap.py — the
reference's margin-2 every-2nd-substep trick, mod_barotp.F90:387-397,
generalized)."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.constants import onem, epsilp
from ..core.grid import Grid
from ..core.state import State
from .tmsmt import wbaro


class BarotpParams(NamedTuple):
    cwbdts: float = 0.0   # coastal wave-breaking damping 1/timescale [s-1]
    cwbdls: float = 25.0  # coastal wave-breaking damping length [m]
    mommth: str = 'enscon'


def _slot(a, idx):
    """a[idx] for traced idx in {0,1} on a (2, ...) array."""
    return jnp.where(idx == 0, a[0], a[1])


def _set_slot(a, idx, val):
    sel = (jnp.arange(2) == idx).reshape((2,) + (1,) * val.ndim)
    return jnp.where(sel, val[None], a)


def _prologue(grid: Grid, s: State, utotn, vtotn, m: int, n: int,
              par: BarotpParams):
    """Per-baroclinic-step precomputation (mod_barotp.F90:168-346):
    velocity bounds, coastal damping, barotropic PV, and the bundle of
    2-D fields the substep core consumes."""
    ip, iu, iv, iq = grid.ip, grid.iu, grid.iv, grid.iq
    im1, jm1 = grid.im1, grid.jm1

    # ---- velocity bounds and coastal damping (mod_barotp.F90:168-225)
    u_n_max = jnp.max(jnp.maximum(s.u[n], 0.), axis=0)
    u_n_min = jnp.min(jnp.minimum(s.u[n], 0.), axis=0)
    v_n_max = jnp.max(jnp.maximum(s.v[n], 0.), axis=0)
    v_n_min = jnp.min(jnp.minimum(s.v[n], 0.), axis=0)
    umaxb = (grid.umax - u_n_max) * s.pbu[m] * grid.scuy * iu
    uminb = (grid.umax + u_n_min) * s.pbu[m] * grid.scuy * iu
    vmaxb = (grid.vmax - v_n_max) * s.pbv[m] * grid.scvx * iv
    vminb = (grid.vmax + v_n_min) * s.pbv[m] * grid.scvx * iv
    uglue = par.cwbdts * jnp.exp(1. - s.pbu[m] / (par.cwbdls * onem)) * iu
    vglue = par.cwbdts * jnp.exp(1. - s.pbv[m] / (par.cwbdls * onem)) * iv

    # ---- potential vorticity of barotropic flow (mod_barotp.F90:227-286)
    pbp = jnp.maximum(s.pb_p, epsilp)
    pv_from_u = grid.corioq * 2. / (pbp + im1(pbp))       # at q over u(i,j)
    pv_from_v = grid.corioq * 2. / (pbp + jm1(pbp))       # at q over v(i,j)
    pv_int = grid.corioq * 4. / (pbp + im1(pbp) + jm1(pbp) + im1(jm1(pbp)))
    # priority (lowest->highest): u(i,j-1), u(i,j), v(i-1,j), v(i,j), interior
    pvt = jnp.zeros_like(pbp)
    pvt = jnp.where(jm1(iu) > 0,
                    grid.corioq * 2. / (jm1(pbp) + im1(jm1(pbp))), pvt)
    pvt = jnp.where(iu > 0, pv_from_u, pvt)
    pvt = jnp.where(im1(iv) > 0,
                    grid.corioq * 2. / (im1(pbp) + im1(jm1(pbp))), pvt)
    pvt = jnp.where(iv > 0, pv_from_v, pvt)
    pvt = jnp.where(iq > 0, pv_int, pvt)

    fld = {
        'ip': ip, 'iu': iu, 'iv': iv,
        'scuy': grid.scuy, 'scvx': grid.scvx, 'scp2i': grid.scp2i,
        'scuxi': grid.scuxi, 'scvyi': grid.scvyi,
        'scvxi': grid.scvxi, 'scuyi': grid.scuyi,
        'pvtrop_o': s.pvtrop[n], 'pvtrop_m': s.pvtrop[m],
        'pvtrop_n': pvt,
        'pgfxm_o': s.pgfxm_o, 'pgfym_o': s.pgfym_o,
        'xixp_o': s.xixp_o, 'xixm_o': s.xixm_o,
        'xiyp_o': s.xiyp_o, 'xiym_o': s.xiym_o,
        'pgfxm_m': s.pgfxm[m], 'pgfxm_n': s.pgfxm[n],
        'pgfym_m': s.pgfym[m], 'pgfym_n': s.pgfym[n],
        'xixp_m': s.xixp[m], 'xixp_n': s.xixp[n],
        'xixm_m': s.xixm[m], 'xixm_n': s.xixm[n],
        'xiyp_m': s.xiyp[m], 'xiyp_n': s.xiyp[n],
        'xiym_m': s.xiym[m], 'xiym_n': s.xiym[n],
        'utotn': utotn, 'vtotn': vtotn,
        'uglue': uglue, 'vglue': vglue,
        'umaxb': umaxb, 'uminb': uminb,
        'vmaxb': vmaxb, 'vminb': vminb,
        'pb_t': s.pb_mn, 'ubflx_t': s.ubflx_mn, 'vbflx_t': s.vbflx_mn,
    }
    return fld


class Shifts(NamedTuple):
    im1: object
    ip1: object
    jm1: object
    jp1v: object    # j+1 read of a v-grid vector (fold-aware globally)
    jp1q: object    # j+1 read of a q-grid scalar


def global_shifts(grid: Grid) -> Shifts:
    return Shifts(im1=grid.im1, ip1=grid.ip1, jm1=grid.jm1,
                  jp1v=lambda a: grid.jp1(a, 'v', True),
                  jp1q=lambda a: grid.jp1(a, 'q'))


def local_shifts() -> Shifts:
    """Shifts on a halo-widened local block: zero-filled slice+pad
    shifts (the ghost rings absorb the edge garbage; validity
    bookkeeping lives in the caller's margin schedule).  Slice+pad, not
    roll: sublane-axis rolls are pathological for the TPU backend."""
    from ..ops import stencil

    def sh(off, axis):
        return lambda a: stencil._shift(a, axis, off, False)
    return Shifts(im1=sh(-1, -1), ip1=sh(1, -1), jm1=sh(-1, -2),
                  jp1v=sh(1, -2), jp1q=sh(1, -2))


def substep_weights(lstep: int):
    """Per-substep PGF time-interpolation weight schedule
    (mod_barotp.F90:328-358): block nb=1 ramps the old level out, blocks
    2-3 ramp the new level in (coefficients set at block 2 persist into
    block 3, with lll0 = 1 + lstep/2 at block 2), blocks 4-5 use the new
    level only.  Returns weights(nb, lll) -> (wo, wm, wn)."""
    half = lstep // 2

    def weights(nb, lll):
        if nb == 1:
            woa, wob = -1. / lstep, .5 + .5 / lstep
            wna, wnb = 0., 0.
        elif nb in (2, 3):
            woa, wob = 0., 0.
            wna, wnb = 1. / lstep, -(1 + half - .5) / lstep
        else:
            woa, wob = 0., 0.
            wna, wnb = 0., 1.
        wo = woa * lll + wob
        wn = wna * lll + wnb
        wm = 1. - wo - wn
        return wo, wm, wn

    return weights


def make_substep(fld, sh: Shifts, lstep: int, dlt, par: BarotpParams):
    """Build the per-substep update closure over a field bundle
    (mod_barotp.F90:360-838)."""
    im1, ip1, jm1 = sh.im1, sh.ip1, sh.jm1
    jp1v, jp1q = sh.jp1v, sh.jp1q
    weights = substep_weights(lstep)

    def pgf_terms_u(wo, wm, wn, pb_nl):
        pbw = im1(pb_nl)
        return (wo * (fld['pgfxm_o']
                      - (fld['xixp_o'] * pb_nl - fld['xixm_o'] * pbw))
                + wm * (fld['pgfxm_m']
                        - (fld['xixp_m'] * pb_nl - fld['xixm_m'] * pbw))
                + wn * (fld['pgfxm_n']
                        - (fld['xixp_n'] * pb_nl - fld['xixm_n'] * pbw))) \
            * fld['scuxi']

    def pgf_terms_v(wo, wm, wn, pb_nl):
        pbs = jm1(pb_nl)
        return (wo * (fld['pgfym_o']
                      - (fld['xiyp_o'] * pb_nl - fld['xiym_o'] * pbs))
                + wm * (fld['pgfym_m']
                        - (fld['xiyp_m'] * pb_nl - fld['xiym_m'] * pbs))
                + wn * (fld['pgfym_n']
                        - (fld['xiyp_n'] * pb_nl - fld['xiym_n'] * pbs))) \
            * fld['scvyi']

    def coriolis_u(vb_src, pvt_w):
        """q term of the u momentum equation (mod_barotp.F90:428-435
        enscon / :471-480 enecon)."""
        vsx = vb_src * fld['scvxi']
        if par.mommth == 'enscon':
            return (vsx + jp1v(vsx) + im1(vsx) + im1(jp1v(vsx))) \
                * (pvt_w + jp1q(pvt_w)) * .125
        return .25 * ((vsx + im1(vsx)) * pvt_w
                      + (jp1v(vsx) + im1(jp1v(vsx))) * jp1q(pvt_w))

    def coriolis_v(ub_src, pvt_w):
        usy = ub_src * fld['scuyi']
        if par.mommth == 'enscon':
            return -(usy + ip1(usy) + jm1(usy) + ip1(jm1(usy))) \
                * (pvt_w + ip1(pvt_w)) * .125
        return -.25 * ((usy + jm1(usy)) * pvt_w
                       + (ip1(usy) + ip1(jm1(usy))) * ip1(pvt_w))

    def continuity(pb_ml, pb_nl, ubf_ml, vbf_ml):
        return ((1. - wbaro) * pb_ml + wbaro * pb_nl
                - (1. + wbaro) * dlt
                * (ip1(ubf_ml) - ubf_ml + jp1v(vbf_ml) - vbf_ml)
                * fld['scp2i']) * fld['ip']

    def u_update(ubf_ml, ubf_nl, pb_nl, utndcy):
        new = ((1. - wbaro) * ubf_ml + wbaro * ubf_nl
               + (1. + wbaro) * dlt
               * ((utndcy + fld['utotn']) * fld['scuy']
                  * jnp.minimum(im1(pb_nl), pb_nl)
                  - fld['uglue'] * ubf_ml))
        return jnp.clip(new, -fld['uminb'], fld['umaxb']) * fld['iu']

    def v_update(vbf_ml, vbf_nl, pb_nl, vtndcy):
        new = ((1. - wbaro) * vbf_ml + wbaro * vbf_nl
               + (1. + wbaro) * dlt
               * ((vtndcy + fld['vtotn']) * fld['scvx']
                  * jnp.minimum(jm1(pb_nl), pb_nl)
                  - fld['vglue'] * vbf_ml))
        return jnp.clip(new, -fld['vminb'], fld['vmaxb']) * fld['iv']

    def substep(nb, carry, lll):
        pb_t, ubflx_t, vbflx_t, us_t, vs_t, uc_t, vc_t = carry
        odd = (lll % 2) == 1
        ml = jnp.where(odd, 0, 1)
        nl = 1 - ml
        wo, wm, wn = weights(nb, lll)
        pvt_w = (wo * fld['pvtrop_o'] + wm * fld['pvtrop_m']
                 + wn * fld['pvtrop_n'])

        pb_ml = _slot(pb_t, ml)
        pb_nl = _slot(pb_t, nl)
        ubf_ml = _slot(ubflx_t, ml)
        ubf_nl = _slot(ubflx_t, nl)
        vbf_ml = _slot(vbflx_t, ml)
        vbf_nl = _slot(vbflx_t, nl)

        pb_new = continuity(pb_ml, pb_nl, ubf_ml, vbf_ml)

        def odd_branch(_):
            # u first with v(ml); then v with the new u
            # (mod_barotp.F90:399-615)
            us = us_t - wbaro * ubf_nl + (1. + wbaro) * ubf_ml
            qu = coriolis_u(vbf_ml, pvt_w)
            uc = uc_t + qu
            utndcy = qu + pgf_terms_u(wo, wm, wn, pb_new)
            ubf_new = u_update(ubf_ml, ubf_nl, pb_new, utndcy)

            vs = vs_t - wbaro * vbf_nl + (1. + wbaro) * vbf_ml
            qv = coriolis_v(ubf_new, pvt_w)
            vc = vc_t + qv
            vtndcy = qv + pgf_terms_v(wo, wm, wn, pb_new)
            vbf_new = v_update(vbf_ml, vbf_nl, pb_new, vtndcy)
            return ubf_new, vbf_new, us, vs, uc, vc

        def even_branch(_):
            # v first with u(ml); then u with the new v
            # (mod_barotp.F90:617-838)
            vs = vs_t - wbaro * vbf_nl + (1. + wbaro) * vbf_ml
            qv = coriolis_v(ubf_ml, pvt_w)
            vc = vc_t + qv
            vtndcy = qv + pgf_terms_v(wo, wm, wn, pb_new)
            vbf_new = v_update(vbf_ml, vbf_nl, pb_new, vtndcy)

            us = us_t - wbaro * ubf_nl + (1. + wbaro) * ubf_ml
            qu = coriolis_u(vbf_new, pvt_w)
            uc = uc_t + qu
            utndcy = qu + pgf_terms_u(wo, wm, wn, pb_new)
            ubf_new = u_update(ubf_ml, ubf_nl, pb_new, utndcy)
            return ubf_new, vbf_new, us, vs, uc, vc

        ubf_new, vbf_new, us, vs, uc, vc = lax.cond(
            odd, odd_branch, even_branch, None)

        pb_t = _set_slot(pb_t, nl, pb_new)
        ubflx_t = _set_slot(ubflx_t, nl, ubf_new)
        vbflx_t = _set_slot(vbflx_t, nl, vbf_new)
        return (pb_t, ubflx_t, vbflx_t, us, vs, uc, vc)

    return substep


def block_scan(substep, nb, half, carry):
    """Run one weight block of `half` substeps via lax.scan."""
    lll0 = 1 + (nb - 1) * half
    llls = lll0 + jnp.arange(half)

    def body(c, lll):
        return substep(nb, c, lll), None

    carry, _ = lax.scan(body, carry, llls)
    return carry


def run_blocks(fld, sh: Shifts, s_ubflxs, s_vbflxs, s_ubflxs_p,
               s_vbflxs_p, m: int, n: int, lstep: int, dlt,
               par: BarotpParams, im1, jm1, iu, iv, ip,
               block_runner=None):
    """The five weight blocks (mod_barotp.F90:328-986).

    `block_runner(nb, substep, half, carry) -> carry`, when given,
    replaces the default lax.scan — the shard_map driver substitutes a
    margin-k halo-amortized loop."""
    substep = make_substep(fld, sh, lstep, dlt, par)
    half = lstep // 2
    runner = block_runner or (lambda nb, sub, h, c: block_scan(sub, nb, h, c))

    pb_t = fld['pb_t']
    ubflx_t = fld['ubflx_t']
    vbflx_t = fld['vbflx_t']

    z = jnp.zeros_like(pb_t[0])
    ubflxs = s_ubflxs
    vbflxs = s_vbflxs
    ubflxs_p = s_ubflxs_p
    vbflxs_p = s_vbflxs_p
    ubcors_p = z
    vbcors_p = z
    out = {}

    for nb in (1, 2, 3, 4, 5):
        carry = (pb_t, ubflx_t, vbflx_t, z, z, z, z)
        carry = runner(nb, substep, half, carry)
        pb_t, ubflx_t, vbflx_t, us_t, vs_t, uc_t, vc_t = carry
        ml_end = (nb * half) % 2   # slot holding 'ml' after the block

        if nb == 1:
            # state at baroclinic mid level m (mod_barotp.F90:848-879)
            out['pb_m'] = pb_t[ml_end] * ip
            pbu_m = jnp.minimum(pb_t[ml_end], im1(pb_t[ml_end])) * iu
            pbv_m = jnp.minimum(pb_t[ml_end], jm1(pb_t[ml_end])) * iv
            out['pbu_m'] = pbu_m
            out['pbv_m'] = pbv_m
            out['ubflx_m'] = ubflx_t[ml_end] * iu
            out['vbflx_m'] = vbflx_t[ml_end] * iv
            out['ub_m'] = ubflx_t[ml_end] \
                / jnp.maximum(pbu_m * fld['scuy'], epsilp) * iu
            out['vb_m'] = vbflx_t[ml_end] \
                / jnp.maximum(pbv_m * fld['scvx'], epsilp) * iv
            ubflxs = ubflxs.at[n].add(us_t)
            ubflxs = ubflxs.at[m].set(ubflxs[2] + us_t)
            vbflxs = vbflxs.at[n].add(vs_t)
            vbflxs = vbflxs.at[m].set(vbflxs[2] + vs_t)
        elif nb == 2:
            # checkpoint for next step's restart of the barotropic loop
            # (mod_barotp.F90:880-912)
            out['pb_mn'] = pb_t * ip
            out['ubflx_mn'] = ubflx_t * iu
            out['vbflx_mn'] = vbflx_t * iv
            ubflxs = ubflxs.at[m].add(us_t).at[2].set(us_t)
            vbflxs = vbflxs.at[m].add(vs_t).at[2].set(vs_t)
            ubflxs_p = ubflxs_p.at[n].set(us_t)
            vbflxs_p = vbflxs_p.at[n].set(vs_t)
            ubcors_p = uc_t
            vbcors_p = vc_t
        elif nb == 3:
            # state at new baroclinic level n (mod_barotp.F90:913-945)
            out['pb_n'] = pb_t[ml_end] * ip
            pbu_n = jnp.minimum(pb_t[ml_end], im1(pb_t[ml_end])) * iu
            pbv_n = jnp.minimum(pb_t[ml_end], jm1(pb_t[ml_end])) * iv
            out['pbu_n'] = pbu_n
            out['pbv_n'] = pbv_n
            out['ubflx_n'] = ubflx_t[ml_end] * iu
            out['vbflx_n'] = vbflx_t[ml_end] * iv
            out['ub_n'] = ubflx_t[ml_end] \
                / jnp.maximum(pbu_n * fld['scuy'], epsilp) * iu
            out['vb_n'] = vbflx_t[ml_end] \
                / jnp.maximum(pbv_n * fld['scvx'], epsilp) * iv
            ubflxs_p = ubflxs_p.at[m].set(ubflxs[m] + us_t)
            ubflxs_p = ubflxs_p.at[n].add(us_t)
            vbflxs_p = vbflxs_p.at[m].set(vbflxs[m] + vs_t)
            vbflxs_p = vbflxs_p.at[n].add(vs_t)
            ubcors_p = ubcors_p + uc_t
            vbcors_p = vbcors_p + vc_t
        elif nb == 4:
            # (mod_barotp.F90:946-962)
            ubflxs_p = ubflxs_p.at[n].add(us_t)
            vbflxs_p = vbflxs_p.at[n].add(vs_t)
            ubcors_p = ubcors_p + uc_t
            vbcors_p = vbcors_p + vc_t
        else:
            # predicted bottom pressure for next step (mod_barotp.F90:963-986)
            out['pb_p'] = pb_t[ml_end] * ip
            out['pbu_p'] = jnp.minimum(pb_t[ml_end], im1(pb_t[ml_end])) * iu
            out['pbv_p'] = jnp.minimum(pb_t[ml_end], jm1(pb_t[ml_end])) * iv
            ubflxs_p = ubflxs_p.at[n].add(us_t)
            vbflxs_p = vbflxs_p.at[n].add(vs_t)
            ubcors_p = ubcors_p + uc_t
            vbcors_p = vbcors_p + vc_t

    sums = {'ubflxs': ubflxs, 'vbflxs': vbflxs,
            'ubflxs_p': ubflxs_p, 'vbflxs_p': vbflxs_p,
            'ubcors_p': ubcors_p, 'vbcors_p': vbcors_p}
    return out, sums


def finalize(grid: Grid, s: State, m: int, n: int, out: dict,
             sums: dict) -> State:
    """Write block outputs back into the State (the per-block stores of
    mod_barotp.F90:848-986)."""
    return dataclasses.replace(
        s,
        pb=s.pb.at[m].set(out['pb_m']).at[n].set(out['pb_n']),
        pbu=s.pbu.at[m].set(out['pbu_m']).at[n].set(out['pbu_n']),
        pbv=s.pbv.at[m].set(out['pbv_m']).at[n].set(out['pbv_n']),
        ub=s.ub.at[m].set(out['ub_m']).at[n].set(out['ub_n']),
        vb=s.vb.at[m].set(out['vb_m']).at[n].set(out['vb_n']),
        ubflx=s.ubflx.at[m].set(out['ubflx_m']).at[n].set(out['ubflx_n']),
        vbflx=s.vbflx.at[m].set(out['vbflx_m']).at[n].set(out['vbflx_n']),
        pb_mn=out['pb_mn'], ubflx_mn=out['ubflx_mn'],
        vbflx_mn=out['vbflx_mn'],
        ubflxs=sums['ubflxs'], vbflxs=sums['vbflxs'],
        ubflxs_p=sums['ubflxs_p'], vbflxs_p=sums['vbflxs_p'],
        ubcors_p=sums['ubcors_p'], vbcors_p=sums['vbcors_p'],
        pb_p=out['pb_p'], pbu_p=out['pbu_p'], pbv_p=out['pbv_p'],
        pvtrop=s.pvtrop.at[n].set(out['pvtrop_n']))


def barotp(grid: Grid, s: State, utotn, vtotn, m: int, n: int,
           lstep: int, dlt, par: BarotpParams) -> State:
    """Global-array driver: stencil shifts lower to GSPMD collectives
    under a sharded mesh (every substep).  For the margin-k amortized
    version see barotp_shmap.make_barotp_shmap."""
    fld = _prologue(grid, s, utotn, vtotn, m, n, par)
    out, sums = run_blocks(
        fld, global_shifts(grid), s.ubflxs, s.vbflxs, s.ubflxs_p,
        s.vbflxs_p, m, n, lstep, dlt, par,
        im1=grid.im1, jm1=grid.jm1, iu=grid.iu, iv=grid.iv, ip=grid.ip)
    out['pvtrop_n'] = fld['pvtrop_n']
    return finalize(grid, s, m, n, out, sums)
