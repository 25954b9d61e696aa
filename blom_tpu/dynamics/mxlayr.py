"""Bulk surface mixed layer (Kraus-Turner / Oberhuber TKE balance).

TPU-native re-design of the reference bulk mixed layer
(reference: /root/reference/phy/mod_mxlayr.F90:128-1431 mxlayr): the
mixed layer consists of layers 1-2 (layer 1 a thktop=10 m skin); surface
fluxes are absorbed in the mixed layer; a TKE budget with wind stirring
(rm0*ustar^3, :347) and buoyancy work decides between entrainment
deepening (positive TKE: lift denser interior water into the ML) and
detrainment toward a Monin-Obukhov-type equilibrium depth (negative TKE,
:385-454), with detrained water assigned to its isopycnic density class.

Round-1 simplifications, documented for the parity pass: the penetrating
part of shortwave below the ML base, the near-inertial energy source
(rm5/niw), mixed-layer restratification (mlrmth) and the detailed
layer-1/layer-2 split bookkeeping are reduced — the skin layer tracks
min(thktop, pmxl/2) and ML properties are homogeneous over both layers."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..core import eos
from ..core.constants import grav, alpha0, rho0, spcifh, onem, epsilp
from ..core.grid import Grid
from ..core.state import State, cumulative_p
from ..phys.forcing import Forcing

mltmin = 5.      # minimum ML thickness [m] (mod_mxlayr.F90:73)
thktop = 10.     # skin layer thickness [m] (mod_mxlayr.F90:75)


class MxlayrParams(NamedTuple):
    rm0: float = 1.2    # wind TKE efficiency (deck RM0)
    rm5: float = 0.     # momentum-entrainment TKE efficiency


def mxlayr(grid: Grid, e: eos.EosParams, s: State, forcing: Forcing,
           par: MxlayrParams, m: int, n: int, delt1) -> State:
    kk = grid.kk
    ip = grid.ip
    kidx = jnp.arange(kk, dtype=jnp.int32).reshape(
        (kk,) + (1,) * len(grid.shape))

    ttem = s.temp[n]
    ssal = s.saln[n]
    delp = s.dp[n]
    densr = s.sigmar
    kfpl = s.kfpla[n]

    cpi = 1.0 / spcifh
    dtg = delt1 * grav

    # ---- apply surface fluxes to the mixed layer (layers 0+1)
    hml_p = jnp.maximum(delp[0] + delp[1], mltmin * onem * .1)
    hf = forcing.surflx + forcing.surrlx          # [W m-2], >0 out of ocean
    sf = forcing.salflx + forcing.salrlx          # [g m-2 s-1]
    dT = -hf * dtg * cpi / hml_p
    dS = -sf * dtg / hml_p
    w0 = delp[0] / hml_p
    Tml = (ttem[0] * delp[0] + ttem[1] * delp[1]) / hml_p + dT
    Sml = jnp.maximum((ssal[0] * delp[0] + ssal[1] * delp[1]) / hml_p + dS,
                      0.)

    # ---- TKE budget (mod_mxlayr.F90:288-454)
    taux_p = .5 * (forcing.taux + grid.ip1(forcing.taux))
    tauy_p = .5 * (forcing.tauy + grid.jp1(forcing.tauy))
    ustar3 = (jnp.sqrt(jnp.sqrt(taux_p ** 2 + tauy_p ** 2) / rho0)) ** 3
    gaa = grav * alpha0 * alpha0
    dsgdt = eos.dsigdt0(e, Tml, Sml)
    dsgds = eos.dsigds0(e, Tml, Sml)
    # surface buoyancy flux [m2 s-3]; > 0 destabilizes (buoyancy loss)
    B0 = (dsgdt * hf * cpi + dsgds * sf) * gaa
    hml_m = hml_p * alpha0 / grav                 # [m]
    tkew = par.rm0 * ustar3 + .5 * hml_m * B0     # [m3 s-3]

    # ---- entrainment (tkew > 0): absorb interior mass until the TKE is
    # consumed by the potential-energy cost (scan over k)
    sig_ml = eos.sig(e, Tml, Sml)
    budget0 = tkew * delt1                        # [m3 s-2]

    def entrain_scan(carry, xs):
        tdps, sdps, dps, budget, hcur = carry
        t_k, s_k, dp_k, k_i = xs
        interior = (k_i >= 2) & (dp_k > epsilp)
        sig_k = eos.sig(e, t_k, s_k)
        sig_cur = eos.sig(e, tdps / jnp.maximum(dps, epsilp),
                          sdps / jnp.maximum(dps, epsilp))
        dbuoy = jnp.maximum(sig_k - sig_cur, 1e-7) * gaa / alpha0
        # PE cost of entraining the whole layer [m3 s-2]
        dz_k = dp_k * alpha0 / grav
        cost_full = .5 * dbuoy * hcur * dz_k
        frac = jnp.clip(budget / jnp.maximum(cost_full, 1e-30), 0., 1.)
        take = jnp.where(interior, frac * dp_k, 0.)
        tdps2 = tdps + t_k * take
        sdps2 = sdps + s_k * take
        dps2 = dps + take
        budget2 = budget - jnp.where(interior, frac * cost_full, 0.)
        hcur2 = hcur + take * alpha0 / grav
        return (tdps2, sdps2, dps2, budget2, hcur2), take

    entraining = budget0 > 0.
    init = (Tml * hml_p, Sml * hml_p, hml_p,
            jnp.where(entraining, budget0, 0.), hml_m)
    (tdps, sdps, dps, _, _), taken = lax.scan(
        entrain_scan, init, (ttem, ssal, delp, kidx))

    Tml_e = tdps / jnp.maximum(dps, epsilp)
    Sml_e = sdps / jnp.maximum(dps, epsilp)
    hml_e = dps

    # ---- detrainment (tkew <= 0): relax the ML base toward the
    # Monin-Obukhov depth (mod_mxlayr.F90:385-454), not shallower than
    # mltmin; the detrained water goes to its isopycnic density class.
    lmo = par.rm0 * ustar3 / jnp.maximum(.5 * B0 * alpha0 / grav, 1e-12)
    pmxl_det = jnp.clip(lmo * onem, mltmin * onem, hml_p)
    detr = jnp.where(~entraining, jnp.maximum(hml_p - pmxl_det, 0.), 0.)

    hml_new = jnp.where(entraining, hml_e, hml_p - detr)
    Tml_new = jnp.where(entraining, Tml_e, Tml)
    Sml_new = jnp.where(entraining, Sml_e, Sml)
    sig_new = eos.sig(e, Tml_new, Sml_new)

    # density class of detrained water: deepest k >= 2 with
    # densr(k) <= sig_ml, bounded to [2, kk-1]
    fits = (densr <= sig_new[None]) & (kidx >= 2)
    kdet = jnp.clip(jnp.max(jnp.where(fits, kidx, 2), axis=0), 2, kk - 1)

    # ---- rebuild the column
    delp_new = delp
    # interior layers lose entrained mass
    delp_new = jnp.where(entraining[None], delp_new - taken, delp_new)
    # detrained mass joins layer kdet
    delp_new = delp_new + jnp.where(
        (kidx == kdet[None]) & (~entraining)[None], detr[None], 0.)
    # detrained water carries ML properties into its class
    gets = (kidx == kdet[None]) & (~entraining)[None] & (detr[None] > 0.)
    wd = jnp.where(gets, detr[None]
                   / jnp.maximum(delp_new, epsilp), 0.)
    ttem = ttem * (1. - wd) + Tml_new[None] * wd
    ssal = ssal * (1. - wd) + Sml_new[None] * wd

    # skin/remainder split of the new ML
    dp0 = jnp.minimum(thktop * onem, .5 * hml_new)
    delp_new = delp_new.at[0].set(dp0).at[1].set(hml_new - dp0)
    ttem = ttem.at[0].set(Tml_new).at[1].set(Tml_new)
    ssal = ssal.at[0].set(Sml_new).at[1].set(Sml_new)

    sigma_new = eos.sig(e, ttem, ssal) * ip

    return dataclasses.replace(
        s,
        temp=s.temp.at[n].set(ttem * ip),
        saln=s.saln.at[n].set(ssal * ip),
        dp=s.dp.at[n].set(jnp.maximum(delp_new, 0.) * ip),
        sigma=s.sigma.at[n].set(sigma_new))
