"""Minimum physical temperature per isopycnic layer.

TPU-native counterpart of the reference module
(/root/reference/phy/mod_temmin.F90:20-138 settemmin): for the
isopycnic-bulk-mixed-layer coordinate the lower temperature bound of a
layer is the freezing temperature on that layer's reference density
(solve sig(tfrz(S), S) = sigmar for S, a quadratic in S since
tfrz = atf*S + btf with btf = ctf = 0 in the relevant configs); other
vertical coordinates use a constant -3 C.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import eos


def settemmin(e: eos.EosParams, sigmar, vcoord_isopyc: bool,
              expcnf: str = 'fuk95'):
    """Return temmin (K, J, I) given layer reference densities
    (settemmin, mod_temmin.F90:51-133).  Layer 0 (mixed layer) keeps
    the constant bound as in the reference (only k>=2 is set there)."""
    if (not vcoord_isopyc) or expcnf in ('cesm', 'single_column'):
        return jnp.full_like(sigmar, -3.)

    # freezing salinity on the reference density: with rho = P1/P2 and
    # tfrz = atf*s, sig = sigmar becomes a*s^2 + b*s + c = 0
    # (mod_temmin.F90:86-96)
    a = (((e.ap14 - e.ap24 * sigmar) * e.atf
          + e.ap15 - e.ap25 * sigmar) * e.atf
         + e.ap16 - e.ap26 * sigmar)
    b = (e.ap12 - e.ap22 * sigmar) * e.atf + e.ap13 - e.ap23 * sigmar
    c = e.ap11 - e.ap21 * sigmar
    disc = jnp.maximum(b * b - 4. * a * c, 0.)
    salfrz = (-b + jnp.sqrt(disc)) / (2. * a)
    temmin = e.atf * salfrz
    return temmin.at[0].set(-3.)
