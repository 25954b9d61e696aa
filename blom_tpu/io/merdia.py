"""Meridional-overturning, section, and z-level diagnostics.

TPU-native counterpart of the reference MERDIA/SECDIA systems and the
z-level output path (/root/reference/phy/mod_dia.F90:4004-4350 diamer,
:3814-4001 diasec, depthslev tables :111-142 and the ALE z-level remap
mod_ale_regrid_remap.F90 ale_remap_diazlv).

Re-design: the reference walks precomputed section index lists
(mer_mifile) gathered to rank 1; here sections and latitude bins are
dense (J, I) weight masks so every reduction is a masked sum or a
one-hot matmul (MXU-friendly), identical on any sharding.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# the 35-level standard depth table (mod_dia.F90:111-129) [m]
DEPTHSLEV = np.array([
    0., 10., 20., 30., 50., 75., 100., 125., 150., 200., 250., 300.,
    400., 500., 600., 700., 800., 900., 1000., 1100., 1200., 1300.,
    1400., 1500., 1750., 2000., 2500., 3000., 3500., 4000., 4500.,
    5000., 5500., 6000., 6500.])
DEPTHSLEV_BNDS = np.array([
    [0., 5.], [5., 15.], [15., 25.], [25., 40.], [40., 62.5],
    [62.5, 87.5], [87.5, 112.5], [112.5, 137.5], [137.5, 175.],
    [175., 225.], [225., 275.], [275., 350.], [350., 450.],
    [450., 550.], [550., 650.], [650., 750.], [750., 850.],
    [850., 950.], [950., 1050.], [1050., 1150.], [1150., 1250.],
    [1250., 1350.], [1350., 1450.], [1450., 1625.], [1625., 1875.],
    [1875., 2250.], [2250., 2750.], [2750., 3250.], [3250., 3750.],
    [3750., 4250.], [4250., 4750.], [4750., 5250.], [5250., 5750.],
    [5750., 6250.], [6250., 8000.]])


# ------------------------------------------------------------------ #
# z-level remap of layer fields
# ------------------------------------------------------------------ #

def zlev_overlap(p_i, bnds=None, onem: float = 9806.):
    """Overlap weights between model layers and fixed z-bins
    (ale_remap_diazlv's bin integrals).  p_i: (K+1, J, I) interface
    pressures; returns (ddm, K, J, I) overlap thickness [Pa]."""
    if bnds is None:
        bnds = DEPTHSLEV_BNDS
    zb = jnp.asarray(bnds, p_i.dtype) * onem          # (ddm, 2)
    p_up = p_i[:-1][None]                             # (1, K, J, I)
    p_lo = p_i[1:][None]
    lo = zb[:, 0][:, None, None, None]
    hi = zb[:, 1][:, None, None, None]
    return jnp.maximum(0., jnp.minimum(p_lo, hi) - jnp.maximum(p_up, lo))


def to_zlev(field, p_i, bnds=None, onem: float = 9806.,
            fill: float = 0.):
    """Bin-average a (K, J, I) layer field onto the standard depth
    levels.  Returns (ddm, J, I); bins with no overlap get `fill`."""
    w = zlev_overlap(p_i, bnds, onem)
    num = jnp.einsum('dkji,kji->dji', w, field)
    den = jnp.sum(w, axis=1)
    return jnp.where(den > 0., num / jnp.maximum(den, 1.e-30), fill)


# ------------------------------------------------------------------ #
# meridional overturning / transports (MERDIA)
# ------------------------------------------------------------------ #

def lat_bin_weights(vlat, lats, region=None):
    """One-hot latitude-bin membership of v-points.

    vlat: (J, I) latitude at v-points; lats: (L,) bin edges (transport
    across each latitude collects v-edges whose latitude falls in
    [lats[l], lats[l]+dlat) as the reference's zigzag sections do).
    Returns (L, J, I) weights; `region` (J, I) 0/1 mask restricts to
    one ocean region (mer_regflg)."""
    lats = jnp.asarray(lats, vlat.dtype)
    edges = jnp.concatenate([lats, jnp.asarray([90.], vlat.dtype)])
    idx = jnp.clip(jnp.searchsorted(edges, vlat, side='right') - 1,
                   0, lats.shape[0] - 1)
    onehot = (jnp.arange(lats.shape[0])[:, None, None] == idx[None])
    w = onehot.astype(vlat.dtype)
    if region is not None:
        w = w * region[None]
    return w


def overturning_streamfunction(vflx, wlat, scale: float = 1.):
    """Meridional-overturning streamfunction from accumulated v mass
    flux (mosf; diamer's mmflxl path, mod_dia.F90:4150-4300).

    vflx: (K, J, I) accumulated v mass flux; wlat: (L, J, I) latitude
    weights.  Returns (L, K+1) streamfunction: zonal/regional sum per
    bin, then cumulative from the surface."""
    t = jnp.einsum('lji,kji->lk', wlat, vflx) * scale
    zero = jnp.zeros_like(t[:, :1])
    return jnp.concatenate([zero, jnp.cumsum(t, axis=1)], axis=1)


def meridional_transport(flx, wlat, scale: float = 1.):
    """Vertically integrated meridional transport per latitude bin
    (mhflx/msflx; mod_dia.F90:4300-4340)."""
    return jnp.einsum('lji,kji->l', wlat, flx) * scale


# ------------------------------------------------------------------ #
# section transports (SECDIA)
# ------------------------------------------------------------------ #

def section_transport(uflx, vflx, uflg, vflg):
    """Net transport through a section defined by signed edge masks
    (diasec, mod_dia.F90:3814-4001): uflg/vflg are (J, I) in {-1,0,1}
    giving the orientation of each crossed edge."""
    return (jnp.einsum('ji,kji->', uflg, uflx)
            + jnp.einsum('ji,kji->', vflg, vflx))


def section_masks_along_i(shape, i0: int, j_range=None, dtype=float):
    """Build the edge masks of a meridional section at constant i
    (the simplest mer_mifile-style section)."""
    uflg = np.zeros(shape, dtype)
    j0, j1 = (0, shape[0]) if j_range is None else j_range
    uflg[j0:j1, i0] = 1.
    return jnp.asarray(uflg), jnp.zeros(shape, dtype)


def section_masks_along_j(shape, j0: int, i_range=None, dtype=float):
    """Zonal section at constant j (transport across a latitude
    line)."""
    vflg = np.zeros(shape, dtype)
    i0, i1 = (0, shape[1]) if i_range is None else i_range
    vflg[j0, i0:i1] = 1.
    return jnp.zeros(shape, dtype), jnp.asarray(vflg)
