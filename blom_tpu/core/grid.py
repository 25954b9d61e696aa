"""Grid container: C-grid metrics, masks, Coriolis, numerical bounds.

TPU-native re-design of the reference's grid + mask machinery
(reference: /root/reference/phy/mod_grid.F90 declarations;
/root/reference/phy/mod_bigrid.F90:43-431 mask construction;
/root/reference/phy/mod_blom_init.F90:446-555 numerical bounds).

Instead of per-row land-skipping loop tables (isp/ifp/ilp...), land is a
dense 0/1 mask per grid-point class (p, u, v, q) that multiplies compute
results — on TPU dense masked arithmetic beats gather/scatter.  The
domain topology (periodicity) is static metadata so stencil shifts
compile to rolls.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stencil
from . import constants as c


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    """Static geometry of the model domain.

    All 2-D arrays are (jdm, idm); corner arrays follow the reference's
    q/u/v staggering (mod_bigrid.F90:222-243)."""

    # topology (static)
    periodic_i: bool = dataclasses.field(metadata=dict(static=True))
    periodic_j: bool = dataclasses.field(metadata=dict(static=True))
    arctic: bool = dataclasses.field(metadata=dict(static=True))
    kk: int = dataclasses.field(metadata=dict(static=True))

    # grid metrics [m], [m2] (mod_grid.F90:48-66)
    scpx: jax.Array
    scpy: jax.Array
    scux: jax.Array
    scuy: jax.Array
    scvx: jax.Array
    scvy: jax.Array
    scqx: jax.Array
    scqy: jax.Array
    scp2: jax.Array
    scu2: jax.Array
    scv2: jax.Array
    scq2: jax.Array
    scp2i: jax.Array
    scq2i: jax.Array
    scuxi: jax.Array
    scuyi: jax.Array
    scvxi: jax.Array
    scvyi: jax.Array

    # geography
    plon: jax.Array
    plat: jax.Array
    depths: jax.Array      # water depth [m], 0 over land
    corioq: jax.Array      # Coriolis at q [s-1]
    coriop: jax.Array      # Coriolis at p [s-1]
    betafp: jax.Array      # df/dy at p [m-1 s-1]

    # land masks (0/1 float) per point class (mod_bigrid.F90:210-249)
    ip: jax.Array
    iu: jax.Array
    iv: jax.Array
    iq: jax.Array

    # numerical bounds (mod_blom_init.F90:446-555)
    difmxp: jax.Array      # max lateral diffusivity at p [m2 s-1]
    difmxq: jax.Array      # max lateral diffusivity at q [m2 s-1]
    umax: jax.Array        # max u velocity [m s-1]
    vmax: jax.Array        # max v velocity [m s-1]

    @property
    def shape(self):
        return self.depths.shape

    # ---- neighbor shifts respecting this grid's topology ----
    #
    # On tripolar grids (arctic=True) a j+1 read at the top row crosses
    # the bipolar fold: the ghost is the i-mirrored (sign-flipped for
    # vector components) value from below the fold, with per-grid-kind
    # staggering (xctilr halo_ps..halo_vv, mod_xc.F90:2405-2700).
    # Callers crossing the fold must tag the field's grid kind
    # ('p'|'u'|'v'|'q') and vector-ness; untagged calls keep the closed
    # (zero-ghost) behavior, which is correct only off the fold row.

    def im1(self, a):
        return stencil.im1(a, self.periodic_i)

    def ip1(self, a):
        return stencil.ip1(a, self.periodic_i)

    def jm1(self, a):
        return stencil.jm1(a, self.periodic_j)

    def jp1(self, a, kind: str = None, vector: bool = False):
        if self.arctic and kind is not None:
            from ..parallel.arctic import jp1_arctic
            return jp1_arctic(a, kind, vector)
        return stencil.jp1(a, self.periodic_j)

    def jpn(self, a, m: int, kind: str = None, vector: bool = False):
        """Neighbor at j+m (m >= 1), fold-aware when tagged."""
        if self.arctic and kind is not None:
            from ..parallel.arctic import fold_row
            ghosts = [fold_row(a, kind, vector, mm)[..., None, :]
                      for mm in range(m)]
            ext = jnp.concatenate([a] + ghosts, axis=-2)
            return ext[..., m:, :]
        return stencil.shift(a, 0, m, self.periodic_i, self.periodic_j)

    def shift(self, a, di=0, dj=0, kind: str = None,
              vector: bool = False):
        if dj > 0 and self.arctic and kind is not None:
            out = self.jpn(a, dj, kind, vector)
            if di:
                out = stencil.shift(out, di, 0, self.periodic_i,
                                    self.periodic_j)
            return out
        return stencil.shift(a, di, dj, self.periodic_i, self.periodic_j)


def build_masks(depths: np.ndarray, periodic_i: bool, periodic_j: bool):
    """Construct p/u/v/q masks from the depth field.

    Mirrors bigrid (mod_bigrid.F90:210-249): p-points where depth > 0;
    u/v between two wet p-points; q where all four surrounding p are wet,
    or on promontories (3 wet, or 2 diametrically opposed wet)."""
    ip = (depths > 0.0).astype(np.float64)

    def shiftn(a, di, dj):
        out = np.roll(a, (dj, di), axis=(0, 1))
        if di == 1 and not periodic_i:
            out[:, 0] = 0.0
        if di == -1 and not periodic_i:
            out[:, -1] = 0.0
        if dj == 1 and not periodic_j:
            out[0, :] = 0.0
        if dj == -1 and not periodic_j:
            out[-1, :] = 0.0
        return out

    ip_im1 = shiftn(ip, 1, 0)    # ip(i-1, j)
    ip_jm1 = shiftn(ip, 0, 1)    # ip(i, j-1)
    ip_im1jm1 = shiftn(ip_im1, 0, 1)

    iu = ip * ip_im1
    iv = ip * ip_jm1
    iq_all = ip * ip_im1 * ip_jm1 * ip_im1jm1
    iq_diag = np.maximum(ip * ip_im1jm1, ip_im1 * ip_jm1)
    iq = np.maximum(iq_all, (iq_diag > 0).astype(np.float64))
    return ip, iu, iv, iq


def finish_grid(*, scpx, scpy, scux, scuy, scvx, scvy, scqx, scqy,
                plon, plat, depths, corioq, coriop, betafp,
                periodic_i, periodic_j, kk, baclin,
                arctic=False, dtype=jnp.float64) -> Grid:
    """Assemble a Grid: areas, inverses, masks, and numerical bounds.

    The stability bounds follow numerical_bounds
    (mod_blom_init.F90:446-555): difmx* = 0.45*dx2*dy2/((dx2+dy2)*2*dt),
    umax/vmax = 0.9/8 * min(neighbor cell areas)/(edge length * dt)."""
    depths = np.asarray(depths, dtype=np.float64)
    ip, iu, iv, iq = build_masks(depths, periodic_i, periodic_j)

    scp2 = scpx * scpy
    scu2 = scux * scuy
    scv2 = scvx * scvy
    scq2 = scqx * scqy

    dx2, dy2 = scpx * scpx, scpy * scpy
    difmxp = .9 * .5 * dx2 * dy2 / np.maximum(
        1.0, (dx2 + dy2) * (baclin + baclin))
    dx2, dy2 = scqx * scqx, scqy * scqy
    difmxq = .9 * .5 * dx2 * dy2 / np.maximum(
        1.0, (dx2 + dy2) * (baclin + baclin))

    def shiftn(a, di, dj):
        out = np.roll(a, (dj, di), axis=(0, 1))
        if di == 1 and not periodic_i:
            out[:, 0] = out[:, 1]
        if dj == 1 and not periodic_j:
            out[0, :] = out[1, :]
        return out

    umax = .9 * .125 * np.minimum(shiftn(scp2, 1, 0), scp2) / (scuy * baclin)
    vmax = .9 * .125 * np.minimum(shiftn(scp2, 0, 1), scp2) / (scvx * baclin)

    as_j = partial(jnp.asarray, dtype=dtype)
    return Grid(
        periodic_i=periodic_i, periodic_j=periodic_j, arctic=arctic, kk=kk,
        scpx=as_j(scpx), scpy=as_j(scpy), scux=as_j(scux), scuy=as_j(scuy),
        scvx=as_j(scvx), scvy=as_j(scvy), scqx=as_j(scqx), scqy=as_j(scqy),
        scp2=as_j(scp2), scu2=as_j(scu2), scv2=as_j(scv2), scq2=as_j(scq2),
        scp2i=as_j(1.0 / scp2), scq2i=as_j(1.0 / scq2),
        scuxi=as_j(1.0 / scux), scuyi=as_j(1.0 / scuy),
        scvxi=as_j(1.0 / scvx), scvyi=as_j(1.0 / scvy),
        plon=as_j(plon), plat=as_j(plat), depths=as_j(depths),
        corioq=as_j(corioq), coriop=as_j(coriop), betafp=as_j(betafp),
        ip=as_j(ip), iu=as_j(iu), iv=as_j(iv), iq=as_j(iq),
        difmxp=as_j(difmxp), difmxq=as_j(difmxq),
        umax=as_j(umax), vmax=as_j(vmax))
