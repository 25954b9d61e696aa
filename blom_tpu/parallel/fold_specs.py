"""Per-field tripolar-fold halo rules for the shard_map step.

The reference tags every xctilr call with a halo type
(halo_ps/halo_us/halo_vs/halo_qs for scalars at p/u/v/q points and
halo_uv/halo_vv for sign-flipping vector components,
/root/reference/phy/mod_xc.F90:107-110); the distributed fold then
mirrors, staggers and sign-flips accordingly (:2518-2700).  This module
is the same tagging for the pytrees the shard_map step exchanges: a
flat `(kind, sign, partner)` spec per array leaf, resolved by field
name.

`partner` handles the reference's bottom-pressure-sensitivity pairs
(xixp/xixm, and the umaxb/uminb clip bounds): under the fold the +i/-i
(or +velocity/-velocity) roles SWAP with no sign flip — the mirrored
u-point's east cell is the original's west cell (see
parallel/arctic.py XI_PAIRS).

kind None = leave the zero ghosts from the plain exchange (used for
CPPM stencil coefficients, whose fold rows are NOT mirrors — they come
from the arctic-extended init_cppm_coeffs domain and are patched in
separately by step_shmap._fix_coeff_ghosts).
"""

from __future__ import annotations

import jax

from .arctic import STATE_KINDS

# name -> (kind, sign, partner_name | None)
_TABLE = {}

# --- State fields (same tags as parallel/arctic.STATE_KINDS) --------
for _n, (_k, _vec) in STATE_KINDS.items():
    _TABLE[_n] = (_k, -1.0 if _vec else 1.0, None)
_TABLE['kfpla'] = ('p', 1.0, None)   # int index field at p-points
for _a, _b in (('xixp', 'xixm'), ('xixp_o', 'xixm_o')):
    _TABLE[_a] = ('u', 1.0, _b)
    _TABLE[_b] = ('u', 1.0, _a)
for _a, _b in (('xiyp', 'xiym'), ('xiyp_o', 'xiym_o')):
    _TABLE[_a] = ('v', 1.0, _b)
    _TABLE[_b] = ('v', 1.0, _a)

# --- DiffusionFields ------------------------------------------------
for _n in ('difint', 'difiso', 'difdia', 'difwgt', 'difvho', 'difvso',
           'difvmo', 'mtke', 'bld'):
    _TABLE[_n] = ('p', 1.0, None)
for _n in ('umfltd', 'umflsm', 'utflld', 'usflld'):
    _TABLE[_n] = ('u', -1.0, None)
for _n in ('vmfltd', 'vmflsm', 'vtflld', 'vsflld'):
    _TABLE[_n] = ('v', -1.0, None)

# --- Forcing --------------------------------------------------------
_TABLE.update({
    'taux': ('u', -1.0, None), 'tauy': ('v', -1.0, None),
    'mu_nonloc': ('u', 1.0, None), 'mv_nonloc': ('v', 1.0, None),
})
for _n in ('surflx', 'sswflx', 'salflx', 'brnflx', 'surrlx', 'salrlx',
           'sstclm', 'sssclm', 'lamult',
           'swfc1', 'swfc2', 'swal1', 'swal2'):
    _TABLE[_n] = ('p', 1.0, None)

# --- Grid metrics (scalars; mod_inigeo's xctilr tags) ---------------
for _n in ('scpx', 'scpy', 'scp2', 'scp2i', 'coriop', 'betafp', 'ip',
           'difmxp', 'depths', 'plon', 'plat'):
    _TABLE[_n] = ('p', 1.0, None)
for _n in ('scux', 'scuy', 'scu2', 'scuxi', 'scuyi', 'iu', 'umax'):
    _TABLE[_n] = ('u', 1.0, None)
for _n in ('scvx', 'scvy', 'scv2', 'scvxi', 'scvyi', 'iv', 'vmax'):
    _TABLE[_n] = ('v', 1.0, None)
for _n in ('scqx', 'scqy', 'scq2', 'scq2i', 'corioq', 'iq', 'difmxq'):
    _TABLE[_n] = ('q', 1.0, None)

# --- barotp prologue dict (dynamics/barotp.py _prologue) ------------
_TABLE.update({
    'pvtrop_o': ('q', 1.0, None), 'pvtrop_m': ('q', 1.0, None),
    'pvtrop_n': ('q', 1.0, None),
    'pgfxm_o': ('u', -1.0, None), 'pgfym_o': ('v', -1.0, None),
    'pgfxm_m': ('u', -1.0, None), 'pgfxm_n': ('u', -1.0, None),
    'pgfym_m': ('v', -1.0, None), 'pgfym_n': ('v', -1.0, None),
    'xixp_m': ('u', 1.0, 'xixm_m'), 'xixm_m': ('u', 1.0, 'xixp_m'),
    'xixp_n': ('u', 1.0, 'xixm_n'), 'xixm_n': ('u', 1.0, 'xixp_n'),
    'xiyp_m': ('v', 1.0, 'xiym_m'), 'xiym_m': ('v', 1.0, 'xiyp_m'),
    'xiyp_n': ('v', 1.0, 'xiym_n'), 'xiym_n': ('v', 1.0, 'xiyp_n'),
    'utotn': ('u', -1.0, None), 'vtotn': ('v', -1.0, None),
    'uglue': ('u', 1.0, None), 'vglue': ('v', 1.0, None),
    # velocity clip bounds: mirror swaps max<->min, no sign flip
    # (mirrored u_max = -u_min of the source point)
    'umaxb': ('u', 1.0, 'uminb'), 'uminb': ('u', 1.0, 'umaxb'),
    'vmaxb': ('v', 1.0, 'vminb'), 'vminb': ('v', 1.0, 'vmaxb'),
    'pb_t': ('p', 1.0, None),
    'ubflx_t': ('u', -1.0, None), 'vbflx_t': ('v', -1.0, None),
})

# --- CPPM coefficients: zero ghosts here; patched from the
# arctic-extended coefficient rows by step_shmap ---------------------
for _n in ('stencil', 'hevc', 'ssc', 'scc', 'd2m', 'tmc0', 'tmcl',
           'tmcr', 'dx'):
    _TABLE[_n] = (None, 1.0, None)

# --- vmix VmixFields (difest_vertical outputs stay block-local; not
# exchanged) — no entries needed.


def _leaf_name(path):
    """Last attribute/dict key name on a pytree path, or None."""
    for entry in reversed(path):
        name = getattr(entry, 'name', None)
        if name is None:
            name = getattr(entry, 'key', None)
            if not isinstance(name, str):
                name = None
        if name is not None:
            return name
    return None


def leaf_specs(tree, overrides=None):
    """Build the flat fold-spec list aligned with jax.tree.flatten(tree).

    Each entry: (kind, sign, partner_leaf_index|None) or None (skip
    fold fixup for that leaf).  `overrides` maps a TOP-LEVEL tuple
    index (for unnamed positional leaves) to a (kind, sign) pair.

    Raises KeyError for any array leaf whose field name is unknown —
    silently defaulting a vector to a scalar would corrupt the fold.
    """
    overrides = overrides or {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
    names = []
    specs = []
    for path, leaf in leaves_with_path:
        name = _leaf_name(path)
        if name is None:
            idx = getattr(path[0], 'idx', None)
            if idx in overrides:
                k, sign = overrides[idx]
                names.append(None)
                specs.append((k, sign, None))
                continue
            raise KeyError(f'unnamed pytree leaf at {path} needs an '
                           f'overrides entry for the tripolar fold')
        if name not in _TABLE:
            raise KeyError(f'no tripolar fold rule for field {name!r}')
        k, sign, partner = _TABLE[name]
        names.append(name)
        specs.append((k, sign, partner))
    # resolve partner names -> leaf indices
    out = []
    for k, sign, partner in specs:
        if k is None:
            out.append(None)
        elif partner is None:
            out.append((k, sign, None))
        else:
            try:
                pi = names.index(partner)
            except ValueError:
                raise KeyError(f'fold partner {partner!r} not present '
                               f'in the exchanged tree')
            out.append((k, sign, pi))
    return out
