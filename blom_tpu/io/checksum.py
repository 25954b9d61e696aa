"""Deterministic field checksums for regression/equivalence testing.

TPU-native re-design of the reference's csdiag machinery
(reference: /root/reference/phy/mod_checksum.F90 per-routine CRC32 of
masked fields; /root/reference/phy/mod_crc32.F90; PE-count-invariant by
the fixed-strip scheme of mod_xc.F90:2195-2322).

Here each field hashes to the CRC32 of its exact little-endian f64 bytes
on the host — invariant across shardings because arrays are gathered
before hashing."""

from __future__ import annotations

import dataclasses
import zlib

import numpy as np

from ..core.state import State


def field_crc(a) -> int:
    arr = np.ascontiguousarray(np.asarray(a, dtype='<f8'))
    return zlib.crc32(arr.tobytes()) & 0xFFFFFFFF


def state_checksums(s: State, fields=None) -> dict:
    """Per-field CRC dictionary (chksum calls, e.g. mod_advect.F90:174-187)."""
    names = fields or [f.name for f in dataclasses.fields(s)]
    return {name: field_crc(getattr(s, name)) for name in names}


def print_checksums(tag: str, s: State, fields=('dp', 'temp', 'saln',
                                                'u', 'v', 'pb')):
    print(f'{tag}:')
    for name, crc in state_checksums(s, fields).items():
        print(f'  chksum {name}: {crc:08x}')
