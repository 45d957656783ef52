"""Static de-interleaver index tables.

Every interleaver in the reference is a fixed permutation; here each is a
precomputed gather-index array so de-interleaving any batch is one
``take``/gather. Indices map *output* position -> *input* position (i.e.
``deinterleaved = x[..., table]``).
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def bptc_196() -> np.ndarray:
    """DMR BPTC(196,96) de-interleave: out[i] = in[i*181 % 196]
    (src/dmr_decoder/bptc_196_96.c:12-17)."""
    return np.array([(i * 181) % 196 for i in range(196)], dtype=np.int32)


def _rowcol(rows: int, cols: int) -> np.ndarray:
    """Generic block de-interleave: input scanned as rows x cols,
    output reads column-major: out[k*rows + i] = in[i*cols + k]."""
    idx = np.zeros(rows * cols, dtype=np.int32)
    for i in range(rows):
        for k in range(cols):
            idx[k * rows + i] = i * cols + k
    return idx


@functools.lru_cache(maxsize=None)
def ysf_fich() -> np.ndarray:
    """YSF FICH 5x20 dibit de-interleave (src/ysf_decoder/fich.cpp:15-19):
    out dibit i <- in dibit (i*20) % 100 + (i*20) // 100."""
    return np.array(
        [(i * 20) % 100 + (i * 20) // 100 for i in range(100)],
        dtype=np.int32,
    )


@functools.lru_cache(maxsize=None)
def ysf_v2_voice() -> np.ndarray:
    """YSF V/D2 voice: 26 rows x 4 cols bit de-interleave over 104 bits
    (src/ysf_decoder/ysf_phase.cpp:180-219): bit i of output = input bit
    (i % 26) * 4 + i / 26."""
    idx = np.zeros(104, dtype=np.int32)
    for i in range(104):
        idx[i] = (i % 26) * 4 + i // 26
    return idx


@functools.lru_cache(maxsize=None)
def ysf_dch_v2() -> np.ndarray:
    """YSF V/D2 data channel: gathers the 20-dibit DCH prefix of each of the
    5 payload blocks with 20x5 interleaving (ysf_phase.cpp:100-106):
    out dibit i <- payload dibit (i % 5) * 72 + i // 5. Indices are into the
    360-dibit payload."""
    return np.array(
        [(i % 5) * 72 + i // 5 for i in range(100)], dtype=np.int32
    )


@functools.lru_cache(maxsize=None)
def ysf_dch_header(block: int = 0) -> np.ndarray:
    """YSF header/terminator data channel: 20x9 dibit de-interleave over 180
    dibits pulled from the first 36 dibits of each 72-dibit payload block
    (ysf_phase.cpp:322-334): streampos = (i % 9) * 20 + i // 9, then
    inpos = (streampos // 36) * 72 + streampos % 36 (+36 for the 2nd DCH)."""
    idx = np.zeros(180, dtype=np.int32)
    for i in range(180):
        streampos = (i % 9) * 20 + i // 9
        idx[i] = (streampos // 36) * 72 + streampos % 36 + 36 * block
    return idx


@functools.lru_cache(maxsize=None)
def nxdn_sacch() -> np.ndarray:
    """NXDN SACCH: 12x5 bit de-interleave over 60 bits
    (src/nxdn_decoder/sacch.cpp:46-55): out[k*12+i] = in[i*5+k]."""
    idx = np.zeros(60, dtype=np.int32)
    for i in range(12):
        for k in range(5):
            idx[k * 12 + i] = i * 5 + k
    return idx


@functools.lru_cache(maxsize=None)
def nxdn_facch1() -> np.ndarray:
    """NXDN FACCH1: 16x9 bit de-interleave over 144 bits
    (src/nxdn_decoder/facch1.cpp:40-49): out[k*16+i] = in[i*9+k]."""
    idx = np.zeros(144, dtype=np.int32)
    for i in range(16):
        for k in range(9):
            idx[k * 16 + i] = i * 9 + k
    return idx


@functools.lru_cache(maxsize=None)
def dstar_header() -> np.ndarray:
    """D-Star 660-bit radio header de-interleave
    (src/dstar_decoder/header.cpp:56-68): first 12 columns have 28 rows,
    the remaining 12 have 27. Mapping: out[k*24 + i] = in[...]."""
    idx = np.zeros(660, dtype=np.int32)
    for i in range(12):
        for k in range(28):
            idx[k * 24 + i] = i * 28 + k
    for i in range(12, 24):
        for k in range(27):
            idx[k * 24 + i] = 12 + i * 27 + k
    return idx


def deinterleave(x: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Apply a de-interleave gather on the last axis (numpy or jax array)."""
    return x[..., table]


@functools.lru_cache(maxsize=None)
def depuncture_mask_sacch() -> tuple[np.ndarray, np.ndarray]:
    """NXDN SACCH 'inflate' (sacch.cpp:57-68): 60 bits -> 72, inserting a 0
    at every position where (i+1) % 6 == 0. Returns (scatter_idx, mask):
    output[i] = mask[i] ? input[scatter_idx[i]] : 0."""
    idx = np.zeros(72, dtype=np.int32)
    mask = np.zeros(72, dtype=bool)
    pos = 0
    for i in range(72):
        if (i + 1) % 6 != 0:
            idx[i] = pos
            mask[i] = True
            pos += 1
    return idx, mask


@functools.lru_cache(maxsize=None)
def depuncture_mask_facch1() -> tuple[np.ndarray, np.ndarray]:
    """NXDN FACCH1 'inflate' (facch1.cpp:52-61): 144 bits -> 192, inserting
    a 0 wherever (i-1) % 4 == 0."""
    idx = np.zeros(192, dtype=np.int32)
    mask = np.zeros(192, dtype=bool)
    pos = 0
    for i in range(192):
        if (i - 1) % 4 != 0:
            idx[i] = pos
            mask[i] = True
            pos += 1
    return idx, mask


def depuncture(bits: np.ndarray, table: tuple[np.ndarray, np.ndarray]):
    """Inflate [..., N] bits to the padded length using (idx, mask)."""
    idx, mask = table
    return np.where(mask, np.asarray(bits)[..., idx], 0)
