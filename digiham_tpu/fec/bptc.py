"""DMR BPTC(196,96) product code (ETSI B.1.1).

Reference behavior (src/dmr_decoder/bptc_196_96.c): de-interleave with
``source = i*181 % 196``, skip the leading R(3) pad bit, decode 15 columns
as Hamming(13,9) then 9 rows as Hamming(15,11), and extract 96 data bits
(row 0 contributes 8 bits — its top 3 are reserved; rows 1-8 contribute 11).
Everything here is gathers + the batched block-code decoders, fully
vectorized over leading dims.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import interleave
from .codes import HAMMING_13_9, HAMMING_15_11
from .linear import decode as _decode, decode_np as _decode_np


@functools.lru_cache(maxsize=None)
def _column_gather() -> np.ndarray:
    """[15, 13] indices into the de-interleaved 196-bit vector: column i,
    element k = bit k*15 + i + 1 (MSB of the 13-bit column word first)."""
    idx = np.zeros((15, 13), dtype=np.int32)
    for i in range(15):
        for k in range(13):
            idx[i, k] = k * 15 + i + 1
    return idx


@functools.lru_cache(maxsize=None)
def _data_bit_gather() -> np.ndarray:
    """[96] (row, bitpos) pairs flattened: which (row r, bit position) holds
    each of the 96 data bits. Row word bit positions count from MSB=14.
    Data = row0 bits 11..4, rows 1..8 bits 14..4."""
    pairs = []
    for pos in range(11, 3, -1):
        pairs.append((0, pos))
    for r in range(1, 9):
        for pos in range(14, 3, -1):
            pairs.append((r, pos))
    return np.asarray(pairs, dtype=np.int32)


def decode(bits196: jnp.ndarray):
    """bits196: [..., 196] 0/1 -> (data_bits [..., 96] int32, ok [...] bool)."""
    x = bits196[..., jnp.asarray(interleave.bptc_196())]
    cols_bits = x[..., jnp.asarray(_column_gather())]  # [..., 15, 13]
    weights13 = jnp.asarray([1 << (12 - k) for k in range(13)], dtype=jnp.int32)
    col_words = jnp.sum(cols_bits.astype(jnp.int32) * weights13, axis=-1)
    col_corr, col_ok = _decode(HAMMING_13_9, col_words)
    ok = jnp.all(col_ok, axis=-1)

    # rebuild rows 0..8 from corrected columns: row i bit (14-k) = column k
    # word bit (12-i)
    row_idx = jnp.arange(9)
    col_bits = (col_corr[..., None, :] >> (12 - row_idx[:, None])) & 1  # [...,9,15]
    weights15 = jnp.asarray([1 << (14 - k) for k in range(15)], dtype=jnp.int32)
    row_words = jnp.sum(col_bits * weights15, axis=-1)
    row_corr, row_ok = _decode(HAMMING_15_11, row_words)
    ok = ok & jnp.all(row_ok, axis=-1)

    gb = _data_bit_gather()
    data_bits = (row_corr[..., gb[:, 0]] >> gb[:, 1]) & 1
    return data_bits, ok


def decode_np(bits196: np.ndarray):
    """Host-side numpy variant."""
    bits196 = np.asarray(bits196, dtype=np.int64)
    x = bits196[..., interleave.bptc_196()]
    cols_bits = x[..., _column_gather()]
    weights13 = np.array([1 << (12 - k) for k in range(13)], dtype=np.int64)
    col_words = (cols_bits * weights13).sum(-1)
    col_corr, col_ok = _decode_np(HAMMING_13_9, col_words)
    ok = col_ok.all(-1)
    row_idx = np.arange(9)
    col_bits = (col_corr[..., None, :] >> (12 - row_idx[:, None])) & 1
    weights15 = np.array([1 << (14 - k) for k in range(15)], dtype=np.int64)
    row_words = (col_bits * weights15).sum(-1)
    row_corr, row_ok = _decode_np(HAMMING_15_11, row_words)
    ok = ok & row_ok.all(-1)
    gb = _data_bit_gather()
    data_bits = (row_corr[..., gb[:, 0]] >> gb[:, 1]) & 1
    return data_bits, ok


def encode(data_bits: np.ndarray) -> np.ndarray:
    """TX/test path: [..., 96] data bits -> [..., 196] interleaved bits."""
    data_bits = np.asarray(data_bits, dtype=np.int64)
    shape = data_bits.shape[:-1]
    rows = np.zeros(shape + (13, 15), dtype=np.int64)

    # place data bits into rows 0..8 (row 0 top 3 bits reserved = 0)
    gb = _data_bit_gather()
    row_words = np.zeros(shape + (9,), dtype=np.int64)
    for b in range(96):
        r, pos = gb[b]
        row_words[..., r] |= data_bits[..., b] << pos
    # row FEC: fill bits 3..0 of each row via Hamming(15,11) encode of the
    # 11 data bits (word >> 4)
    enc_rows = HAMMING_15_11.encode(row_words >> 4)
    # column FEC: build 15 columns of 9 bits, extend to 13 via Hamming(13,9)
    col_words = np.zeros(shape + (15,), dtype=np.int64)
    for i in range(15):
        col9 = np.zeros(shape, dtype=np.int64)
        for r in range(9):
            col9 = (col9 << 1) | ((enc_rows[..., r] >> (14 - i)) & 1)
        col_words[..., i] = HAMMING_13_9.encode(col9)
    # assemble 196-bit de-interleaved vector: bit 0 = R(3) pad = 0,
    # bit k*15+i+1 = column i word bit (12-k)
    flat = np.zeros(shape + (196,), dtype=np.int64)
    for i in range(15):
        for k in range(13):
            flat[..., k * 15 + i + 1] = (col_words[..., i] >> (12 - k)) & 1
    # interleave: transmitted[source_index] = deinterleaved[i]
    out = np.zeros_like(flat)
    table = interleave.bptc_196()
    out[..., table] = flat
    return out
