"""DMR burst synthesizer for tests: builds 144-dibit frames with valid
CACH/TACT, sync patterns, SlotType+BPTC data bursts, and voice superframes
with embedded LC — the TX inverse of the decoder under test."""
import numpy as np

from digiham_tpu.fec import bptc
from digiham_tpu.fec.codes import (
    GOLAY_20_8, HAMMING_7_4, HAMMING_16_11, QR_16_7,
)
from digiham_tpu.protocols.dmr.phases import (
    BS_DATA_SYNC, BS_VOICE_SYNC, CACH_SIZE, FRAME_SIZE,
    MS_DATA_SYNC, MS_VOICE_SYNC, SYNC_OFFSET, SYNC_SIZE,
)
from digiham_tpu.protocols.dmr.components import (
    TACT_POSITIONS, LCSS_START, LCSS_STOP, LCSS_CONTINUATION,
)


def make_cach(slot: int, busy: int = 0, lcss: int = 0) -> np.ndarray:
    """12 CACH dibits with a valid Hamming(7,4) TACT."""
    data4 = (busy << 3) | (slot << 2) | lcss
    tact7 = int(HAMMING_7_4.encode(data4))
    bits = np.zeros(24, dtype=np.uint8)
    for i, pos in enumerate(TACT_POSITIONS):
        bits[pos] = (tact7 >> (6 - i)) & 1
    dibits = (bits[0::2] << 1) | bits[1::2]
    return dibits.astype(np.uint8)


def make_lc_bytes(opcode: int, payload7: bytes = b"\x00" * 7,
                  fid: int = 0) -> bytes:
    """9-byte LC. For group/unit calls, payload7 = 1 pad + target3 + src3."""
    return bytes([opcode & 0x3F, fid]) + payload7


def group_lc(target: int, source: int, opcode: int = 0) -> bytes:
    return make_lc_bytes(opcode, bytes([
        0,
        (target >> 16) & 0xFF, (target >> 8) & 0xFF, target & 0xFF,
        (source >> 16) & 0xFF, (source >> 8) & 0xFF, source & 0xFF,
    ]))


def data_frame(slot: int, data_type: int, lc9: bytes,
               sync=BS_DATA_SYNC) -> np.ndarray:
    """Data burst: CACH + BPTC(196,96) payload + SlotType + data sync."""
    frame = np.zeros(FRAME_SIZE, dtype=np.uint8)
    frame[:CACH_SIZE] = make_cach(slot)
    frame[SYNC_OFFSET:SYNC_OFFSET + SYNC_SIZE] = sync
    # slot type: color code 1
    word20 = int(GOLAY_20_8.encode((1 << 4) | data_type))
    st_dibits = [(word20 >> (18 - 2 * i)) & 3 for i in range(10)]
    frame[SYNC_OFFSET - 5:SYNC_OFFSET] = st_dibits[:5]
    frame[SYNC_OFFSET + SYNC_SIZE:SYNC_OFFSET + SYNC_SIZE + 5] = st_dibits[5:]
    # BPTC payload from 96 data bits: LC 9 + masked RS(12,9) parity
    # (ETSI B.3.6 — spec-true TX; the reference RX ignores the parity,
    # ours checks it only under DIGIHAM_DMR_RS129=1)
    from digiham_tpu.fec import rs129
    mask = {1: rs129.MASK_VOICE_LC_HEADER,
            2: rs129.MASK_TERMINATOR_WITH_LC}.get(data_type, 0)
    parity = bytes(b ^ mask for b in rs129.encode(lc9))
    data_bits = np.unpackbits(np.frombuffer(lc9 + parity, np.uint8))
    bits196 = bptc.encode(data_bits.astype(np.int64))
    dibits98 = ((bits196[0::2] << 1) | bits196[1::2]).astype(np.uint8)
    frame[CACH_SIZE:CACH_SIZE + 49] = dibits98[:49]
    frame[CACH_SIZE + 54 + SYNC_SIZE + 5:
          CACH_SIZE + 54 + SYNC_SIZE + 5 + 49] = dibits98[49:]
    return frame


def voice_frame(slot: int, payload108=None, sync=True,
                emb_fragment: bytes | None = None,
                lcss: int = LCSS_CONTINUATION, ms=False) -> np.ndarray:
    """Voice burst: CACH + 2x54-dibit voice payload + sync or EMB."""
    frame = np.zeros(FRAME_SIZE, dtype=np.uint8)
    frame[:CACH_SIZE] = make_cach(slot)
    if payload108 is None:
        payload108 = np.arange(108) % 4
    payload108 = np.asarray(payload108, dtype=np.uint8)
    frame[CACH_SIZE:CACH_SIZE + 54] = payload108[:54]
    frame[CACH_SIZE + 54 + SYNC_SIZE:] = payload108[54:]
    if sync:
        frame[SYNC_OFFSET:SYNC_OFFSET + SYNC_SIZE] = \
            MS_VOICE_SYNC if ms else BS_VOICE_SYNC
    else:
        # EMB halves + 16-dibit embedded fragment
        emb16 = int(QR_16_7.encode((1 << 3) | (0 << 2) | lcss))
        emb_dibits = [(emb16 >> (14 - 2 * i)) & 3 for i in range(8)]
        frame[SYNC_OFFSET:SYNC_OFFSET + 4] = emb_dibits[:4]
        frame[SYNC_OFFSET + 20:SYNC_OFFSET + 24] = emb_dibits[4:]
        if emb_fragment is None:
            emb_fragment = b"\x00" * 4
        for i in range(16):
            frame[SYNC_OFFSET + 4 + i] = (
                emb_fragment[i // 4] >> (6 - (i % 4) * 2)) & 3
    return frame


def embedded_fragments(lc9: bytes) -> list:
    """Encode a 9-byte LC into 4x4-byte embedded fragments (inverse of
    EmbeddedCollector.get_lc: Hamming(16,11) rows, 5-bit checksum, column
    parity, 8x16 interleave)."""
    lc = list(lc9)
    checksum = sum(lc) % 31
    # data bits 15..5 of rows 0..6 per the byte layout
    rows = [0] * 7
    rows[0] = (lc[0] << 8) | (lc[1] & 0b11100000)
    rows[1] = ((lc[1] & 0b00011111) << 11) | ((lc[2] & 0b11111100) << 3)
    rows[2] = ((lc[2] & 0b00000011) << 14) | (lc[3] << 6)
    rows[3] = (lc[4] << 8) | (lc[5] & 0b11000000)
    rows[4] = ((lc[5] & 0b00111111) << 10) | ((lc[6] & 0b11110000) << 2)
    rows[5] = ((lc[6] & 0b00001111) << 12) | ((lc[7] & 0b11111100) << 4)
    rows[6] = ((lc[7] & 0b00000011) << 14) | (lc[8] << 6)
    # checksum bit (4-i) -> bit 5 of row i+2
    for i in range(5):
        rows[i + 2] |= ((checksum >> (4 - i)) & 1) << 5
    # Hamming(16,11): parity bits 4..0 from the 11 data bits 15..5
    full = [int(HAMMING_16_11.encode(r >> 5)) for r in rows]
    parity_row = 0
    for r in full:
        parity_row ^= r
    matrix = full + [parity_row]
    # interleave: byte i bit (7-k) = bit (15-i) of matrix[k]
    data16 = bytearray(16)
    for i in range(16):
        for k in range(8):
            data16[i] |= ((matrix[k] >> (15 - i)) & 1) << (7 - k)
    return [bytes(data16[j * 4:j * 4 + 4]) for j in range(4)]


def voice_superframe(slot: int, lc9: bytes, payload108=None) -> list:
    """6 voice frames: A with sync, B-E carrying the embedded LC, F single."""
    frags = embedded_fragments(lc9)
    frames = [voice_frame(slot, payload108, sync=True)]
    lcsses = [LCSS_START, LCSS_CONTINUATION, LCSS_CONTINUATION, LCSS_STOP]
    for frag, lcss in zip(frags, lcsses):
        frames.append(voice_frame(slot, payload108, sync=False,
                                  emb_fragment=frag, lcss=lcss))
    frames.append(voice_frame(slot, payload108, sync=True))
    return frames


def interleave_slots(slot0_frames, slot1_frames) -> np.ndarray:
    """TDMA: alternate slot 0 / slot 1 bursts into one dibit stream."""
    out = []
    for a, b in zip(slot0_frames, slot1_frames):
        out.append(a)
        out.append(b)
    return np.concatenate(out)
