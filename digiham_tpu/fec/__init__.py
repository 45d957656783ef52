from .linear import BlockCode, decode, decode_np
from .codes import (
    ALL_CODES,
    BCH_31_21,
    GOLAY_20_8,
    GOLAY_24_12,
    HAMMING_7_4,
    HAMMING_13_9,
    HAMMING_15_11,
    HAMMING_16_11,
    QR_16_7,
)
