from .fir import (pallas_fir_available, pallas_fir_cmajor,
                  rrc_filter_block_pallas)
from .demod_pallas import pallas_demod_block

__all__ = [
    "pallas_fir_available",
    "pallas_fir_cmajor",
    "rrc_filter_block_pallas",
    "pallas_demod_block",
]
