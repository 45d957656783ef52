from .fir import pallas_fir, pallas_fir_available, rrc_filter_block_pallas
