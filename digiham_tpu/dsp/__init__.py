from .rrc import WIDE_RRC, NARROW_RRC, RrcState, rrc_filter, rrc_filter_block
from .demod import (
    DemodState,
    demod_init,
    fsk_demod_block,
    gfsk_demod_block,
    FskDemodNp,
    GfskDemodNp,
)
from .audio import DigitalVoiceState, digitalvoice_filter, DigitalVoiceFilterNp
from .fm import fm_discriminator, dc_block, DcBlockState
