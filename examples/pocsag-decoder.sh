#!/bin/bash
# POCSAG pager decoding (cf. reference examples/pocsag-decoder.sh):
# 1200 Bd inverted 2FSK; messages print on stdout.
set -euo pipefail

fsk_demodulator -i -s 40 | pocsag_decoder
