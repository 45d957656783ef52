#!/bin/bash
# NXDN 4800 decoding pipeline (cf. reference examples/nxdn48-decoder.sh):
# 6.25 kHz channel -> narrow RRC, 20 samples/symbol.
set -euo pipefail
METAFIFO="${METAFIFO:-/tmp/nxdn-meta.fifo}"
[ -p "$METAFIFO" ] || mkfifo "$METAFIFO"

rrc_filter --narrow \
  | gfsk_demodulator -s 20 \
  | nxdn_decoder -f "$METAFIFO" \
  | mbe_synthesizer \
  | digitalvoice_filter \
  | play -q -r 8000 -t raw -e signed -b 16 -c 1 -
