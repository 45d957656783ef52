#!/bin/bash
# YSF decoding pipeline (cf. reference examples/ysf-decoder.sh).
set -euo pipefail
METAFIFO="${METAFIFO:-/tmp/ysf-meta.fifo}"
[ -p "$METAFIFO" ] || mkfifo "$METAFIFO"

rrc_filter \
  | gfsk_demodulator \
  | ysf_decoder -f "$METAFIFO" \
  | mbe_synthesizer --yaesu \
  | digitalvoice_filter \
  | play -q -r 8000 -t raw -e signed -b 16 -c 1 -
