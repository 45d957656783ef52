#!/bin/bash
# D-Star decoding pipeline (cf. reference examples/dstar-decoder.sh):
# GMSK bit stream, no RRC stage.
set -euo pipefail
METAFIFO="${METAFIFO:-/tmp/dstar-meta.fifo}"
[ -p "$METAFIFO" ] || mkfifo "$METAFIFO"

fsk_demodulator -s 10 \
  | dstar_decoder -f "$METAFIFO" \
  | mbe_synthesizer --dstar \
  | digitalvoice_filter \
  | play -q -r 8000 -t raw -e signed -b 16 -c 1 -
