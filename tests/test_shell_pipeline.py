"""The user-facing composition: installed CLI entry points chained with
real shell pipes (examples/dmr-decoder.sh shape), end to end."""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from dmr_synth import data_frame, group_lc, voice_frame

LEVELS = np.array([1.0, 3.0, -1.0, -3.0]) / 3.0


@pytest.mark.skipif(shutil.which("rrc_filter") is None,
                    reason="CLI entry points not installed")
def test_dmr_shell_pipe(tmp_path):
    lc = group_lc(1234, 5678)
    payload = np.tile([1, 3, 0, 2], 27)
    parts = [np.zeros(40, np.uint8)]
    parts += [data_frame(s % 2, 1, lc) for s in range(2)]
    parts += [voice_frame(s % 2, payload, sync=True) for s in range(12)]
    dibits = np.concatenate(parts)
    sig = np.concatenate([np.repeat(LEVELS[dibits], 10) * 1000,
                          np.zeros(30000)]).astype(np.float32)
    fm = tmp_path / "fm.f32"
    sig.tofile(fm)
    meta = tmp_path / "meta.txt"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        f"cat {fm} | rrc_filter | gfsk_demodulator "
        f"| dmr_decoder -f {meta}",
        shell=True, env=env, capture_output=True, timeout=500)
    assert r.returncode == 0, r.stderr[-500:]
    assert len(r.stdout) >= 8 * 27 and len(r.stdout) % 27 == 0
    events = meta.read_text()
    assert "source:5678" in events and "target:1234" in events
    assert "type:group" in events and "sync:voice" in events
