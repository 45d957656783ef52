"""Many-channel decoding example: a DMR bank on one chip, production
topology — device pipeline (RRC + demod + batched frame-field decode)
feeding host trackers that do control flow only.

Usage: python examples/channel_bank.py [channels] [steps]
"""
import sys

import numpy as np

from digiham_tpu.pipeline import DmrPipeline
from digiham_tpu.runtime.metrics import REGISTRY
from digiham_tpu.runtime.tracked_bank import TrackedChannelBank

sys.path.insert(0, "tests")


def synth_bank(channels: int, n_sym: int, seed: int = 0):
    """Synthesized DMR voice for each channel (different payloads)."""
    from dmr_synth import voice_frame

    levels = np.array([1.0, 3.0, -1.0, -3.0]) / 3.0
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(channels):
        payload = rng.integers(0, 4, 108)
        frames = [voice_frame(s % 2, payload, sync=True)
                  for s in range(n_sym // 144 + 1)]
        dibits = np.concatenate(frames)[:n_sym]
        rows.append(np.repeat(levels[dibits], 10) * 1000)
    return np.stack(rows).astype(np.float32)


def main(channels: int = 32, steps: int = 8):
    pipe = DmrPipeline(channels=channels, sps=10, n_centuries=4)
    decoded = [0]
    bank = TrackedChannelBank(
        pipe, on_output=lambda c, d: decoded.__setitem__(
            0, decoded[0] + len(d)))

    n_sym = steps * 400 + 200
    samples = synth_bank(channels, n_sym)
    meter = REGISTRY.meter("dmr_tracked_bank", "samples")
    chunk = 4096
    for lo in range(0, samples.shape[1], chunk):
        block = samples[:, lo:lo + chunk]
        with meter.measure(block.size):
            bank.push(block)
    REGISTRY.report()
    print(f"decoded {decoded[0]} voice-payload bytes "
          f"({decoded[0] // 27} bursts) across {channels} channels",
          file=sys.stderr)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
