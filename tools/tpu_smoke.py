"""On-hardware smoke test: the production tracked-bank path on a REAL
TPU backend (Pallas kernels active where eligible).

Synthesizes a noisy DMR voice stream, pushes it through
TrackedChannelBank (device pipeline + host trackers), and asserts the
TX voice payload decodes on every channel. Run under the default axon
env (do NOT force cpu). Exit code 0 = PASS.

Round-2 catch: this script found the Pallas RRC lane-alignment failure
for channel counts not a multiple of 128 (dsp/rrc.py gate).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main(channels=8, noise=60.0):
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    except Exception:
        pass
    from digiham_tpu.pipeline import DmrPipeline
    from digiham_tpu.protocols.dmr.phases import pack_dibits
    from digiham_tpu.runtime.tracked_bank import TrackedChannelBank
    from dmr_synth import voice_frame

    levels = np.array([1.0, 3.0, -1.0, -3.0]) / 3.0
    rng = np.random.default_rng(42)
    payload = np.tile([1, 3, 0, 2], 27)
    frames = [voice_frame(s % 2, payload, sync=True) for s in range(12)]
    dibits = np.concatenate([np.zeros(30, np.uint8)] + frames)
    base = np.repeat(levels[dibits], 10) * 1000
    samples = np.stack(
        [base + rng.normal(0, noise, base.shape) for _ in range(channels)]
    ).astype(np.float32)

    pipe = DmrPipeline(channels=channels, sps=10, n_centuries=2)
    outputs = {c: b"" for c in range(channels)}
    bank = TrackedChannelBank(
        pipe, on_output=lambda c, d: outputs.__setitem__(c, outputs[c] + d))
    for lo in range(0, samples.shape[1], 8192):
        bank.push(samples[:, lo:lo + 8192])
    want = pack_dibits(payload)
    ok = sum(want in outputs[c] for c in range(channels))
    print("backend:", jax.devices()[0].platform)
    print(f"channels with TX payload decoded: {ok}/{channels}")
    print("TPU SMOKE:", "PASS" if ok == channels else "FAIL")
    return 0 if ok == channels else 1


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:2])))
