"""Many-channel decoding example: a 256-channel DMR bank on one chip.

Feeds synthesized multi-channel FM audio through the fused device
pipeline and routes per-channel frame fields into host-side phase
machines for metadata. This is the production topology: device does
O(samples) batched math, host does O(frames) control logic.
"""
import numpy as np
import jax.numpy as jnp

from digiham_tpu.pipeline import DmrPipeline
from digiham_tpu.runtime.metrics import REGISTRY


def main(channels: int = 256, sps: int = 10, n_centuries: int = 8,
         steps: int = 10):
    pipe = DmrPipeline(channels=channels, sps=sps, n_centuries=n_centuries)
    state = pipe.init_state()
    L = n_centuries * (100 * sps + 1) + 8
    rng = np.random.default_rng(0)

    meter = REGISTRY.meter("dmr_bank", "samples")
    for _ in range(steps):
        # stand-in for SDR ingest: noise blocks
        samples = jnp.asarray(
            rng.normal(0, 100, (channels, L)).astype(np.float32))
        with meter.measure(channels * n_centuries * 100 * sps):
            out, state = pipe.step(samples, state)
            out["voice_payload"].block_until_ready()
        # host control plane consumes the per-frame fields here:
        # sync_type/tact_slot feed the slot trackers, voice_payload rows
        # go to the codec bridge for channels in voice state, ...
    REGISTRY.report()


if __name__ == "__main__":
    main()
