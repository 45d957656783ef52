"""Pre-populate the persistent jit cache for the CLI tools' jax backend.

The CLI tools default to the numpy oracle backend (millisecond startup,
reference-exact); `DIGIHAM_CLI_BACKEND=jax` opts into the device path,
whose first run pays the jit compile. Running this once per machine (or
in an image build / postinstall step) compiles every standard CLI
configuration into the persistent compilation cache
(JAX_COMPILATION_CACHE_DIR, default /tmp/jax_cache — set it to a
durable path for provisioning), so the jax CLI backend starts warm.

Configurations covered (the examples/*.sh pipelines):
  rrc_filter wide + narrow, 1 channel
  gfsk_demodulator -s 10 (DMR/YSF) and -s 20 (NXDN48)
  fsk_demodulator  -s 10 (D-Star) and -s 40 -i (POCSAG)
  digitalvoice_filter

Usage: python tools/warm_cli_cache.py  [--cache DIR]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default=os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    ap.add_argument("--platform", default=None,
                    help="pin the jax platform (e.g. 'cpu'); default "
                         "uses the session backend — the cache is "
                         "platform-specific, so warm on the platform "
                         "the CLIs will run on")
    args = ap.parse_args()
    os.environ["JAX_COMPILATION_CACHE_DIR"] = args.cache

    import jax
    if args.platform:
        # config update required: the axon plugin overrides the
        # JAX_PLATFORMS env var (CLAUDE.md)
        jax.config.update("jax_platforms", args.platform)
    from digiham_tpu.cli.base import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    import jax.numpy as jnp
    from digiham_tpu.dsp.rrc import (NARROW_RRC, WIDE_RRC, RrcState,
                                     rrc_filter_block)
    from digiham_tpu.dsp.demod import (demod_init, fsk_demod_block,
                                       gfsk_demod_block)
    from digiham_tpu.dsp.audio import DigitalVoiceState, digitalvoice_filter

    t0 = time.time()
    block = jnp.zeros((1, 4096), jnp.float32)
    for design in (WIDE_RRC, NARROW_RRC):
        y, _ = rrc_filter_block(block, RrcState.init(1, design), design)
        np.asarray(y)
        print(f"rrc {design.name}: warm ({time.time() - t0:.1f}s)",
              flush=True)
    for sps in (10, 20):
        x = jnp.zeros((1, 100 * sps + 9), jnp.float32)
        d, _ = gfsk_demod_block(x, demod_init(1), 1, sps)
        np.asarray(d)
        print(f"gfsk sps={sps}: warm ({time.time() - t0:.1f}s)",
              flush=True)
    for sps, invert in ((10, False), (40, True)):
        x = jnp.zeros((1, 100 * sps + 9), jnp.float32)
        d, _ = fsk_demod_block(x, demod_init(1), 1, sps, invert)
        np.asarray(d)
        print(f"fsk sps={sps} invert={invert}: warm "
              f"({time.time() - t0:.1f}s)", flush=True)
    pcm = jnp.zeros((1, 1024), jnp.float32)
    y, _ = digitalvoice_filter(pcm, DigitalVoiceState.init(1))
    np.asarray(y)
    print(f"digitalvoice: warm ({time.time() - t0:.1f}s)", flush=True)
    print(f"cache at {args.cache} ready in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
