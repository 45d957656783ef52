"""Pre-populate the persistent jit cache for the CLI tools' jax backend.

The CLI tools default to the numpy oracle backend (millisecond startup,
reference-exact); `DIGIHAM_CLI_BACKEND=jax` opts into the device path,
whose first run pays the jit compile. Running this once per machine (or
in an image build / postinstall step) drives the ACTUAL CLI classes —
same argparse surface, same stdin chunk sizes as the real read loop —
so the compiled shapes in the persistent cache (JAX_COMPILATION_CACHE_DIR,
default /tmp/jax_cache; set a durable path when provisioning) are
exactly the ones the tools execute.

Configurations covered (the examples/*.sh pipelines):
  rrc_filter (wide) and rrc_filter -n (narrow)
  gfsk_demodulator -s 10 (DMR/YSF) and -s 20 (NXDN48)
  fsk_demodulator  -s 10 (D-Star) and -s 40 -i (POCSAG)
  digitalvoice_filter

Usage: python tools/warm_cli_cache.py [--cache DIR] [--platform cpu]
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

    import numpy as np
    from digiham_tpu.cli.base import BUF_SIZE
    from digiham_tpu.cli.tools import (DigitalVoiceFilterCli,
                                       FskDemodulatorCli,
                                       GfskDemodulatorCli, RrcFilterCli)

    configs = [
        (RrcFilterCli, []),
        (RrcFilterCli, ["--narrow"]),
        (GfskDemodulatorCli, ["-s", "10"]),
        (GfskDemodulatorCli, ["-s", "20"]),
        (FskDemodulatorCli, ["-s", "10"]),
        (FskDemodulatorCli, ["-s", "40", "--invert"]),
        (DigitalVoiceFilterCli, []),
    ]
    t0 = time.time()
    for cls, argv in configs:
        tool = cls()
        parser = argparse.ArgumentParser(prog=tool.name)
        tool.add_arguments(parser)
        ns = parser.parse_args(argv + ["--backend", "jax"])
        tool.setup(ns)
        # the real read loop delivers BUF_SIZE bytes per chunk; push two
        # chunks so block-boundary code paths compile too
        chunk = BUF_SIZE // np.dtype(tool.in_dtype).itemsize
        data = np.zeros(chunk, tool.in_dtype)
        tool.process(data)
        tool.process(data)
        print(f"{tool.name} {' '.join(argv) or '(default)'}: warm "
              f"({time.time() - t0:.1f}s)", flush=True)
    print(f"cache at {args.cache} ready in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
