"""Floor-subtracted trellis A/B: Pallas Viterbi kernel vs the XLA scan.

VERDICT round-2 item 5: the +13%/+28% YSF/NXDN trellis-cost bounds that
justified deferring a Viterbi kernel predate the serialized-dispatch
floor discovery, so they could be mostly tunnel floor. This tool
re-derives the stage truth with the corrected methodology (bench.py):
ONE jit program runs K unrolled decodes over per-step 128-aligned
windows of one on-device base stream, returns a scalar checksum, every
checksum is fetched, and a same-unroll trivial-program floor probe is
reported and subtracted for the A/B ratio (only floor-subtracted
same-session A/Bs are meaningful on this tunnel).

Workloads mirror the production decode batches:
- ysf_fich: T=100 rate-1/2 trellis (fich interleave length), batch =
  256 channels x 3 frames/16-century block (ysf.py::decode_fich_batch)
- ysf_frame: full ysf_decode_frames on [256, 3, 480] (3 trellises +
  golay + crc per frame) — the adoption-level A/B
- nxdn_sacch: T=30, blocked_steps=4 (nxdn.py::_depunctured_viterbi)

Usage (hardware, default axon env):
    python tools/bench_trellis.py [unroll]
Prints one JSON line per (workload, impl) plus the floor probe.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from digiham_tpu.fec.viterbi import viterbi_decode
    from digiham_tpu.pipeline.ysf import ysf_decode_frames

    unroll = int(sys.argv[1]) if len(sys.argv) > 1 else \
        int(os.environ.get("BENCH_UNROLL", "64"))
    reps = int(os.environ.get("BENCH_REPS", "6"))
    seed_base = int(time.time()) % 1000000
    print(json.dumps({"backend": jax.devices()[0].platform,
                      "unroll": unroll}), flush=True)

    def timed(step_k):
        for w in range(2):
            float(step_k(seed_base + 900000 + w))
        t0 = time.perf_counter()
        cks = [step_k(seed_base + r + 1) for r in range(reps)]
        checks = [float(c) for c in cks]
        wall = time.perf_counter() - t0
        assert len(set(checks)) > 1 or reps == 1, "stale-result cache"
        return wall / (reps * unroll)

    @jax.jit
    def floor_k(seed):
        acc = jnp.float32(0)
        base = jax.random.normal(jax.random.key(seed), (8, 256))
        for k in range(unroll):
            acc = acc + (base * (k + 1)).sum()
        return acc

    floor = timed(floor_k)
    print(json.dumps({"metric": "dispatch_floor_per_step",
                      "value": round(floor, 6), "unit": "s"}), flush=True)

    def bench_viterbi(name, B, T, blocked, impl):
        # base dibit stream [B, T + 128*(unroll-1)]; per-step 128-aligned
        # windows keep inputs distinct with zero realignment copies
        stride = 128

        @jax.jit
        def step_k(seed):
            base = jax.random.randint(
                jax.random.key(seed), (B, T + stride * (unroll - 1)),
                0, 4, jnp.int32)
            base = jax.lax.optimization_barrier(base)
            acc = jnp.int32(0)
            for k in range(unroll):
                obs = jax.lax.slice_in_dim(base, k * stride,
                                           k * stride + T, axis=1)
                bits, metric = viterbi_decode(obs, 16, blocked, impl=impl)
                acc = acc + bits.sum() + metric.sum()
            return acc

        dt = timed(step_k)
        print(json.dumps({
            "metric": f"viterbi_{name}_{impl}",
            "batch": B, "T": T, "blocked_steps": blocked,
            "per_step_seconds": round(dt, 6),
            "floor_subtracted_seconds": round(max(dt - floor, 0.0), 6),
            "ns_per_trellis_step": round(
                max(dt - floor, 0.0) / (B * T) * 1e9, 3),
        }), flush=True)
        return max(dt - floor, 0.0)

    def bench_frames(impl):
        C, F = 256, 3
        stride = 512

        @jax.jit
        def step_k(seed):
            base = jax.random.randint(
                jax.random.key(seed),
                (C, F * 480 + stride * (unroll - 1)), 0, 4, jnp.int32)
            base = jax.lax.optimization_barrier(base)
            acc = jnp.float32(0)
            for k in range(unroll):
                w = jax.lax.slice_in_dim(base, k * stride,
                                         k * stride + F * 480, axis=1)
                fields = ysf_decode_frames(
                    w.reshape(C, F, 480).astype(jnp.uint8), impl=impl)
                acc = acc + sum(jnp.sum(v.astype(jnp.float32))
                                for v in jax.tree.leaves(fields))
            return acc

        dt = timed(step_k)
        print(json.dumps({
            "metric": f"ysf_decode_frames_{impl}",
            "channels": C, "frames": F,
            "per_step_seconds": round(dt, 6),
            "floor_subtracted_seconds": round(max(dt - floor, 0.0), 6),
        }), flush=True)
        return max(dt - floor, 0.0)

    results = {}
    for name, B, T, blocked in [("ysf_fich", 768, 100, 0),
                                ("nxdn_sacch", 2048, 30, 4)]:
        for impl in ("xla", "pallas"):
            results[(name, impl)] = bench_viterbi(name, B, T, blocked,
                                                  impl)
    for impl in ("xla", "auto"):
        results[("frames", impl)] = bench_frames(impl)
    for name in ("ysf_fich", "nxdn_sacch"):
        x, p = results[(name, "xla")], results[(name, "pallas")]
        if p > 0:
            print(json.dumps({"metric": f"{name}_speedup_pallas_vs_xla",
                              "value": round(x / p, 2)}), flush=True)
    fx, fa = results[("frames", "xla")], results[("frames", "auto")]
    if fa > 0:
        print(json.dumps({"metric": "ysf_frames_speedup_auto_vs_xla",
                          "value": round(fx / fa, 2)}), flush=True)


if __name__ == "__main__":
    main()
