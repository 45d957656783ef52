"""SER equivalence: Pallas vs XLA demod on TPU at realistic SNRs.
Both decode the same noisy 4FSK streams; SER measured vs TX truth.

Round-2 measurement (32ch x 8 centuries x 4 reps per point):
  snr_db  ser_xla   ser_pallas  cross_path_mismatch
    6.0   0.093761  0.092087    2.1e-3
   10.0   0.025033  0.025011    1.2e-4
   14.0   0.010301  0.010324    6.8e-5
   20.0   0.013158  0.013158    4.9e-5
=> noise performance of the two paths is statistically identical; the
cross-path divergences are knife-edge ties (elevated at low SNR where
margins shrink), not a quality regression. NB ser-vs-truth uses naive
pos-0 alignment, so its absolute floor includes alignment artifacts —
the meaningful comparison is between the two columns."""
import sys, json, numpy as np, jax
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from digiham_tpu.dsp.demod import demod_init, _demod_block_xla
from digiham_tpu.ops.demod_pallas import pallas_demod_block
LEVELS = np.array([1.0, 3.0, -1.0, -3.0]) / 3.0
rng = np.random.default_rng(99)
C, n_cent, sps = 32, 8, 10
sym_amp = 1000.0
# signal power for 4FSK levels {1/3,1,-1/3,-1}*1000: E[s^2] = (1/9+1)/2 * 1e6
sig_pow = (1/9 + 1) / 2 * sym_amp**2
for snr_db in (6.0, 10.0, 14.0, 20.0):
    noise_sigma = np.sqrt(sig_pow / (10 ** (snr_db / 10)))
    tot = {"xla": 0, "pallas": 0, "cross": 0, "n": 0}
    for rep in range(4):
        tx = rng.integers(0, 4, (C, n_cent * 100 + 4))
        sig = np.repeat(LEVELS[tx], sps, axis=-1) * sym_amp
        sig = (sig + rng.normal(0, noise_sigma, sig.shape)).astype(np.float32)
        x = jax.numpy.asarray(sig)
        st = demod_init(C)
        a, _ = _demod_block_xla(x, st, n_cent, sps, "gfsk", False)
        b, _ = pallas_demod_block(x, st, n_cent, sps, mode="gfsk", tile=32)
        a, b = np.asarray(a), np.asarray(b)
        # skip the AGC warmup century; align truth (symbol 0 at pos 0)
        truth = tx[:, :a.shape[1]]
        sl = slice(100, a.shape[1])
        tot["xla"] += int((a[:, sl] != truth[:, sl]).sum())
        tot["pallas"] += int((b[:, sl] != truth[:, sl]).sum())
        tot["cross"] += int((a != b).sum())
        tot["n"] += a[:, sl].size
    print(json.dumps({
        "snr_db": snr_db,
        "ser_xla": round(tot["xla"] / tot["n"], 6),
        "ser_pallas": round(tot["pallas"] / tot["n"], 6),
        "cross_path_mismatch_rate": round(tot["cross"] / (tot["n"] + C*4*100), 8),
    }), flush=True)
