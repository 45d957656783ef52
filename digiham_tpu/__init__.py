"""digiham_tpu — TPU-native digital-voice decoding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jketterl/digiham: DMR, YSF, D-Star, NXDN and POCSAG decoding from
FM-demodulated sample streams, including the DSP front end (RRC filtering,
2FSK/4FSK demodulation), all FEC primitives, protocol state machines with
metadata extraction, a codecserver voice bridge, and audio post-filtering —
batched over many channels and shardable over TPU meshes.
"""

__version__ = "0.1.0"
