"""Stream-state checkpoint/resume.

The reference has no persistence (SURVEY.md §5): restart = re-acquire
sync. Here every device-side stage keeps its state in explicit pytrees
(RrcState, DemodState, DmrPipelineState, ...), so a whole channel bank can
be snapshotted to a flat ``.npz`` blob and resumed bit-exactly — the
device-side analogue of checkpointing a training step's optimizer state.

Host-side phase machines (protocol decoders) are plain Python objects with
small integer/bytes state; they serialize via ``pickle`` alongside.

.. warning::
   Checkpoints deserialize with :mod:`pickle`, so loading a blob is
   arbitrary code execution. Only load checkpoints you produced yourself
   (same trust domain as the process); never accept them from the network
   or other untrusted sources. This matches the threat model of the
   training-stack checkpoints this mirrors — a checkpoint is operator
   data, not user data.
"""
from __future__ import annotations

import io
import pickle

import jax
import numpy as np


def save_state(state) -> bytes:
    """Serialize any pytree-of-arrays state to bytes (npz + treedef)."""
    leaves, treedef = jax.tree.flatten(state)
    buf = io.BytesIO()
    np.savez(buf, *[np.asarray(leaf) for leaf in leaves])
    return pickle.dumps({
        "treedef": treedef,
        "npz": buf.getvalue(),
    })


def load_state(blob: bytes):
    """Inverse of save_state; arrays come back as numpy (device placement
    happens on first use)."""
    payload = pickle.loads(blob)
    npz = np.load(io.BytesIO(payload["npz"]))
    leaves = [npz[k] for k in npz.files]
    return jax.tree.unflatten(payload["treedef"], leaves)


def save_decoder(decoder) -> bytes:
    """Snapshot a host-side protocol decoder (phase machine + buffers)."""
    return pickle.dumps(decoder)


def load_decoder(blob: bytes):
    return pickle.loads(blob)
