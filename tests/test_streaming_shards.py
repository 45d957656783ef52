"""Time-sharded STREAMING equivalence: the ppermute carry chain.

Proves the contract VERDICT.md round-1 item 1 demands: a time-sharded
stream — multiple consecutive sharded steps — produces byte-identical
dibits / sync distances / frame fields to the single-device
``DmrPipeline`` stream (driven through ChannelBank, the production
consume/rebase path), for 2 and 4 time shards, with the demod carry
(pos / slew / volume ring) hopping shard-to-shard over ``ppermute``.
"""
import numpy as np
import pytest

import jax

from digiham_tpu.parallel import make_mesh
from digiham_tpu.parallel.streaming import (
    TimeShardedDmrPipeline,
    TimeShardedDmrStream,
)
from digiham_tpu.pipeline.dmr import DmrPipeline
from digiham_tpu.runtime.channel_bank import ChannelBank

FRAME = 144
SYNC = 24


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return devs


def _bank_reference(x, C, sps, use_rrc):
    """Single-device reference stream via the production ChannelBank
    (variable consumption keeps pos >= 0; n_centuries=36 keeps every
    block start on the global 144-symbol frame grid)."""
    bank = ChannelBank(
        DmrPipeline(channels=C, sps=sps, n_centuries=36, use_rrc=use_rrc),
        [None] * C)
    results = bank.push(x)
    dibits = np.concatenate(
        [np.asarray(r["dibits"]) for r in results], axis=1)
    fields = {}
    for k in results[0]:
        if k in ("dibits", "sync_dist_dense"):
            continue
        fields[k] = np.concatenate(
            [np.asarray(r[k]) for r in results], axis=1)
    # sync windows per block are block-local (each block misses its own
    # 23 boundary windows); keep (global_start, array) pairs
    sync = [(b * 3600, np.asarray(r["sync_dist_dense"]))
            for b, r in enumerate(results)]
    return dibits, fields, sync


def _run_and_compare(n_time, use_rrc, n_steps, seed):
    C, sps, cps = 2, 10, 36
    mesh = make_mesh(n_channel_shards=2, n_time_shards=n_time)
    sp = TimeShardedDmrPipeline(mesh, channels=C, sps=sps,
                                centuries_per_shard=cps, use_rrc=use_rrc)
    B, S = sp.block_len, sp.symbols_per_block

    rng = np.random.default_rng(seed)
    total = n_steps * B + sp.h_right + 1200
    x = rng.normal(0, 1000, (C, total)).astype(np.float32)

    driver = TimeShardedDmrStream(sp)
    outs = driver.push(x)
    assert len(outs) == n_steps
    got_dib = np.concatenate(
        [np.asarray(o["dibits"]) for o in outs], axis=1)
    got_sync = np.concatenate(
        [np.asarray(o["sync_dist_dense"]) for o in outs], axis=1)
    got_fields = {}
    for k in outs[0]:
        if k in ("dibits", "sync_dist_dense"):
            continue
        got_fields[k] = np.concatenate(
            [np.asarray(o[k]) for o in outs], axis=1)

    want_dib, want_fields, want_sync = _bank_reference(x, C, sps, use_rrc)

    n = min(got_dib.shape[1], want_dib.shape[1])
    assert n >= n_steps * S - 3600
    np.testing.assert_array_equal(got_dib[:, :n], want_dib[:, :n])

    nf = n // FRAME
    for k, want in want_fields.items():
        np.testing.assert_array_equal(
            got_fields[k][:, :nf], want[:, :nf], err_msg=f"field {k}")

    # sync windows: compare wherever both sides have a valid window.
    # sharded marks only the global tail invalid; the bank reference
    # misses the 23 boundary windows of each of its own blocks.
    for start, arr in want_sync:
        width = arr.shape[1]
        stop = min(start + width, got_sync.shape[1] - (SYNC - 1))
        if stop <= start:
            break
        np.testing.assert_array_equal(
            got_sync[:, start:stop], arr[:, :stop - start],
            err_msg=f"sync window block @{start}")


@pytest.mark.parametrize("n_time", [2, 4])
def test_streamed_time_shards_bitexact(devices, n_time):
    """Full pipeline (RRC included), 2 consecutive sharded steps."""
    _run_and_compare(n_time, use_rrc=True, n_steps=2, seed=42)


def test_streamed_time_shards_no_rrc(devices):
    """Pure carry-chain isolation: no filter stage, 4 shards, 3 steps
    (the third step exercises a carry whose pos has gone negative)."""
    _run_and_compare(4, use_rrc=False, n_steps=3, seed=7)
