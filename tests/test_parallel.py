"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from digiham_tpu.dsp.rrc import WIDE_RRC, RrcState, rrc_filter_block
from digiham_tpu.parallel import (
    make_mesh,
    sharded_pipeline_step,
    sharded_rrc_filter,
)


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return devs


class TestShardedRrc:
    def test_matches_single_device(self, devices):
        """Time-sharded overlap-save output == unsharded streaming run."""
        mesh = make_mesh(n_channel_shards=2, n_time_shards=4)
        rng = np.random.default_rng(0)
        C, T = 4, 4 * 512
        x = rng.normal(0, 1, (C, T)).astype(np.float32)
        want, _ = rrc_filter_block(
            jnp.asarray(x), RrcState.init(C, WIDE_RRC), WIDE_RRC)
        got = sharded_rrc_filter(mesh, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_shard_count_invariance(self, devices):
        """Same bits whether split 2 ways or 4 ways on the time axis."""
        rng = np.random.default_rng(1)
        C, T = 2, 2048
        x = jnp.asarray(rng.normal(0, 1, (C, T)).astype(np.float32))
        a = sharded_rrc_filter(make_mesh(2, 2), x)
        b = sharded_rrc_filter(make_mesh(2, 4), x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestShardedPipeline:
    def test_full_step_compiles_and_runs(self, devices):
        mesh = make_mesh(n_channel_shards=4, n_time_shards=2)
        sps, n_cent = 10, 2
        t_local = n_cent * (100 * sps + 1) + 4
        C, T = 8, 2 * t_local
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 100, (C, T)).astype(np.float32))
        voice, hits = sharded_pipeline_step(mesh, x, sps, n_cent)
        assert voice.shape[0] == C
        assert voice.shape[-1] == 27
        assert hits.shape == (C,)
