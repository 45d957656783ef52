"""Pallas kernel tests (interpret mode on the CPU backend)."""
import numpy as np
import pytest

import jax.numpy as jnp

from digiham_tpu.ops import pallas_fir_available, rrc_filter_block_pallas
from digiham_tpu.dsp.rrc import NARROW_RRC, WIDE_RRC, RrcState, \
    rrc_filter_block

pytestmark = pytest.mark.skipif(not pallas_fir_available(),
                                reason="pallas unavailable")


@pytest.mark.parametrize("design", [WIDE_RRC, NARROW_RRC])
def test_matches_conv_path(design):
    rng = np.random.default_rng(0)
    C, T = 8, 700
    x = jnp.asarray(rng.normal(0, 1, (C, T)).astype(np.float32))
    hist = jnp.asarray(rng.normal(0, 1, (C, design.ntaps - 1))
                       .astype(np.float32))
    y_p, h_p = rrc_filter_block_pallas(x, hist, design.scaled_taps,
                                       interpret=True)
    y_c, st = rrc_filter_block(x, RrcState(hist), design)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_c), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(h_p), np.asarray(st.history))


@pytest.mark.parametrize("design", [WIDE_RRC, NARROW_RRC])
@pytest.mark.parametrize("T", [700, 513, 4096])
def test_matmul_fir_matches_conv(design, T):
    """The banded-matmul MXU formulation (TPU default) stays within the
    f32 envelope of the conv path and carries the identical state."""
    from digiham_tpu.dsp.rrc import _rrc_filter_block_matmul

    rng = np.random.default_rng(5)
    C = 8
    x = jnp.asarray(rng.normal(0, 100, (C, T)).astype(np.float32))
    hist = jnp.asarray(rng.normal(0, 100, (C, design.ntaps - 1))
                       .astype(np.float32))
    y_m, st_m = _rrc_filter_block_matmul(x, RrcState(hist), design)
    y_c, st_c = rrc_filter_block(x, RrcState(hist), design, impl="xla")
    scale = float(jnp.max(jnp.abs(y_c)))
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_c),
                               atol=2e-5 * scale)
    np.testing.assert_array_equal(np.asarray(st_m.history),
                                  np.asarray(st_c.history))


def test_matmul_fir_custom_design():
    """The banded matrix must key on the actual taps, not the design
    name — a custom RrcDesign (even one reusing a stock name) gets its
    own matrix."""
    from digiham_tpu.dsp.rrc import RrcDesign, _rrc_filter_block_matmul

    rng = np.random.default_rng(9)
    custom = RrcDesign("wide", 1.0, tuple(
        rng.normal(0, 0.3, 31).astype(np.float64)))
    C, T = 4, 400
    x = jnp.asarray(rng.normal(0, 10, (C, T)).astype(np.float32))
    hist = jnp.zeros((C, custom.ntaps - 1), jnp.float32)
    y_m, _ = _rrc_filter_block_matmul(x, RrcState(hist), custom)
    y_c, _ = rrc_filter_block(x, RrcState(hist), custom, impl="xla")
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_c),
                               atol=1e-4)


def test_non_multiple_block():
    """T not a multiple of the tile size exercises the padding path."""
    rng = np.random.default_rng(1)
    C, T = 4, 513
    x = jnp.asarray(rng.normal(0, 1, (C, T)).astype(np.float32))
    hist = jnp.zeros((C, WIDE_RRC.ntaps - 1), jnp.float32)
    y_p, _ = rrc_filter_block_pallas(x, hist, WIDE_RRC.scaled_taps,
                                     interpret=True)
    y_c, _ = rrc_filter_block(x, RrcState(hist), WIDE_RRC)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_c), atol=1e-5)
