"""Streaming time-parallelism with an EXACT cross-shard carry chain.

``sharded_pipeline_step`` (sharded.py) is bulk mode: each time shard
demodulates from a fresh state, fine for recorded archives but not
bit-exact for a continuous stream. This module is the streaming mode the
SURVEY §5 long-context mapping calls for: the demodulator's O(1) carry
(pos / pending slew / volume ring — fsk_demodulator.cpp:37,84-87) threads
through the time shards over ICI, so a time-sharded stream decodes
byte-identically to the single-device ``DmrPipeline.step`` chain.

How the axes parallelize — and what provably cannot:

- **RRC FIR** (81 MACs/sample — the bulk of per-sample FLOPs): fully
  time-parallel via overlap-save; each shard pulls its left raw halo from
  its neighbor with one ``ppermute`` (``taps-1`` + drift-budget samples).
- **Sync correlation + frame-field FEC decode**: fully time-parallel on
  the decoded dibit segments (a 23-dibit right halo covers windows that
  straddle shard boundaries).
- **The demod carry itself is a true sequential dependency**: symbol
  ``n``'s sample window position depends on every ±1 timing slew before
  it (the cumulative sum of data-dependent offsets), so no schedule can
  compute shard ``t+1``'s symbols before shard ``t``'s carry exists —
  the reference's own feedback loop (fsk_demodulator.cpp:36-78) forbids
  time-parallel demodulation with bit-exactness. The step therefore runs
  the demod as a **ppermute ring pipeline**: a ``fori_loop`` of
  ``n_time`` rounds in which the carry hops shard ``i -> i+1`` as soon
  as shard ``i``'s segment is demodulated, each shard starting its
  segment the moment the boundary carry lands. Demod wall-clock equals
  the single-device scan (Amdahl's sequential term); everything around
  it gets the ``n_time``-way speedup. The final hop ``T-1 -> 0`` lands
  the stream carry where the *next* step's first segment needs it — the
  software pipelining across successive steps.

Semantics contract (tested in tests/test_streaming_shards.py): for any
number of time shards and any number of consecutive steps, ``dibits``,
``sync_dist_dense`` (valid region) and every decoded frame field are
byte-identical to the single-device ``DmrPipeline.step`` stream.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..dsp.demod import CENTURY, DemodState, demod_init, gfsk_demod_block
from ..dsp.rrc import WIDE_RRC, RrcState, rrc_filter_block
from ..pipeline.dmr import dmr_decode_frames, dmr_sync_correlate
from ..protocols.dmr.phases import FRAME_SIZE, SYNC_SIZE


def _fields_structure():
    """Output ranks of dmr_decode_frames for building out_specs."""
    probe = jax.eval_shape(
        dmr_decode_frames,
        jax.ShapeDtypeStruct((1, 1, FRAME_SIZE), jnp.uint8))
    return {k: v.ndim for k, v in probe.items()}


def _ct_spec(ndim: int) -> P:
    """Leading (channel, time-concat) axes, trailing replicated."""
    return P(*(("channel", "time") + (None,) * (ndim - 2)))


class TimeShardedDmrPipeline:
    """(channel, time)-sharded streaming DMR pipeline step.

    Differences from the single-device ``DmrPipeline``:

    - fixed-stride consumption: every step consumes exactly
      ``block_len = n_time * centuries_per_shard * 100 * sps`` samples
      per channel; the per-channel ±1/century timing drift accumulates in
      the carried ``pos`` instead of the block size. ``drift_budget``
      bounds |pos| (halo headroom); the driver asserts it.
    - the caller supplies ``edges``: the ``h_left`` raw samples before
      the block and ``h_right`` after it (the stream driver keeps the
      tail / waits for the lookahead).

    ``centuries_per_shard`` must keep segments frame-aligned
    (``centuries_per_shard * 100 % 144 == 0`` — multiples of 36) so each
    shard's frame decode matches the single-device frame slicing.
    """

    def __init__(self, mesh: Mesh, channels: int, sps: int = 10,
                 centuries_per_shard: int = 36, use_rrc: bool = True,
                 drift_budget: int = 24):
        if "time" not in mesh.axis_names or "channel" not in mesh.axis_names:
            raise ValueError("mesh needs ('channel', 'time') axes")
        self.mesh = mesh
        self.n_time = mesh.shape["time"]
        self.channels = channels
        self.sps = sps
        self.centuries_per_shard = centuries_per_shard
        self.use_rrc = use_rrc
        self.drift_budget = drift_budget
        self.seg_symbols = centuries_per_shard * CENTURY
        if self.seg_symbols % FRAME_SIZE:
            raise ValueError(
                f"centuries_per_shard={centuries_per_shard} leaves segments "
                f"frame-misaligned ({self.seg_symbols} % {FRAME_SIZE} != 0);"
                " use a multiple of 36")
        self.seg_len = self.seg_symbols * sps
        self.block_len = self.n_time * self.seg_len
        self.symbols_per_block = self.n_time * self.seg_symbols
        nt1 = WIDE_RRC.ntaps - 1 if use_rrc else 0
        self.h_left = nt1 + drift_budget
        self.h_right = drift_budget + centuries_per_shard + 2
        self._step = self._build()

    def init_state(self) -> DemodState:
        return demod_init(self.channels)

    # ------------------------------------------------------------------
    def _build(self):
        sps = self.sps
        n_cent = self.centuries_per_shard
        D = self.drift_budget
        HL, HR = self.h_left, self.h_right
        seg_len, seg_sym = self.seg_len, self.seg_symbols
        use_rrc = self.use_rrc
        nt1 = WIDE_RRC.ntaps - 1
        T = self.n_time

        def local(x, edges, st_in):
            # x: [C_local, seg_len] raw samples of this shard's segment
            # edges: [C_local, HL+HR] block-edge raw samples (replicated
            #   over time; only shard 0 / T-1 read their half)
            # st_in: demod carry, pos relative to segment-0 origin
            t = jax.lax.axis_index("time")
            C = x.shape[0]
            fwd = [(i, i + 1) for i in range(T - 1)]
            bwd = [(i + 1, i) for i in range(T - 1)]

            # ---- raw-sample halo exchange over ICI ----
            if T > 1:
                left = jax.lax.ppermute(x[:, -HL:], "time", fwd)
                right = jax.lax.ppermute(x[:, :HR], "time", bwd)
            else:
                left = jnp.zeros((C, HL), x.dtype)
                right = jnp.zeros((C, HR), x.dtype)
            left = jnp.where(t == 0, edges[:, :HL], left)
            right = jnp.where(t == T - 1, edges[:, HL:], right)
            xe = jnp.concatenate([left, x, right], axis=-1)

            # ---- RRC: time-parallel overlap-save (exact w/ halo) ----
            if use_rrc:
                y, _ = rrc_filter_block(
                    xe[:, nt1:], RrcState(xe[:, :nt1]), WIDE_RRC)
            else:
                y = xe
            # y[0] = filtered stream sample (segment_origin - D)

            # ---- demod: sequential ppermute ring pipeline ----
            ring = [(i, (i + 1) % T) for i in range(T)]

            def round_(i, carry):
                st, dib = carry
                # pos arrives relative to this shard's segment origin;
                # y starts D samples earlier
                st_loc = DemodState(st.pos + D, st.offset, st.volume_ring)
                d_i, st_out = gfsk_demod_block(y, st_loc, n_cent, sps)
                # rebase the carry to the NEXT segment's origin before
                # the hop (the wrap hop T-1 -> 0 then lands it already
                # rebased for the next step's first segment)
                st_out = DemodState(st_out.pos - D - seg_len,
                                    st_out.offset, st_out.volume_ring)
                dib = jnp.where(t == i, d_i, dib)
                if T > 1:
                    st_out = jax.tree.map(
                        lambda a: jax.lax.ppermute(a, "time", ring), st_out)
                return st_out, dib

            st0 = jax.tree.map(
                lambda a: jax.lax.pcast(a, "time", to="varying"), st_in)
            dib0 = jax.lax.pcast(
                jnp.zeros((C, seg_sym), jnp.uint8), ("channel", "time"),
                to="varying")
            st_fin, dibits = jax.lax.fori_loop(0, T, round_, (st0, dib0))

            # ---- sync correlation: time-parallel with a dibit halo ----
            if T > 1:
                dh = jax.lax.ppermute(
                    dibits[:, :SYNC_SIZE - 1], "time", bwd)
            else:
                dh = jnp.zeros((C, SYNC_SIZE - 1), dibits.dtype)
            dh = jnp.where(t == T - 1, jnp.zeros_like(dh), dh)
            sync_dist = dmr_sync_correlate(
                jnp.concatenate([dibits, dh], axis=-1))
            # the final shard's last 23 windows have no dibits yet:
            # mark invalid (the driver exposes only the valid region)
            win = jnp.arange(seg_sym)
            invalid = (t == T - 1) & (win > seg_sym - SYNC_SIZE)
            sync_dist = jnp.where(invalid[None, :, None], 99, sync_dist)

            # ---- frame-field decode: time-parallel ----
            frames = dibits.reshape(C, seg_sym // FRAME_SIZE, FRAME_SIZE)
            fields = dmr_decode_frames(frames)

            # carry out: one column per shard; after the wrap hop the true
            # stream carry sits on shard 0 — the host reads column 0
            st_cols = jax.tree.map(
                lambda a: a[:, None] if a.ndim == 1 else a[:, None, :],
                st_fin)
            return {"dibits": dibits, "sync_dist_dense": sync_dist,
                    **fields}, st_cols

        field_ndims = _fields_structure()
        out_specs = (
            {"dibits": _ct_spec(2), "sync_dist_dense": _ct_spec(3),
             **{k: _ct_spec(nd) for k, nd in field_ndims.items()}},
            DemodState(pos=_ct_spec(2), offset=_ct_spec(2),
                       volume_ring=_ct_spec(3)),
        )
        in_specs = (
            P("channel", "time"),
            P("channel", None),
            DemodState(pos=P("channel"), offset=P("channel"),
                       volume_ring=P("channel", None)),
        )
        f = jax.shard_map(local, mesh=self.mesh,
                          in_specs=in_specs, out_specs=out_specs,
                          check_vma=False)  # pallas in shard_map
        return jax.jit(f)

    # ------------------------------------------------------------------
    def step(self, body: jnp.ndarray, edges: jnp.ndarray,
             state: DemodState):
        """body: [C, block_len] raw samples; edges: [C, h_left+h_right]
        (the h_left raw samples before the block + h_right after).
        state: demod carry, pos relative to the block origin.

        Returns (outputs, new_state) where outputs mirrors
        ``DmrPipeline.step`` (dibits [C, S], sync_dist_dense [C, S, 4]
        with the final 23 columns invalid, frame fields [C, S/144, ...])
        and new_state.pos is already relative to the NEXT block origin.
        """
        out, st_cols = self._step(body, edges, state)
        new_state = jax.tree.map(lambda a: a[:, 0], st_cols)
        return out, new_state


class TimeShardedDmrStream:
    """Host driver for :class:`TimeShardedDmrPipeline`.

    Mirrors ``StreamDriver``/bank feeding but with the fixed-stride
    contract: keeps the raw left-edge tail, waits for ``h_right``
    lookahead samples, consumes exactly ``block_len`` per step, and
    asserts the carried drift stays inside the halo budget.
    """

    def __init__(self, pipeline: TimeShardedDmrPipeline):
        from ..runtime.stream import SampleBuffer

        self.p = pipeline
        self.state = pipeline.init_state()
        self.buffer = SampleBuffer(pipeline.channels)
        # prime the left edge: stream start = zeros (reference delay
        # lines start zeroed)
        self.buffer.push(np.zeros((pipeline.channels, pipeline.h_left),
                                  np.float32))

    def push(self, samples: np.ndarray) -> list[dict]:
        p = self.p
        self.buffer.push(samples)
        outs = []
        need = p.h_left + p.block_len + p.h_right
        while self.buffer.fill >= need:
            view = self.buffer.view(need)
            body = jnp.asarray(view[:, p.h_left:p.h_left + p.block_len])
            edges = jnp.asarray(np.concatenate(
                [view[:, :p.h_left], view[:, p.h_left + p.block_len:]],
                axis=1))
            out, self.state = p.step(body, edges, self.state)
            pos = np.asarray(self.state.pos)
            if np.abs(pos).max() >= p.drift_budget:
                raise RuntimeError(
                    f"timing drift {pos.min()}..{pos.max()} exceeded the "
                    f"halo budget ±{p.drift_budget}; raise drift_budget "
                    "or re-acquire")
            outs.append(out)
            self.buffer.consume(p.block_len)
        return outs
