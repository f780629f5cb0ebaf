"""Fused Pallas stereo block-matching kernel.

The XLA composition in geometry/stereo.py materializes the (H, W, D) cost
volume in HBM (D=64 disparities). This kernel keeps everything in VMEM:
each grid step owns a row tile (+ halo for the box window), sweeps the
disparity axis twice with integral-image box sums, and emits disparity +
validity directly — the cost volume never exists.

  pass 1: winner-take-all with neighbor costs (cm, c, cp) for the subpixel
          parabola, captured with a delayed-neighbor trick;
  pass 2: second-best cost excluding the +-1 neighborhood of the winner
          (the StereoBM uniqueness-ratio test needs it).

Parity target: StereoBM(numDisparities=64, blockSize=21)
(ref src/utils/CameraGeometry.cpp:81); validity semantics match
geometry/stereo.block_match (uniqueness + texture + range).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16
BIG = 1e3  # sentinel cost for invalid (out-of-range) columns


def _band(n: int, h: int) -> jax.Array:
    """(n, n) 0/1 band matrix: B[i, j] = 1 iff |i - j| <= h. Multiplying by
    it is a centered zero-padded box sum — Mosaic has no cumsum lowering,
    but banded matmuls ride the MXU natively (and faster anyway)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (jnp.abs(i - j) <= h).astype(jnp.float32)


def _box2d_banded(x: jax.Array, bv: jax.Array, bh: jax.Array) -> jax.Array:
    """Centered box sum via two banded matmuls: bv @ x @ bh."""
    vx = jax.lax.dot_general(
        bv, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.dot_general(
        vx, bh, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _make_kernel(H: int, W: int, num_disp: int, block: int, uniqueness: float,
                 texture_thresh: float):
    h = block // 2
    # Mosaic alignment rules shape the whole memory plan:
    #   - DMA row windows: start AND length multiples of 8 -> the read
    #     window starts at row0-16 (a TILE_H multiple) and spans TIN=48;
    #   - no partial lane-dim slicing of refs -> DMA into exact-width
    #     buffers; the roll-friendly 128-multiple padding happens on VALUES
    #     (concat), not refs.
    assert h <= 16
    TIN = TILE_H + 32
    # caller pads W to a multiple of 128 (manual DMA requires it)
    assert W % 128 == 0

    def kernel(left_hbm, right_hbm, disp_ref, valid_ref, lv, rv, od, ov, vol, sem):
        # grid = (B, H // TILE_H): batch-major so vmapped verification runs
        # as ONE kernel (a vmapped ANY-space pallas_call cannot lower)
        b = pl.program_id(0)
        t = pl.program_id(1)
        row0 = t * TILE_H
        src0 = jnp.clip(row0 - 16, 0, H - TIN)
        src0 = pl.multiple_of(src0, 8)
        off = pl.multiple_of(row0 - src0, 8)  # output-row start inside tile

        cp_l = pltpu.make_async_copy(
            left_hbm.at[b, pl.ds(src0, TIN), :], lv, sem.at[0]
        )
        cp_r = pltpu.make_async_copy(
            right_hbm.at[b, pl.ds(src0, TIN), :], rv, sem.at[1]
        )
        cp_l.start()
        cp_r.start()
        cp_l.wait()
        cp_r.wait()

        left = lv[:]
        right = rv[:]
        col = jax.lax.broadcasted_iota(jnp.int32, (TIN, W), 1)
        bv = _band(TIN, h)
        bh = _band(W, h)

        def cost_at(d):
            # roll(right, d) puts right[x - d] at column x; the wrapped
            # columns (x < d) have no valid counterpart and are masked
            # (dynamic lane-dim slicing is not lowerable; dynamic rotate is)
            shifted = pltpu.roll(right, d, 1)
            sad = jnp.abs(left - shifted)
            sad = jnp.where(col >= d, sad, BIG)
            return _box2d_banded(sad, bv, bh)  # (TIN, W)

        # ---- pass 1: WTA + neighbors; costs cached in VMEM so pass 2
        # reads the volume instead of recomputing 64 banded matmuls
        # (the matmuls are the kernel's whole cost — this halves it) ----
        def body1(d, carry):
            best, best_d, cm, cp, prev = carry
            c = cost_at(d)
            vol[pl.ds(d, 1)] = c[None]
            # capture cp for a winner found at d-1
            cp = jnp.where(best_d == d - 1, c, cp)
            better = c < best
            cm = jnp.where(better, prev, cm)
            best_d = jnp.where(better, d, best_d)
            best = jnp.where(better, c, best)
            return best, best_d, cm, cp, c

        init = (
            jnp.full((TIN, W), jnp.inf, jnp.float32),
            jnp.full((TIN, W), -1, jnp.int32),
            jnp.full((TIN, W), BIG * block * block, jnp.float32),
            jnp.full((TIN, W), BIG * block * block, jnp.float32),
            jnp.full((TIN, W), BIG * block * block, jnp.float32),
        )
        best, best_d, cm, cp, _ = jax.lax.fori_loop(0, num_disp, body1, init)

        # ---- pass 2: second best outside +-1 of the winner ----
        def body2(d, second):
            c = vol[pl.ds(d, 1)][0]
            far = jnp.abs(best_d - d) > 1
            return jnp.where(far & (c < second), c, second)

        second = jax.lax.fori_loop(
            0, num_disp, body2, jnp.full((TIN, W), jnp.inf, jnp.float32)
        )

        # subpixel parabola (clamped interior winners only)
        denom = jnp.maximum(cm - 2.0 * best + cp, 1e-6)
        delta = jnp.clip(0.5 * (cm - cp) / denom, -1.0, 1.0)
        disp = best_d.astype(jnp.float32) + delta

        unique_ok = best < uniqueness * second
        gx = left - pltpu.roll(left, 1, 1)
        tex = _box2d_banded(jnp.abs(gx), bv, bh)
        tex_ok = tex > texture_thresh
        range_ok = (best_d > 0) & (best_d < num_disp - 1) & (col >= num_disp)
        valid = unique_ok & tex_ok & range_ok

        # Mosaic lowers dynamic slicing of REFS but not of values — stage
        # the full tile in scratch (static lane slice to W on the value),
        # then read the 8-aligned output row window back out.
        od[:] = disp
        ov[:] = valid.astype(jnp.float32)
        disp_ref[:] = od[pl.ds(off, TILE_H), :][None]
        valid_ref[:] = ov[pl.ds(off, TILE_H), :][None].astype(jnp.int32)

    return kernel, TIN


def _block_match_batched(
    left: jax.Array,  # (B, H, W) float32 rectified, H % TILE_H == 0
    right: jax.Array,
    num_disp: int,
    block: int,
    uniqueness: float,
    texture_thresh: float,
):
    B, H, W0 = left.shape
    assert H % TILE_H == 0, f"H={H} must be a multiple of {TILE_H}"
    # pad width to the lane multiple (manual DMA alignment); pad columns
    # carry zeros and are invalidated below
    W = ((W0 + 127) // 128) * 128
    if W != W0:
        pad = ((0, 0), (0, 0), (0, W - W0))
        left = jnp.pad(left, pad)
        right = jnp.pad(right, pad)
    kernel, TIN = _make_kernel(H, W, num_disp, block, uniqueness, texture_thresh)
    assert H % 16 == 0 and H >= TIN
    grid = (B, H // TILE_H)
    interpret = jax.default_backend() == "cpu"

    disp, valid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, W), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, W), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TIN, W), jnp.float32),
            pltpu.VMEM((TIN, W), jnp.float32),
            pltpu.VMEM((TIN, W), jnp.float32),
            pltpu.VMEM((TIN, W), jnp.float32),
            # cached cost volume for pass 2 (~4.7 MB at 64x48x384 f32 —
            # comfortably inside the ~16 MB VMEM budget)
            pltpu.VMEM((num_disp, TIN, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_disp * B * H * W * 8,
            bytes_accessed=B * H * W * 4 * 4,
            transcendentals=0,
        ),
    )(left.astype(jnp.float32), right.astype(jnp.float32))
    return disp[:, :, :W0], valid[:, :, :W0].astype(bool)


@functools.lru_cache(maxsize=None)
def _block_match_vmappable(num_disp, block, uniqueness, texture_thresh):
    """custom_vmap wrapper: vmapping this function dispatches to the
    batch-grid kernel instead of (unlowerable) per-example pallas calls."""

    @jax.custom_batching.custom_vmap
    def bm(left, right):
        d, v = _block_match_batched(
            left[None], right[None], num_disp, block, uniqueness, texture_thresh
        )
        return d[0], v[0]

    @bm.def_vmap
    def _rule(axis_size, in_batched, left, right):
        lb, rb = in_batched
        if not lb:
            left = jnp.broadcast_to(left, (axis_size,) + left.shape)
        if not rb:
            right = jnp.broadcast_to(right, (axis_size,) + right.shape)
        out = _block_match_batched(
            left, right, num_disp, block, uniqueness, texture_thresh
        )
        return out, (True, True)

    return bm


def block_match_pallas(
    left: jax.Array,  # (H, W) or (B, H, W) float32 rectified, H % TILE_H == 0
    right: jax.Array,
    num_disp: int = 64,
    block: int = 21,
    uniqueness: float = 0.85,
    texture_thresh: float = 0.5,
):
    fn = _block_match_vmappable(num_disp, block, uniqueness, texture_thresh)
    if left.ndim == 3:
        return _block_match_batched(
            left, right, num_disp, block, uniqueness, texture_thresh
        )
    return fn(left, right)
