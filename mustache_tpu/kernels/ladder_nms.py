"""Fused scale-space NMS as a Pallas TPU kernel.

Replaces the XLA shear + scan stages of the detector: given the dense blur
stack ``G [S, N, N]`` this kernel computes, in one pass over row tiles, the
DoG planes, the 3x3 space/scale local-max conditions, the per-pixel best
response / log-p / scale-index state across all 18 detection planes, and
writes the result directly in a band-friendly layout.

Layout: TPU DMA requires 128-aligned lane offsets, so an exact per-row
shear (band[i, d] = dense[i, i+d]) cannot be DMA'd directly. Instead the
kernel works on the **staircase** layout

    stair[i, t] = dense[i, 128*(i // 128) + t],   t in [0, DB + 128)

whose chunk-aligned column offset makes every DMA aligned and — the key
property — makes the dense 3x3 stencil a *static* (di, dt) shift in
staircase coordinates. The XLA side converts the two small output planes
to the exact band layout with one cheap gather.

Two passes over the same tiles (the per-plane exponential fits are global
statistics needed before any update):

* pass A: per-tile partial (min, sum) of |L_j| over the support mask;
* pass B: the NMS state machine with the finalized (loc, scale) scalars.

Inputs are zero-padded by 8 rows top/bottom and ``DB + 128`` columns right
(in XLA) so halo DMAs never leave the array and out-of-matrix stencil taps
contribute exactly the maximum_filter's constant-0 padding.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWPAD = 8          # zero rows added above/below the dense arrays
SUB = 16            # interior rows per grid step
HALOROWS = 32       # rows DMA'd per step (8-aligned, covers halo +-1)


def _plane_triples(n_octaves: int, planes_per_octave: int):
    """(lp, lc, ln, plane_id) G-stack difference indices per detection
    plane: L_k = G[k] - G[k+1]; octave o detects on L[o*12+1 .. o*12+9]."""
    out = []
    plane = 0
    for o in range(n_octaves):
        base = o * 12
        for j in range(1, planes_per_octave + 1):
            out.append((base + j - 1, base + j, base + j + 1, plane))
            plane += 1
    return out


def _load_tiles(pb, base, col0, W, g_hbm, nz_hbm, gbuf, cbuf, sem):
    """DMA the step's [S, 32, W] blur rows + [32, W] support-mask rows."""
    cp = pltpu.make_async_copy(
        nz_hbm.at[pb, pl.ds(base, HALOROWS), pl.ds(col0, W)], cbuf, sem)
    cp.start()
    cp.wait()
    gp = pltpu.make_async_copy(
        g_hbm.at[pb, :, pl.ds(base, HALOROWS), pl.ds(col0, W)], gbuf, sem)
    gp.start()
    gp.wait()


def _stats_kernel(g_hbm, nz_hbm, part_ref, *, S, N, W, n_octaves,
                  planes_per_octave):
    """Pass A: per-tile (min, sum) of |L_j| over the support mask."""
    pb = pl.program_id(0)
    p0 = pl.program_id(1)
    p1 = pl.program_id(2)
    base = p0 * 128 + p1 * SUB
    col0 = p0 * 128
    triples = _plane_triples(n_octaves, planes_per_octave)
    n_planes = len(triples)

    def body(gbuf, cbuf, sem):
        _load_tiles(pb, base, col0, W, g_hbm, nz_hbm, gbuf, cbuf, sem)
        r0 = 8
        nzf = cbuf[r0:r0 + SUB, :]
        nz = nzf > 0.5

        def L(k):
            return gbuf[k, r0:r0 + SUB, :] - gbuf[k + 1, r0:r0 + SUB, :]

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        vec = jnp.zeros((8, 128), jnp.float32)
        for (lp, lc, ln, plane) in triples:
            al = jnp.abs(L(lc))
            mn = jnp.min(jnp.where(nz, al, jnp.float32(np.inf)))
            sm = jnp.sum(al * nzf)
            vec = jnp.where(lane == plane, mn, vec)
            vec = jnp.where(lane == n_planes + plane, sm, vec)
        part_ref[0, 0] = vec

    pl.run_scoped(
        body,
        gbuf=pltpu.VMEM((S, HALOROWS, W), jnp.float32),
        cbuf=pltpu.VMEM((HALOROWS, W), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
    )


def _nms_kernel(stats_ref, g_hbm, nz_hbm, logp_ref, sigidx_ref, *,
                S, N, W, n_octaves, planes_per_octave):
    """Pass B: the NMS state machine. Grid: (B, N2//128, 128//SUB)."""
    pb = pl.program_id(0)
    p0 = pl.program_id(1)
    p1 = pl.program_id(2)
    base = p0 * 128 + p1 * SUB        # first interior (unpadded) row
    col0 = p0 * 128                   # chunk-aligned dense column offset
    triples = _plane_triples(n_octaves, planes_per_octave)
    n_planes = len(triples)

    def body(gbuf, cbuf, sem):
        _load_tiles(pb, base, col0, W, g_hbm, nz_hbm, gbuf, cbuf, sem)
        r0 = 8
        nzf = cbuf[r0:r0 + SUB, :]     # dense support mask (0.0 / 1.0)
        nz = nzf > 0.5

        def L(k, lo, hi):
            return gbuf[k, lo:hi, :] - gbuf[k + 1, lo:hi, :]

        best_v = jnp.zeros((SUB, W), jnp.float32)
        best_logp = jnp.full((SUB, W), jnp.float32(np.inf))
        best_sig = jnp.full((SUB, W), -1, jnp.int32)
        for (lp, lc, ln, plane) in triples:
            # halo view [SUB+2, W]: rows r0-1 .. r0+SUB
            Lp = L(lp, r0 - 1, r0 + SUB + 1)
            Lc = L(lc, r0 - 1, r0 + SUB + 1)
            Ln = L(ln, r0 - 1, r0 + SUB + 1)

            def max3(a):
                # dense 3x3 max with constant-0 pad: in staircase coords a
                # static (di, dt) stencil. The out-of-matrix zero taps are
                # already encoded by the zero row/column padding of the
                # inputs (zero G rows/cols make L zero there); the t-edge
                # fill below only touches cells never on the support mask.
                # Lane shifts via roll+mask (Mosaic cannot concat
                # offset-mismatched vectors).
                lanes = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
                left = jnp.where(lanes == 0, 0.0, pltpu.roll(a, 1, 1))
                right = jnp.where(lanes == a.shape[1] - 1, 0.0,
                                  pltpu.roll(a, a.shape[1] - 1, 1))
                h = jnp.maximum(jnp.maximum(left, a), right)
                return jnp.maximum(jnp.maximum(h[:-2], h[1:-1]), h[2:])

            mP = max3(Lp)
            mC = max3(Lc)
            mN = max3(Ln)
            Lpi = Lp[1:-1]
            Lci = Lc[1:-1]
            Lni = Ln[1:-1]

            loc = stats_ref[0, 0, 0, plane]
            scale = stats_ref[0, 0, 1, plane]
            abs_lc = jnp.abs(Lci)
            logp = -(abs_lc - loc) / scale

            will = (nz
                    & (Lci > best_v)
                    & (Lci == mC)
                    & ((Lpi == mP) | (Lni == mN))
                    & (Lci > mP)
                    & (Lci > mN))
            best_v = jnp.where(will, Lci, best_v)
            best_logp = jnp.where(will, logp, best_logp)
            best_sig = jnp.where(will, plane, best_sig)

        logp_ref[0] = best_logp
        sigidx_ref[0] = best_sig

    pl.run_scoped(
        body,
        gbuf=pltpu.VMEM((S, HALOROWS, W), jnp.float32),
        cbuf=pltpu.VMEM((HALOROWS, W), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnames=("n_octaves", "planes_per_octave",
                                             "DB", "interpret"))
def ladder_nms_pallas_batched(G, nzf, nz_count, *, n_octaves,
                              planes_per_octave, DB, interpret=False):
    """Band best-state from the dense blur stack, via the Pallas kernel.

    G: [B, S, N, N] f32 dense blurs; nzf: [B, N, N] f32 dense support mask
    (1.0 where tested, from the PRE-sentinel maps); nz_count: [B] int32.
    Returns (band_logp [B, N, DB], band_sigidx [B, N, DB] int32) in the
    exact band layout band[b, i, d] = dense[b, i, i+d].
    """
    B, S, N, _ = G.shape
    W = DB + 128
    triples = _plane_triples(n_octaves, planes_per_octave)
    n_planes = len(triples)

    # zero-pad the block to a 128-multiple: zeros beyond the matrix edge
    # reproduce the dense maximum_filter's constant-0 padding exactly and
    # contribute no support-mask cells
    N2 = -(-N // 128) * 128
    Gp = jnp.pad(G, ((0, 0), (0, 0), (ROWPAD, ROWPAD + N2 - N),
                     (0, N2 - N + W)))
    cp = jnp.pad(nzf, ((0, 0), (ROWPAD, ROWPAD + N2 - N), (0, N2 - N + W)))

    steps = (N2 // 128) * (128 // SUB)
    grid = (B, N2 // 128, 128 // SUB)

    # pass A: per-tile stats partials
    parts = pl.pallas_call(
        functools.partial(_stats_kernel, S=S, N=N, W=W, n_octaves=n_octaves,
                          planes_per_octave=planes_per_octave),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=jax.ShapeDtypeStruct((B, steps, 8, 128), jnp.float32),
        out_specs=pl.BlockSpec(
            (1, 1, 8, 128), lambda b, i, j: (b, i * (128 // SUB) + j, 0, 0),
            memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Gp, cp)

    parts = parts[:, :, 0, :]
    locs = jnp.min(parts[:, :, :n_planes], axis=1)                  # [B, P]
    sums = jnp.sum(parts[:, :, n_planes:2 * n_planes], axis=1)      # [B, P]
    means = sums / jnp.maximum(nz_count, 1).astype(jnp.float32)[:, None]
    scales = means - locs
    stats = jnp.zeros((B, 2, 128), jnp.float32)
    stats = stats.at[:, 0, :n_planes].set(locs)
    stats = stats.at[:, 1, :n_planes].set(scales)

    # pass B: NMS state
    stats4 = jnp.broadcast_to(stats[:, None], (B, 8, 2, 128))
    logp_st, sig_st = pl.pallas_call(
        functools.partial(_nms_kernel, S=S, N=N, W=W, n_octaves=n_octaves,
                          planes_per_octave=planes_per_octave),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, 2, 128), lambda b, i, j: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, N2, W), jnp.float32),
            jax.ShapeDtypeStruct((B, N2, W), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((1, SUB, W),
                         lambda b, i, j: (b, i * (128 // SUB) + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, W),
                         lambda b, i, j: (b, i * (128 // SUB) + j, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(stats4, Gp, cp)

    # staircase -> exact band: band[i, d] = stair[i, d + i % 128]
    logp_st = logp_st[:, :N]
    sig_st = sig_st[:, :N]
    rows = np.arange(N, dtype=np.int32)
    dcols = np.arange(DB, dtype=np.int32)
    idx = (jnp.zeros_like(logp_st[:, :, :DB], dtype=jnp.int32)
           + dcols[None, None, :] + (rows % 128)[None, :, None])
    band_logp = jnp.take_along_axis(logp_st, idx, axis=2)
    band_sig = jnp.take_along_axis(sig_st, idx, axis=2)
    return band_logp, band_sig


def ladder_nms_pallas(G, nzf, nz_count, *, n_octaves, planes_per_octave, DB,
                      interpret=False):
    """Single-block wrapper around the batched kernel."""
    bl, bs = ladder_nms_pallas_batched(
        G[None], nzf[None], nz_count[None], n_octaves=n_octaves,
        planes_per_octave=planes_per_octave, DB=DB, interpret=interpret)
    return bl[0], bs[0]
