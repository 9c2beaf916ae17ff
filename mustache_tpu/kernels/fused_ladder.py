"""Fused scale-space blur + DoG + NMS as a single Pallas TPU kernel.

Replaces both the XLA blur ladder and the shear + scan NMS stages: given
the sentinel-filled contact block ``c [N, N]`` the kernel computes, per
16-row tile, ALL Gaussian blurs of the ladder, the DoG planes, the 3x3
space/scale local-max conditions, and the running best-response state —
without ever materializing the dense ``[S, N, N]`` blur stack in HBM (the
XLA path's dominant memory cost; reference hot loop: mustache.py:719-751).

Both convolution passes run on the MXU:

* row pass — one matmul per octave against a static banded weight matrix
  (all 12 sigmas' output rows stacked);
* column pass — per sigma, a banded-Toeplitz matmul per 128-lane output
  block: ``out_block = rc[:, b*128 : b*128+384] @ TT_s`` where ``TT_s``
  holds the sigma's taps on shifted diagonals. (A lane-rolled FMA
  formulation was 10x slower: 29 full-width VMEM passes per octave.)

Blur planes are consumed by a rolling 3-plane DoG scan (the same shape as
the XLA path's ``lax.scan``), so only one octave's row-conv output plus
four blur planes are live — VMEM stays bounded for 1kb-scale bands.

Per-plane exponential-fit statistics are computed in the same pass as
per-tile (min, sum) partials; the final p-value of a detected pixel is
recovered in XLA afterwards as ``-(best_v - loc[plane]) / scale[plane]``
(detections always have ``L > 0``, so ``|L| == best_v``).

Layout: the kernel works on the **staircase** layout

    stair[i, t] = dense[i, 128*(i // 128) + t],   t in [0, DB + 128)

whose chunk-aligned column offset keeps every DMA 128-lane aligned and
makes the dense 3x3 stencil a static (di, dt) shift. The XLA side converts
the two small output planes to the exact band layout
(band[i, d] = dense[i, i+d]) with one cheap gather.

Boundary semantics, matching the XLA path exactly:

* the convolution sees the scipy 'reflect' (symmetric) boundary: inputs
  are symmetric-padded by the ladder radius in XLA before the kernel;
* blur values at out-of-matrix rows/cols are zeroed in-kernel, so DoG
  taps outside the matrix contribute the dense ``maximum_filter``'s
  constant-0 padding.

DMAs are double-buffered across grid steps: each step prefetches the next
step's input window while computing on the current one (grid steps run
sequentially on a TensorCore; scratch persists across steps).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 128           # interior rows per grid step = one staircase chunk
GROUP = SUB + 2     # blur rows held per sigma (interior + NMS row halo)
CPAD = 128          # aligned column pad covering the conv radius
TWIN = 3 * 128      # rc lane window feeding one 128-lane column-conv block


def build_fused_mats(kernels: np.ndarray):
    """Static weight matrices for the in-kernel separable convolution.

    kernels: [S, 2R+1] float64, zero-padded to the common ladder radius
    (scalespace.build_ladder), S = 12 * n_octaves. The kernel processes
    one octave at a time (DoG planes never cross octaves), so weights are
    grouped per octave. Returns (KR, TT, R, TOPPAD, WINROWS):

    * KR [n_oct, 12*GROUP, WINROWS] — row-pass matmul weights: output row
      ``s*GROUP + r`` of octave o is the blur of sigma ``o*12+s`` at dense
      row ``base-1+r``, contracted against the DMA'd WINROWS-row window;
    * TT [n_oct, 12, TWIN, 128] — column-pass banded-Toeplitz blocks:
      output lane ``CPAD + b*128 + j`` contracts rc lanes
      ``b*128 + u`` with ``TT[u, j] = k[u - 128 - j + R]``.
    """
    S, taps = kernels.shape
    n_oct = S // 12
    R = (taps - 1) // 2
    if R > CPAD - 1:
        raise ValueError(f"ladder radius {R} exceeds the column pad")
    TOPPAD = -(-(R + 1) // 8) * 8
    WINROWS = SUB + 2 * TOPPAD
    KR = np.zeros((n_oct, 12 * GROUP, WINROWS), np.float32)
    TT = np.zeros((n_oct, 12, TWIN, 128), np.float32)
    for o in range(n_oct):
        for s in range(12):
            k = kernels[o * 12 + s]
            for r in range(GROUP):
                row = s * GROUP + r
                # rc[r] = sum_t k[t] * window[TOPPAD - 1 + r + (t - R)]
                KR[o, row, TOPPAD - 1 + r - R: TOPPAD - 1 + r + R + 1] = k
            for j in range(128):
                lo = 128 + j - R
                TT[o, s, lo:lo + taps, j] = k
    return KR, TT, R, TOPPAD, WINROWS


def _fused_kernel(kr_ref, tt_ref, valid_ref, c_hbm, nz_hbm, bv_ref, bs_ref,
                  part_ref, cbuf, nzbuf, rc3, gtmp, sem_c, sem_z, *,
                  N, W, R, TOPPAD, WINROWS, WCOLS, CFULL, ZFULL, n_octaves,
                  planes_per_octave):
    pb = pl.program_id(0)
    p0 = pl.program_id(1)
    nchunk = pl.num_programs(1)
    lin = pb * nchunk + p0
    last = pl.num_programs(0) * nchunk - 1
    n_planes = n_octaves * planes_per_octave

    def dmas(lin_idx, slot):
        # full-width row slabs: slicing only the row dim keeps each DMA one
        # contiguous HBM segment. A [rows, lane-window] 2-D slice instead
        # costs one descriptor PER ROW, and on this platform per-segment
        # latency (not bandwidth) dominates: the windowed form measured
        # ~78ms of pure DMA for a whole batch, the slab form ~3ms.
        pb_ = lin_idx // nchunk
        p0_ = lin_idx % nchunk
        base_ = pl.multiple_of(p0_ * SUB, SUB)
        dc = pltpu.make_async_copy(
            c_hbm.at[pb_, pl.ds(base_, WINROWS), :],
            cbuf.at[slot], sem_c.at[slot])
        dz = pltpu.make_async_copy(
            nz_hbm.at[pb_, pl.ds(base_, SUB), :],
            nzbuf.at[slot], sem_z.at[slot])
        return dc, dz

    # pad-slot skip: pow2 batch shaping zero-pads trailing batch slots
    # (pipeline._pick_batch), and each pad slot would otherwise run the
    # full blur ladder (~45ms/block on v5e). valid[pb]==0 blocks skip
    # their DMAs and all compute, writing empty state instead. The
    # prefetch chain stays intact: every step starts the NEXT step's DMA
    # iff that step's block is valid, so skipped blocks never break the
    # double buffering for later valid blocks (the diff path's stacked
    # [2B] batch has pads mid-sequence, not just at the tail).
    my_valid = valid_ref[pb] > 0

    @pl.when((lin == 0) & my_valid)
    def _():
        for d in dmas(lin, 0):
            d.start()

    @pl.when((lin < last) & (valid_ref[(lin + 1) // nchunk] > 0))
    def _():
        for d in dmas(lin + 1, (lin + 1) % 2):
            d.start()

    @pl.when(~my_valid)
    def _():
        bv_ref[0] = jnp.zeros((SUB, W), jnp.float32)
        bs_ref[0] = jnp.full((SUB, W), -1, jnp.int32)
        part_ref[0, 0] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(my_valid)
    def _():
        slot = lin % 2
        for d in dmas(lin, slot):
            d.wait()

        col0 = pl.multiple_of(p0 * 128, 128)
        cb = cbuf[slot, :, pl.ds(col0, WCOLS)]  # [WINROWS, WCOLS] window
        nzf = nzbuf[slot, :, pl.ds(col0, W)]    # [SUB, W] dense support
        nz = nzf > 0.5

        base = p0 * SUB
        # out-of-matrix validity as a rank-1 outer product (full-size iotas
        # would each cost as much scratch as a blur plane)
        drow = base - 1 + lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)
        rv = ((drow >= 0) & (drow < N)).astype(jnp.float32)
        cv = ((col0 + lax.broadcasted_iota(jnp.int32, (1, W), 1)) < N
              ).astype(jnp.float32)

        def max3(a):
            # dense 3x3 max with constant-0 pad: a static stencil in
            # staircase coords. Lane shifts via roll+mask (Mosaic cannot
            # concat offset-mismatched vectors); the lane-edge zero fills
            # only touch cells never on the support band.
            lanes = lax.broadcasted_iota(jnp.int32, a.shape, 1)
            left = jnp.where(lanes == 0, 0.0, pltpu.roll(a, 1, 1))
            right = jnp.where(lanes == a.shape[1] - 1, 0.0,
                              pltpu.roll(a, a.shape[1] - 1, 1))
            h = jnp.maximum(jnp.maximum(left, a), right)
            return jnp.maximum(jnp.maximum(h[:-2], h[1:-1]), h[2:])

        lane8 = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        vec = jnp.zeros((8, 128), jnp.float32)
        best_v = jnp.zeros((SUB, W), jnp.float32)
        best_sig = jnp.full((SUB, W), -1, jnp.int32)

        # one octave at a time: DoG planes never cross octaves, so only the
        # best-response state carries over — this caps live VMEM at one
        # octave's row-conv output plus a rolling window of blur planes
        for o in range(n_octaves):
            # row pass: one matmul against the static banded weight matrix,
            # split per sigma into a 3D scratch (leading-dim indexable by
            # the traced plane counter; sublane offsets need 8-alignment)
            rc2 = lax.dot_general(
                kr_ref[o], cb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)    # [12*GROUP, WCOLS]
            for s in range(12):
                rc3[s] = rc2[s * GROUP:(s + 1) * GROUP]

            def blur(k):
                """Column pass for sigma index ``k`` (static or traced) as
                banded-Toeplitz MXU matmuls, one per 128-lane output block;
                out-of-matrix rows/cols zeroed so DoG there reproduces the
                dense maximum_filter's constant-0 padding."""
                src = rc3[k]
                tt = tt_ref[o, k]
                for b in range(W // 128):
                    gtmp[:, b * 128:(b + 1) * 128] = lax.dot_general(
                        src[:, b * 128:b * 128 + TWIN], tt,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
                return gtmp[:] * rv * cv            # [GROUP, W]

            G0 = blur(0)
            G1 = blur(1)
            Lp = G0 - G1
            mP = max3(Lp)
            G2 = blur(2)
            Lc = G1 - G2
            mC = max3(Lc)

            def plane_body(j, carry):
                # fori_loop (not unrolled) so Mosaic reuses one plane's
                # temporaries across all nine planes of the octave
                Lp, Lc, mP, mC, Glast, best_v, best_sig, vec = carry
                plane = o * planes_per_octave + j - 1
                Gnew = blur(j + 2)
                Ln = Glast - Gnew
                mN = max3(Ln)
                Lpi = Lp[1:-1]
                Lci = Lc[1:-1]
                Lni = Ln[1:-1]

                # per-tile exponential-fit partials on |Lc| over support
                al = jnp.abs(Lci)
                mn = jnp.min(jnp.where(nz, al, jnp.float32(np.inf)))
                sm = jnp.sum(al * nzf)
                vec = jnp.where(lane8 == plane, mn, vec)
                vec = jnp.where(lane8 == n_planes + plane, sm, vec)

                will = (nz
                        & (Lci > best_v)
                        & (Lci == mC)
                        & ((Lpi == mP) | (Lni == mN))
                        & (Lci > mP)
                        & (Lci > mN))
                best_v = jnp.where(will, Lci, best_v)
                best_sig = jnp.where(will, plane, best_sig)
                return Lc, Ln, mC, mN, Gnew, best_v, best_sig, vec

            carry = lax.fori_loop(
                1, planes_per_octave + 1, plane_body,
                (Lp, Lc, mP, mC, G2, best_v, best_sig, vec))
            best_v, best_sig, vec = carry[5:]

        bv_ref[0] = best_v
        bs_ref[0] = best_sig
        part_ref[0, 0] = vec


def fused_ladder_nms_batched(cs, nzf, kr, tt, *, R, TOPPAD, WINROWS,
                             n_octaves, planes_per_octave, DB,
                             valid=None, interpret=False):
    """Band best-state from the sentinel-filled blocks, via the fused kernel.

    cs: [B, N, N] f32 sentinel-filled maps (post-_preamble); nzf: [B, N, N]
    f32 dense support mask; kr/tt: static weight matrices from
    ``build_fused_mats``. ``valid``: optional [B] int mask — 0 marks a
    pad batch slot whose blurs/NMS are skipped in-kernel (empty state out);
    None means all valid. Returns ``(band_v, band_sig, locs, sums)``:
    band arrays [B, N, DB] in the exact band layout
    band[b, i, d] = dense[b, i, i+d]; locs/sums [B, n_planes] are the
    per-plane exponential-fit partials — ``locs`` the support min and
    ``sums`` the support *sum* of |L| (the caller divides by its nz count
    and subtracts loc to form the scale).
    """
    B, N, _ = cs.shape
    if valid is None:
        valid = jnp.ones((B,), jnp.int32)
    else:
        valid = jnp.asarray(valid).astype(jnp.int32)
    W = DB + 128
    WCOLS = W + 2 * CPAD
    n_planes = n_octaves * planes_per_octave
    N2 = -(-N // 128) * 128
    ROWS = N2 + 2 * TOPPAD
    COLS = N2 + W + CPAD

    # symmetric (scipy 'reflect') padding by the ladder radius, then zero
    # pad out to the aligned DMA geometry: dense (i, j) sits at padded
    # (i + TOPPAD, j + CPAD)
    csym = jnp.pad(cs, ((0, 0), (R, R), (R, R)), mode="symmetric")
    cpad = jnp.pad(csym, ((0, 0), (TOPPAD - R, ROWS - TOPPAD - N - R),
                          (CPAD - R, COLS - CPAD - N - R)))
    ZCOLS = N2 - 128 + W
    nzp = jnp.pad(nzf, ((0, 0), (0, N2 - N), (0, ZCOLS - N)))

    steps = N2 // 128
    grid = (B, steps)

    bv, bs, parts = pl.pallas_call(
        functools.partial(
            _fused_kernel, N=N, W=W, R=R, TOPPAD=TOPPAD,
            WINROWS=WINROWS, WCOLS=WCOLS, CFULL=COLS, ZFULL=ZCOLS,
            n_octaves=n_octaves, planes_per_octave=planes_per_octave),
        grid=grid,
        in_specs=[
            pl.BlockSpec(kr.shape, lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tt.shape, lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # valid[B]
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, N2, W), jnp.float32),
            jax.ShapeDtypeStruct((B, N2, W), jnp.int32),
            jax.ShapeDtypeStruct((B, steps, 8, 128), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((1, SUB, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WINROWS, COLS), jnp.float32),
            pltpu.VMEM((2, SUB, ZCOLS), jnp.float32),
            pltpu.VMEM((12, GROUP, WCOLS), jnp.float32),    # row-conv out
            pltpu.VMEM((GROUP, W), jnp.float32),            # col-conv out
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the 128-row tile's scratch + stack exceed the default 16MB scoped
        # window; v5e has 128MB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(kr), jnp.asarray(tt), valid, cpad, nzp)

    parts = parts[:, :, 0, :]
    locs = jnp.min(parts[:, :, :n_planes], axis=1)             # [B, P]
    sums = jnp.sum(parts[:, :, n_planes:2 * n_planes], axis=1)  # [B, P]

    # staircase -> exact band: band[i, d] = stair[i, d + i % 128]. The
    # row shift depends only on i mod 128, so the conversion is 128 STATIC
    # lane slices (one per residue) — a take_along_axis gather here costs
    # 83ms/batch on this chip vs 6ms for the slice/stack form
    def to_band(x):
        st3 = x.reshape(B, N2 // 128, 128, W)
        per_r = [st3[:, :, r, r:r + DB] for r in range(128)]
        return jnp.stack(per_r, axis=2).reshape(B, N2, DB)[:, :N]

    return to_band(bv), to_band(bs), locs, sums
