"""Single-block scale-space loop detection — the TPU compute core.

One jitted, vmappable function maps a dense contact block ``[N, N]`` to a
fixed-capacity candidate table. The algorithm reproduces the reference
detection semantics (mustache.py:697-850) step for step:

1. support mask ``nz`` = nonzero ∧ at least 4 off-diagonal, computed before
   sentinel fill;
2. sentinel value 2 on the near-diagonal wedge and beyond the distance band;
3. the full blur ladder evaluated as ONE batched separable convolution
   (MXU-friendly), then a rolling scan over DoG planes performing 3x3
   local-max NMS across space and scale — the reference's sequential
   "best response so far" update is an argmax-with-strict-> reduction,
   which the scan reproduces exactly;
4. per-plane exponential tail fit (closed-form MLE: loc=min, scale=mean-min)
   with p-values carried in log space (f32-safe down to exp(-inf));
5. Benjamini-Hochberg FDR on device via sort + reverse-cummin, log space;
6. candidate selection (all pixels with q < pt, via top_k);
7. sparsity filter via an integral image of ``nz`` (the reference's
   per-candidate window loops become 8 gathers), including numpy's
   negative-slice-start => empty-window semantics;
8. enrichment filter: candidate value > 2 * nonzero-mean of its diagonal
   (diagonal means computed by a shear gather + masked column reduction);
9. the 8-neighborhood q/scale values are exported so the host can finish
   the reference's connected-component clustering bit-compatibly.

Detection scales are exported as plane indices, so the driver can print
float64 sigma values identical to the reference's output strings.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mustache_tpu.config import DetectionConfig
from mustache_tpu.scalespace import LadderSpec, build_ladder

SENTINEL = 2.0        # fills the masked wedges; participates in the blurs
LOG2 = math.log(2.0)  # log-space image of the "untested" marker q=2


# ---------------------------------------------------------------------------
# device-side pieces
# ---------------------------------------------------------------------------

def _max3x3(x):
    """scipy ``maximum_filter(footprint=ones(3,3), mode='constant')``:
    3x3 window max with zero padding at the borders.

    Separable shifted-max formulation (rows then cols) — plain VPU
    elementwise maxima, which XLA fuses and never re-lays-out (a vmapped
    reduce_window can pick a batch-minor tiled layout and blow up HBM 16x).
    """
    xp = jnp.pad(x, ((1, 1), (0, 0)), mode="constant", constant_values=0)
    r = jnp.maximum(jnp.maximum(xp[:-2], xp[1:-1]), xp[2:])
    rp = jnp.pad(r, ((0, 0), (1, 1)), mode="constant", constant_values=0)
    return jnp.maximum(jnp.maximum(rp[:, :-2], rp[:, 1:-1]), rp[:, 2:])


def _blur_ladder(c, kernels):
    """All S Gaussian blurs of ``c`` as one batched separable convolution.

    ``c``: [N, N] or [M, N, N] (M independent maps). ``kernels``: [S, W]
    zero-padded to the common radius R=(W-1)//2. Symmetric (scipy
    'reflect') padding by R once, then two VALID passes: axis 0 (rows)
    producing S channels, then a depthwise axis-1 pass. Returns [S, N, N]
    or [M, S, N, N].
    """
    single = c.ndim == 2
    if single:
        c = c[None]
    S, W = kernels.shape
    R = (W - 1) // 2
    cpad = jnp.pad(c, ((0, 0), (R, R), (R, R)), mode="symmetric")
    lhs = cpad[:, None]                           # [M, 1, N+2R, N+2R]
    k_rows = kernels[:, None, :, None]            # [S, 1, W, 1]
    g = lax.conv_general_dilated(
        lhs, k_rows, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )                                             # [M, S, N, N+2R]
    k_cols = kernels[:, None, None, :]            # [S, 1, 1, W]
    g = lax.conv_general_dilated(
        g, k_cols, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=S,
        precision=lax.Precision.HIGHEST,
    )                                             # [M, S, N, N]
    return g[0] if single else g


def _bh_logq(logp_flat, n_tested):
    """Benjamini-Hochberg in log space over a fixed-size vector.

    Untested entries carry +inf and sort to the tail where they cannot
    influence the reverse cummin. Matches statsmodels fdr_bh:
    q_i = cummin_{j>=i}(p_(j) * n / j), clipped at 1 (=0 in log space).
    """
    dtype = logp_flat.dtype
    M = logp_flat.shape[0]
    order = jnp.argsort(logp_flat)
    slp = logp_flat[order]
    ranks = jnp.arange(M, dtype=dtype) + 1.0
    q = slp + jnp.log(n_tested.astype(dtype)) - jnp.log(ranks)
    q = lax.cummin(q, axis=0, reverse=True)
    q = jnp.minimum(q, 0.0)
    return jnp.zeros(M, dtype).at[order].set(q)


def _diag_nz_means(c):
    """Nonzero-mean of every superdiagonal of ``c`` (post-sentinel map).

    Shear gather: A[i, d] = c[i, i+d] for i+d < N, then a masked column
    reduction. Empty diagonals yield NaN exactly as ``np.mean([])`` does in
    the reference's per-candidate ``diag_mean`` (mustache.py:816-823).
    """
    N = c.shape[0]
    rows = jnp.arange(N, dtype=jnp.int32)
    cols = (rows[:, None] + rows[None, :]) % N
    A = jnp.take_along_axis(c, cols, axis=1)
    valid = (rows[:, None] + rows[None, :]) < N
    occupied = valid & (A != 0)
    dsum = jnp.sum(jnp.where(occupied, A, 0), axis=0)
    dcnt = jnp.sum(occupied, axis=0).astype(c.dtype)
    return dsum / dcnt  # NaN where a diagonal has no nonzeros


def _box_counts(ii, x, y, s, N):
    """Window sums of ``nz`` over [x-s, x+s+1) x [y-s, y+s+1) with numpy
    slice semantics: a negative start makes the slice empty (count 0),
    overruns clamp (mustache.py:800-810)."""
    x0, x1 = x - s, x + s + 1
    y0, y1 = y - s, y + s + 1
    empty = (x0 < 0) | (y0 < 0)
    x0c = jnp.clip(x0, 0, N)
    x1c = jnp.clip(x1, 0, N)
    y0c = jnp.clip(y0, 0, N)
    y1c = jnp.clip(y1, 0, N)
    cnt = ii[x1c, y1c] - ii[x0c, y1c] - ii[x1c, y0c] + ii[x0c, y0c]
    return jnp.where(empty, 0, cnt)


@dataclasses.dataclass(frozen=True)
class BlockDetector:
    """Compiled detector for a fixed block size / config."""

    cfg: DetectionConfig
    spec: LadderSpec
    n: int
    fn: Any          # jitted [B, N, N] -> dict of arrays
    fn_single: Any   # jitted [N, N] -> dict of arrays

    def __call__(self, blocks):
        return self.fn(blocks)


def _detect_one(c, *, kernels, det_ceil, n_planes, planes_per_octave,
                n_octaves, d_px, intra, st, log_pt, K):
    dtype = c.dtype
    N = c.shape[0]
    rows = jnp.arange(N, dtype=jnp.int32)
    diag = rows[None, :] - rows[:, None]          # y - x

    nz = (c != 0) & (diag >= 4)
    nz_count = jnp.sum(nz, dtype=jnp.int32)

    # sentinel fill (mustache.py:703-706)
    c = jnp.where(diag <= 4, jnp.asarray(SENTINEL, dtype), c)
    if intra:
        c = jnp.where(diag >= d_px + 1, jnp.asarray(SENTINEL, dtype), c)

    G = _blur_ladder(c, kernels)                  # [S, N, N]

    nzf = nz.astype(dtype)
    ninf = jnp.asarray(-jnp.inf, dtype)
    pinf = jnp.asarray(jnp.inf, dtype)

    best_v = jnp.zeros((N, N), dtype)
    best_logp = jnp.full((N, N), pinf, dtype)     # +inf == "never detected"
    best_sigidx = jnp.full((N, N), -1, jnp.int32)

    plane = 0
    for o in range(n_octaves):
        Go = G[o * 12:(o + 1) * 12]
        L = Go[:-1] - Go[1:]                      # [11, N, N]
        mP = _max3x3(L[0])
        mC = _max3x3(L[1])
        Lp, Lc = L[0], L[1]
        for j in range(1, planes_per_octave + 1):
            Ln = L[j + 1]
            mN = _max3x3(Ln)
            abs_lc = jnp.abs(Lc)
            # exponential-tail MLE on |Lc[nz]|: loc=min, scale=mean-min
            loc = jnp.min(jnp.where(nz, abs_lc, pinf))
            mean = jnp.sum(abs_lc * nzf) / jnp.maximum(nz_count, 1).astype(dtype)
            scale = mean - loc
            logp = -(abs_lc - loc) / scale        # log of the survival prob

            will = (
                nz
                & (Lc > best_v)
                & (Lc == mC)
                & ((Lp == mP) | (Ln == mN))
                & (Lc > mP)
                & (Lc > mN)
            )
            best_v = jnp.where(will, Lc, best_v)
            best_logp = jnp.where(will, logp, best_logp)
            best_sigidx = jnp.where(will, plane, best_sigidx)
            Lp, Lc, mP, mC = Lc, Ln, mC, mN
            plane += 1

    found = nz & (best_logp < pinf)
    n_tested = jnp.sum(found, dtype=jnp.int32)

    logp_flat = jnp.where(found, best_logp, pinf).reshape(-1)
    logq_flat = _bh_logq(logp_flat, n_tested)

    # dense q map in log space: 0 (=log 1) outside nz, log 2 untested
    o_flat = jnp.where(
        found.reshape(-1), logq_flat,
        jnp.where(nz.reshape(-1), jnp.asarray(LOG2, dtype), jnp.asarray(0.0, dtype)),
    )
    sig_count = jnp.sum(o_flat < log_pt, dtype=jnp.int32)

    neg_topk, flat_idx = lax.top_k(-o_flat, K)
    cand_logq = -neg_topk
    cand_valid = cand_logq < log_pt
    cx = (flat_idx // N).astype(jnp.int32)
    cy = (flat_idx % N).astype(jnp.int32)

    sigidx_dense = jnp.where(nz, best_sigidx, -1)
    cand_sigidx = sigidx_dense.reshape(-1)[flat_idx]

    # sparsity filter via integral image of nz
    ii = jnp.pad(
        jnp.cumsum(jnp.cumsum(nz.astype(jnp.int32), 0), 1), ((1, 0), (1, 0))
    )
    ceil_table = jnp.asarray(det_ceil, jnp.int32)
    s1 = jnp.where(cand_sigidx >= 0, ceil_table[jnp.maximum(cand_sigidx, 0)], 1)
    c1 = _box_counts(ii, cx, cy, s1, N).astype(dtype) / ((2 * s1 + 1) ** 2).astype(dtype)
    s2 = 2 * s1
    c2 = _box_counts(ii, cx, cy, s2, N).astype(dtype) / ((2 * s2 + 1) ** 2).astype(dtype)
    pass_sparse = (cx != 0) & ~((c1 < st) | (c2 < 0.6))

    # enrichment filter (intra-chromosomal only)
    if intra:
        dmeans = _diag_nz_means(c)
        cand_mean = dmeans[jnp.clip(cy - cx, 0, N - 1)]
        pass_enrich = c[cx, cy] > 2 * cand_mean   # NaN mean => False
    else:
        pass_enrich = jnp.ones((K,), bool)

    cand_pass = cand_valid & pass_sparse & pass_enrich

    # 8-neighborhood q/scale export for host-side clustering
    offs = jnp.array([-1, 0, 1], jnp.int32)
    nxs = cx[:, None, None] + offs[None, :, None]   # [K, 3, 1]
    nys = cy[:, None, None] + offs[None, None, :]   # [K, 1, 3]
    nx = jnp.broadcast_to(nxs, (K, 3, 3))
    ny = jnp.broadcast_to(nys, (K, 3, 3))
    oob = (nx < 0) | (nx >= N) | (ny < 0) | (ny >= N)
    nxc = jnp.clip(nx, 0, N - 1)
    nyc = jnp.clip(ny, 0, N - 1)
    o_dense = o_flat.reshape(N, N)
    neigh_logq = jnp.where(oob, pinf, o_dense[nxc, nyc])
    neigh_sigidx = jnp.where(oob, -1, sigidx_dense[nxc, nyc])

    return {
        "nz_count": nz_count,
        "n_tested": n_tested,
        "sig_count": sig_count,
        "cand_x": cx,
        "cand_y": cy,
        "cand_logq": cand_logq,
        "cand_sigidx": cand_sigidx,
        "cand_pass": cand_pass,
        "cand_valid": cand_valid,
        "neigh_logq": neigh_logq,
        "neigh_sigidx": neigh_sigidx,
    }


@functools.lru_cache(maxsize=32)
def _build_detector_cached(cfg: DetectionConfig, n: int, intra: bool,
                           max_candidates: int) -> BlockDetector:
    spec = build_ladder(cfg.octave_values)
    dtype = jnp.float64 if cfg.precision == "float64" else jnp.float32
    kernels = jnp.asarray(spec.kernels, dtype)
    kw = dict(
        det_ceil=spec.det_ceil,
        n_planes=spec.n_planes,
        planes_per_octave=spec.planes_per_octave,
        n_octaves=len(cfg.octave_values),
        d_px=cfg.distance_px,
        intra=intra,
        st=dtype(cfg.st),
        log_pt=dtype(math.log(cfg.pt)),
        K=max_candidates,
    )

    def one(c):
        return _detect_one(c.astype(dtype), kernels=kernels, **kw)

    fn = jax.jit(jax.vmap(one))
    fn_single = jax.jit(one)
    return BlockDetector(cfg=cfg, spec=spec, n=n, fn=fn, fn_single=fn_single)


def build_detector(cfg: DetectionConfig, n: int, *, intra: bool = True,
                   max_candidates: int | None = None) -> BlockDetector:
    return _build_detector_cached(
        cfg, n, intra, max_candidates or cfg.max_candidates
    )


# ---------------------------------------------------------------------------
# host-side finish: gates + connected-component clustering
# ---------------------------------------------------------------------------

def _cluster_components(cands: list[dict]) -> list[list[dict]]:
    """Group candidates whose painted 3x3 neighborhoods are 8-connected,
    i.e. candidates within Chebyshev distance 3 (mustache.py:830-841)."""
    parent = list(range(len(cands)))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    index: dict[tuple[int, int], int] = {}
    for i, cd in enumerate(cands):
        index[(cd["x"], cd["y"])] = i
    for i, cd in enumerate(cands):
        for dx in range(-3, 4):
            for dy in range(-3, 4):
                j = index.get((cd["x"] + dx, cd["y"] + dy))
                if j is not None and j != i:
                    union(i, j)

    groups: dict[int, list[dict]] = {}
    for i, cd in enumerate(cands):
        groups.setdefault(find(i), []).append(cd)
    return list(groups.values())


def finish_block(out: dict, *, block_index: int, start: int, cfg: DetectionConfig,
                 spec: LadderSpec) -> list[list[float]]:
    """Host-side finish of one block: bail-out gates, clustering, and the
    per-component argmin-q emission. Returns ``[x, y, q, sigma]`` rows in
    the same order the reference produces (component label order ==
    row-major order of each component's first painted pixel).
    """
    nz_count = int(out["nz_count"])
    if nz_count < cfg.min_nz:
        return []
    if nz_count < cfg.min_tested:
        return []

    passing = np.asarray(out["cand_pass"])
    if not passing.any():
        return []
    cx = np.asarray(out["cand_x"])[passing]
    cy = np.asarray(out["cand_y"])[passing]
    nlq = np.asarray(out["neigh_logq"])[passing]
    nsi = np.asarray(out["neigh_sigidx"])[passing]

    cands = [
        {"x": int(cx[i]), "y": int(cy[i]), "nlq": nlq[i], "nsi": nsi[i]}
        for i in range(len(cx))
    ]

    det_sigmas = spec.det_sigmas
    rows: list[tuple[tuple[int, int], list[float]]] = []
    for comp in _cluster_components(cands):
        # painted pixel set with the q/scale value at each pixel
        pixels: dict[tuple[int, int], tuple[float, int]] = {}
        for cd in comp:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    px, py = cd["x"] + dx, cd["y"] + dy
                    lq = float(cd["nlq"][dx + 1, dy + 1])
                    si = int(cd["nsi"][dx + 1, dy + 1])
                    pixels[(px, py)] = (lq, si)
        ordered = sorted(pixels.items())  # row-major, np.argwhere order
        best = min(range(len(ordered)), key=lambda i: (ordered[i][1][0], i))
        (px, py), (lq, si) = ordered[best]
        q = float(np.exp(np.float64(lq)))
        sigma = det_sigmas[si] if si >= 0 else 1.0
        first_pixel = ordered[0][0]
        rows.append((first_pixel, [px + start, py + start, q, sigma]))

    rows.sort(key=lambda t: t[0])
    return [r for _, r in rows]
