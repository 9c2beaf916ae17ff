"""Differential loop detection (two conditions), TPU core.

Reproduces ``diff_mustache`` semantics (diff_mustache.py:260-569): the
scale-space pyramid runs simultaneously on both normalized maps and their
difference map (joint support ``nz = nz1 & nz2``); per-map detections carry
an additional differential p-value — a two-sided folded normal tail of the
difference-map DoG response, fit per plane on the joint support — recorded
at each map's detection scale. Candidates pass per-map BH FDR, sparsity and
enrichment filters and clustering exactly as the single-map core, and a
loop is called differential when its component representative has
``pair < pt2`` and a larger best DoG response than the other condition.

All three ladders run as one batched separable convolution ([3, S, N, N]).
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
from mustache_tpu.detect import (
    LOG2, SENTINEL, _bh_logq, _blur_ladder, _box_counts, _cluster_components,
    _diag_nz_means, _max3x3,
)
from mustache_tpu.scalespace import LadderSpec, build_ladder


def _map_outputs(tag, *, nz, o_flat, sigidx_dense, pair_dense, v1_dense,
                 v2_dense, c, ii, ceil_table, st, log_pt, K, N, intra):
    """Candidate table for one condition: selection, filters, neighborhoods."""
    dtype = o_flat.dtype
    pinf = dtype.type(np.inf)
    sig_count = jnp.sum(o_flat < log_pt, dtype=jnp.int32)
    neg_topk, flat_idx = lax.top_k(-o_flat, K)
    cand_logq = -neg_topk
    cand_valid = cand_logq < log_pt
    cx = (flat_idx // N).astype(jnp.int32)
    cy = (flat_idx % N).astype(jnp.int32)
    cand_sigidx = sigidx_dense.reshape(-1)[flat_idx]

    s1 = jnp.where(cand_sigidx >= 0, ceil_table[jnp.maximum(cand_sigidx, 0)], 1)
    c1 = _box_counts(ii, cx, cy, s1, N).astype(dtype) / ((2 * s1 + 1) ** 2).astype(dtype)
    s2 = 2 * s1
    c2 = _box_counts(ii, cx, cy, s2, N).astype(dtype) / ((2 * s2 + 1) ** 2).astype(dtype)
    pass_sparse = (cx != 0) & ~((c1 < st) | (c2 < 0.6))

    if intra:
        dmeans = _diag_nz_means(c)
        cand_mean = dmeans[jnp.clip(cy - cx, 0, N - 1)]
        pass_enrich = c[cx, cy] > 2 * cand_mean
    else:
        pass_enrich = jnp.ones_like(cand_valid)

    offs = np.array([-1, 0, 1], np.int32)
    nx = jnp.broadcast_to(cx[:, None, None] + offs[None, :, None], (K, 3, 3))
    ny = jnp.broadcast_to(cy[:, None, None] + offs[None, None, :], (K, 3, 3))
    oob = (nx < 0) | (nx >= N) | (ny < 0) | (ny >= N)
    nxc = jnp.clip(nx, 0, N - 1)
    nyc = jnp.clip(ny, 0, N - 1)
    o_dense = o_flat.reshape(N, N)
    return {
        f"sig_count{tag}": sig_count,
        f"cand_x{tag}": cx,
        f"cand_y{tag}": cy,
        f"cand_logq{tag}": cand_logq,
        f"cand_sigidx{tag}": cand_sigidx,
        f"cand_valid{tag}": cand_valid,
        f"pass_sparse{tag}": pass_sparse,
        f"pass_enrich{tag}": pass_enrich,
        f"neigh_logq{tag}": jnp.where(oob, pinf, o_dense[nxc, nyc]),
        f"neigh_sigidx{tag}": jnp.where(oob, -1, sigidx_dense[nxc, nyc]),
        f"neigh_pair{tag}": jnp.where(oob, pinf, pair_dense[nxc, nyc]),
        f"neigh_v1{tag}": jnp.where(oob, dtype.type(1.0), v1_dense[nxc, nyc]),
        f"neigh_v2{tag}": jnp.where(oob, dtype.type(1.0), v2_dense[nxc, nyc]),
    }


def _diff_detect_one(c1, c2, st, log_pt, *, kernels, det_ceil,
                     planes_per_octave, n_octaves, d_px, intra, K):
    dtype = c1.dtype
    st = st.astype(dtype)
    log_pt = log_pt.astype(dtype)
    N = c1.shape[0]
    rows_np = np.arange(N, dtype=np.int32)
    diag = (jnp.zeros_like(c1, dtype=jnp.int32)
            + rows_np[None, :] - rows_np[:, None])

    nz1 = (c1 != 0) & (diag >= 4)
    nz2 = (c2 != 0) & (diag >= 4)
    nz = nz1 & nz2
    nz1_count = jnp.sum(nz1, dtype=jnp.int32)
    nz2_count = jnp.sum(nz2, dtype=jnp.int32)

    sent = dtype.type(SENTINEL)
    c1 = jnp.where(diag <= 4, sent, c1)
    c2 = jnp.where(diag <= 4, sent, c2)
    if intra:
        c1 = jnp.where(diag >= d_px + 1, sent, c1)
        c2 = jnp.where(diag >= d_px + 1, sent, c2)
    cd = jnp.where(nz, c1 - c2, dtype.type(0.0))

    G = _blur_ladder(jnp.stack([cd, c1, c2]), kernels)  # [3, S, N, N]

    pinf = dtype.type(np.inf)
    zero = dtype.type(0.0)

    state = {}
    for m in (1, 2):
        state[m] = dict(
            best_v=jnp.zeros_like(c1),
            best_logp=jnp.full_like(c1, pinf),
            best_pair=jnp.full_like(c1, dtype.type(SENTINEL)),
            best_sigidx=jnp.full_like(diag, -1),
        )
    nzm = {1: nz1, 2: nz2}
    nzf = {1: nz1.astype(dtype), 2: nz2.astype(dtype)}
    nzc = {1: jnp.maximum(nz1_count, 1).astype(dtype),
           2: jnp.maximum(nz2_count, 1).astype(dtype)}
    nzd_f = nz.astype(dtype)
    nzd_c = jnp.maximum(jnp.sum(nz, dtype=jnp.int32), 1).astype(dtype)

    def step(carry, xs):
        roll, st1, st2 = carry
        Lcd, Ln1, Ln2, plane = xs
        # folded-normal differential p on the difference-map plane,
        # fit on the joint support (diff_mustache.py:371-385)
        mu = jnp.sum(Lcd * nzd_f) / nzd_c
        var = jnp.sum((Lcd - mu) ** 2 * nzd_f) / nzd_c
        sd = jnp.sqrt(var)
        phi = jax.scipy.stats.norm.cdf(Lcd, loc=mu, scale=sd)
        phi = jnp.where(jnp.isnan(phi), dtype.type(1.0), phi)
        diff_p = jnp.where(phi > 0.5, 1.0 - phi, phi) * 2.0

        new_roll = []
        new_states = []
        for m, st_m, Ln in ((1, st1, Ln1), (2, st2, Ln2)):
            Lp, Lc, mP, mC = roll[4 * (m - 1):4 * m]
            mN = _max3x3(Ln)
            abs_lc = jnp.abs(Lc)
            loc = jnp.min(jnp.where(nzm[m], abs_lc, pinf))
            mean = jnp.sum(abs_lc * nzf[m]) / nzc[m]
            scale = mean - loc
            logp = -(abs_lc - loc) / scale
            # reference scrubs NaN p to 1 (diff_mustache.py:386-387)
            logp = jnp.where(jnp.isnan(logp), zero, logp)

            will = (
                nzm[m]
                & (Lc > st_m[0])
                & (Lc == mC)
                & ((Lp == mP) | (Ln == mN))
                & (Lc > mP)
                & (Lc > mN)
            )
            new_states.append((
                jnp.where(will, Lc, st_m[0]),
                jnp.where(will, logp, st_m[1]),
                jnp.where(will, diff_p, st_m[2]),
                jnp.where(will, plane, st_m[3]),
            ))
            new_roll.extend((Lc, Ln, mC, mN))
        return (tuple(new_roll), new_states[0], new_states[1]), None

    states = {m: (state[m]["best_v"], state[m]["best_logp"],
                  state[m]["best_pair"], state[m]["best_sigidx"])
              for m in (1, 2)}
    for o in range(n_octaves):
        Gd = G[0, o * 12:(o + 1) * 12]
        G1 = G[1, o * 12:(o + 1) * 12]
        G2 = G[2, o * 12:(o + 1) * 12]
        Ld = Gd[:-1] - Gd[1:]
        L1 = G1[:-1] - G1[1:]
        L2 = G2[:-1] - G2[1:]
        planes = np.arange(o * planes_per_octave,
                           (o + 1) * planes_per_octave, dtype=np.int32)
        roll = (L1[0], L1[1], _max3x3(L1[0]), _max3x3(L1[1]),
                L2[0], L2[1], _max3x3(L2[0]), _max3x3(L2[1]))
        carry, _ = lax.scan(
            step, (roll, states[1], states[2]),
            (Ld[1:planes_per_octave + 1], L1[2:], L2[2:], planes))
        states = {1: carry[1], 2: carry[2]}
    for m in (1, 2):
        state[m]["best_v"], state[m]["best_logp"], state[m]["best_pair"], \
            state[m]["best_sigidx"] = states[m]

    out = {"nz1_count": nz1_count, "nz2_count": nz2_count}
    ceil_table = nz1_count * 0 + np.asarray(det_ceil, np.int32)
    dense = {}
    for m, cm in ((1, c1), (2, c2)):
        st_m = state[m]
        found = nzm[m] & (st_m["best_logp"] < pinf)
        n_tested = jnp.sum(found, dtype=jnp.int32)
        logp_flat = jnp.where(found, st_m["best_logp"], pinf).reshape(-1)
        logq_flat = _bh_logq(logp_flat, n_tested)
        o_flat = jnp.where(
            found.reshape(-1), logq_flat,
            jnp.where(nzm[m].reshape(-1), dtype.type(LOG2), zero))
        sigidx_dense = jnp.where(nzm[m], st_m["best_sigidx"], -1)
        pair_dense = jnp.where(nzm[m], st_m["best_pair"], dtype.type(1.0))
        v_dense = jnp.where(nzm[m], st_m["best_v"], dtype.type(1.0))
        dense[m] = dict(o_flat=o_flat, sigidx=sigidx_dense, pair=pair_dense,
                        v=v_dense, found=found, cm=cm)
        out[f"n_tested{m}"] = n_tested

    for m in (1, 2):
        ii = jnp.pad(jnp.cumsum(jnp.cumsum(nzm[m].astype(jnp.int32), 0), 1),
                     ((1, 0), (1, 0)))
        out.update(_map_outputs(
            str(m), nz=nzm[m], o_flat=dense[m]["o_flat"],
            sigidx_dense=dense[m]["sigidx"], pair_dense=dense[m]["pair"],
            v1_dense=dense[1]["v"], v2_dense=dense[2]["v"],
            c=dense[m]["cm"], ii=ii, ceil_table=ceil_table, st=st,
            log_pt=log_pt, K=K, N=N, intra=intra))
    return out


@dataclasses.dataclass(frozen=True)
class DiffBlockDetector:
    cfg: DetectionConfig
    spec: LadderSpec
    n: int
    _fn: Any
    _fn_single: Any

    @property
    def _scalars(self):
        dt = np.float64 if self.cfg.precision == "float64" else np.float32
        return dt(self.cfg.st), dt(math.log(self.cfg.pt))

    def fn(self, b1, b2):
        st, lp = self._scalars
        return self._fn(b1, b2, st, lp)

    def fn_single(self, c1, c2):
        st, lp = self._scalars
        return self._fn_single(c1, c2, st, lp)


@functools.lru_cache(maxsize=16)
def _build_diff_detector_cached(octave_values: tuple, precision: str,
                                d_px: int, n: int, max_candidates: int):
    spec = build_ladder(octave_values)
    dtype = jnp.float64 if precision == "float64" else jnp.float32
    kernels = spec.kernels.astype(dtype)  # numpy: lifted as an HLO literal
    kw = dict(
        det_ceil=spec.det_ceil,
        planes_per_octave=spec.planes_per_octave,
        n_octaves=len(octave_values),
        d_px=d_px,
        intra=True,
        K=max_candidates,
    )

    def one(c1, c2, st, log_pt):
        return _diff_detect_one(c1.astype(dtype), c2.astype(dtype), st,
                                log_pt, kernels=kernels, **kw)

    return (spec, jax.jit(jax.vmap(one, in_axes=(0, 0, None, None))),
            jax.jit(one))


def build_diff_detector(cfg: DetectionConfig, n: int, *, intra: bool = True,
                        max_candidates: int | None = None) -> DiffBlockDetector:
    if not intra:
        raise NotImplementedError("inter-chromosomal detection not supported")
    spec, fn, fn_single = _build_diff_detector_cached(
        cfg.octave_values, cfg.precision, cfg.distance_px, n,
        max_candidates or cfg.max_candidates)
    return DiffBlockDetector(cfg=cfg, spec=spec, n=n, _fn=fn,
                             _fn_single=fn_single)


# ---------------------------------------------------------------------------
# host finish
# ---------------------------------------------------------------------------

def _finish_map(out, tag, *, start, spec, include_enrich_gate):
    """Cluster one condition's surviving candidates; returns rows with the
    pair/v values needed for the differential call, or None when this map's
    bail-outs fire."""
    passing = (np.asarray(out[f"cand_valid{tag}"])
               & np.asarray(out[f"pass_sparse{tag}"]))
    if not passing.any():
        return None, None
    with_enrich = passing & np.asarray(out[f"pass_enrich{tag}"])
    if not with_enrich.any():
        return passing, None
    cx = np.asarray(out[f"cand_x{tag}"])[with_enrich]
    cy = np.asarray(out[f"cand_y{tag}"])[with_enrich]
    cands = []
    for i in range(len(cx)):
        cands.append({
            "x": int(cx[i]), "y": int(cy[i]),
            "nlq": np.asarray(out[f"neigh_logq{tag}"])[with_enrich][i],
            "nsi": np.asarray(out[f"neigh_sigidx{tag}"])[with_enrich][i],
            "npair": np.asarray(out[f"neigh_pair{tag}"])[with_enrich][i],
            "nv1": np.asarray(out[f"neigh_v1{tag}"])[with_enrich][i],
            "nv2": np.asarray(out[f"neigh_v2{tag}"])[with_enrich][i],
        })
    det_sigmas = spec.det_sigmas
    rows = []
    for comp in _cluster_components(cands):
        pixels = {}
        for cd in comp:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    px, py = cd["x"] + dx, cd["y"] + dy
                    pixels[(px, py)] = (
                        float(cd["nlq"][dx + 1, dy + 1]),
                        int(cd["nsi"][dx + 1, dy + 1]),
                        float(cd["npair"][dx + 1, dy + 1]),
                        float(cd["nv1"][dx + 1, dy + 1]),
                        float(cd["nv2"][dx + 1, dy + 1]),
                    )
        ordered = sorted(pixels.items())
        best = min(range(len(ordered)), key=lambda i: (ordered[i][1][0], i))
        (px, py), (lq, si, pair, nv1, nv2) = ordered[best]
        q = float(np.exp(np.float64(lq)))
        sigma = det_sigmas[si] if si >= 0 else 1.0
        rows.append((ordered[0][0],
                     [px + start, py + start, q, sigma], pair, nv1, nv2))
    rows.sort(key=lambda t: t[0])
    return passing, rows


def finish_diff_block(out: dict, *, start: int, cfg: DetectionConfig,
                      spec: LadderSpec):
    """Returns (loops1, diff_loops1, loops2, diff_loops2) row lists."""
    empty = ([], [], [], [])
    if int(out["nz1_count"]) < cfg.min_nz or int(out["nz2_count"]) < cfg.min_nz:
        return empty
    if int(out["nz1_count"]) < cfg.min_tested or \
            int(out["nz2_count"]) < cfg.min_tested:
        return empty

    pass1, rows1 = _finish_map(out, "1", start=start, spec=spec,
                               include_enrich_gate=True)
    pass2, rows2 = _finish_map(out, "2", start=start, spec=spec,
                               include_enrich_gate=True)
    # joint bail-outs (diff_mustache.py:507-508, :519, :526)
    if pass1 is None or pass2 is None:
        return empty
    if rows1 is None or rows2 is None:
        return empty

    def split(rows, own_v_key, other_v_key):
        loops, diff_loops = [], []
        for _, row, pair, nv1, nv2 in rows:
            loops.append(row)
            own = nv1 if own_v_key == 1 else nv2
            other = nv2 if own_v_key == 1 else nv1
            if pair < cfg.pt2 and own > other:
                diff_loops.append(row)
        return loops, diff_loops

    loops1, diff1 = split(rows1, 1, 2)
    loops2, diff2 = split(rows2, 2, 1)
    return loops1, diff1, loops2, diff2


def detect_diff_loops_coo(x1, y1, v1, x2, y2, v2, cfg: DetectionConfig, *,
                          normalize: bool = True, exact_normalize: bool = False):
    """Differential loop calls for one chromosome, both conditions.

    Returns a list of (bin1, bin2, q, scale, tag) with tag 1=loop1,
    2=diffloop1, 3=loop2, 4=diffloop2 (diff_mustache.py:704-715).
    """
    from mustache_tpu.config import block_mask_sizes, chunk_grid
    from mustache_tpu.normalize import normalize_sparse
    from mustache_tpu.pipeline import densify_block

    if len(v1) == 0 or len(v2) == 0:
        return []
    x1 = np.asarray(x1, np.int64); y1 = np.asarray(y1, np.int64)
    x2 = np.asarray(x2, np.int64); y2 = np.asarray(y2, np.int64)
    v1 = np.asarray(v1, np.float64); v2 = np.asarray(v2, np.float64)

    d_px = cfg.distance_px
    n = int(max(x1.max(), y1.max(), x2.max(), y2.max())) + 1
    if normalize:
        normalize_sparse(x1, y1, v1, cfg.resolution, d_px, exact=exact_normalize)
        normalize_sparse(x2, y2, v2, cfg.resolution, d_px, exact=exact_normalize)

    chunk = cfg.chunk_size
    start, end = chunk_grid(n, chunk, d_px)
    masks = block_mask_sizes(start, end, d_px)
    # always chunk x chunk, zero-padded (diff_mustache.py:671)
    width = chunk
    det = build_diff_detector(cfg, width)

    results = []
    for i in range(len(start)):
        cc1 = densify_block(x1, y1, v1, start[i], end[i], width)
        cc2 = densify_block(x2, y2, v2, start[i], end[i], width)
        out = jax.tree.map(np.asarray, det.fn_single(cc1, cc2))
        groups = finish_diff_block(out, start=start[i], cfg=cfg, spec=det.spec)
        mask = masks[i]
        for tag, rows in zip((1, 2, 3, 4), groups):
            for r in rows:
                if r[0] >= start[i] + mask or r[1] >= start[i] + mask:
                    results.append((int(r[0]), int(r[1]), float(r[2]),
                                    float(r[3]), tag))
    return results
