"""Sphere-tracing raycaster over the semi-implicit gradient-SDF.

The reference has no renderer (tracking queries the SDF at backprojected
depth pixels instead); this module adds the TPU-native rendering path the
north star requires: depth/normal images rendered by sphere tracing the
block-sparse gradient-SDF, fully vectorized over rays. It is the Mrays/s
benchmark kernel and the basis of rendered-depth parity checks against
fused geometry.

Performance design (measured rationale in PERF_NOTES.md):

  * Per march step exactly TWO random gathers: a transient combined
    directory (slot >= 0 allocated; -1 unallocated-but-coarse-occupied;
    -2 coarse-empty — the coarse occupancy mip is broadcast-upsampled into
    the directory image once per render, no per-step third gather) and a
    transient "march field" (voxel dist where observed else +inf).
  * All per-ray state is carried as SEPARATE x/y/z component arrays —
    [N, 3]-minor-axis math wastes 125/128 lanes per op on TPU and measurably
    dominated the march loop (PERF_NOTES.md).
  * March values are raw voxel `dist` — CONSTANT within each voxel — so
    sign changes can only happen at voxel boundaries and the step is floored
    by the DDA distance to the next voxel boundary (never skips a crossing);
    this kills the dominant straggler class, tangent rays crawling through
    the truncation band at step_min for >100 iterations.
  * A `lax.while_loop` runs as long as its SLOWEST ray, so after a short
    full-width burst the surviving rays are compacted (jnp.nonzero) into
    successively smaller fixed-capacity buffers and marched there; a round
    that would overflow its capacity falls back to full width (lax.cond)
    rather than dropping rays. Refinement runs compacted on the HIT rays
    only.
  * The march carries the field values at the crossing-bracket endpoints,
    so refinement is a FREE secant interpolation between the bracket
    voxels' center projections (the classic TSDF crossing interpolation,
    made march-path-independent) — measured 2x MORE accurate (median
    0.15 vs 0.31 voxels on the synthetic sphere) than the 5 bisection
    rounds (10 gathers) it replaced; `bisect_steps` (default 2) tightens
    the bracket first so windowed and unwindowed marches bracket the same
    voxel pair.

Empty-space hierarchy: outside allocated blocks the field is unknown but —
by construction of fusion (`MapGradPixelSdf.cpp:101-116`) — every point
within truncation distance T of the surface is allocated, so the ray may
skip to the next block boundary (DDA), or to the next 4^3-block coarse-cell
boundary where the coarse mip is empty. `render_depth_normal` additionally
runs a low-resolution prior pass first and marches each full-res ray only
inside [min - margin, max + margin] of its coarse 3x3 neighborhood's hit
range (the min/max range-image technique); rays whose whole coarse
neighborhood missed fall back to the full range, so only sub-coarse-pixel
geometry can be skipped.

Differentiability: the march itself is non-differentiable control flow, so
the returned hit is re-expressed straight-through with one Newton/IFT step
from the stop-gradient'ed bracket midpoint:
    s* = s0 - phi(o + s0 d) / (grad_phi . d),   s0 = stop_gradient(s_hit).
At the root this is the implicit-function-theorem derivative: d s*/d theta
= -(d phi/d theta)/(grad_phi . d) exactly, so depth gradients w.r.t. pose
(through o, d) AND w.r.t. the grid fields (through the tsdf_grad gathers)
flow without a custom VJP. Gradient subtlety: the semi-implicit field
phi(p) = dist + s ghat.(c-p) is macroscopically increasing along the stored
(inward) gradient — the SEMANTIC gradient the query returns, +s ghat — but
its within-voxel sawtooth slope is -s ghat (c is the frozen voxel center),
so naive autodiff through the query would flip the depth gradient's sign;
the polish freezes the query point and reattaches spatial dependence as an
explicit linearization with the semantic gradient. Verified against finite
differences in tests/test_raycast.py.

Sign convention (reference Sdf.h:76-85): the fused field is NEGATIVE in
observed free space and positive behind the surface, so rays march while
the field is < 0 and a crossing is detected when it turns >= 0.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import FusionConfig, GridConfig
from . import query
from . import voxel_grid as vg


class RaycastResult(NamedTuple):
    depth: jax.Array   # [N] ray-parameter depth (0 where no hit)
    points: jax.Array  # [N, 3] world-space hit points
    normal: jax.Array  # [N, 3] outward unit normals (-ghat)
    hit: jax.Array     # [N] bool


class _Rays(NamedTuple):
    """Componentwise ray bundle (all [N])."""

    ox: jax.Array
    oy: jax.Array
    oz: jax.Array
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    s_end: jax.Array


class _MarchState(NamedTuple):
    s: jax.Array       # current ray parameter
    s_prev: jax.Array  # previous sample (bracket low on crossing)
    lo: jax.Array      # crossing bracket
    hi: jax.Array
    found: jax.Array   # bool
    v_lo: jax.Array    # march-field value at lo (valid iff v_lo_ok)
    v_hi: jax.Array    # march-field value at hi (>= 0 at a crossing)
    v_lo_ok: jax.Array  # bool: lo probe was an observed voxel
    v_prev: jax.Array  # march-field value at s_prev (carried)
    v_prev_ok: jax.Array  # bool: s_prev probe was observed


def _render_fields(grid: vg.VoxelGrid, gcfg: GridConfig):
    """Transient per-render lookup structures (one elementwise pass each):

    * march [nvox]: voxel dist where observed, +inf else;
    * dir2 [dir_dim^3]: slot >= 0 allocated, -1 empty-but-coarse-occupied,
      -2 coarse-empty (coarse mip broadcast-upsampled to block resolution).
    """
    march = jnp.where(vg.flat_field(grid.weight) > 0.0,
                      vg.flat_field(grid.dist), jnp.inf)
    D = gcfg.dir_dim
    F = vg.COARSE_FACTOR
    C = D // F
    occ = grid.coarse_occ.reshape(C, C, C)
    occ_up = jnp.broadcast_to(
        occ[:, None, :, None, :, None], (C, F, C, F, C, F)
    ).reshape(-1)
    dir2 = jnp.where(grid.directory >= 0, grid.directory,
                     jnp.where(occ_up > 0, -1, -2))
    return march, dir2


def _march_probe(march, dir2, px, py, pz, gcfg):
    """(value, observed, level) at component points — 2 random gathers.
    level: >=0 observed/allocated handled via `observed`/`block_present`."""
    inv_vs = 1.0 / gcfg.voxel_size
    b = gcfg.block_shape
    vx = jnp.round(px * inv_vs).astype(jnp.int32)
    vy = jnp.round(py * inv_vs).astype(jnp.int32)
    vz = jnp.round(pz * inv_vs).astype(jnp.int32)
    bx = jnp.floor_divide(vx, b)
    by = jnp.floor_divide(vy, b)
    bz = jnp.floor_divide(vz, b)
    local = ((vz - bz * b) * b + (vy - by * b)) * b + (vx - bx * b)
    key = vg.pack_key_xyz(bx, by, bz, gcfg)
    d3 = gcfg.dir_dim**3
    entry = dir2[jnp.clip(key, 0, d3 - 1)]
    entry = jnp.where(key >= 0, entry, -2)  # outside world = coarse-empty
    block_present = entry >= 0
    lin = jnp.where(block_present, entry, 0) * gcfg.voxels_per_block + local
    val = march[lin]
    observed = block_present & jnp.isfinite(val)
    coarse_occ = entry >= -1
    return jnp.where(observed, val, 0.0), observed, block_present, coarse_occ


def _dda_axis(p, d, cell, half_vox):
    b = jnp.floor((p + half_vox) / cell)
    bound = jnp.where(d > 0, (b + 1.0) * cell, b * cell)
    return jnp.where(jnp.abs(d) > 1e-12, (bound - p - half_vox) / d, jnp.inf)


def _dda(px, py, pz, dx, dy, dz, cell, half_vox, step_min):
    """Distance along each ray to its next cell boundary of size `cell`.
    Voxel i spans [i*vs - vs/2, i*vs + vs/2), so boundaries sit at
    k*cell - vs/2 (handled by the +vs/2 shift)."""
    out = _dda_axis(px, dx, cell, half_vox)
    out = jnp.minimum(out, _dda_axis(py, dy, cell, half_vox))
    out = jnp.minimum(out, _dda_axis(pz, dz, cell, half_vox))
    out = jnp.where(out > 0, out, jnp.inf)
    return jnp.maximum(out + 0.5 * step_min, step_min)


def _march(march, dir2, rays: _Rays, state: _MarchState, max_steps: int,
           gcfg: GridConfig, fcfg: FusionConfig):
    """Advance rays until crossing/exhaustion, at most max_steps."""
    T = fcfg.trunc_voxels * gcfg.voxel_size
    vs = gcfg.voxel_size
    step_min = 0.25 * vs
    half_vox = 0.5 * vs
    bs_m = gcfg.block_shape * vs
    coarse_m = bs_m * vg.COARSE_FACTOR

    def cond(carry):
        k, st = carry
        alive = ~st.found & (st.s <= rays.s_end)
        return (k < max_steps) & jnp.any(alive)

    def body(carry):
        k, st = carry
        px = rays.ox + st.s * rays.dx
        py = rays.oy + st.s * rays.dy
        pz = rays.oz + st.s * rays.dz
        phi, observed, block_present, coarse_occ = _march_probe(
            march, dir2, px, py, pz, gcfg
        )
        crossed = observed & (phi >= 0.0) & ~st.found
        lo = jnp.where(crossed, st.s_prev, st.lo)
        hi = jnp.where(crossed, st.s, st.hi)
        v_lo = jnp.where(crossed, st.v_prev, st.v_lo)
        v_hi = jnp.where(crossed, phi, st.v_hi)
        v_lo_ok = jnp.where(crossed, st.v_prev_ok, st.v_lo_ok)
        found = st.found | crossed
        # step policy (each level is a superset guarantee — an absent
        # block/cell cannot contain the truncation band):
        #  * observed voxel: sphere-trace with -phi (free space is negative),
        #    floored by the voxel-boundary DDA (march values are constant
        #    per voxel, so boundary sampling cannot skip a sign change)
        #  * allocated block, unobserved voxel: cautious T step (band may
        #    start one voxel ahead behind a shadow boundary)
        #  * unallocated block in an occupied coarse cell: DDA to the next
        #    block boundary
        #  * coarse-empty 4^3-block cell: DDA to the next coarse boundary
        dda_vox = _dda(px, py, pz, rays.dx, rays.dy, rays.dz,
                       vs, half_vox, step_min)
        step = jnp.where(
            observed,
            jnp.maximum(jnp.minimum(-phi, T), dda_vox),
            jnp.where(
                block_present,
                T,
                jnp.where(
                    coarse_occ,
                    _dda(px, py, pz, rays.dx, rays.dy, rays.dz,
                         bs_m, half_vox, step_min),
                    _dda(px, py, pz, rays.dx, rays.dy, rays.dz,
                         coarse_m, half_vox, step_min),
                ),
            ),
        )
        stay = found | (st.s > rays.s_end)
        s_new = jnp.where(stay, st.s, st.s + step)
        s_prev = jnp.where(found, st.s_prev, st.s)
        v_prev = jnp.where(found, st.v_prev, phi)
        v_prev_ok = jnp.where(found, st.v_prev_ok, observed)
        return k + 1, _MarchState(s_new, s_prev, lo, hi, found,
                                  v_lo, v_hi, v_lo_ok, v_prev, v_prev_ok)

    _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return st


def _gather_rays(rays: _Rays, idx) -> _Rays:
    return _Rays(*(f[idx] for f in rays))


def raycast(
    grid: vg.VoxelGrid,
    origins: jax.Array,     # [N, 3] ray origins (world)
    dirs: jax.Array,        # [N, 3] unit ray directions (world)
    gcfg: GridConfig,
    fcfg: FusionConfig,
    *,
    s_min: float = 0.1,
    s_max: float = 5.0,
    s_lo: Optional[jax.Array] = None,   # [N] per-ray march window start
    s_hi: Optional[jax.Array] = None,   # [N] per-ray march window end
    max_steps: int = 128,
    bisect_steps: int = 2,
    burst_steps: int = 12,
    compact_divisors: tuple = (64,),
    refine: bool = True,
) -> RaycastResult:
    """Trace N rays; returns first zero crossing along each.

    `s_lo`/`s_hi` optionally bound each ray's march window (from a depth
    prior); they default to the scalar [s_min, s_max]. The burst of
    `burst_steps` runs pre-compacted to N/2 when per-ray windows exist
    (window-skipped rays never occupy march lanes; cap 3N/8); surviving rays then
    continue in compacted buffers of at most N/divisor rays per entry of
    `compact_divisors` — each round actually runs at the TIGHTEST fitting
    capacity on a {N/divisor, N/8, full-width} ladder (lax.switch), so an
    overflowing round degrades by one ladder rung rather than dropping
    rays or jumping straight to a full-width march.

    Schedule default: a single straggler round at divisor 64. Round-4
    capacity sweep (one v5e, from-scratch VGA, ALL bit-identical depth
    images): N/8 114 ms, N/16 108, N/20 106, N/32-N/64 102-103 ms
    (plateau) — the round's cost is its fixed lane width, and this
    scene's post-burst survivors fit N/64. The old (8, 64) TWO-round
    schedule was worse than either (122 ms): a second round pays its own
    re-compaction; one narrow round with a ladder escape does not.
    (6, 48) was 131.5 ms; burst 16 changed bracket choices on tail rays,
    burst 12 stays the default."""
    n = origins.shape[0]
    if s_lo is None:
        s0 = jnp.full((n,), s_min, jnp.float32)
    else:
        s0 = jnp.maximum(s_lo, s_min)
    if s_hi is None:
        s_end = jnp.full((n,), s_max, jnp.float32)
    else:
        s_end = jnp.minimum(s_hi, s_max)

    march, dir2 = _render_fields(grid, gcfg)
    rays = _Rays(
        ox=origins[:, 0], oy=origins[:, 1], oz=origins[:, 2],
        dx=dirs[:, 0], dy=dirs[:, 1], dz=dirs[:, 2], s_end=s_end,
    )
    zf = jnp.zeros((n,), jnp.float32)
    zb = jnp.zeros((n,), bool)
    state = _MarchState(s=s0, s_prev=s0, lo=s0, hi=s0, found=zb,
                        v_lo=zf, v_hi=zf, v_lo_ok=zb,
                        v_prev=zf, v_prev_ok=zb)

    # round schedule: a burst (pre-compacted to N/2 when windows can
    # exclude rays up front), then compacted straggler rounds — early
    # rounds get short step budgets, the last (narrowest) round gets the
    # remainder
    divisors = tuple(d for d in compact_divisors if d > 1)
    burst = min(burst_steps, max_steps) if divisors else max_steps
    budget = max_steps - burst
    windowed = s_lo is not None or s_hi is not None
    schedule = [(burst, 8 / 3 if windowed else 1)]
    for i, div in enumerate(divisors):
        if i < len(divisors) - 1:
            steps = min(burst_steps + 4 * (i + 1), budget)
            budget -= steps
        else:
            steps = budget
        schedule.append((steps, div))

    for steps, div in schedule:
        if steps <= 0:
            continue
        if div <= 1:
            state = _march(march, dir2, rays, state, steps, gcfg, fcfg)
            continue
        # CAPACITY LADDER (round 4): the round runs at the TIGHTEST
        # fitting capacity among {n/div, n/8} via lax.switch — per-step
        # cost is the buffer's FIXED lane width, not the live-ray count
        # (the while_loop early-exits in steps, not lanes), so narrow
        # survivor sets should march in narrow buffers. Measured sweep
        # (one v5e, from-scratch VGA, bit-identical depth images):
        # n/8 114 ms, n/16 108, n/20 106, n/32-n/64 102-103 (plateau) —
        # the ladder takes the n/64 win when survivors allow and degrades
        # to n/8 (the former fixed default) instead of a full-width march
        # when they don't; full width remains the final escape.
        ladder = sorted({max(1, int(n / d)) for d in (div, 8.0) if d > 1})
        ladder = [c for c in ladder if c < n] or [max(1, int(n / div))]
        alive = ~state.found & (state.s <= rays.s_end)
        count = jnp.sum(alive.astype(jnp.int32))
        cap_max = ladder[-1]
        # one nonzero pass at the widest capacity; narrower branches take
        # the prefix (nonzero's indices are ascending, so the first
        # `count` entries are exactly the alive set whenever count <= cap)
        (idx_full,) = jnp.nonzero(alive, size=cap_max, fill_value=0)

        def make_compacted(cap, steps=steps):
            def compacted(state):
                idx = idx_full[:cap]
                mask = jnp.arange(cap, dtype=jnp.int32) < count
                sub = _MarchState(
                    s=state.s[idx], s_prev=state.s_prev[idx],
                    lo=state.lo[idx], hi=state.hi[idx],
                    # padded entries are marked found so they don't march
                    found=state.found[idx] | ~mask,
                    v_lo=state.v_lo[idx], v_hi=state.v_hi[idx],
                    v_lo_ok=state.v_lo_ok[idx],
                    v_prev=state.v_prev[idx], v_prev_ok=state.v_prev_ok[idx],
                )
                out = _march(march, dir2, _gather_rays(rays, idx), sub,
                             steps, gcfg, fcfg)
                tgt = jnp.where(mask, idx, n)  # drop padding writes

                def put(full, new):
                    return full.at[tgt].set(new, mode="drop")

                return _MarchState(
                    s=put(state.s, out.s),
                    s_prev=put(state.s_prev, out.s_prev),
                    lo=put(state.lo, out.lo), hi=put(state.hi, out.hi),
                    found=put(state.found, out.found & mask),
                    v_lo=put(state.v_lo, out.v_lo),
                    v_hi=put(state.v_hi, out.v_hi),
                    v_lo_ok=put(state.v_lo_ok, out.v_lo_ok & mask),
                    v_prev=put(state.v_prev, out.v_prev),
                    v_prev_ok=put(state.v_prev_ok, out.v_prev_ok & mask),
                )

            return compacted

        def full_width(state, steps=steps):
            return _march(march, dir2, rays, state, steps, gcfg, fcfg)

        branches = [make_compacted(c) for c in ladder] + [full_width]
        # smallest ladder index whose capacity fits the survivor count;
        # len(ladder) = the full-width escape
        bucket = jnp.searchsorted(
            jnp.asarray(ladder, dtype=jnp.int32), count, side="left")
        state = jax.lax.switch(bucket, branches, state)

    found = state.found

    if not refine:
        s_mid = 0.5 * (state.lo + state.hi)
        pts = (origins + s_mid[:, None] * dirs)
        z3 = jnp.zeros((n, 3), jnp.float32)
        return RaycastResult(
            depth=jnp.where(found, s_mid, 0.0),
            points=jnp.where(found[:, None], pts, 0.0),
            normal=z3,
            hit=found,
        )

    def _refine(rays_c: _Rays, lo, hi, v_lo, v_hi, v_lo_ok):
        """Value-tracking bisection (march field, 2 gathers/iter) + a final
        secant interpolation + straight-through Newton/IFT polish; one
        semi-implicit query serves both polish and the output normal.
        Returns (s_hit, pts [.,3], normal [.,3]).

        The march carries the field values at the bracket endpoints, so the
        classic TSDF crossing interpolation (linear between the last
        free-space dist and the first non-negative dist, KinectFusion-style)
        comes for free; each optional bisection round halves the bracket
        AND refreshes the endpoint values. Measured (PERF_NOTES.md): the
        secant at bisect_steps=2 beats plain midpoint at bisect_steps=5,
        saving 6 compacted march-field gathers per render; a Newton step on
        the SEMI-IMPLICIT field instead was 3x worse (its grad_scale-biased
        zero level is offset from the dist-field zero)."""

        def bisect(_, carry):
            lo, hi, v_lo, v_hi, v_lo_ok = carry
            mid = 0.5 * (lo + hi)
            px = rays_c.ox + mid * rays_c.dx
            py = rays_c.oy + mid * rays_c.dy
            pz = rays_c.oz + mid * rays_c.dz
            val, observed, _, _ = _march_probe(march, dir2, px, py, pz, gcfg)
            before = ~observed | (val < 0.0)  # still in free space
            lo = jnp.where(before, mid, lo)
            v_lo = jnp.where(before, val, v_lo)
            v_lo_ok = jnp.where(before, observed, v_lo_ok)
            hi = jnp.where(before, hi, mid)
            v_hi = jnp.where(before, v_hi, val)
            return lo, hi, v_lo, v_hi, v_lo_ok

        lo, hi, v_lo, v_hi, v_lo_ok = jax.lax.fori_loop(
            0, bisect_steps, bisect, (lo, hi, v_lo, v_hi, v_lo_ok)
        )

        # secant (false-position) estimate where both endpoint values are
        # usable; bracket midpoint otherwise. The interpolation runs
        # between the bracket voxels' CENTER projections onto the ray, not
        # the probe positions: the march field is constant per voxel, so
        # probe positions are march-path-dependent noise while the center
        # projections make the result identical for every march that
        # brackets the same voxel pair (windowed and unwindowed renders
        # agree exactly off the silhouette tails).
        inv_vs = 1.0 / gcfg.voxel_size

        def s_of_center(s):
            px = rays_c.ox + s * rays_c.dx
            py = rays_c.oy + s * rays_c.dy
            pz = rays_c.oz + s * rays_c.dz
            cx = jnp.round(px * inv_vs) * gcfg.voxel_size
            cy = jnp.round(py * inv_vs) * gcfg.voxel_size
            cz = jnp.round(pz * inv_vs) * gcfg.voxel_size
            # dirs are unit vectors: the center's closest ray parameter
            return ((cx - rays_c.ox) * rays_c.dx
                    + (cy - rays_c.oy) * rays_c.dy
                    + (cz - rays_c.oz) * rays_c.dz)

        s_lo_c = s_of_center(lo)
        s_hi_c = s_of_center(hi)
        dv = v_hi - v_lo
        use_sec = (v_lo_ok & (v_lo < 0.0) & (v_hi >= 0.0) & (dv > 1e-12)
                   & (s_hi_c > s_lo_c))
        s_star = jnp.where(
            use_sec,
            s_lo_c + (s_hi_c - s_lo_c) * (-v_lo) / jnp.where(use_sec, dv,
                                                             1.0),
            0.5 * (lo + hi),
        )

        # one differentiable Newton/IFT step from the stop-gradient'ed
        # secant point (module docstring)
        s_mid = jax.lax.stop_gradient(s_star)
        o_c = jnp.stack([rays_c.ox, rays_c.oy, rays_c.oz], axis=-1)
        d_c = jnp.stack([rays_c.dx, rays_c.dy, rays_c.dz], axis=-1)
        pts_mid = o_c + s_mid[..., None] * d_c
        pts_frozen = jax.lax.stop_gradient(pts_mid)
        phi_mid, grad_mid, w_mid = query.tsdf_grad(grid, pts_frozen, gcfg,
                                                   fcfg)
        g_sem = jax.lax.stop_gradient(grad_mid)
        phi_lin = phi_mid + jnp.sum(g_sem * (pts_mid - pts_frozen), axis=-1)
        denom = jax.lax.stop_gradient(jnp.sum(grad_mid * d_c, axis=-1))
        # at a valid crossing the field increases along the ray (denom > 0);
        # floor the denominator for near-tangent rays
        safe = (w_mid > 0.0) & (denom > 0.0)
        denom_f = jnp.maximum(denom, 0.25 * fcfg.grad_scale)
        s_ift = s_mid - phi_lin / denom_f
        # straight-through: VALUE = the secant estimate (the march field's
        # macro zero crossing), GRADIENT = the IFT expression. Using the
        # IFT value directly was measured 3x less accurate — the
        # semi-implicit field's zero level is offset from the dist field's.
        s_hit = jnp.where(safe,
                          s_mid + s_ift - jax.lax.stop_gradient(s_ift),
                          s_mid)
        gn = jnp.linalg.norm(grad_mid, axis=-1, keepdims=True)
        normal = -grad_mid / jnp.maximum(gn, 1e-12)  # stored grads: inward
        pts = o_c + s_hit[..., None] * d_c
        return s_hit, pts, normal

    # refinement runs compacted on the hit rays when they are a minority
    # (scatter results back); full width otherwise
    hit_cap = max(1, (3 * n) // 10)
    n_hit = jnp.sum(found.astype(jnp.int32))
    (hidx,) = jnp.nonzero(found, size=hit_cap, fill_value=0)
    hmask = jnp.arange(hit_cap, dtype=jnp.int32) < n_hit

    def refine_compacted(state):
        s_c, pts_c, nrm_c = _refine(_gather_rays(rays, hidx),
                                    state.lo[hidx], state.hi[hidx],
                                    state.v_lo[hidx], state.v_hi[hidx],
                                    state.v_lo_ok[hidx])
        tgt = jnp.where(hmask, hidx, n)
        depth = jnp.zeros((n,), jnp.float32).at[tgt].set(s_c, mode="drop")
        points = jnp.zeros((n, 3), jnp.float32).at[tgt].set(pts_c,
                                                            mode="drop")
        normal = jnp.zeros((n, 3), jnp.float32).at[tgt].set(nrm_c,
                                                            mode="drop")
        return depth, points, normal

    def refine_full(state):
        return _refine(rays, state.lo, state.hi,
                       state.v_lo, state.v_hi, state.v_lo_ok)

    depth, points, normal = jax.lax.cond(
        n_hit <= hit_cap, refine_compacted, refine_full, state
    )

    return RaycastResult(
        depth=jnp.where(found, depth, 0.0),
        points=jnp.where(found[..., None], points, 0.0),
        normal=jnp.where(found[..., None], normal, 0.0),
        hit=found,
    )


def block_raster_windows(grid: vg.VoxelGrid, K, R, t,
                         width: int, height: int, gcfg: GridConfig,
                         *, tile: int = 16, max_span: int = 4,
                         active_cap: int = 4096,
                         occlusion_zcap: bool = False):
    """EXACT per-pixel march windows by rasterizing the active blocks.

    Every observed zero crossing lies inside an allocated block (fusion
    allocates the whole truncation band, MapGradPixelSdf.cpp:101-116), so
    the union of the active blocks' bounding spheres bounds the surface:
    each block is projected to the image, its conservative ray-parameter
    range [|q| - r, |q| + r] scatter-min/maxed into a (H/tile x W/tile)
    tile grid, and pixels take their tile's hull. Pixels whose tile no
    block covers are EXACT misses — unlike the coarse stride-prior's
    all-miss heuristic, no geometry of any size can be skipped.

    Conservative escapes (windows only widen, never drop coverage):
      * blocks whose projected span exceeds `max_span` tiles, or that
        straddle the camera plane, contribute a GLOBAL range to every tile;
      * more than `active_cap` active blocks -> full-range windows.

    Returns (s_lo [H*W], s_hi [H*W]) ray-parameter bounds; empty windows
    have s_lo > s_hi. Cost: one dense pass over `active_cap` blocks plus
    ~3 scatters of active_cap * max_span^2 elements (~1-4 ms) — replaces
    the stride-prior's low-res MARCH entirely.
    """
    vs = gcfg.voxel_size
    bs = gcfg.block_shape
    nb = grid.num_blocks
    cap = min(active_cap, nb)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    WT = -(-width // tile)
    HT = -(-height // tile)

    bc = grid.block_coords[:cap]
    alive = jnp.arange(cap, dtype=jnp.int32) < grid.num_active
    # block center / bounding radius (voxel i spans [i*vs - vs/2, +vs/2])
    ccx = (bc[:, 0].astype(jnp.float32) * bs + 0.5 * (bs - 1)) * vs
    ccy = (bc[:, 1].astype(jnp.float32) * bs + 0.5 * (bs - 1)) * vs
    ccz = (bc[:, 2].astype(jnp.float32) * bs + 0.5 * (bs - 1)) * vs
    r = 0.5 * bs * vs * jnp.sqrt(3.0).astype(jnp.float32)

    dx_ = ccx - t[0]
    dy_ = ccy - t[1]
    dz_ = ccz - t[2]
    qx = R[0, 0] * dx_ + R[1, 0] * dy_ + R[2, 0] * dz_
    qy = R[0, 1] * dx_ + R[1, 1] * dy_ + R[2, 1] * dz_
    qz = R[0, 2] * dx_ + R[1, 2] * dy_ + R[2, 2] * dz_
    s_c = jnp.sqrt(qx * qx + qy * qy + qz * qz)
    lo_b = jnp.maximum(s_c - r, 0.0)
    hi_b = s_c + r

    behind = alive & (qz + r <= 0.0)          # no forward ray reaches it
    near = alive & ~behind & (qz <= r)        # straddles the camera plane
    proj = alive & ~behind & ~near
    qz_safe = jnp.where(proj, qz, 1.0)
    u = fx * qx / qz_safe + cx
    v = fy * qy / qz_safe + cy
    # conservative silhouette half-extent: the naive fx*r/(qz-r) bound is
    # exact only on-axis; an off-axis sphere's screen silhouette extends up
    # to |q|/qz times further (the tangent cone tilts with the center ray),
    # so scale by s_c/qz >= 1. The same bound gates the offscreen cull below
    # so a partially visible block can never be wrongly culled.
    sil = s_c / qz_safe
    ru = fx * r * sil / jnp.maximum(qz_safe - r, 1e-6)
    rv = fy * r * sil / jnp.maximum(qz_safe - r, 1e-6)
    tx0 = jnp.clip(jnp.floor((u - ru) / tile).astype(jnp.int32), 0, WT - 1)
    tx1 = jnp.clip(jnp.floor((u + ru) / tile).astype(jnp.int32), 0, WT - 1)
    ty0 = jnp.clip(jnp.floor((v - rv) / tile).astype(jnp.int32), 0, HT - 1)
    ty1 = jnp.clip(jnp.floor((v + rv) / tile).astype(jnp.int32), 0, HT - 1)
    offscreen = proj & ((u + ru < 0) | (u - ru >= width)
                        | (v + rv < 0) | (v - rv >= height))
    proj = proj & ~offscreen
    wide = proj & ((tx1 - tx0 >= max_span) | (ty1 - ty0 >= max_span))
    proj = proj & ~wide

    # global (all-tile) contribution from near/wide blocks
    glob = near | wide
    glob_lo = jnp.min(jnp.where(glob, lo_b, jnp.inf))
    glob_hi = jnp.max(jnp.where(glob, hi_b, -jnp.inf))

    # scatter each projecting block's range into its covered tiles
    ii = jnp.arange(max_span, dtype=jnp.int32)
    tyi = ty0[:, None] + ii[None, :]                       # [cap, S]
    txj = tx0[:, None] + ii[None, :]
    ok_y = proj[:, None] & (tyi <= ty1[:, None])
    ok_x = txj <= tx1[:, None]
    idx = tyi[:, :, None] * WT + txj[:, None, :]           # [cap, S, S]
    ok = ok_y[:, :, None] & ok_x[:, None, :]
    nt = WT * HT
    idx = jnp.where(ok, idx, nt).reshape(-1)
    lo_s = jnp.broadcast_to(lo_b[:, None, None],
                            (cap, max_span, max_span)).reshape(-1)
    hi_s = jnp.broadcast_to(hi_b[:, None, None],
                            (cap, max_span, max_span)).reshape(-1)
    tiles_lo = jnp.full((nt,), jnp.inf).at[idx].min(lo_s, mode="drop")
    tiles_hi = jnp.full((nt,), -jnp.inf).at[idx].max(hi_s, mode="drop")
    tiles_lo = jnp.minimum(tiles_lo, glob_lo)
    tiles_hi = jnp.maximum(tiles_hi, glob_hi)

    if occlusion_zcap:
        # OCCLUSION Z-CAP — probed round 5 and REJECTED AS UNSOUND; kept
        # ONLY so tools/probe_raycast_occl_zcap.py reproduces the
        # measurement. NEVER default this on. The idea: a tile whose pixel
        # square lies entirely inside one block's projected
        # inscribed-sphere silhouette caps its window at that block's far
        # range ("first covering surface occludes everything behind").
        # The flaw: an allocated block's truncation band can clip a corner
        # or run oblique without blocking all of the tile's rays, so the
        # cap drops REAL geometry behind silhouettes. Measured on the
        # bench raycast scene (vs=1 cm, 875 active blocks): 683 of 76,641
        # hits LOST, depth errors up to 2.4 m, for a ~3% window
        # tightening (PERF_NOTES.md round 5). Same family as the round-4
        # raster-hull-fallback reversion: hull geometry without a per-ray
        # occlusion proof loses coverage exactly at silhouettes.
        r_in = r / jnp.sqrt(3.0).astype(jnp.float32)  # inscribed sphere
        ru_in = fx * r_in / (qz_safe + r)
        rv_in = fy * r_in / (qz_safe + r)
        ctx0 = jnp.clip(jnp.ceil((u - ru_in) / tile).astype(jnp.int32),
                        0, WT - 1)
        ctx1 = jnp.clip(jnp.floor((u + ru_in) / tile).astype(jnp.int32) - 1,
                        0, WT - 1)
        cty0 = jnp.clip(jnp.ceil((v - rv_in) / tile).astype(jnp.int32),
                        0, HT - 1)
        cty1 = jnp.clip(jnp.floor((v + rv_in) / tile).astype(jnp.int32) - 1,
                        0, HT - 1)
        cov = proj & (ctx1 >= ctx0) & (cty1 >= cty0)
        tyc = cty0[:, None] + ii[None, :]
        txc = ctx0[:, None] + ii[None, :]
        oky = cov[:, None] & (tyc <= cty1[:, None])
        okx = txc <= ctx1[:, None]
        idx_c = tyc[:, :, None] * WT + txc[:, None, :]
        okc = oky[:, :, None] & okx[:, None, :]
        idx_c = jnp.where(okc, idx_c, nt).reshape(-1)
        tiles_cap = jnp.full((nt,), jnp.inf).at[idx_c].min(
            hi_s, mode="drop")
        tiles_hi = jnp.minimum(tiles_hi, tiles_cap)

    # tiles -> pixels (empty tile: lo=inf > hi=-inf -> instant miss)
    img_lo = jnp.repeat(jnp.repeat(tiles_lo.reshape(HT, WT), tile, 0),
                        tile, 1)[:height, :width].reshape(-1)
    img_hi = jnp.repeat(jnp.repeat(tiles_hi.reshape(HT, WT), tile, 0),
                        tile, 1)[:height, :width].reshape(-1)

    # conservative escape: too many active blocks -> full range everywhere
    over = grid.num_active > cap
    img_lo = jnp.where(over, 0.0, img_lo)
    img_hi = jnp.where(over, jnp.inf, img_hi)
    return img_lo, img_hi


def camera_rays(K, R, t, width: int, height: int):
    """Per-pixel world-space rays for a camera-to-world pose.

    Returns (origins [H*W,3], dirs [H*W,3] unit, inv_hnorm [H*W]) where
    camera-z depth = ray length * inv_hnorm."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = (jnp.arange(width, dtype=jnp.float32) - cx) / fx
    v = (jnp.arange(height, dtype=jnp.float32) - cy) / fy
    x0, y0 = jnp.meshgrid(u, v)
    h = jnp.stack([x0, y0, jnp.ones_like(x0)], axis=-1).reshape(-1, 3)
    hnorm = jnp.linalg.norm(h, axis=-1, keepdims=True)
    d_cam = h / hnorm
    dirs = jnp.einsum("ij,nj->ni", R, d_cam, precision=jax.lax.Precision.HIGHEST)
    origins = jnp.broadcast_to(t, dirs.shape)
    return origins, dirs, (1.0 / hnorm[..., 0])


def _neighborhood_minmax(img: jax.Array, mask: jax.Array):
    """3x3 min/max over `img` counting only masked entries; also returns
    whether any neighbor is masked. Edge-padded (a wrap would import hit
    windows from the opposite image border and could mask real geometry)."""
    h, w = img.shape
    big = jnp.pad(jnp.where(mask, img, jnp.inf), 1, constant_values=jnp.inf)
    small = jnp.pad(jnp.where(mask, img, -jnp.inf), 1,
                    constant_values=-jnp.inf)
    maskp = jnp.pad(mask, 1, constant_values=False)
    mn = jnp.full_like(img, jnp.inf)
    mx = jnp.full_like(img, -jnp.inf)
    anym = jnp.zeros_like(mask)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            mn = jnp.minimum(mn, jax.lax.dynamic_slice(big, (dy, dx), (h, w)))
            mx = jnp.maximum(mx, jax.lax.dynamic_slice(small, (dy, dx),
                                                       (h, w)))
            anym = anym | jax.lax.dynamic_slice(maskp, (dy, dx), (h, w))
    return mn, mx, anym


def render_depth_normal(
    grid: vg.VoxelGrid,
    K,
    R,
    t,
    width: int,
    height: int,
    gcfg: GridConfig,
    fcfg: FusionConfig,
    *,
    prior_stride: int = 4,
    prior_mode: str = "stride",
    prior_miss_skip: bool = True,
    prior_occlusion_zcap: bool = False,
    depth_prior: Optional[jax.Array] = None,
    depth_prior_holes: str = "march",
    prior_margin_voxels: Optional[float] = None,
    s_min: float = 0.1,
    s_max: float = 5.0,
    **kw,
):
    """Render a depth (camera-z) and normal image from pose (R, t).

    With `prior_stride` > 1 a low-res prior pass (1/stride^2 of the rays)
    marches first and each full-res ray then marches only inside the
    [min - margin, max + margin] hit range of its coarse 3x3 neighborhood —
    the min/max range-image technique. With `prior_miss_skip` (default),
    rays whose WHOLE coarse neighborhood missed are declared misses without
    marching — the policy of production voxel-hashing raycasters; only
    geometry thinner than the prior stride (4 px) can be lost. Set
    `prior_miss_skip=False` to march those rays over the full range
    instead, or `prior_stride=0` to disable the prior entirely.

    `depth_prior` (optional [H, W] camera-z image, e.g. the previous fused
    frame's depth in frame-to-model loops) replaces the prior pass: each
    ray marches a +-margin window around its prior depth, where margin is
    `prior_margin_voxels * voxel_size` if given and T + 2 voxels otherwise.
    The default is safe against any prior error below the truncation
    distance; frame-to-model loops at tracking frame rates move the
    reprojected surface by a few voxels at most, so 4-6 voxels roughly
    halves the march probes per ray (measured, PERF_NOTES.md) — rays whose
    window misses the moved surface fall back to a miss for that frame.
    `depth_prior_holes` decides prior-hole (depth 0) rays: "march" (default,
    safe) marches them over the full range; "skip" declares them misses —
    the incremental frame-to-model policy when holes mean "nothing fused
    there last frame".
    """
    origins, dirs, inv_hnorm = camera_rays(K, R, t, width, height)
    T = fcfg.trunc_voxels * gcfg.voxel_size
    # margin applies to BOTH prior flavors (per-pixel depth prior and the
    # coarse stride-prior windows below)
    margin = (float(prior_margin_voxels) * gcfg.voxel_size
              if prior_margin_voxels is not None
              else T + 2.0 * gcfg.voxel_size)

    s_lo = s_hi = None
    if depth_prior is None and prior_mode == "raster":
        # EXACT culling prior: active blocks rasterized to screen tiles,
        # per-pixel windows = hull of the covering blocks' ray-parameter
        # ranges (block_raster_windows). No low-res march, no
        # sub-coarse-pixel miss heuristic — tiles no block covers are
        # provably empty of observed crossings.
        s_lo, s_hi = block_raster_windows(grid, K, R, t, width, height,
                                          gcfg,
                                          occlusion_zcap=prior_occlusion_zcap)
    elif depth_prior is not None:
        # Prior windows bound every WINDOWED ray to a few probes, so the
        # pre-compacted burst finishes them all and the straggler
        # re-compaction rounds are pure overhead: default to burst-only —
        # but only when holes are skipped (the incremental frame-to-model
        # mode). Under holes="march" hole rays march the full [s_min,s_max]
        # range, the rationale doesn't hold, and a sparse prior would push
        # every hole ray into the full-width fallback for the whole
        # max_steps budget — keep the straggler rounds there. Measured
        # (one v5e, VGA, 4-voxel margin, holes="skip"):
        # 89.5 -> 56.4 ms (3.4 -> 5.4 Mrays/s), bit-identical hits/depths
        # (rays overflowing the burst's 3N/8 compaction cap still fall
        # back to a full-width march).
        if depth_prior_holes == "skip":
            kw.setdefault("compact_divisors", ())
        sp = (depth_prior / inv_hnorm.reshape(height, width)).reshape(-1)
        ok = depth_prior.reshape(-1) > 0
        if depth_prior_holes == "skip":
            s_lo = jnp.where(ok, jnp.maximum(sp - margin, s_min), s_max)
            s_hi = jnp.where(ok, jnp.minimum(sp + margin, s_max),
                             s_min - 1.0)
        else:
            s_lo = jnp.where(ok, jnp.maximum(sp - margin, s_min), s_min)
            s_hi = jnp.where(ok, jnp.minimum(sp + margin, s_max), s_max)
    elif prior_stride and prior_stride > 1 and width % prior_stride == 0 \
            and height % prior_stride == 0:
        wc, hc = width // prior_stride, height // prior_stride
        # coarse rays = the full-res rays at strided pixel centers
        d_img = dirs.reshape(height, width, 3)
        o_img = origins.reshape(height, width, 3)
        off = prior_stride // 2
        d_c = d_img[off::prior_stride, off::prior_stride].reshape(-1, 3)
        o_c = o_img[off::prior_stride, off::prior_stride].reshape(-1, 3)
        # EXACT block-raster windows bound the COARSE pass (round 4): the
        # coarse pass previously marched its ~75% background rays over the
        # full [s_min, s_max] range just to conclude "miss" — tiles no
        # active block covers are provably empty of observed crossings, so
        # those rays now die instantly, and covered rays march only the
        # covering blocks' ray-parameter hull (~1-2 ms of tiny scatters).
        # Note the asymmetry with the full-res pass: using the same hull
        # windows there was measured WORSE (PERF_NOTES.md round 3/4 raster
        # sections — no occlusion in a hull, so full-res silhouette rays
        # march the whole front-to-back gap), but the coarse pass keeps its
        # own hit-window output, so here the hull only replaces "no bound
        # at all" and cannot lose coverage the stride prior had.
        rw_lo, rw_hi = block_raster_windows(grid, K, R, t, width, height,
                                            gcfg,
                                            occlusion_zcap=prior_occlusion_zcap)
        rw_lo_i = rw_lo.reshape(height, width)
        rw_hi_i = rw_hi.reshape(height, width)
        rw_lo_c = rw_lo_i[off::prior_stride, off::prior_stride].reshape(-1)
        rw_hi_c = rw_hi_i[off::prior_stride, off::prior_stride].reshape(-1)
        res_c = raycast(grid, o_c, d_c, gcfg, fcfg,
                        s_min=s_min, s_max=s_max,
                        s_lo=rw_lo_c, s_hi=rw_hi_c, refine=False, **kw)
        sc = res_c.depth.reshape(hc, wc)
        mc = res_c.hit.reshape(hc, wc)
        mn, mx, anyhit = _neighborhood_minmax(sc, mc)
        if prior_miss_skip:
            # all-miss neighborhood -> empty window (ray never marches).
            # Replacing this heuristic with the pixel's raster hull window
            # was MEASURED WORSE AND less consistent (round 4, one v5e:
            # 116 -> 188 ms — hull windows have no occlusion, so
            # silhouette-adjacent rays march the whole front-to-back gap
            # and dominate the straggler rounds; bracket artifacts up to
            # 0.56 m appeared where hulls start behind the first sheet).
            # prior_mode="raster" remains the exact-coverage option.
            lo_c = jnp.where(anyhit, jnp.maximum(mn - margin, s_min), s_max)
            hi_c = jnp.where(anyhit, jnp.minimum(mx + margin, s_max),
                             s_min - 1.0)
        else:
            lo_c = jnp.where(anyhit, jnp.maximum(mn - margin, s_min), s_min)
            hi_c = jnp.where(anyhit, jnp.minimum(mx + margin, s_max), s_max)
        s_lo = jnp.repeat(jnp.repeat(lo_c, prior_stride, 0), prior_stride, 1)
        s_hi = jnp.repeat(jnp.repeat(hi_c, prior_stride, 0), prior_stride, 1)
        s_lo = s_lo.reshape(-1)
        s_hi = s_hi.reshape(-1)

    res = raycast(grid, origins, dirs, gcfg, fcfg,
                  s_min=s_min, s_max=s_max, s_lo=s_lo, s_hi=s_hi, **kw)
    depth = (res.depth * inv_hnorm).reshape(height, width)
    normal = res.normal.reshape(height, width, 3)
    hit = res.hit.reshape(height, width)
    return depth, normal, hit
