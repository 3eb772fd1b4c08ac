"""Marching cubes over the block-sparse grid.

Replaces the reference's layered streaming MC
(`cpp/include/mesh/LayeredMarchingCubesNoColor.cpp:357-561`: dense two-slice
z-sweep over the hash map's bounding box) with a block-parallel design: each
occupied 8^3 block gathers a (8+1)^3 padded corner field from itself and its
7 upper neighbors, classifies all 512 cubes at once against the 256-case
lookup tables, and interpolates edge vertices — one `vmap` over blocks,
chunked to bound memory. Cube gating matches the reference: a cube emits
geometry only if all 8 corners have weight > 0
(`computeLutIndex`, :611-636), and zero-crossing interpolation is clamped
(:642-662).

The edge/triangle tables are NOT copied constants: they are *generated* at
import time by a correct-by-construction algorithm (face-cycle walking with
the "separate the inside corners" rule on ambiguous faces, which is
symmetric under inside/outside complement on the shared face pattern, so
adjacent cubes always agree -> watertight meshes; see tests/test_mc_tables).

Corner convention: corner i sits at offset ((i)&1, (i>>1)&1, (i>>2)&1);
"inside" = dist < iso. Triangles are wound counter-clockwise seen from the
outside (positive side).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GridConfig
from . import voxel_grid as vg

MAX_TRIS = 6  # per cube; generator asserts the true max fits

# ---------------------------------------------------------------------------
# table generation
# ---------------------------------------------------------------------------

CORNER_OFFSETS = np.array([[(i >> a) & 1 for a in range(3)] for i in range(8)])


def _make_edges():
    edges = []
    for axis in range(3):
        for i in range(8):
            o = CORNER_OFFSETS[i]
            if o[axis] == 0:
                j_off = o.copy()
                j_off[axis] = 1
                j = int(j_off[0] + 2 * j_off[1] + 4 * j_off[2])
                edges.append((i, j))
    # deterministic order: axis-major, then corner index
    return edges


EDGES = _make_edges()  # 12 (a, b) corner pairs
EDGE_INDEX = {frozenset(e): k for k, e in enumerate(EDGES)}


def _faces():
    """6 faces as (axis, side, [4 corner ids in cyclic order])."""
    faces = []
    for axis in range(3):
        u, v = [a for a in range(3) if a != axis]
        for side in (0, 1):
            cyc = []
            for du, dv in [(0, 0), (1, 0), (1, 1), (0, 1)]:
                o = [0, 0, 0]
                o[axis] = side
                o[u] = du
                o[v] = dv
                cyc.append(int(o[0] + 2 * o[1] + 4 * o[2]))
            faces.append((axis, side, cyc))
    return faces


FACES = _faces()


@functools.lru_cache(maxsize=1)
def build_tables():
    """Generate (edge_table [256] uint16, tri_table [256, MAX_TRIS*3] int8).

    For each of the 256 inside/outside configurations, cut edges are linked
    into closed cycles by walking faces: on each face the crossing segments
    pair cut edges; ambiguous faces (two diagonal inside corners) always
    *separate* the inside corners. Cycles are oriented by Newell normal
    against the local inside->outside direction and fan-triangulated.
    """
    tri_table = np.full((256, MAX_TRIS * 3), -1, dtype=np.int8)
    edge_table = np.zeros(256, dtype=np.int32)

    corner_pos = CORNER_OFFSETS.astype(np.float64)
    edge_mid = np.array([(corner_pos[a] + corner_pos[b]) * 0.5 for a, b in EDGES])

    # face adjacency: edge -> two faces containing it
    edge_faces = {k: [] for k in range(12)}
    face_edges_cyclic = []
    for fi, (axis, side, cyc) in enumerate(FACES):
        fe = []
        for idx in range(4):
            a, b = cyc[idx], cyc[(idx + 1) % 4]
            e = EDGE_INDEX[frozenset((a, b))]
            fe.append(e)
            edge_faces[e].append(fi)
        face_edges_cyclic.append(fe)

    for config in range(256):
        inside = [(config >> i) & 1 for i in range(8)]
        cut = [k for k, (a, b) in enumerate(EDGES) if inside[a] != inside[b]]
        if not cut:
            continue
        edge_table[config] = sum(1 << k for k in cut)

        # pair cut edges on each face
        partner = {}  # (edge, face) -> edge
        for fi, (axis, side, cyc) in enumerate(FACES):
            fcut = [e for e in face_edges_cyclic[fi] if e in cut]
            if not fcut:
                continue
            if len(fcut) == 2:
                e0, e1 = fcut
                partner[(e0, fi)] = e1
                partner[(e1, fi)] = e0
            else:  # 4 cut edges: diagonal pattern; separate inside corners
                assert len(fcut) == 4
                ins = [c for c in cyc if inside[c]]
                assert len(ins) == 2
                for c in ins:
                    inc = [
                        e
                        for e in fcut
                        if c in EDGES[e]
                    ]
                    assert len(inc) == 2
                    partner[(inc[0], fi)] = inc[1]
                    partner[(inc[1], fi)] = inc[0]

        # walk cycles
        visited = set()
        cycles = []
        for start in cut:
            if start in visited:
                continue
            cycle = [start]
            visited.add(start)
            face = edge_faces[start][0]
            cur = start
            while True:
                nxt = partner[(cur, face)]
                if nxt == cycle[0]:
                    break
                cycle.append(nxt)
                visited.add(nxt)
                f1, f2 = edge_faces[nxt]
                face = f2 if f1 == face else f1
                cur = nxt
            cycles.append(cycle)

        # orient + fan-triangulate
        tris = []
        for cycle in cycles:
            pts = edge_mid[cycle]
            # Newell normal
            nrm = np.zeros(3)
            for i in range(len(cycle)):
                p, q = pts[i], pts[(i + 1) % len(cycle)]
                nrm += np.cross(p, q)
            # inside -> outside direction from the cycle's own cut edges
            direc = np.zeros(3)
            for e in cycle:
                a, b = EDGES[e]
                if inside[a]:
                    direc += corner_pos[b] - corner_pos[a]
                else:
                    direc += corner_pos[a] - corner_pos[b]
            if np.dot(nrm, direc) < 0:
                cycle = cycle[::-1]
            for i in range(1, len(cycle) - 1):
                tris.append((cycle[0], cycle[i], cycle[i + 1]))

        assert len(tris) <= MAX_TRIS, (config, len(tris))
        flat = [v for t in tris for v in t]
        tri_table[config, : len(flat)] = flat

    return edge_table, tri_table


# ---------------------------------------------------------------------------
# device-side extraction
# ---------------------------------------------------------------------------


def _gather_padded(grid: vg.VoxelGrid, block_slots: jax.Array, gcfg: GridConfig,
                   color_field=None):
    """For each block slot, assemble padded (B+1)^3 dist & weight (and
    optionally color) fields from the block and its +x/+y/+z neighbors.
    Missing neighbors contribute weight 0 (their cubes are gated off,
    matching the all-corners rule)."""
    B = gcfg.block_shape
    coords = grid.block_coords[block_slots]  # [M, 3]

    offsets = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
         [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
        dtype=np.int32,
    )
    neigh_keys = vg.pack_key(coords[:, None, :] + offsets, gcfg)  # [M, 8]
    neigh_slots = vg.lookup_keys(grid, neigh_keys, gcfg)  # [M, 8]
    present = neigh_slots >= 0
    safe = jnp.where(present, neigh_slots, 0)

    # own block is offset (0,0,0) == index 0 (always present: it's the slot)
    d_blocks = grid.dist[safe]      # [M, 8, B^3]
    w_blocks = grid.weight[safe]
    w_blocks = jnp.where(present[..., None], w_blocks, 0.0)
    d_blocks = jnp.where(present[..., None], d_blocks, 0.0)
    # reshape to [M, 8, B, B, B] with index order [z, y, x]
    d_blocks = d_blocks.reshape(-1, 8, B, B, B)
    w_blocks = w_blocks.reshape(-1, 8, B, B, B)

    M = d_blocks.shape[0]
    P = B + 1
    dpad = jnp.zeros((M, P, P, P), jnp.float32)
    wpad = jnp.zeros((M, P, P, P), jnp.float32)

    def place(dst, src, oi):
        ox, oy, oz = offsets[oi]
        # source region within neighbor block, destination region in pad
        sx = slice(0, 1) if ox else slice(0, B)
        sy = slice(0, 1) if oy else slice(0, B)
        sz = slice(0, 1) if oz else slice(0, B)
        dx = slice(B, P) if ox else slice(0, B)
        dy = slice(B, P) if oy else slice(0, B)
        dz = slice(B, P) if oz else slice(0, B)
        return dst.at[:, dz, dy, dx].set(src[:, oi, sz, sy, sx])

    for oi in range(8):
        dpad = place(dpad, d_blocks, oi)
        wpad = place(wpad, w_blocks, oi)

    cpad = None
    if color_field is not None:
        C = color_field.shape[-1]
        c_blocks = color_field[safe]  # [M, 8, B^3, C]
        c_blocks = jnp.where(present[..., None, None], c_blocks, 0.0)
        c_blocks = c_blocks.reshape(-1, 8, B, B, B, C)
        cpad = jnp.zeros((M, P, P, P, C), jnp.float32)
        for oi in range(8):
            cpad = place(cpad, c_blocks, oi)
    return dpad, wpad, cpad, coords


def _extract_chunk(grid, block_slots, gcfg: GridConfig, iso: float,
                   edge_tab, tri_tab, color_field=None, origin: float = 0.0):
    """Triangles for a chunk of blocks.

    Returns (tri_verts [M, B^3, MAX_TRIS, 3, 3], tri_valid [M, B^3, MAX_TRIS]
    [, tri_colors [M, B^3, MAX_TRIS, 3, C]]).
    `origin` shifts all voxel centers (the HR lattice sits at
    voxel_size/2 * idx + voxel_size/4, `HrLayeredMarchingCubes.cpp:817-821`).
    """
    B = gcfg.block_shape
    dpad, wpad, cpad, coords = _gather_padded(grid, block_slots, gcfg,
                                              color_field)  # [M,P,P,P]
    M = dpad.shape[0]

    co = CORNER_OFFSETS  # [8,3] (x,y,z)
    # corner fields per cube: [M, B, B, B, 8] (cube index order z,y,x)
    d_c = jnp.stack(
        [dpad[:, co[i, 2]:co[i, 2] + B, co[i, 1]:co[i, 1] + B, co[i, 0]:co[i, 0] + B]
         for i in range(8)],
        axis=-1,
    )
    w_c = jnp.stack(
        [wpad[:, co[i, 2]:co[i, 2] + B, co[i, 1]:co[i, 1] + B, co[i, 0]:co[i, 0] + B]
         for i in range(8)],
        axis=-1,
    )

    cube_ok = jnp.all(w_c > 0.0, axis=-1)  # [M,B,B,B]
    config = jnp.sum(
        (d_c < iso).astype(jnp.int32) * (1 << np.arange(8)), axis=-1
    )
    config = jnp.where(cube_ok, config, 0)

    # interpolated vertex on each of the 12 edges: [M,B,B,B,12,3]
    ea = np.array([e[0] for e in EDGES])
    eb = np.array([e[1] for e in EDGES])
    da = d_c[..., ea]
    db = d_c[..., eb]
    denom = db - da
    frac = jnp.where(jnp.abs(denom) > 1e-12, (iso - da) / denom, 0.5)
    frac = jnp.clip(frac, 0.0, 1.0)  # clamped interpolation (ref :642-662)
    pa = co[ea].astype(np.float32)  # [12,3]
    pb = co[eb].astype(np.float32)
    everts = pa + frac[..., None] * (pb - pa)  # [M,B,B,B,12,3] cube-local

    # cube base voxel index -> world position
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(B), jnp.arange(B), jnp.arange(B), indexing="ij"
    )
    base = coords[:, None, None, None, :] * B + jnp.stack(
        [xx, yy, zz], axis=-1
    )  # [M,B,B,B,3]
    everts = (everts + base[..., None, :]) * gcfg.voxel_size + origin

    # triangle edge ids: [M,B,B,B,MAX_TRIS*3]
    tri_e = tri_tab[config]
    tvalid = tri_e[..., 0::3] >= 0  # [.., MAX_TRIS]
    tri_e_safe = jnp.maximum(tri_e, 0)
    tv = jnp.take_along_axis(
        everts, tri_e_safe[..., None].astype(jnp.int32), axis=-2
    )  # [M,B,B,B,MAX_TRIS*3,3]
    shape = tv.shape[:4]
    tv = tv.reshape(shape + (MAX_TRIS, 3, 3))
    tvalid = tvalid & cube_ok[..., None]
    out = (
        tv.reshape(M, B * B * B, MAX_TRIS, 3, 3),
        tvalid.reshape(M, B * B * B, MAX_TRIS),
    )
    if color_field is not None:
        C = color_field.shape[-1]
        c_c = jnp.stack(
            [cpad[:, co[i, 2]:co[i, 2] + B, co[i, 1]:co[i, 1] + B,
                  co[i, 0]:co[i, 0] + B, :] for i in range(8)],
            axis=-2,
        )  # [M,B,B,B,8,C]
        ca = c_c[..., ea, :]
        cb = c_c[..., eb, :]
        ecolors = ca + frac[..., None] * (cb - ca)  # [M,B,B,B,12,C]
        tc = jnp.take_along_axis(
            ecolors, tri_e_safe[..., None].astype(jnp.int32), axis=-2
        )
        tc = tc.reshape(shape + (MAX_TRIS, 3, C))
        out = out + (tc.reshape(M, B * B * B, MAX_TRIS, 3, C),)
    return out


def extract_mesh(grid: vg.VoxelGrid, gcfg: GridConfig, iso: float = 0.0,
                 chunk: int = 256, dedup: bool = True, color_field=None,
                 origin: float = 0.0):
    """Extract the iso-surface triangle mesh.

    Host-orchestrated: device computes per-chunk fixed-size triangle soup,
    host compacts + optionally dedups vertices (the reference appends
    duplicates, :705-711; dedup here shrinks meshes ~6x at no cost).
    Returns (vertices [V,3] f32, faces [F,3] i32) and, when `color_field`
    ([num_blocks, B^3, C]) is given, per-vertex colors [V, C].
    """
    edge_np, tri_np = build_tables()
    tri_tab = jnp.asarray(tri_np, jnp.int32)
    edge_tab = jnp.asarray(edge_np, jnp.int32)
    with_color = color_field is not None

    na = int(grid.num_active)
    verts_out = []
    colors_out = []
    extract_jit = jax.jit(
        lambda g, s, cf: _extract_chunk(g, s, gcfg, iso, edge_tab, tri_tab,
                                        cf, origin)
    ) if with_color else jax.jit(
        lambda g, s: _extract_chunk(g, s, gcfg, iso, edge_tab, tri_tab,
                                    None, origin)
    )
    for start in range(0, na, chunk):
        stop = min(start + chunk, na)
        slots = jnp.arange(start, stop, dtype=jnp.int32)
        if stop - start < chunk:  # pad to static shape
            slots = jnp.concatenate(
                [slots, jnp.zeros(chunk - (stop - start), jnp.int32)]
            )
        if with_color:
            tv, tvalid, tc = extract_jit(grid, slots, color_field)
        else:
            tv, tvalid = extract_jit(grid, slots)
        tv = np.asarray(tv[: stop - start])
        tvalid = np.asarray(tvalid[: stop - start])
        tris = tv[tvalid]  # [K, 3, 3]
        verts_out.append(tris.reshape(-1, 3))
        if with_color:
            tc = np.asarray(tc[: stop - start])
            colors_out.append(tc[tvalid].reshape(-1, tc.shape[-1]))

    empty = (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    if not verts_out:
        return empty + ((np.zeros((0, 3), np.float32),) if with_color else ())
    flat = np.concatenate(verts_out, axis=0)
    colors = np.concatenate(colors_out, axis=0) if with_color else None
    faces = np.arange(len(flat), dtype=np.int32).reshape(-1, 3)
    if dedup and len(flat):
        from .. import native

        quantum = gcfg.voxel_size * 1e-4
        nd = native.dedup_vertices(flat, quantum) if native.available() else None
        if nd is not None:
            verts, inv = nd
            faces = inv[faces].astype(np.int32)
            if with_color:
                # first-occurrence color per unique vertex (reverse pass so
                # earlier occurrences win)
                first = np.zeros(len(verts), np.int64)
                order = np.arange(len(flat))
                first[inv[::-1]] = order[::-1]
                colors = colors[first]
        else:
            keys = np.round(flat / quantum).astype(np.int64)
            _, idx, inv = np.unique(
                keys, axis=0, return_index=True, return_inverse=True
            )
            verts = flat[idx]
            faces = inv[faces].astype(np.int32)
            if with_color:
                colors = colors[idx]
        # drop degenerate triangles (iso-surface passing exactly through a
        # lattice corner collapses some triangles to edges/points)
        keep = (
            (faces[:, 0] != faces[:, 1])
            & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2])
        )
        faces = faces[keep]
    else:
        verts = flat
    if with_color:
        return verts, faces, colors
    return verts, faces
