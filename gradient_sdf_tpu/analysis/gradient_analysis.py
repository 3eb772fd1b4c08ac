"""Gradient-accuracy analysis on the synthetic sphere world (paper Fig. 3).

Python port of the reference's MATLAB validation
(`matlab/GradientAnalysisSpheres.m:42-224`, `matlab/phi_statistics.m:57-77`):
compares the *stored* per-voxel gradients against central/forward/backward
finite differences of the fused distance field, scoring both against the
analytic sphere normals, binned by distance-to-surface. This quantifies the
paper's core claim — stored gradients beat finite differences off the
surface — without MATLAB and without leaving the framework.

Consumes either a live grid (ops.voxel_grid) or the `save_sdf` text dumps
(format of `MapGradPixelSdf::save_sdf`, MapGradPixelSdf.cpp:222-296), which
also makes it the C++-parity harness for SDF dumps.
"""

from __future__ import annotations

import os
import numpy as np


def load_sdf_dump(prefix: str):
    """Read `<prefix>_grid_info.txt` + sparse value files into dense arrays.

    Returns dict with voxel_size, vmin, dim, and dense [X,Y,Z] arrays
    d, w, n0, n1, n2 (missing voxels: d=0, w=0)."""
    info = {}
    with open(prefix + "_grid_info.txt") as f:
        for line in f:
            key, _, vals = line.partition(":")
            info[key.strip()] = [float(v) for v in vals.split()]
    dim = np.array(info["voxel dim"], dtype=int)
    vmin = np.array(info["voxel min"], dtype=int)
    out = {"voxel_size": info["voxel size"][0], "dim": dim, "vmin": vmin}
    for name, suffix in [("d", "_sdf_d.txt"), ("w", "_sdf_weight.txt"),
                         ("n0", "_sdf_n0.txt"), ("n1", "_sdf_n1.txt"),
                         ("n2", "_sdf_n2.txt")]:
        arr = np.zeros(dim[0] * dim[1] * dim[2], np.float64)
        path = prefix + suffix
        if os.path.isfile(path):
            data = np.loadtxt(path)
            if data.size:
                data = np.atleast_2d(data)
                arr[data[:, 0].astype(int)] = data[:, 1]
        # lin = dim0*dim1*(z-zmin) + dim0*(y-ymin) + (x-xmin): x fastest
        out[name] = arr.reshape(dim[2], dim[1], dim[0]).transpose(2, 1, 0)
    return out


def _finite_diff(d: np.ndarray, w: np.ndarray, voxel_size: float):
    """Central/forward/backward gradients of the dense dist field; a
    component is valid only where the participating voxels are observed."""
    grads = {}
    valids = {}
    for mode in ("central", "forward", "backward"):
        g = np.zeros(d.shape + (3,))
        v = np.ones(d.shape, bool)
        for ax in range(3):
            dp = np.roll(d, -1, axis=ax)
            dm = np.roll(d, 1, axis=ax)
            wp = np.roll(w, -1, axis=ax) > 0
            wm = np.roll(w, 1, axis=ax) > 0
            if mode == "central":
                g[..., ax] = (dp - dm) / (2 * voxel_size)
                v &= wp & wm
            elif mode == "forward":
                g[..., ax] = (dp - d) / voxel_size
                v &= wp
            else:
                g[..., ax] = (d - dm) / voxel_size
                v &= wm
            # roll wraps; kill the boundary slices
            sl = [slice(None)] * 3
            sl[ax] = [0, -1]
            v[tuple(sl)] = False
        grads[mode] = g
        valids[mode] = v & (w > 0)
    return grads, valids


def angle_error_deg(g: np.ndarray, ref: np.ndarray) -> np.ndarray:
    gn = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    rn = ref / np.maximum(np.linalg.norm(ref, axis=-1, keepdims=True), 1e-12)
    cos = np.clip(np.sum(gn * rn, axis=-1), -1.0, 1.0)
    return np.degrees(np.arccos(cos))


def bin_stats(errors: np.ndarray, dist_to_surface: np.ndarray,
              bin_edges: np.ndarray):
    """Per-bin mean/median/rmse/95th percentile (phi_statistics.m:57-77)."""
    stats = []
    for lo, hi in zip(bin_edges[:-1], bin_edges[1:]):
        m = (np.abs(dist_to_surface) >= lo) & (np.abs(dist_to_surface) < hi)
        e = errors[m]
        if len(e) == 0:
            stats.append(dict(bin=(float(lo), float(hi)), count=0))
            continue
        stats.append(dict(
            bin=(float(lo), float(hi)), count=int(len(e)),
            mean=float(e.mean()), median=float(np.median(e)),
            rmse=float(np.sqrt((e ** 2).mean())),
            p95=float(np.percentile(e, 95)),
        ))
    return stats


def grid_points(dump: dict) -> np.ndarray:
    """World coordinates [X,Y,Z,3] of the dump's voxel centers."""
    vs = dump["voxel_size"]
    dim, vmin = dump["dim"], dump["vmin"]
    xs = (np.arange(dim[0]) + vmin[0]) * vs
    ys = (np.arange(dim[1]) + vmin[1]) * vs
    zs = (np.arange(dim[2]) + vmin[2]) * vs
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    return np.stack([X, Y, Z], axis=-1)


def box_true_field(pts: np.ndarray, centers: np.ndarray,
                   half_extents: np.ndarray):
    """Analytic union-box SDF + INWARD unit normal at points (numpy mirror
    of `data/synth.box_sdf`; inward sign matches the stored gradients).
    Exact a.e. — crease/edge lines themselves are measure zero."""
    d = pts[..., None, :] - centers
    q = np.abs(d) - half_extents
    out = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    qmax = q.max(axis=-1)
    sdf_b = out + np.minimum(qmax, 0.0)
    b = np.argmin(np.abs(sdf_b), axis=-1)
    sdf = np.take_along_axis(sdf_b, b[..., None], axis=-1)[..., 0]
    dn = np.take_along_axis(d, b[..., None, None], axis=-2)[..., 0, :]
    qn = np.take_along_axis(q, b[..., None, None], axis=-2)[..., 0, :]
    outn = np.take_along_axis(out, b[..., None], axis=-1)[..., 0]
    g_out = (np.sign(dn) * np.maximum(qn, 0.0)
             / np.maximum(outn[..., None], 1e-12))
    g_in = np.sign(dn) * np.eye(3)[qn.argmax(axis=-1)]
    grad = np.where((outn > 0.0)[..., None], g_out, g_in)
    return sdf, -grad


def analyze_boxes(dump: dict, centers: np.ndarray, half_extents: np.ndarray,
                  num_bins: int = 10, max_band_voxels: float = 10.0):
    """Gradient-accuracy analysis against the analytic BOX world (the
    crease/occlusion fixture, `data/synth.BoxWorld`): stored vs FD
    gradients scored against exact box normals — the planar-face analog of
    the paper's sphere analysis."""
    true_sdf, true_n = box_true_field(grid_points(dump), centers,
                                      half_extents)
    return _analyze_field(dump, true_sdf, true_n, num_bins, max_band_voxels)


def analyze(dump: dict, sphere_centers: np.ndarray, sphere_radii: np.ndarray,
            num_bins: int = 10, max_band_voxels: float = 10.0):
    """Full analysis: stored vs FD gradient angle errors binned by
    |distance to surface| (in voxels). Returns dict of method -> bin stats."""
    pts = grid_points(dump)
    diff = pts[..., None, :] - sphere_centers  # [...,S,3]
    dists = np.linalg.norm(diff, axis=-1) - sphere_radii
    s = np.argmin(np.abs(dists), axis=-1)
    true_sdf = np.take_along_axis(dists, s[..., None], axis=-1)[..., 0]
    nearest = np.take_along_axis(diff, s[..., None, None], axis=-2)[..., 0, :]
    # stored gradients are inward-pointing -> reference normal is -outward
    true_n = -nearest / np.maximum(
        np.linalg.norm(nearest, axis=-1, keepdims=True), 1e-12
    )
    return _analyze_field(dump, true_sdf, true_n, num_bins, max_band_voxels)


def _analyze_field(dump: dict, true_sdf: np.ndarray, true_n: np.ndarray,
                   num_bins: int, max_band_voxels: float):
    vs = dump["voxel_size"]
    w = dump["w"]
    stored = np.stack([dump["n0"], dump["n1"], dump["n2"]], axis=-1)
    fd, fd_valid = _finite_diff(dump["d"], w, vs)

    band = np.abs(true_sdf) < max_band_voxels * vs
    edges = np.linspace(0.0, max_band_voxels * vs, num_bins + 1)

    results = {}
    mask = (w > 0) & band & (np.linalg.norm(stored, axis=-1) > 1e-12)
    results["stored"] = bin_stats(
        angle_error_deg(stored[mask], true_n[mask]), true_sdf[mask], edges
    )
    for mode in ("central", "forward", "backward"):
        # the stored dist is NEGATIVE in observed free space (reference
        # sign convention, MapGradPixelSdf.cpp:95-101), so it INCREASES
        # toward the interior: its finite differences already point inward,
        # matching the stored-gradient convention — no sign flip. (A flip
        # lived here through round 4 and pushed every FD method to ~177 deg;
        # the "stored beats FD" comparison is only meaningful unflipped.)
        m = fd_valid[mode] & band
        results[mode] = bin_stats(
            angle_error_deg(fd[mode][m], true_n[m]), true_sdf[m], edges
        )
    return results
