#!/usr/bin/env python
"""Quantitative validation of the z-buffer partial renderer vs the
reference's Blender render model.

The reference produces training partials by rendering the MESH to a depth
map in Blender (``render/render_depth.py:33-141``: 8 random camera poses on
the unit sphere, 160x120, focal 100 px) and back-projecting depth pixels to
a world-frame cloud (``render/process_exr.py:34-86``).  This repo's stand-in
(``data/render.py``) instead z-buffer-splats the complete CLOUD and keeps
the visible subset.  This tool quantifies how statistically comparable the
two are, mesh-exactly:

- an **oracle renderer** re-implements the reference model without Blender:
  a software triangle rasterizer with the reference's exact camera
  (pinhole, 160x120, focal 100, camera 1 unit from the origin looking at
  it, -z forward / +z in pose convention as in ``random_pose``), depth
  z-buffer over mesh triangles with perspective-correct interpolation, and
  the reference back-projection;
- the **repo renderer** runs with the exact parameters ``make_dataset.py``
  uses (``generate_partials`` defaults).

Both render the SAME view directions of the SAME meshes (procedural
``gen_shapes`` categories, normalised to the unit diagonal like ShapeNet).
Reported per category + aggregate:

- visibility fraction: share of the complete surface captured by a view
  (fraction of complete-cloud points within eps of the partial);
- precision/recall of the z-buffer partial against the mesh-true oracle
  partial at eps (surface agreement);
- same-view cross-renderer Chamfer-L1 between loader-resampled 2048-pt
  partials, anchored against the cross-VIEW Chamfer (scale reference);
- point density (mean 1-NN spacing) of the resampled partials.

Usage: python tools/validate_render.py [--out RESULTS/render_validation.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vn_pointcloudcompletion_tpu.data.render import render_partial  # noqa: E402
import gen_shapes  # noqa: E402

WIDTH, HEIGHT, FOCAL = 160, 120, 100.0  # render_depth.py:88-90


def sample_mesh_surface(v, f, n, rng):
    """Area-weighted uniform surface sampling (mesh_sampling.cpp semantics)."""
    tri = v[f]  # (T, 3, 3)
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    probs = area / area.sum()
    idx = rng.choice(len(f), size=n, p=probs)
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    a, b, c = tri[idx, 0], tri[idx, 1], tri[idx, 2]
    return (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b + (
        r1 * r2
    )[:, None] * c


def pose_for_direction(d):
    """Reference pose convention (render_depth.py:33-50): camera at R[:,2]
    (unit distance), world->cam is R^T; Blender's camera looks along its
    local -z, i.e. toward the origin.  Build an R with third column d."""
    d = d / np.linalg.norm(d)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, d)) > 0.999:
        up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, d)
    x /= np.linalg.norm(x)
    y = np.cross(d, x)
    return np.stack([x, y, d], axis=1)  # columns = camera axes


def rasterize_depth(v, f, rot):
    """Depth map of the mesh from the reference camera (the Blender oracle).

    rot: (3,3) pose rotation, camera centre = rot[:, 2].  Returns (H, W)
    depth (+inf where empty) in the camera frame (depth = -z_cam, positive
    in front, Blender convention)."""
    eye = rot[:, 2]
    cam = (v - eye) @ rot  # world -> camera coords (R^T acting from right)
    # Blender camera: -z forward.  depth positive in front of the camera.
    depth_v = -cam[:, 2]
    zbuf = np.full((HEIGHT, WIDTH), np.inf)
    cx, cy = WIDTH / 2.0, HEIGHT / 2.0

    tris = f
    # cull triangles fully behind the camera
    dv = depth_v[tris]  # (T, 3)
    keep = (dv > 1e-6).all(axis=1)
    tris = tris[keep]
    if len(tris) == 0:
        return zbuf
    p = cam[tris]  # (T, 3, 3)
    d = depth_v[tris]  # (T, 3)
    # image coords (x right, y in image rows; orientation is irrelevant to
    # the statistics as long as projection/back-projection agree)
    u = FOCAL * p[:, :, 0] / d + cx
    w = FOCAL * p[:, :, 1] / d + cy
    inv_d = 1.0 / d

    for t in range(len(tris)):
        u0, u1, u2 = u[t]
        w0, w1, w2 = w[t]
        lo_u = max(int(np.floor(min(u0, u1, u2))), 0)
        hi_u = min(int(np.ceil(max(u0, u1, u2))) + 1, WIDTH)
        lo_w = max(int(np.floor(min(w0, w1, w2))), 0)
        hi_w = min(int(np.ceil(max(w0, w1, w2))) + 1, HEIGHT)
        if lo_u >= hi_u or lo_w >= hi_w:
            continue
        gu, gw = np.meshgrid(
            np.arange(lo_u, hi_u) + 0.5, np.arange(lo_w, hi_w) + 0.5
        )
        det = (u1 - u0) * (w2 - w0) - (u2 - u0) * (w1 - w0)
        if abs(det) < 1e-12:
            continue
        l1 = ((gu - u0) * (w2 - w0) - (gw - w0) * (u2 - u0)) / det
        l2 = ((gw - w0) * (u1 - u0) - (gu - u0) * (w1 - w0)) / det
        l0 = 1.0 - l1 - l2
        inside = (l0 >= -1e-9) & (l1 >= -1e-9) & (l2 >= -1e-9)
        if not inside.any():
            continue
        # perspective-correct: 1/depth interpolates linearly in image space
        inv = l0 * inv_d[t, 0] + l1 * inv_d[t, 1] + l2 * inv_d[t, 2]
        dep = np.where(inside, 1.0 / np.maximum(inv, 1e-12), np.inf)
        sub = zbuf[lo_w:hi_w, lo_u:hi_u]
        np.minimum(sub, dep, out=sub)
    return zbuf


def mesh_truth_mask(points, v, f, eye, tol=0.01, size=512, focal=448.0):
    """Mesh-exact visibility of ``points`` from ``eye`` with the repo
    renderer's camera convention (data/render.py::look_at, z forward),
    rasterised at 3.2x the repo renderer's resolution: a point is visible
    iff its depth is within ``tol`` (relative) of the mesh depth at its
    pixel.  This is the ground truth the z-buffer splat approximates."""
    from vn_pointcloudcompletion_tpu.data.render import look_at

    r = look_at(eye, np.zeros(3))
    cam_p = (points - eye) @ r.T
    zp = cam_p[:, 2]
    cam_v = (v - eye) @ r.T
    zv = cam_v[:, 2]
    zbuf = np.full((size, size), np.inf)
    cx = size / 2.0

    tris = f[(zv[f] > 1e-6).all(axis=1)]
    p = cam_v[tris]
    d = zv[tris]
    u = focal * p[:, :, 0] / d + cx
    w = focal * p[:, :, 1] / d + cx
    inv_d = 1.0 / d
    for t in range(len(tris)):
        u0, u1, u2 = u[t]
        w0, w1, w2 = w[t]
        lo_u = max(int(np.floor(min(u0, u1, u2))), 0)
        hi_u = min(int(np.ceil(max(u0, u1, u2))) + 1, size)
        lo_w = max(int(np.floor(min(w0, w1, w2))), 0)
        hi_w = min(int(np.ceil(max(w0, w1, w2))) + 1, size)
        if lo_u >= hi_u or lo_w >= hi_w:
            continue
        gu, gw = np.meshgrid(
            np.arange(lo_u, hi_u) + 0.5, np.arange(lo_w, hi_w) + 0.5
        )
        det = (u1 - u0) * (w2 - w0) - (u2 - u0) * (w1 - w0)
        if abs(det) < 1e-12:
            continue
        l1 = ((gu - u0) * (w2 - w0) - (gw - w0) * (u2 - u0)) / det
        l2 = ((gw - w0) * (u1 - u0) - (gu - u0) * (w1 - w0)) / det
        l0 = 1.0 - l1 - l2
        inside = (l0 >= -1e-9) & (l1 >= -1e-9) & (l2 >= -1e-9)
        if not inside.any():
            continue
        inv = l0 * inv_d[t, 0] + l1 * inv_d[t, 1] + l2 * inv_d[t, 2]
        dep = np.where(inside, 1.0 / np.maximum(inv, 1e-12), np.inf)
        sub = zbuf[lo_w:hi_w, lo_u:hi_u]
        np.minimum(sub, dep, out=sub)

    up = np.clip(np.rint(focal * cam_p[:, 0] / zp + cx), 0, size - 1).astype(int)
    wp = np.clip(np.rint(focal * cam_p[:, 1] / zp + cx), 0, size - 1).astype(int)
    md = zbuf[wp, up]
    return (zp > 1e-6) & np.isfinite(md) & (zp <= md * (1.0 + tol))


def backproject(zbuf, rot):
    """process_exr.py:43-52 semantics: depth pixels -> world points."""
    eye = rot[:, 2]
    wy, wx = np.where(np.isfinite(zbuf))
    if len(wx) == 0:
        return np.zeros((0, 3))
    dep = zbuf[wy, wx]
    cx, cy = WIDTH / 2.0, HEIGHT / 2.0
    x_cam = (wx + 0.5 - cx) / FOCAL * dep
    y_cam = (wy + 0.5 - cy) / FOCAL * dep
    z_cam = -dep
    cam = np.stack([x_cam, y_cam, z_cam], axis=1)
    return cam @ rot.T + eye


def resample(pts, n, rng):
    """dataset/shapenet.py:98-102 random_sample semantics."""
    if len(pts) == 0:
        return np.zeros((n, 3))
    perm = rng.permutation(len(pts))
    if len(pts) >= n:
        return pts[perm[:n]]
    pad = rng.integers(0, len(pts), n - len(pts))
    return pts[np.concatenate([perm, pad])]


def nn_dist(a, b):
    """For each point of a, distance to nearest point of b."""
    from scipy.spatial import cKDTree

    if len(b) == 0:
        return np.full(len(a), np.inf)
    d, _ = cKDTree(b).query(a, k=1)
    return d


def chamfer_l1(a, b):
    return 0.5 * (nn_dist(a, b).mean() + nn_dist(b, a).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="RESULTS/render_validation.json")
    ap.add_argument("--categories", nargs="+",
                    default=["airplane", "chair", "table", "lamp"])
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    rows = []
    for cat in args.categories:
        v, f = gen_shapes.generate(cat, args.seed)
        # ShapeNet normalisation for the reference camera: unit diagonal
        diag = np.linalg.norm(v.max(axis=0) - v.min(axis=0))
        v = (v - (v.max(axis=0) + v.min(axis=0)) / 2) / diag
        complete = sample_mesh_surface(v, f, 16384, rng)
        eps = 2.0 * float(np.median(nn_dist(complete[:2048], complete[2048:])))
        scale = np.abs(complete).max()

        dirs = rng.standard_normal((args.views, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

        key = {pt.tobytes(): j for j, pt in enumerate(complete)}
        oracle_parts, zbuf_parts, truth_stats = [], [], []
        for d in dirs:
            rot = pose_for_direction(d)
            oracle = backproject(rasterize_depth(v, f, rot), rot)
            # repo pipeline exactly as make_dataset runs it
            eye = d * 3.0 * scale
            zb = render_partial(complete, eye)
            kept = np.zeros(len(complete), bool)
            kept[[key[pt.tobytes()] for pt in zb]] = True
            truth = mesh_truth_mask(complete, v, f, eye)
            tp = float((kept & truth).sum())
            truth_stats.append(dict(
                vis_frac_mesh_truth=float(truth.mean()),
                mesh_precision=tp / max(kept.sum(), 1),
                mesh_recall=tp / max(truth.sum(), 1),
            ))
            oracle_parts.append(oracle)
            zbuf_parts.append(zb)

        for i, d in enumerate(dirs):
            oracle, zb = oracle_parts[i], zbuf_parts[i]
            vis_o = float((nn_dist(complete, oracle) < eps).mean())
            vis_z = float((nn_dist(complete, zb) < eps).mean())
            prec = float((nn_dist(zb, oracle) < eps).mean())
            rec = float((nn_dist(oracle, zb) < eps).mean())
            o2k = resample(oracle, 2048, rng)
            z2k = resample(zb, 2048, rng)
            cd_same = chamfer_l1(o2k, z2k)
            j = (i + 1) % args.views
            cd_cross = chamfer_l1(
                resample(oracle_parts[j], 2048, rng), z2k
            )
            from scipy.spatial import cKDTree

            # 1-NN spacing excluding self (k=2, second neighbour)
            dens_o = float(np.median(cKDTree(o2k).query(o2k, k=2)[0][:, 1]))
            dens_z = float(np.median(cKDTree(z2k).query(z2k, k=2)[0][:, 1]))
            rows.append(dict(
                category=cat, view=i, eps=eps,
                n_oracle=len(oracle), n_zbuf=len(zb),
                vis_frac_oracle=vis_o, vis_frac_zbuf=vis_z,
                precision_zbuf=prec, recall_zbuf=rec,
                cd_same_view=cd_same, cd_cross_view=cd_cross,
                nn_spacing_oracle=dens_o, nn_spacing_zbuf=dens_z,
                **truth_stats[i],
            ))
        done = [r for r in rows if r["category"] == cat]
        print(f"{cat}: vis oracle {np.mean([r['vis_frac_oracle'] for r in done]):.3f} "
              f"zbuf {np.mean([r['vis_frac_zbuf'] for r in done]):.3f}  "
              f"prec {np.mean([r['precision_zbuf'] for r in done]):.3f} "
              f"rec {np.mean([r['recall_zbuf'] for r in done]):.3f}  "
              f"cd same/cross {np.mean([r['cd_same_view'] for r in done]):.4f}/"
              f"{np.mean([r['cd_cross_view'] for r in done]):.4f}")

    agg = {
        k: float(np.mean([r[k] for r in rows]))
        for k in ("vis_frac_oracle", "vis_frac_zbuf", "precision_zbuf",
                  "recall_zbuf", "cd_same_view", "cd_cross_view",
                  "nn_spacing_oracle", "nn_spacing_zbuf",
                  "vis_frac_mesh_truth", "mesh_precision", "mesh_recall")
    }
    agg["cd_ratio_same_over_cross"] = agg["cd_same_view"] / agg["cd_cross_view"]
    out = dict(aggregate=agg, per_view=rows,
               oracle="software rasterizer of render_depth.py:33-141 + "
                      "process_exr.py:34-86 (160x120, focal 100, unit-"
                      "distance camera)",
               zbuf="data/render.py::render_partial with make_dataset "
                    "defaults (splat z-buffer over the 16384-pt cloud)")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("\naggregate:", json.dumps(agg, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
