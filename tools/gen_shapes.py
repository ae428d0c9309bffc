#!/usr/bin/env python
"""Procedural CAD-mesh generator for dataset builds (no ShapeNet download).

Emits watertight-enough triangle OBJ meshes in three parametric families that
mimic PCN categories — ``airplane`` (fuselage + swept wings + tail),
``chair`` (legs + seat + backrest), ``table`` (top + legs / pedestal) — with
randomized proportions per model.  Meshes are normalised to a unit bounding
cube centred at the origin (the ShapeNet convention) and are consumed by
``tools/mesh_sampling`` (area-weighted surface sampling, the reference
``sample/mesh_sampling.cpp`` role) + ``tools/render_partials.py`` (z-buffer
partial views, the reference ``render/`` role) to produce a full PCN-layout
dataset for real-protocol training runs.
"""

from __future__ import annotations

import numpy as np


def _box(center, size, rot=None):
    """Axis-aligned box as 12 triangles; optional 3x3 rotation."""
    cx, cy, cz = center
    sx, sy, sz = np.asarray(size) / 2.0
    v = np.array([
        [-sx, -sy, -sz], [sx, -sy, -sz], [sx, sy, -sz], [-sx, sy, -sz],
        [-sx, -sy, sz], [sx, -sy, sz], [sx, sy, sz], [-sx, sy, sz],
    ])
    if rot is not None:
        v = v @ rot.T
    v = v + np.array([cx, cy, cz])
    f = np.array([
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
    ])
    return v, f


def _cylinder(p0, p1, radius, nseg=14, rx=None):
    """Capped cylinder from p0 to p1 (radius may be a (2,) pair for taper)."""
    p0, p1 = np.asarray(p0, float), np.asarray(p1, float)
    r0, r1 = (radius, radius) if np.isscalar(radius) else radius
    axis = p1 - p0
    length = np.linalg.norm(axis)
    axis = axis / length
    # build an orthonormal frame around the axis
    ref = np.array([0.0, 0.0, 1.0]) if abs(axis[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(axis, ref)
    u /= np.linalg.norm(u)
    w = np.cross(axis, u)
    ang = np.linspace(0, 2 * np.pi, nseg, endpoint=False)
    ring0 = p0 + r0 * (np.outer(np.cos(ang), u) + np.outer(np.sin(ang), w))
    ring1 = p1 + r1 * (np.outer(np.cos(ang), u) + np.outer(np.sin(ang), w))
    v = np.concatenate([ring0, ring1, [p0], [p1]])
    c0, c1 = 2 * nseg, 2 * nseg + 1
    f = []
    for i in range(nseg):
        j = (i + 1) % nseg
        f += [[i, j, nseg + i], [j, nseg + j, nseg + i]]
        f += [[c0, j, i], [c1, nseg + i, nseg + j]]
    return v, np.array(f)


def _ellipsoid(center, radii, nu=16, nv=10):
    """UV-sphere scaled to radii."""
    us = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vs = np.linspace(0, np.pi, nv + 1)[1:-1]
    verts = [np.array([0, 0, 1.0]), np.array([0, 0, -1.0])]
    for p in vs:
        for t in us:
            verts.append(np.array([
                np.sin(p) * np.cos(t), np.sin(p) * np.sin(t), np.cos(p)
            ]))
    v = np.asarray(verts) * np.asarray(radii) + np.asarray(center)
    f = []
    def vid(i, j):
        return 2 + i * nu + (j % nu)
    for j in range(nu):  # polar caps
        f.append([0, vid(0, j), vid(0, j + 1)])
        f.append([1, vid(len(vs) - 1, j + 1), vid(len(vs) - 1, j)])
    for i in range(len(vs) - 1):
        for j in range(nu):
            f += [[vid(i, j), vid(i + 1, j), vid(i, j + 1)],
                  [vid(i, j + 1), vid(i + 1, j), vid(i + 1, j + 1)]]
    return v, np.array(f)


def _merge(parts):
    verts, faces, off = [], [], 0
    for v, f in parts:
        verts.append(v)
        faces.append(np.asarray(f) + off)
        off += len(v)
    return np.concatenate(verts), np.concatenate(faces)


def make_airplane(rng):
    L = rng.uniform(0.8, 1.1)           # fuselage length
    rf = rng.uniform(0.05, 0.09)        # fuselage radius
    span = rng.uniform(0.7, 1.1)
    chord = rng.uniform(0.12, 0.22)
    sweep = rng.uniform(0.0, 0.18)
    wx = rng.uniform(-0.1, 0.1)         # wing root position along fuselage
    parts = [
        _ellipsoid([0, 0, 0], [L / 2, rf, rf]),
        # main wings (thin swept boxes, port/starboard)
        _box([wx - sweep / 2, span / 4, 0], [chord, span / 2, 0.015],
             rot=_rot_z(-sweep)),
        _box([wx - sweep / 2, -span / 4, 0], [chord, span / 2, 0.015],
             rot=_rot_z(sweep)),
        # horizontal stabilizer + vertical fin at the tail
        _box([-L / 2 + 0.06, 0, 0.01], [0.1, rng.uniform(0.25, 0.4), 0.012]),
        _box([-L / 2 + 0.06, 0, 0.07], [0.09, 0.012, rng.uniform(0.1, 0.16)]),
    ]
    if rng.random() < 0.5:  # engines under wings
        re = rng.uniform(0.02, 0.035)
        ey = span * rng.uniform(0.12, 0.2)
        for s in (+1, -1):
            parts.append(_cylinder([wx + 0.1, s * ey, -rf], [wx - 0.1, s * ey, -rf], re))
    return _merge(parts)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def make_chair(rng):
    seat_h = rng.uniform(0.35, 0.5)
    seat_w = rng.uniform(0.35, 0.5)
    seat_d = rng.uniform(0.35, 0.5)
    back_h = rng.uniform(0.35, 0.6)
    leg_r = rng.uniform(0.012, 0.025)
    tilt = rng.uniform(0.0, 0.15)
    parts = [_box([0, 0, seat_h], [seat_w, seat_d, 0.04])]
    # backrest (solid or slatted)
    bx = -seat_w / 2 + 0.02
    back = _box([bx - np.sin(tilt) * back_h / 2, 0, seat_h + back_h / 2],
                [0.035, seat_d * 0.95, back_h], rot=_rot_y(tilt))
    parts.append(back)
    if rng.random() < 0.4:  # armrests
        for s in (+1, -1):
            parts.append(_box([0, s * (seat_d / 2 - 0.02), seat_h + 0.12],
                              [seat_w * 0.8, 0.03, 0.03]))
            parts.append(_cylinder([seat_w * 0.3, s * (seat_d / 2 - 0.02), seat_h],
                                   [seat_w * 0.3, s * (seat_d / 2 - 0.02), seat_h + 0.12],
                                   0.012))
    for sx in (+1, -1):
        for sy in (+1, -1):
            x = sx * (seat_w / 2 - leg_r * 2)
            y = sy * (seat_d / 2 - leg_r * 2)
            parts.append(_cylinder([x, y, 0], [x, y, seat_h], leg_r))
    return _merge(parts)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def make_table(rng):
    top_w = rng.uniform(0.7, 1.1)
    top_d = rng.uniform(0.5, 0.9)
    h = rng.uniform(0.4, 0.65)
    parts = [_box([0, 0, h], [top_w, top_d, rng.uniform(0.025, 0.05)])]
    if rng.random() < 0.3:  # pedestal table
        parts.append(_cylinder([0, 0, 0.02], [0, 0, h], rng.uniform(0.04, 0.07)))
        parts.append(_cylinder([0, 0, 0], [0, 0, 0.03], top_w * rng.uniform(0.2, 0.3)))
    else:
        leg_r = rng.uniform(0.015, 0.03)
        for sx in (+1, -1):
            for sy in (+1, -1):
                x = sx * (top_w / 2 - 0.06)
                y = sy * (top_d / 2 - 0.06)
                parts.append(_cylinder([x, y, 0], [x, y, h], leg_r))
        if rng.random() < 0.5:  # lower shelf
            parts.append(_box([0, 0, h * rng.uniform(0.25, 0.45)],
                              [top_w * 0.85, top_d * 0.85, 0.02]))
    return _merge(parts)


def make_cabinet(rng):
    w = rng.uniform(0.6, 1.0)
    d = rng.uniform(0.3, 0.5)
    h = rng.uniform(0.7, 1.2)
    t = 0.02
    parts = [_box([0, 0, h / 2], [w, d, h])]
    # front door/drawer panels, slightly proud of the carcass
    n_panels = rng.integers(1, 4)
    gap = 0.012
    pw = (w - gap * (n_panels + 1)) / n_panels
    for i in range(n_panels):
        x = -w / 2 + gap + pw / 2 + i * (pw + gap)
        parts.append(_box([x, d / 2 + t / 2, h / 2],
                          [pw, t, h - 2 * gap]))
        # handle knob
        parts.append(_cylinder([x + pw * 0.3, d / 2 + t, h * 0.55],
                               [x + pw * 0.3, d / 2 + t + 0.03, h * 0.55],
                               0.008, nseg=8))
    if rng.random() < 0.5:  # plinth base
        parts.append(_box([0, 0, -0.03], [w * 0.96, d * 0.96, 0.06]))
    else:  # short legs
        for sx in (+1, -1):
            for sy in (+1, -1):
                x, y = sx * (w / 2 - 0.05), sy * (d / 2 - 0.05)
                parts.append(_cylinder([x, y, -0.08], [x, y, 0], 0.015))
    return _merge(parts)


def make_car(rng):
    L = rng.uniform(0.9, 1.2)           # body length
    w = rng.uniform(0.38, 0.5)
    body_h = rng.uniform(0.16, 0.24)
    cabin_l = L * rng.uniform(0.4, 0.55)
    cabin_h = rng.uniform(0.12, 0.18)
    wheel_r = rng.uniform(0.07, 0.1)
    z0 = wheel_r * 0.9                  # body bottom above ground
    parts = [
        _box([0, 0, z0 + body_h / 2], [L, w, body_h]),
        # cabin, set slightly rearward with a windshield slope
        _box([-L * rng.uniform(0.02, 0.12), 0, z0 + body_h + cabin_h / 2],
             [cabin_l, w * 0.85, cabin_h], rot=_rot_y(rng.uniform(0.0, 0.08))),
    ]
    ax_f, ax_r = L * 0.32, -L * 0.34    # axle positions
    ww = w * 0.12                       # wheel width
    for x in (ax_f, ax_r):
        for s in (+1, -1):
            y = s * (w / 2 + ww / 2 - 0.01)
            parts.append(_cylinder([x, y - ww / 2, wheel_r],
                                   [x, y + ww / 2, wheel_r], wheel_r, nseg=16))
    if rng.random() < 0.3:  # rear spoiler
        parts.append(_box([-L / 2 + 0.04, 0, z0 + body_h + 0.06],
                          [0.06, w * 0.9, 0.015]))
    return _merge(parts)


def make_lamp(rng):
    base_r = rng.uniform(0.1, 0.18)
    pole_h = rng.uniform(0.5, 1.0)
    shade_h = rng.uniform(0.15, 0.3)
    shade_r0 = rng.uniform(0.08, 0.14)   # shade top radius
    shade_r1 = shade_r0 * rng.uniform(1.4, 2.2)  # flared bottom
    parts = [
        _cylinder([0, 0, 0], [0, 0, 0.025], base_r, nseg=18),
        _cylinder([0, 0, 0.02], [0, 0, pole_h], rng.uniform(0.012, 0.022)),
        # flared shade (tapered cylinder, open look doesn't matter for sampling)
        _cylinder([0, 0, pole_h - 0.02], [0, 0, pole_h - 0.02 + shade_h],
                  (shade_r1, shade_r0), nseg=18),
    ]
    if rng.random() < 0.4:  # bulb under the shade
        parts.append(_ellipsoid([0, 0, pole_h - 0.04], [0.035, 0.035, 0.05]))
    if rng.random() < 0.3:  # arched desk-lamp arm instead of straight pole look
        elbow = pole_h * rng.uniform(0.55, 0.75)
        parts.append(_cylinder([0, 0, elbow], [0.15, 0, pole_h - 0.02],
                               0.012))
    return _merge(parts)


def make_sofa(rng):
    w = rng.uniform(0.9, 1.5)           # width (y)
    d = rng.uniform(0.45, 0.6)          # depth (x)
    seat_h = rng.uniform(0.18, 0.26)
    back_h = rng.uniform(0.3, 0.45)
    arm_h = seat_h + rng.uniform(0.1, 0.18)
    arm_w = rng.uniform(0.07, 0.12)
    parts = [
        _box([0, 0, seat_h / 2 + 0.04], [d, w, seat_h]),          # seat base
        _box([-d / 2 + 0.05, 0, seat_h + back_h / 2],
             [0.1, w, back_h], rot=_rot_y(rng.uniform(0.0, 0.1))),  # backrest
    ]
    for s in (+1, -1):  # armrests
        parts.append(_box([0, s * (w / 2 + arm_w / 2 - 0.01), arm_h / 2 + 0.04],
                          [d, arm_w, arm_h]))
    n_cush = rng.integers(1, 4)
    cw = w / n_cush
    for i in range(n_cush):  # seat cushions
        y = -w / 2 + cw / 2 + i * cw
        parts.append(_box([0.03, y, seat_h + 0.05],
                          [d * 0.9, cw * 0.92, 0.09]))
    for sx in (+1, -1):  # stub legs
        for sy in (+1, -1):
            x, y = sx * (d / 2 - 0.05), sy * (w / 2 - 0.05)
            parts.append(_cylinder([x, y, 0], [x, y, 0.05], 0.02, nseg=8))
    return _merge(parts)


def make_vessel(rng):
    L = rng.uniform(0.9, 1.3)           # hull length
    w = rng.uniform(0.22, 0.35)
    hull_h = rng.uniform(0.1, 0.16)
    parts = [
        # hull: ellipsoid squashed vertically, bow taper from the x-radius
        _ellipsoid([0, 0, hull_h / 2], [L / 2, w / 2, hull_h], nu=20),
        # deck slab
        _box([0, 0, hull_h + 0.01], [L * 0.7, w * 0.8, 0.02]),
    ]
    if rng.random() < 0.7:  # deckhouse / cabin
        cab_l = L * rng.uniform(0.2, 0.35)
        cab_h = rng.uniform(0.08, 0.14)
        parts.append(_box([-L * rng.uniform(0.0, 0.1), 0,
                           hull_h + 0.02 + cab_h / 2],
                          [cab_l, w * 0.6, cab_h]))
    if rng.random() < 0.5:  # mast
        mx = L * rng.uniform(0.05, 0.25)
        mh = rng.uniform(0.3, 0.6)
        parts.append(_cylinder([mx, 0, hull_h], [mx, 0, hull_h + mh], 0.01))
        if rng.random() < 0.5:  # boom
            parts.append(_cylinder([mx, 0, hull_h + mh * 0.3],
                                   [mx - 0.3, 0, hull_h + mh * 0.3], 0.008))
    return _merge(parts)


def make_bus(rng):
    L = rng.uniform(1.0, 1.3)
    w = rng.uniform(0.3, 0.4)
    h = rng.uniform(0.32, 0.45)
    wheel_r = rng.uniform(0.05, 0.07)
    z0 = wheel_r * 0.8
    parts = [_box([0, 0, z0 + h / 2], [L, w, h])]  # slab body
    # window band along both sides
    parts.append(_box([0.02, 0, z0 + h * 0.72],
                      [L * 0.9, w * 1.02, h * 0.22]))
    n_ax = 2 if rng.random() < 0.7 else 3
    xs = np.linspace(L * 0.35, -L * 0.35, n_ax)
    ww = w * 0.1
    for x in xs:
        for s in (+1, -1):
            y = s * (w / 2 - ww / 2)
            parts.append(_cylinder([x, y - ww / 2, wheel_r],
                                   [x, y + ww / 2, wheel_r], wheel_r, nseg=14))
    return _merge(parts)


def make_bed(rng):
    L = rng.uniform(0.95, 1.3)          # length (x)
    w = rng.uniform(0.6, 1.0)
    frame_h = rng.uniform(0.12, 0.2)
    mat_h = rng.uniform(0.08, 0.14)
    head_h = frame_h + rng.uniform(0.25, 0.45)
    parts = [
        _box([0, 0, frame_h / 2 + 0.03], [L, w, frame_h]),        # frame
        _box([0, 0, frame_h + 0.03 + mat_h / 2],
             [L * 0.97, w * 0.95, mat_h]),                         # mattress
        _box([L / 2 - 0.02, 0, head_h / 2 + 0.03],
             [0.04, w, head_h]),                                   # headboard
    ]
    if rng.random() < 0.5:  # footboard
        parts.append(_box([-L / 2 + 0.02, 0, (frame_h + 0.12) / 2 + 0.03],
                          [0.04, w, frame_h + 0.12]))
    if rng.random() < 0.6:  # pillow
        parts.append(_box([L / 2 - 0.16, 0, frame_h + mat_h + 0.05],
                          [0.22, w * 0.8, 0.06]))
    for sx in (+1, -1):
        for sy in (+1, -1):
            x, y = sx * (L / 2 - 0.05), sy * (w / 2 - 0.05)
            parts.append(_cylinder([x, y, 0], [x, y, 0.04], 0.02, nseg=8))
    return _merge(parts)


def make_bookshelf(rng):
    w = rng.uniform(0.6, 1.0)
    d = rng.uniform(0.2, 0.32)
    h = rng.uniform(0.9, 1.4)
    t = 0.02
    n_shelves = int(rng.integers(3, 6))
    parts = [
        _box([-w / 2 + t / 2, 0, h / 2], [t, d, h]),   # sides
        _box([w / 2 - t / 2, 0, h / 2], [t, d, h]),
        _box([0, -d / 2 + t / 2, h / 2], [w, t, h]),   # back panel
        _box([0, 0, h - t / 2], [w, d, t]),            # top
    ]
    for i in range(n_shelves):
        z = h * (i + 0.5) / n_shelves
        parts.append(_box([0, 0, z], [w - 2 * t, d, t]))
        if rng.random() < 0.7:  # a run of books on this shelf
            n_books = int(rng.integers(3, 8))
            bx0 = -w / 2 + 2 * t
            avail = w - 4 * t
            bw = avail / n_books
            for b in range(n_books):
                bh = rng.uniform(0.4, 0.85) * (h / n_shelves - t)
                parts.append(_box([bx0 + bw * (b + 0.5), 0.02, z + t / 2 + bh / 2],
                                  [bw * 0.8, d * 0.7, bh]))
    return _merge(parts)


def make_bench(rng):
    w = rng.uniform(0.9, 1.4)           # width (y)
    d = rng.uniform(0.28, 0.4)
    seat_h = rng.uniform(0.35, 0.48)
    n_slats = int(rng.integers(2, 5))
    parts = []
    sw = d / n_slats
    for i in range(n_slats):  # slatted seat
        x = -d / 2 + sw * (i + 0.5)
        parts.append(_box([x, 0, seat_h], [sw * 0.8, w, 0.03]))
    if rng.random() < 0.6:  # slatted backrest
        for i in range(int(rng.integers(1, 3))):
            z = seat_h + 0.12 + i * 0.1
            parts.append(_box([-d / 2 - 0.02, 0, z], [0.03, w, 0.06],
                              rot=_rot_y(rng.uniform(0.05, 0.15))))
    for s in (+1, -1):  # leg frames at both ends
        y = s * (w / 2 - 0.06)
        parts.append(_box([0, y, seat_h / 2], [d * 0.9, 0.04, seat_h]))
    return _merge(parts)


def make_guitar(rng):
    body_l = rng.uniform(0.42, 0.52)    # body length (x)
    body_w = rng.uniform(0.3, 0.4)
    body_t = rng.uniform(0.04, 0.07)
    neck_l = rng.uniform(0.4, 0.55)
    parts = [
        # figure-eight body: two overlapping squashed ellipsoids
        _ellipsoid([-body_l * 0.18, 0, 0],
                   [body_l * 0.32, body_w * 0.5, body_t], nu=18),
        _ellipsoid([body_l * 0.2, 0, 0],
                   [body_l * 0.26, body_w * 0.4, body_t], nu=18),
        # neck + headstock
        _box([body_l * 0.46 + neck_l / 2, 0, 0.01], [neck_l, 0.045, 0.02]),
        _box([body_l * 0.46 + neck_l + 0.05, 0, 0.012], [0.1, 0.06, 0.018]),
    ]
    if rng.random() < 0.5:  # bridge block
        parts.append(_box([-body_l * 0.2, 0, body_t + 0.005],
                          [0.05, 0.08, 0.012]))
    return _merge(parts)


def make_motorbike(rng):
    L = rng.uniform(0.9, 1.1)
    wheel_r = rng.uniform(0.14, 0.18)
    ww = rng.uniform(0.035, 0.055)
    ax_f, ax_r = L * 0.38, -L * 0.38
    rake = rng.uniform(0.35, 0.55)      # fork angle
    parts = []
    for x in (ax_f, ax_r):  # wheels
        parts.append(_cylinder([x, -ww / 2, wheel_r], [x, ww / 2, wheel_r],
                               wheel_r, nseg=18))
    # main frame spine + engine block + seat + tank
    parts.append(_cylinder([ax_r, 0, wheel_r], [ax_f * 0.7, 0, wheel_r + 0.18],
                           0.02))
    parts.append(_box([0, 0, wheel_r + 0.02], [L * 0.25, 0.12, 0.14]))
    parts.append(_box([-L * 0.18, 0, wheel_r + 0.2], [L * 0.3, 0.1, 0.05]))
    parts.append(_ellipsoid([L * 0.08, 0, wheel_r + 0.2],
                            [0.1, 0.06, 0.06]))
    # fork + handlebar
    top = [ax_f - rake * 0.2, 0, wheel_r + 0.3]
    parts.append(_cylinder([ax_f, 0, wheel_r], top, 0.015))
    parts.append(_cylinder([top[0], -0.12, top[2]], [top[0], 0.12, top[2]],
                           0.012))
    if rng.random() < 0.5:  # exhaust
        parts.append(_cylinder([-L * 0.05, 0.06, wheel_r - 0.02],
                               [ax_r, 0.06, wheel_r + 0.02], 0.02))
    return _merge(parts)


def make_skateboard(rng):
    L = rng.uniform(0.75, 0.95)
    w = rng.uniform(0.2, 0.26)
    deck_t = 0.012
    wheel_r = rng.uniform(0.03, 0.04)
    deck_z = wheel_r * 2 + 0.02
    parts = [_box([0, 0, deck_z], [L * 0.82, w, deck_t])]
    for s in (+1, -1):  # kicked nose/tail
        parts.append(_box([s * L * 0.45, 0, deck_z + 0.015],
                          [L * 0.12, w, deck_t], rot=_rot_y(s * 0.35)))
    for x in (L * 0.3, -L * 0.3):  # trucks + wheels
        parts.append(_box([x, 0, deck_z - 0.015], [0.04, w * 0.5, 0.02]))
        for s in (+1, -1):
            y = s * (w / 2 - 0.02)
            parts.append(_cylinder([x, y - 0.012, wheel_r],
                                   [x, y + 0.012, wheel_r], wheel_r, nseg=10))
    return _merge(parts)


def make_pistol(rng):
    barrel_l = rng.uniform(0.5, 0.7)
    slide_h = rng.uniform(0.12, 0.16)
    grip_l = rng.uniform(0.3, 0.4)
    grip_rake = rng.uniform(0.25, 0.4)
    parts = [
        _box([0, 0, 0], [barrel_l, 0.09, slide_h]),              # slide/frame
        _cylinder([barrel_l / 2 - 0.02, 0, 0.01],
                  [barrel_l / 2 + 0.06, 0, 0.01], 0.025, nseg=10),  # muzzle
        # raked grip below the rear of the frame
        _box([-barrel_l / 2 + grip_l * np.sin(grip_rake) / 2 + 0.08, 0,
              -slide_h / 2 - grip_l * np.cos(grip_rake) / 2],
             [0.1, 0.08, grip_l], rot=_rot_y(grip_rake)),
    ]
    # trigger guard loop (two thin boxes)
    parts.append(_box([-0.05, 0, -slide_h / 2 - 0.06], [0.12, 0.02, 0.015]))
    parts.append(_box([0.01, 0, -slide_h / 2 - 0.03], [0.015, 0.02, 0.06]))
    if rng.random() < 0.5:  # sight nub
        parts.append(_box([barrel_l / 2 - 0.03, 0, slide_h / 2 + 0.01],
                          [0.02, 0.02, 0.02]))
    return _merge(parts)


BUILDERS = {
    "airplane": make_airplane,
    "cabinet": make_cabinet,
    "car": make_car,
    "chair": make_chair,
    "lamp": make_lamp,
    "sofa": make_sofa,
    "table": make_table,
    "vessel": make_vessel,
    # the 8 novel (unseen) PCN categories (reference test.py:19 — the
    # novel-category branch the rebuild exposes via `main.py test --novel`)
    "bus": make_bus,
    "bed": make_bed,
    "bookshelf": make_bookshelf,
    "bench": make_bench,
    "guitar": make_guitar,
    "motorbike": make_motorbike,
    "skateboard": make_skateboard,
    "pistol": make_pistol,
}


def normalize(v):
    """Centre at origin, scale the longest side to 0.9 (ShapeNet-like)."""
    lo, hi = v.min(axis=0), v.max(axis=0)
    center = (lo + hi) / 2
    scale = 0.9 / (hi - lo).max()
    return (v - center) * scale


def write_obj(path, v, f):
    with open(path, "w") as fh:
        for p in v:
            fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for tri in f:
            fh.write(f"f {tri[0] + 1} {tri[1] + 1} {tri[2] + 1}\n")


def generate(category: str, seed: int):
    rng = np.random.default_rng(seed)
    v, f = BUILDERS[category](rng)
    return normalize(v), f


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--category", required=True, choices=sorted(BUILDERS))
    ap.add_argument("--count", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import os

    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(args.count):
        v, f = generate(args.category, args.seed + i)
        write_obj(os.path.join(args.out_dir, f"{args.category}_{i:04d}.obj"), v, f)
    print(f"wrote {args.count} {args.category} meshes -> {args.out_dir}")
