"""SAT.py — single-pair NumPy demonstration of the Separating Axis Theorem.

Recreation of the reference repo's missing `SAT.py` (named at
/root/reference/README.md:3 but absent from the snapshot): the basic
application of the separating-axis theorem to decide whether two
rectangles (or convex shapes) collide, with a fixed runtime (no early
exit) that makes the test ideal for accelerator implementation.

This module is the CPU GROUND-TRUTH ORACLE for the framework: it mirrors
the device function `convex_collide` (/root/reference/utils.cu:159-184)
operation-for-operation in float32 — same edge-vector axes (not
perpendiculars), same unnormalized projections, same strict `<` interval
comparisons, no early exit — so the TPU kernels in
`collide2d_tpu.ops.sat` are bit-checked against it in tests/.

Run it directly for a demo:  python SAT.py
"""

from __future__ import annotations

import numpy as np


def create_rect(w: float, h: float) -> np.ndarray:
    """4 CCW vertices of an axis-aligned (w x h) rect centered at origin.

    Mirrors /root/reference/utils.cu:119-130 — layout starts at the
    bottom-left corner: (-w/2,-h/2), (w/2,-h/2), (w/2,h/2), (-w/2,h/2).
    Returned flat as float32[8] = (x0,y0,...,x3,y3), the reference's raw
    vertex-buffer layout.
    """
    w = np.float32(w)
    h = np.float32(h)
    two = np.float32(2)
    return np.array(
        [-w / two, -h / two, w / two, -h / two, w / two, h / two, -w / two, h / two],
        dtype=np.float32,
    )


def rot_trans_rectangle(r: np.ndarray, dx: float, dy: float, dt: float) -> np.ndarray:
    """Rotate the 4 vertices by dt about the origin, then translate.

    Mirrors /root/reference/utils.cu:132-142 (in-place in the reference;
    returns a copy here). float32 throughout.
    """
    r = np.array(r, dtype=np.float32, copy=True)
    c = np.float32(np.cos(np.float32(dt)))
    s = np.float32(np.sin(np.float32(dt)))
    dx = np.float32(dx)
    dy = np.float32(dy)
    for i in range(4):
        x = r[2 * i]
        y = r[2 * i + 1]
        r[2 * i] = c * x - s * y + dx
        r[2 * i + 1] = s * x + c * y + dy
    return r


def convex_collide(r1: np.ndarray, r2: np.ndarray) -> int:
    """Fixed-runtime SAT between two 4-gons (flat float32[8] buffers).

    Operation-for-operation mirror of /root/reference/utils.cu:159-184,
    including its semantic quirks (documented in SURVEY.md §2):
      - the axis is the EDGE VECTOR itself, not its perpendicular —
        correct-by-accident for rectangles;
      - axes are unnormalized;
      - strict `<` comparisons: touching rectangles COLLIDE;
      - no early exit: all 8 axes always evaluated (fixed runtime).
    Returns 1 if colliding else 0.
    """
    r1 = np.asarray(r1, dtype=np.float32)
    r2 = np.asarray(r2, dtype=np.float32)
    rs = [r1, r2]
    collide = 1
    for j in range(2):
        r = rs[j]
        for i in range(4):
            norm0 = r[(i + 1) * 2 % 8] - r[i * 2]
            norm1 = r[((i + 1) * 2 + 1) % 8] - r[i * 2 + 1]
            p1 = np.empty(4, dtype=np.float32)
            p2 = np.empty(4, dtype=np.float32)
            for k in range(4):
                p1[k] = norm0 * r1[k * 2] + norm1 * r1[k * 2 + 1]
                p2[k] = norm0 * r2[k * 2] + norm1 * r2[k * 2 + 1]
            if p1.max() < p2.min() or p2.max() < p1.min():
                collide = 0
    return collide


def convex_collide_polygons(p1: np.ndarray, p2: np.ndarray) -> int:
    """General convex k-gon SAT with TRUE perpendicular edge normals.

    The correct extension to arbitrary convex shapes (the reference
    README's claimed path) — oracle for `collide2d_tpu.ops.sat.sat_polygons`.
    ``p1``/``p2``: (k, 2) CCW convex vertices (k may differ). Touching
    polygons collide (strict `<` separation), matching the rectangle path.
    """
    p1 = np.asarray(p1, dtype=np.float32)
    p2 = np.asarray(p2, dtype=np.float32)
    for poly in (p1, p2):
        k = len(poly)
        for i in range(k):
            e = poly[(i + 1) % k] - poly[i]
            axis = np.array([e[1], -e[0]], dtype=np.float32)  # perpendicular
            a = p1 @ axis
            b = p2 @ axis
            if a.max() < b.min() or b.max() < a.min():
                return 0
    return 1


def _demo() -> None:
    robot = rot_trans_rectangle(create_rect(4.07, 1.74), 1.0, 0.5, 0.3)
    for name, (dx, dy) in [("near", (2.0, 1.0)), ("far", (10.0, 10.0))]:
        obstacle = rot_trans_rectangle(create_rect(2.0, 3.0), dx, dy, -0.7)
        print(f"robot vs obstacle[{name}]: collide = {convex_collide(robot, obstacle)}")


if __name__ == "__main__":
    _demo()
