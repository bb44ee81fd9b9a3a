"""Property-based tests (hypothesis) — SURVEY.md §4(a).

Geometric invariants that must hold for EVERY input, not just the random
samples of the other suites: rigid-motion invariance, symmetry,
containment, and oracle agreement on adversarially-shrunk cases.
"""

import numpy as np
import jax.numpy as jnp
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

import SAT
from collide2d_tpu.ops.geometry import rect_vertices, transform_vertices
from collide2d_tpu.ops.sat import sat_rects, sat_rects_reference, sat_polygons
from collide2d_tpu.ops.broad_phase import candidate_mask

finite = dict(allow_nan=False, allow_infinity=False)
dims = st.floats(0.05, 8.0, **finite)
coords = st.floats(-10.0, 10.0, **finite)
angles = st.floats(0.0, 6.2831853, **finite)

rect_params = st.tuples(dims, dims, coords, coords, angles)


def _verts(w, h, x, y, t):
    return transform_vertices(rect_vertices(w, h), x, y, t)


@settings(max_examples=150, deadline=None)
@given(rect_params, rect_params)
def test_sat_matches_oracle(a, b):
    va = _verts(*a)
    vb = _verts(*b)
    want = SAT.convex_collide(
        np.asarray(va).ravel().astype(np.float32),
        np.asarray(vb).ravel().astype(np.float32),
    )
    assert int(sat_rects_reference(va, vb)) == want


@settings(max_examples=100, deadline=None)
@given(rect_params, rect_params)
def test_sat_symmetric(a, b):
    va, vb = _verts(*a), _verts(*b)
    assert int(sat_rects(va, vb)) == int(sat_rects(vb, va))
    assert int(sat_polygons(va, vb)) == int(sat_polygons(vb, va))


@settings(max_examples=100, deadline=None)
@given(rect_params, rect_params, coords, coords)
def test_sat_translation_invariant(a, b, dx, dy):
    # A common translation cannot change the label (up to float rounding
    # of genuinely-touching cases, which the strategies avoid by never
    # generating exact tangency).
    va, vb = _verts(*a), _verts(*b)
    shift = jnp.asarray([dx, dy], jnp.float32)
    assert int(sat_rects(va + shift, vb + shift)) == int(sat_rects(va, vb))


@settings(max_examples=100, deadline=None)
@given(rect_params, st.floats(0.05, 0.95, **finite))
def test_contained_rect_always_collides(a, scale):
    w, h, x, y, t = a
    outer = _verts(w, h, x, y, t)
    inner = _verts(w * scale, h * scale, x, y, t)
    assert int(sat_rects(outer, inner)) == 1
    assert int(sat_polygons(outer, inner)) == 1


@settings(max_examples=100, deadline=None)
@given(rect_params, rect_params)
def test_broad_phase_is_necessary_condition(a, b):
    va, vb = _verts(*a), _verts(*b)
    hit = bool(sat_rects(va[None], vb[None])[0])
    cand = bool(candidate_mask(va[None], vb[None])[0])
    assert cand or not hit  # collision => AABB candidate
