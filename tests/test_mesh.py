"""Mesh loading tests (ref: SimpleWavefrontObjectModelLoader, ObjectModel)."""

import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.utils import mesh as meshlib


OBJ_TEXT = """
# simple quad + tri, with vt/vn face forms
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
v 0.5 0.5 1.0
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
f 1//1 2//1 5//1
"""


def test_parse_obj_triangulates_quads():
    v, f = meshlib.parse_obj(OBJ_TEXT)
    assert v.shape == (5, 3)
    # quad → 2 triangles, + 1 triangle
    assert f.shape == (3, 3)
    np.testing.assert_array_equal(f[0], [0, 1, 2])
    np.testing.assert_array_equal(f[1], [0, 2, 3])
    np.testing.assert_array_equal(f[2], [0, 1, 4])


def test_parse_obj_negative_indices():
    v, f = meshlib.parse_obj("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    np.testing.assert_array_equal(f[0], [0, 1, 2])


def test_load_obj_roundtrip(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(OBJ_TEXT)
    m = meshlib.load_obj(p, center=False)
    assert m.num_vertices == 5
    assert m.num_triangles == 3
    assert m.padded_triangles % 128 == 0


def test_centering_subtracts_centroid():
    v = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], float)
    f = np.array([[0, 1, 2]])
    m = meshlib.make_mesh(v, f, center=True)
    np.testing.assert_allclose(np.asarray(m.center),
                               [2 / 3, 2 / 3, 0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m.vertices[:3]).mean(axis=0), [0, 0, 0], atol=1e-6)


def test_intersection_constants_identities():
    """g_det = e2×e1, t_num = A·g_det on every real triangle."""
    m = meshlib.icosphere_mesh(radius=0.1, subdivisions=1)
    n = m.num_triangles
    a, e1, e2 = (np.asarray(x[:n]) for x in (m.tri_a, m.tri_e1, m.tri_e2))
    np.testing.assert_allclose(np.asarray(m.g_det[:n]),
                               np.cross(e2, e1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.t_num[:n]),
                               np.einsum("td,td->t", a,
                                         np.cross(e2, e1)), atol=1e-6)


def test_padding_is_degenerate():
    m = meshlib.box_mesh(pad_to=128)
    pad = np.asarray(m.g_det[m.num_triangles:])
    assert np.all(pad == 0.0)


def test_box_mesh_is_closed_and_outward():
    """Divergence theorem: ∮ x·n dA = 3V for a closed outward surface."""
    m = meshlib.box_mesh(0.2, 0.3, 0.4)
    n = m.num_triangles
    a = np.asarray(m.tri_a[:n])
    e1 = np.asarray(m.tri_e1[:n])
    e2 = np.asarray(m.tri_e2[:n])
    # outward normal area vector = (e1 × e2)/2 for CCW-outward winding
    nvec = np.cross(e1, e2) / 2
    centroid = a + (e1 + e2) / 3
    vol = np.sum(np.einsum("td,td->t", centroid, nvec)) / 3
    np.testing.assert_allclose(vol, 0.2 * 0.3 * 0.4, rtol=1e-5)
