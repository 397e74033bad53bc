"""Scene I/O: PLY loader + XML writer round trips (the remaining
SceneGraph I/O surfaces — ply_loader.cpp:327, xml_writer.cpp roles)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

import embree_tpu as et
from embree_tpu.utils.ply import load_ply, write_xml
from embree_tpu.utils.xml_scene import XMLScene, load_xml, to_scene


def _mesh():
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0.5, 0.5, 1]], np.float32)
    faces = [(0, 1, 2, 3), (0, 1, 4)]       # one quad (fans) + one tri
    return v, faces


def test_ply_ascii_roundtrip(tmp_path):
    v, faces = _mesh()
    p = tmp_path / "m.ply"
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(v)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for row in v:
            f.write(" ".join(map(str, row)) + "\n")
        for fc in faces:
            f.write(f"{len(fc)} " + " ".join(map(str, fc)) + "\n")
    lv, li = load_ply(p)
    np.testing.assert_allclose(lv, v)
    assert li.shape == (3, 3)               # quad fans into 2 tris + 1 tri


def test_ply_binary_roundtrip(tmp_path):
    import struct
    v, faces = _mesh()
    p = tmp_path / "m.ply"
    with open(p, "wb") as f:
        hdr = ("ply\nformat binary_little_endian 1.0\n"
               f"element vertex {len(v)}\n"
               "property float x\nproperty float y\nproperty float z\n"
               f"element face {len(faces)}\n"
               "property list uchar int vertex_indices\nend_header\n")
        f.write(hdr.encode())
        for row in v:
            f.write(struct.pack("<fff", *row))
        for fc in faces:
            f.write(struct.pack("<B", len(fc))
                    + struct.pack(f"<{len(fc)}i", *fc))
    lv, li = load_ply(p)
    np.testing.assert_allclose(lv, v)
    assert li.shape == (3, 3)


def test_xml_writer_roundtrip(tmp_path):
    """write_xml -> load_xml -> commit reproduces the committed scene:
    identical hit distances for a ray batch (incl. an animated mesh with a
    time range)."""
    rng = np.random.default_rng(3)
    tri_v = rng.uniform(-1, 1, (9, 3)).astype(np.float32)
    tri_i = np.arange(9, dtype=np.int32).reshape(3, 3)
    anim_v = np.stack([tri_v, tri_v + np.float32(0.5)])
    pts = rng.uniform(-1, 1, (5, 4)).astype(np.float32)
    pts[:, 3] = 0.3

    xs = XMLScene()
    xs.geometries.append(et.TriangleGeometry(tri_v, tri_i))
    g2 = et.TriangleGeometry(anim_v, tri_i, time_range=(0.2, 0.8))
    xs.geometries.append(g2)
    xs.geometries.append(et.PointGeometry(pts, kind="sphere"))
    xs.kd = [np.ones(3, np.float32)] * 3
    xs.camera = dict(from_=np.zeros(3), to=np.ones(3),
                     up=np.array([0.0, 1.0, 0.0]), fov=45.0)

    p = tmp_path / "scene.xml"
    write_xml(p, xs)
    xs2 = load_xml(p)
    assert len(xs2.geometries) == 3
    np.testing.assert_allclose(xs2.geometries[1].time_range,
                               (0.2, 0.8), rtol=1e-6)
    assert xs2.camera is not None and xs2.camera["fov"] == 45.0

    cs1 = to_scene(xs).commit()
    cs2 = to_scene(xs2).commit()
    org = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32))
    h1 = jax.jit(et.intersect)(cs1, et.make_rays(org, d, time=t))
    h2 = jax.jit(et.intersect)(cs2, et.make_rays(org, d, time=t))
    np.testing.assert_array_equal(np.asarray(h1.valid), np.asarray(h2.valid))
    m = np.asarray(h1.valid)
    np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m],
                               rtol=1e-5)


def test_hermite_tangents_not_translated(tmp_path):
    """Hermite tangents are derivatives: a Transform's translation must not
    leak into them (xml_loader.cpp loadHermiteCurves + xfmVector baking).
    Regression: the oriented_curve0-4 / oriented_hermite_curve_twisted tier
    rendered mis-shaped ribbons because translate was added to tangents."""
    import numpy as np
    from embree_tpu.geometry import CurveGeometry
    xml = """<?xml version="1.0"?>
<scene><Group>
  <Transform>
    <AffineSpace translate="5 7 -3"/>
    <Curves basis="hermite" type="normal_oriented">
      <positions>0 0 0 0.1  0 0 1 0.1</positions>
      <tangents>0 0 1 0.0  0 0 1 0.0</tangents>
      <normals>1 0 0  0 1 0</normals>
      <normal_derivatives>0 1 0  -1 0 0</normal_derivatives>
      <indices>0</indices>
    </Curves>
  </Transform>
</Group></scene>"""
    p = tmp_path / "herm.xml"
    p.write_text(xml)
    xs = load_xml(p)
    g = [x for x in xs.geometries if isinstance(x, CurveGeometry)][0]
    v = np.asarray(g.vertices)
    t = np.asarray(g.tangents)
    # positions ARE translated ...
    np.testing.assert_allclose(v[0, :3], [5, 7, -3], atol=1e-6)
    # ... tangents are NOT (pure translation: linear part is identity)
    np.testing.assert_allclose(t, [[0, 0, 1, 0], [0, 0, 1, 0]], atol=1e-6)
    # normals / normal derivatives likewise ride the vector path
    np.testing.assert_allclose(np.asarray(g.normals)[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.normal_derivatives)[1],
                               [-1, 0, 0], atol=1e-6)
