"""OBJ/MTL loading + ray-triangle mesh rendering."""
import numpy as np

import jax
import jax.numpy as jnp

from sim2real_lane_segment_tpu.sim import objmesh as OM
from sim2real_lane_segment_tpu.sim import render
from sim2real_lane_segment_tpu.sim.maps import load_map_dict

OBJ = """\
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
usemtl red
f 1 2 3 4
"""
MTL = """\
newmtl red
Kd 0.8 0.1 0.1
"""


def test_load_obj_quads_and_mtl(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ)
    (tmp_path / "test.mtl").write_text(MTL)
    mesh = OM.load_obj(str(tmp_path / "test.obj"))
    assert mesh.num_triangles == 2  # quad fan-triangulated
    np.testing.assert_allclose(mesh.colors[0], [0.8 * 255, 25.5, 25.5],
                               atol=0.1)
    # cache returns the same object
    assert OM.load_obj(str(tmp_path / "test.obj")) is mesh


def test_box_mesh_and_placement():
    box = OM.make_box_mesh(0.2, 0.3, 0.4, (10, 20, 30))
    assert box.num_triangles == 12
    v = OM.place_mesh(box, (1.0, 2.0), rotate_deg=90.0)
    assert v.shape == (12, 3, 3)
    # 90° yaw maps the box x-extent onto z; translated to (1, 2)
    assert abs(v[..., 0].max() - v[..., 0].min() - 0.4) < 1e-5
    assert abs(v[..., 2].max() - v[..., 2].min() - 0.2) < 1e-5
    assert abs(np.mean(v[..., 0]) - 1.0) < 1e-5


def test_mesh_rendered_into_scene():
    mdata = {
        "tile_size": 0.585,
        "tiles": [["straight/N", "straight/N", "straight/N"]],
        "objects": [{"kind": "duckiebot", "pos": [1.5, 0.5], "rotate": 0,
                     "height": 0.25}],
    }
    m = load_map_dict("mesh_map", mdata)
    scene = render.build_scene(m, 0)
    assert int(scene.meshes.vertices.shape[0]) == 12  # box stand-in
    # camera right behind the bot looking along +x
    pos = jnp.asarray([0.3 * m.tile_size, 0.5 * m.tile_size])
    angle = jnp.asarray(0.0)
    a = np.asarray(render.render_frame(scene, pos, angle,
                                       render.DRParams.default(),
                                       jax.random.key(0), height=60, width=80))
    # remove the mesh -> the frame must change (mesh was visible)
    scene2 = scene._replace(meshes=OM.MeshSet.empty())
    b = np.asarray(render.render_frame(scene2, pos, angle,
                                       render.DRParams.default(),
                                       jax.random.key(0), height=60, width=80))
    assert np.abs(a.astype(int) - b.astype(int)).max() > 10


def test_mesh_annotated_red():
    mdata = {
        "tile_size": 0.585,
        "tiles": [["straight/N", "straight/N", "straight/N"]],
        "objects": [{"kind": "duckiebot", "pos": [1.5, 0.5], "rotate": 0,
                     "height": 0.25}],
    }
    m = load_map_dict("mesh_map2", mdata)
    scene = render.build_scene(m, 0)
    pos = jnp.asarray([0.3 * m.tile_size, 0.5 * m.tile_size])
    frame = np.asarray(render.render_frame(scene, pos, jnp.asarray(0.0),
                                           render.DRParams.default(),
                                           jax.random.key(0), height=60,
                                           width=80, annotated=True))
    # pure-red obstacle pixels must exist (annotated obstacle color)
    red = (frame[..., 0] > 200) & (frame[..., 1] < 60) & (frame[..., 2] < 60)
    assert red.sum() > 10


# ---------------------------------------------------------------------------
# UV-textured meshes (reference objmesh.py:289-302 texture + annotated swap)
# ---------------------------------------------------------------------------

TEX_OBJ = """\
mtllib tex.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl skin
f 1/1 2/2 3/3 4/4
"""
TEX_MTL = """\
newmtl skin
Kd 0.5 0.5 0.5
map_Kd tex.png
"""


def test_load_obj_with_texture(tmp_path):
    import cv2
    (tmp_path / "tex.obj").write_text(TEX_OBJ)
    (tmp_path / "tex.mtl").write_text(TEX_MTL)
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :4] = (255, 0, 0)      # BGR blue-less: left half red... (B=255)
    img[:, 4:] = (0, 255, 0)
    cv2.imwrite(str(tmp_path / "tex.png"), img)
    mesh = OM.load_obj(str(tmp_path / "tex.obj"))
    assert mesh.num_triangles == 2
    assert len(mesh.textures) == 1
    assert mesh.textures[0].shape == (OM.TEX_RES, OM.TEX_RES, 3)
    assert (mesh.tex_ids == 0).all()
    assert mesh.uvs.max() == 1.0


def test_duckiebot_mesh_textured_render():
    """The duckiebot renders with its UV skin: yellow deck + blue chassis
    pixels appear; annotated mode swaps to the pure-red skin and the
    label extractor still yields class 3."""
    from sim2real_lane_segment_tpu.ops.labelgen import process_classes

    mdata = {
        "tile_size": 0.585,
        "tiles": [["straight/N", "straight/N", "straight/N"]],
        "objects": [{"kind": "duckiebot", "pos": [1.5, 0.5], "rotate": 180,
                     "height": 0.25}],
    }
    m = load_map_dict("mesh_map3", mdata)
    scene = render.build_scene(m, 0)
    pos = jnp.asarray([0.55 * m.tile_size, 0.5 * m.tile_size])
    orig, annot = render.render_pair(scene, pos, jnp.asarray(0.0),
                                     render.DRParams.default(),
                                     jax.random.key(0), height=120, width=160)
    orig, annot = np.asarray(orig), np.asarray(annot)
    yellow = (orig[..., 0] > 180) & (orig[..., 1] > 150) & (orig[..., 2] < 90)
    blue = (orig[..., 2] > 120) & (orig[..., 0] < 90)
    assert yellow.sum() > 5, "textured deck not visible"
    assert blue.sum() > 5, "textured chassis not visible"
    # annotated swap -> obstacle class 3 from the extractor
    mask = np.asarray(process_classes(orig, annot, channel_order="rgb"))
    assert (mask == 3).sum() > 20, np.bincount(mask.ravel(), minlength=4)


def test_npc_duckiebot_mesh_moves():
    """A dynamic duckiebot's mesh triangles follow the NPC pose."""
    from sim2real_lane_segment_tpu.sim.env import Simulator

    mdata = {
        "tile_size": 0.585,
        "tiles": [["straight/E"] * 6],
        "objects": [{"kind": "duckiebot", "pos": [2.5, 0.75], "rotate": 0,
                     "height": 0.12, "static": False}],
        "start_tile": [0, 0],
    }
    m = load_map_dict("mesh_map4", mdata)
    env = Simulator(map_obj=m, camera_width=32, camera_height=24,
                    domain_rand=False, seed=0)
    v0 = np.array(env.scene.meshes.vertices)
    for _ in range(12):
        env.step(np.asarray([0.0, 0.0], np.float32))
    v1 = np.array(env.scene.meshes.vertices)
    assert np.abs(v1 - v0).max() > 0.01, "npc mesh did not move"
