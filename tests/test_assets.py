import json
import struct

import numpy as np
import pytest

from plainrenderer_tpu.assets import compressed, dds, plain_format, procedural
from plainrenderer_tpu.assets.gltf_import import load_model_gltf
from plainrenderer_tpu.assets.sdf_bake import (
    bake_mesh_sdf,
    next_power_of_two,
    sdf_resolution_for_aabb,
)


def test_r10g10b10a2_roundtrip(rng):
    v = rng.random((256, 3)).astype(np.float32) * 2 - 1
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    packed = compressed.vec3_to_r10g10b10a2(v)
    back = compressed.r10g10b10a2_to_vec3(packed)
    assert np.abs(back - v).max() < 2.5 / 1021


def test_r10g10b10a2_axis_vectors_exact_layout():
    # x lands in bits 20-29 (CompressedTypes.cpp:40 shift (2-i)*10)
    packed = compressed.vec3_to_r10g10b10a2(np.asarray([1.0, -1.0, 0.0]))
    x_bits = (packed >> 20) & 1023
    y_bits = (packed >> 10) & 1023
    assert x_bits == 511  # +1 -> 511
    assert y_bits == (-510) & 1023  # -1 -> -510 two's complement


def test_unorm16_snorm16():
    assert compressed.float_to_unorm16(np.asarray(1.0)) == 65535
    assert compressed.float_to_unorm16(np.asarray(0.0)) == 0
    assert compressed.float_to_snorm16(np.asarray(-1.0)) == -32768


def _tiny_scene():
    mesh = procedural.box_mesh(1.0, 2.0, 3.0)
    mesh.texture_paths = plain_format.TexturePaths(
        albedo="textures/a.png", normal="n.png", specular="", sdf="sdfTextures/box.dds"
    )
    mesh.mean_albedo = np.asarray([0.25, 0.5, 0.75], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [1, 2, 3]
    return plain_format.Scene(
        objects=[plain_format.ObjectBinary(model_matrix=m, mesh_index=0)],
        meshes=[mesh],
    )


def test_plain_roundtrip(tmp_path):
    scene = _tiny_scene()
    binary = plain_format.scene_to_binary(scene)
    path = tmp_path / "test.plain"
    plain_format.save_binary_scene(path, binary)
    loaded = plain_format.load_binary_scene(path)

    assert len(loaded.objects) == 1
    assert loaded.objects[0].mesh_index == 0
    np.testing.assert_allclose(
        loaded.objects[0].model_matrix, scene.objects[0].model_matrix, atol=1e-7
    )
    lm = loaded.meshes[0]
    sm = binary.meshes[0]
    assert lm.index_count == sm.index_count
    assert lm.vertex_count == sm.vertex_count
    assert lm.texture_paths.albedo == "textures/a.png"
    assert lm.texture_paths.sdf == "sdfTextures/box.dds"
    np.testing.assert_allclose(lm.mean_albedo, [0.25, 0.5, 0.75])
    np.testing.assert_array_equal(lm.index_buffer, sm.index_buffer)
    assert lm.vertex_buffer.tobytes() == sm.vertex_buffer.tobytes()


def test_plain_file_header_bytes(tmp_path):
    """Byte-level check of the header layout (ModelLoadSaveBinary.cpp:8-13)."""
    scene = plain_format.scene_to_binary(_tiny_scene())
    path = tmp_path / "hdr.plain"
    plain_format.save_binary_scene(path, scene)
    raw = path.read_bytes()
    assert raw[:4] == b"PlMB"
    obj_count, mesh_count = struct.unpack_from("<QQ", raw, 8)
    assert (obj_count, mesh_count) == (1, 1)
    # object block starts at 24: 64B matrix + 8B mesh index
    mesh_index = struct.unpack_from("<Q", raw, 24 + 64)[0]
    assert mesh_index == 0


def test_plain_quantization_quality():
    scene = _tiny_scene()
    binary = plain_format.scene_to_binary(scene)
    arrays = plain_format.mesh_binary_to_arrays(binary.meshes[0])
    src = scene.meshes[0]
    np.testing.assert_allclose(arrays["positions"], src.positions, atol=1e-6)
    np.testing.assert_allclose(arrays["uvs"], src.uvs, atol=2e-3)
    assert np.abs(arrays["normals"] - src.normals).max() < 3e-3
    np.testing.assert_array_equal(
        arrays["indices"].reshape(-1), src.indices
    )


def test_dds_3d_volume_roundtrip(tmp_path):
    vol = np.linspace(-2, 2, 4 * 8 * 16, dtype=np.float32).reshape(4, 8, 16)
    path = tmp_path / "vol.dds"
    dds.write_sdf_volume(path, vol)
    back = dds.read_sdf_volume(path)
    assert back.shape == (4, 8, 16)
    np.testing.assert_allclose(back, vol, atol=2e-3)
    # header spot checks (ImageIO.cpp:448-586)
    raw = path.read_bytes()
    assert raw[:4] == b"DDS "
    header_size, flags, height, width = struct.unpack_from("<4I", raw, 4)
    assert header_size == 124
    assert width == 16 and height == 8
    depth = struct.unpack_from("<I", raw, 4 + 20)[0]
    assert depth == 4
    fourcc = raw[4 + 28 + 44 + 8: 4 + 28 + 44 + 12]
    assert fourcc == b"DX10"
    dxgi = struct.unpack_from("<I", raw, 4 + 124)[0]
    assert dxgi == dds.DXGI_R16_FLOAT


def test_sdf_resolution_rule():
    assert next_power_of_two(5) == 8
    assert next_power_of_two(64) == 64
    # extent 10m / 0.25 = 40 -> next pow2 = 64; extent 1m -> 4 -> clamp 16
    assert sdf_resolution_for_aabb([0, 0, 0], [10.0, 1.0, 3.0]) == (64, 16, 16)


def test_sdf_bake_cube_matches_analytic():
    mesh = procedural.box_mesh(2.0, 2.0, 2.0)
    vol = bake_mesh_sdf(mesh.positions, mesh.indices, resolution=(16, 16, 16))
    assert vol.shape == (16, 16, 16)
    # center voxel must be inside (negative), ~1.0 deep
    c = vol[8, 8, 8]
    assert c < 0
    assert abs(abs(c) - 1.0) < 0.2
    # corner voxels of the padded volume are outside (positive)
    assert vol[0, 0, 0] > 0
    # analytic check: distance at corner voxel to the cube
    from plainrenderer_tpu.scene.aabb import pad_sdf_bounding_box

    pmin, pmax = pad_sdf_bounding_box(np.full(3, -1.0), np.full(3, 1.0))
    pmin, pmax = np.asarray(pmin), np.asarray(pmax)
    extent = pmax - pmin
    center_pos = pmin + (np.asarray([0.5, 0.5, 0.5]) / 16) * extent
    q = np.abs(center_pos) - 1.0
    analytic = np.linalg.norm(np.maximum(q, 0))
    np.testing.assert_allclose(vol[0, 0, 0], analytic, atol=0.05)


def test_sdf_bake_sign_convention_inside_negative():
    mesh = procedural.cylinder_mesh(1.0, 4.0, segments=32, rings=4)
    # cylinder is open (no caps) -> winding number handles it gracefully near
    # the barrel; check a point well inside the barrel at mid height
    vol = bake_mesh_sdf(mesh.positions, mesh.indices, resolution=(16, 16, 16))
    assert vol[8, 8, 8] < 0


def _write_test_gltf(tmp_path):
    """Tiny single-triangle glTF with external bin buffer."""
    positions = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.asarray([[0, 0, 1]] * 3, np.float32)
    tangents = np.asarray([[1, 0, 0, 1]] * 3, np.float32)
    uvs = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.asarray([0, 1, 2], np.uint16)
    blobs = [positions, normals, tangents, uvs, indices]
    bin_data = b"".join(b.tobytes() for b in blobs)
    offsets = np.cumsum([0] + [b.nbytes for b in blobs])[:-1]
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [0, 2, 0]}],
        "meshes": [{
            "name": "tri",
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TANGENT": 2,
                               "TEXCOORD_0": 3},
                "indices": 4,
            }],
        }],
        "buffers": [{"uri": "scene.bin", "byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": int(offsets[i]), "byteLength": int(blobs[i].nbytes)}
            for i in range(5)
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC4"},
            {"bufferView": 3, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 4, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
    }
    (tmp_path / "scene.gltf").write_text(json.dumps(doc))
    (tmp_path / "scene.bin").write_bytes(bin_data)
    return tmp_path / "scene.gltf"


def test_gltf_import_y_flip_and_node_conjugation(tmp_path):
    path = _write_test_gltf(tmp_path)
    scene = load_model_gltf(path)
    assert len(scene.meshes) == 1
    assert len(scene.objects) == 1
    mesh = scene.meshes[0]
    # y-flip on positions (ModelImport.cpp:187-190)
    np.testing.assert_allclose(
        mesh.positions, [[0, 0, 0], [1, 0, 0], [0, -1, 0]], atol=1e-7
    )
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 3, atol=1e-7)
    # bitangent computed pre-flip: cross([1,0,0],[0,0,1]) = [0,-1,0]
    np.testing.assert_allclose(mesh.bitangents, [[0, -1, 0]] * 3, atol=1e-7)
    # node translation [0,2,0] conjugated by c=diag(1,-1,1): world t=[0,-2,0]
    np.testing.assert_allclose(
        scene.objects[0].model_matrix[:3, 3], [0, -2, 0], atol=1e-7
    )
    # default sdf path convention
    assert mesh.texture_paths.sdf.endswith("sdfTextures/tri.dds")


def test_gltf_import_missing_attribute_raises(tmp_path):
    path = _write_test_gltf(tmp_path)
    doc = json.loads(path.read_text())
    del doc["meshes"][0]["primitives"][0]["attributes"]["TANGENT"]
    path.write_text(json.dumps(doc))
    with pytest.raises(ValueError, match="TANGENT"):
        load_model_gltf(path)


def test_procedural_scene_valid():
    scene = procedural.build_atrium_scene()
    assert len(scene.objects) == len(scene.meshes)
    assert procedural.triangle_count(scene) > 1000
    for mesh in scene.meshes:
        v = mesh.positions.shape[0]
        assert mesh.indices.max() < v
        for attr in (mesh.normals, mesh.tangents, mesh.bitangents):
            np.testing.assert_allclose(
                np.linalg.norm(attr, axis=-1), 1.0, atol=1e-4
            )
