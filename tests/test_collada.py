"""COLLADA importer tests (scene/collada.py — mtsimport equivalent,
reference: mitsuba/src/converter/). A synthetic .dae with a transformed
triangle mesh, a polylist quad, and lambert materials must round-trip
through import_collada into a renderable scene XML."""

import os

import numpy as np

from sdmm_tpu.scene.collada import import_collada, load_dae
from sdmm_tpu.scene.xml_loader import load_scene

DAE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>Z_UP</up_axis></asset>
  <library_effects>
    <effect id="red-effect"><profile_COMMON><technique sid="common">
      <lambert><diffuse><color>0.8 0.1 0.1 1</color></diffuse></lambert>
    </technique></profile_COMMON></effect>
  </library_effects>
  <library_materials>
    <material id="red"><instance_effect url="#red-effect"/></material>
  </library_materials>
  <library_geometries>
    <geometry id="tri" name="tri"><mesh>
      <source id="tri-pos">
        <float_array id="tri-pos-array" count="9">0 0 0  1 0 0  0 1 0</float_array>
        <technique_common><accessor source="#tri-pos-array" count="3" stride="3">
          <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
        </accessor></technique_common>
      </source>
      <vertices id="tri-verts"><input semantic="POSITION" source="#tri-pos"/></vertices>
      <triangles material="mat0" count="1">
        <input semantic="VERTEX" source="#tri-verts" offset="0"/>
        <p>0 1 2</p>
      </triangles>
    </mesh></geometry>
    <geometry id="quad" name="quad"><mesh>
      <source id="quad-pos">
        <float_array id="quad-pos-array" count="12">0 0 0  2 0 0  2 2 0  0 2 0</float_array>
        <technique_common><accessor source="#quad-pos-array" count="4" stride="3"/></technique_common>
      </source>
      <vertices id="quad-verts"><input semantic="POSITION" source="#quad-pos"/></vertices>
      <polylist material="mat0" count="1">
        <input semantic="VERTEX" source="#quad-verts" offset="0"/>
        <vcount>4</vcount>
        <p>0 1 2 3</p>
      </polylist>
    </mesh></geometry>
  </library_geometries>
  <library_visual_scenes><visual_scene id="scene">
    <node id="n1">
      <translate>0 0 3</translate>
      <instance_geometry url="#tri">
        <bind_material><technique_common>
          <instance_material symbol="mat0" target="#red"/>
        </technique_common></bind_material>
      </instance_geometry>
    </node>
    <node id="n2">
      <instance_geometry url="#quad">
        <bind_material><technique_common>
          <instance_material symbol="mat0" target="#red"/>
        </technique_common></bind_material>
      </instance_geometry>
    </node>
  </visual_scene></library_visual_scenes>
</COLLADA>
"""


def test_load_dae(tmp_path):
    p = tmp_path / "scene.dae"
    p.write_text(DAE)
    meshes, mats = load_dae(str(p))
    assert len(meshes) == 2
    assert np.allclose(mats["red"], [0.8, 0.1, 0.1])
    tri = next(m for m in meshes if m["name"] == "tri")
    quad = next(m for m in meshes if m["name"] == "quad")
    assert tri["v"].shape == (1, 3, 3)
    assert quad["v"].shape == (2, 3, 3)  # polylist quad triangulated
    # Z_UP: node translate (0,0,3) -> y=3 after up-fix.
    assert np.allclose(tri["v"][0, 0], [0.0, 3.0, 0.0])


def test_import_roundtrip(tmp_path):
    p = tmp_path / "scene.dae"
    p.write_text(DAE)
    out = tmp_path / "imported" / "scene.xml"
    n = import_collada(str(p), str(out))
    assert n == 2
    builder = load_scene(str(out))
    scene, cfg = builder.build()
    t = int(scene.tri_v0.shape[0])
    assert t >= 3  # 1 + 2 triangles (+ padding)
    # Material color carried through.
    alb = np.asarray(scene.bsdf_albedo)
    assert np.any(np.all(np.isclose(alb, [0.8, 0.1, 0.1], atol=1e-5), axis=-1))
