"""Offline asset pipeline and IO (host-side, numpy).

Byte-compatible with the reference's formats so existing scenes load
unchanged:
  - .plain binary scenes (Common/ModelLoadSaveBinary.cpp:15-32)
  - DDS images incl. the 3D R16_FLOAT SDF volumes (Common/ImageIO.cpp:448-586)
  - quantized 28-byte vertices (Common/MeshProcessing.cpp, VertexInput.h)
plus the glTF importer (AssetPipeline/ModelImport.cpp) and the SDF baker
(AssetPipeline/SceneSDF.cpp), vectorized with numpy and optionally
accelerated by the C++ baker in plainrenderer_tpu/native.
"""
