"""Frame graph and scene registration.

The reference's RenderFrontend (pass orchestration, RenderFrontend.cpp:313-
406) and RenderBackend (resource/barrier/submission machinery) collapse here
into: scenebuild.py (host-side scene -> device arrays, the analog of
registerMeshes + createMeshes) and frame.py (the per-frame pass graph as ONE
jittable pure function over the carried FrameState).
"""
