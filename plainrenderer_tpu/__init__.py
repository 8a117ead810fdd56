"""plainrenderer_tpu — a TPU-native real-time forward renderer.

Brand-new JAX/XLA/Pallas implementation of the capability set of
Gaukler/PlainRenderer (C++17/Vulkan): forward PBR with Cook-Torrance GGX and
multiscatter BRDFs, GPU-fitted cascaded sun shadows, SDF sphere-traced diffuse
GI with temporal denoising, physically based sky (Hillaire 2020), froxel
volumetric lighting, TAA, bloom, histogram auto-exposure, ACES tonemapping,
plus the offline asset pipeline (glTF -> .plain + per-mesh SDF volumes, kept
byte-compatible with the reference formats).

Architecture (TPU-first, not a port):
  - the whole per-frame pass graph compiles to ONE jitted XLA program
    (``plainrenderer_tpu.render.frame.render_frame``) over framebuffer-sized
    arrays; Vulkan barriers/descriptors/allocators dissolve into SSA dataflow;
  - rasterization is a Pallas kernel in which edge-function evaluation runs
    as f32 matmuls on the MXU (visibility-buffer style);
  - temporal state (TAA/GI/volumetric/exposure histories) is a carried pytree
    donated between frames, resident in HBM;
  - multi-chip scaling is pixel-space SPMD sharding via jax.sharding/pjit.
"""

__version__ = "0.1.0"
