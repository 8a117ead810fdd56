"""Compute ops: the TPU-side rendering math.

Each module here replaces one or more of the reference's GLSL shader passes
(resources/shaders/*) with jnp functions and/or Pallas TPU kernels. Everything
is pure and jit-compatible; the frame graph in plainrenderer_tpu.render.frame
composes these into a single jitted program.
"""
