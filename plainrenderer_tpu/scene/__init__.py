"""Scene & camera layer: matrices, frustums, AABBs, culling, scene containers.

Host-side per-frame prep (mirrors the reference's Runtime/Rendering frontend
math: Camera.cpp, ViewFrustum.cpp, Culling.cpp, AABB.cpp). All functions are
jnp-pure so they can also run inside the jitted frame when beneficial.
"""
