"""Pure math utilities shared by kernels, asset pipeline and tests.

Each module mirrors one of the reference's GLSL includes or C++ utility files
(cited per-function); everything is a pure jnp function usable inside jit and
inside Pallas kernel bodies.
"""
