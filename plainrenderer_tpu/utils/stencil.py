"""Fusion-friendly stencil taps for dense XLA image passes.

The renderer's screen-space filters (TAA neighborhoods, GI disc blurs, bloom
tap patterns) need many small clamped shifts of the same plane. Implementing
each shift as roll + border writes (dynamic-update-slice) forces XLA to
materialize every tap as its own HBM array — a 9-tap 3x1080p neighborhood
costs ~27 full-frame traversals. Padding the source ONCE (edge-replicated
concat) and expressing every tap as a static `lax.slice` of the padded array
lets XLA fuse the whole weighted-sum stencil into a single loop fusion:
~2 traversals regardless of tap count. Measured on v5e: the TAA main filter
dropped 8.0 -> 1.6 ms from this change alone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class EdgePadded:
    """Edge-replicated padding of the trailing 2 axes + static shift taps.

    tap(dy, dx) returns out[y, x] = in_clamped[y - dy, x - dx]  (the
    convention of ops/taa._shift: positive dy moves content down).
    """

    def __init__(self, x: jnp.ndarray, margin_y: int, margin_x: int = None):
        self.my = int(margin_y)
        self.mx = int(margin_x if margin_x is not None else margin_y)
        self.h = x.shape[-2]
        self.w = x.shape[-1]
        self.lead = x.shape[:-2]
        widths = [(0, 0)] * (x.ndim - 2) + [(self.my, self.my),
                                            (self.mx, self.mx)]
        self.padded = jnp.pad(x, widths, mode="edge")

    def tap(self, dy: int, dx: int) -> jnp.ndarray:
        assert abs(dy) <= self.my and abs(dx) <= self.mx, (dy, dx, self.my,
                                                           self.mx)
        y0 = self.my - dy
        x0 = self.mx - dx
        starts = (0,) * len(self.lead) + (y0, x0)
        limits = tuple(self.lead) + (y0 + self.h, x0 + self.w)
        return jax.lax.slice(self.padded, starts, limits)

    def tap_fwd(self, dy: int, dx: int) -> jnp.ndarray:
        """out[y, x] = in_clamped[y + dy, x + dx] (ops/sdfgi/bloom shift
        convention)."""
        return self.tap(-dy, -dx)
