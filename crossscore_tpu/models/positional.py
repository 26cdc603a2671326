"""Multi-view positional embedding.

Behavioural parity with reference ``model/positional_encoding.py:4-75``: a
*fixed random* (non-trainable by default) (pe_h, pe_w, C) table, bilinearly
interpolated with align_corners=True to the actual patch grid, added
identically to every view (no view-index embedding).

The reference's ``+1e-4`` scale-factor epsilon (``positional_encoding.py:63-66``)
only affects torch's output-size floor computation; passing the target size
directly is exactly equivalent (covered by tests/test_ops.py golden checks).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from crossscore_tpu.ops.interpolate import interpolate_bilinear_align_corners


class MultiViewPositionalEmbedding(nn.Module):
    pe_h: int = 40
    pe_w: int = 40
    hidden_size: int = 384
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        n_view: int,
        grid_h: int,
        grid_w: int,
        valid_grid=None,
    ) -> jnp.ndarray:
        """tokens: (B, n_view * grid_h * grid_w, C) -> same shape with PE added.

        ``valid_grid``: traced (gh_v, gw_v) under shape-bucketed inference —
        the PE is interpolated for the VALID grid and placed into the padded
        (grid_h, grid_w) layout (padded positions are masked in attention).
        """
        pe = self.param(
            "pe", nn.initializers.normal(1.0), (self.pe_h, self.pe_w, self.hidden_size)
        )
        b = tokens.shape[0]
        if valid_grid is not None:
            import jax

            from crossscore_tpu.ops.interpolate import (
                interpolate_bilinear_align_corners_dyn,
            )

            if jnp.ndim(valid_grid[0]) == 1:  # per-item (B,) valid grids
                pe_hw = jax.vmap(
                    lambda vh, vw: interpolate_bilinear_align_corners_dyn(
                        pe, grid_h, grid_w, vh, vw
                    )
                )(valid_grid[0], valid_grid[1])  # (B, gh, gw, C)
                x = tokens.reshape(b, n_view, grid_h, grid_w, self.hidden_size)
                x = x + pe_hw.astype(tokens.dtype)[:, None]
                return x.reshape(b, n_view * grid_h * grid_w, self.hidden_size)
            pe_hw = interpolate_bilinear_align_corners_dyn(
                pe, grid_h, grid_w, valid_grid[0], valid_grid[1]
            )
        elif (grid_h, grid_w) == (self.pe_h, self.pe_w):
            pe_hw = pe
        else:
            pe_hw = interpolate_bilinear_align_corners(pe, grid_h, grid_w)
        x = tokens.reshape(b, n_view, grid_h, grid_w, self.hidden_size)
        x = x + pe_hw.astype(tokens.dtype)[None, None]
        return x.reshape(b, n_view * grid_h * grid_w, self.hidden_size)
