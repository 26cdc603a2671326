"""Regression output activation.

Maps head logits into the metric's value range (parity with reference
``model/regression_layer.py:10-62``):

- ``metric_min == -1`` -> tanh; ``metric_min == 0`` -> sigmoid
- then an element-wise power; default exponents {ssim: 1, mae: 2, mse: 4}
  (helps regress very small values). Power is only applied for non-negative
  ranges (min == 0).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from crossscore_tpu.utils.check_config import check_metric_prediction_config

_POW_DEFAULT = {"ssim": 1, "mae": 2, "mse": 4}


def regression_activation(
    metric_type: str,
    metric_min: int,
    metric_max: int,
    pow_factor="default",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return the activation fn for the configured metric."""
    check_metric_prediction_config(metric_type, metric_min, metric_max)

    if metric_min == -1:
        base = jnp.tanh
        p = 1
    elif metric_min == 0:
        base = jax.nn.sigmoid
        p = _POW_DEFAULT[metric_type] if pow_factor == "default" else pow_factor
    else:
        raise ValueError(f"metric_min={metric_min} not supported")

    p = float(p)
    if p == 1.0:
        return base
    return lambda x: jnp.power(base(x), p)
