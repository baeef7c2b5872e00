"""Device-mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np


def mesh_factors(n: int) -> tuple[int, int]:
    """Factor n devices into (chan, time) axes: prefer a 2-ish time axis
    (halo rings are cheap; channel parallelism is embarrassingly
    parallel, so give it the larger factor)."""
    if n <= 1:
        return (1, 1)
    for t in (2, 4, 3, n):
        if n % t == 0:
            return (n // t, t)
    return (n, 1)


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, str] = ("chan", "time")) -> jax.sharding.Mesh:
    """Build a (chan, time) mesh over the first n_devices devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    c, t = mesh_factors(n)
    arr = np.asarray(devs[:n]).reshape(c, t)
    return jax.sharding.Mesh(arr, axis_names)
