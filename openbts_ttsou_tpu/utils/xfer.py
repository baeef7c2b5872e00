"""Relay-safe host<->device transfers.

Some remote TPU attachments (e.g. the axon relay used for single-chip
benching) do not implement complex64 host<->device copies: the copy is
accepted, fails asynchronously with ``UNIMPLEMENTED: TPU backend error``
and wedges every subsequent program in the client process. Complex
values are fully supported *inside* compiled programs (math, constants
embedded in the executable, device-resident arrays passed between jit
calls) — only the explicit transfer path is broken.

All framework code that moves complex arrays across the host/device
boundary goes through these helpers: the real/imag planes cross as
float32 and are (re)combined by a tiny jitted program on the device
side, or by numpy on the host side.

On the CPU backend (the test mesh) the helpers degrade to plain
``jax.device_put`` / ``np.asarray``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_FORCE = os.environ.get("OPENBTS_TPU_XFER")  # "split" | "direct" | None
_cached_split: bool | None = None


def _needs_split() -> bool:
    """True when complex transfers must be decomposed for this backend."""
    global _cached_split
    if _FORCE == "split":
        return True
    if _FORCE == "direct":
        return False
    if _cached_split is None:
        try:
            _cached_split = jax.devices()[0].platform not in ("cpu",)
        except Exception:
            _cached_split = False
    return _cached_split


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _split(z):
    return jnp.real(z), jnp.imag(z)


def _put_leaf(x):
    if isinstance(x, jax.Array) and not isinstance(
            x, jax.core.Tracer):  # already on device
        return x
    a = np.asarray(x)
    if np.iscomplexobj(a) and _needs_split():
        re = jax.device_put(np.ascontiguousarray(a.real, np.float32))
        im = jax.device_put(np.ascontiguousarray(a.imag, np.float32))
        return _combine(re, im)
    return jax.device_put(a)


def _get_leaf(x):
    if isinstance(x, jax.Array) and jnp.iscomplexobj(x) and _needs_split():
        re, im = _split(x)
        return np.asarray(re) + 1j * np.asarray(im).astype(np.float32)
    return np.asarray(x)


def device_put_safe(tree):
    """`jax.device_put` over a pytree, complex leaves shipped as planes."""
    return jax.tree_util.tree_map(_put_leaf, tree)


def device_get_safe(tree):
    """Fetch a pytree to numpy, complex leaves fetched as planes."""
    return jax.tree_util.tree_map(_get_leaf, tree)
