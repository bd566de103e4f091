"""Misc utilities (reference: ``deepctr/utils.py``).

The reference spawns a PyPI version-check thread on import
(``deepctr/utils.py:19-44``, ``deepctr/__init__.py:3-5``).  This environment is
zero-egress and a version-check phone-home is undesirable in a production
library anyway (SURVEY.md §1 calls it vestigial), so ``check_version`` is a
deliberate no-op kept for API compatibility.
"""

from __future__ import annotations


def check_version(version: str) -> None:
    """API-compatible no-op (the reference's PyPI check thread is not
    reproduced by design)."""
    return None


def concat_fun(inputs, axis=-1):
    """Reference ``layers/utils.py:12-18``."""
    import jax.numpy as jnp

    if len(inputs) == 1:
        return inputs[0]
    return jnp.concatenate(inputs, axis=axis)


def slice_arrays(arrays, start=None, stop=None):
    """Keras-style array slicing (reference ``layers/utils.py:21-70``)."""
    if arrays is None:
        return [None]
    if isinstance(arrays, list):
        if hasattr(start, "__len__"):
            if hasattr(start, "shape"):
                start = start.tolist()
            return [None if x is None else x[start] for x in arrays]
        return [None if x is None else x[start:stop] for x in arrays]
    if hasattr(start, "__len__"):
        if hasattr(start, "shape"):
            start = start.tolist()
        return arrays[start]
    if hasattr(start, "__getitem__"):
        return arrays[start:stop]
    return [None]
