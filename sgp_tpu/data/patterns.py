"""Pattern parsing and broadcasting (``tsl/ops/pattern.py:11-69`` +
``tsl/data/utils.py:88-145``): dims named t/s (time), n (nodes),
c/f (channels), e (edges); validation and broadcast of arrays to a
target pattern."""
from __future__ import annotations

import numpy as np

_ALIASES = {"s": "t", "f": "c"}
_VALID = {"t", "n", "c", "e", "b"}


def parse_pattern(pattern: str) -> list:
    dims = [ _ALIASES.get(d, d) for d in pattern.strip().split(" ") if d]
    for d in dims:
        if d not in _VALID:
            raise ValueError(f"invalid pattern dim {d!r} in {pattern!r}")
    return dims


def check_pattern(pattern: str, ndim: int = None) -> str:
    dims = parse_pattern(pattern)
    if ndim is not None and len(dims) != ndim:
        raise ValueError(
            f"pattern {pattern!r} has {len(dims)} dims, array has {ndim}")
    return " ".join(dims)


def broadcast(x, pattern: str, target: str,
              t: int = None, n: int = None):
    """Expand ``x`` with pattern ``pattern`` to ``target`` by inserting
    and broadcasting missing t/n dims (sizes given by ``t``/``n``)."""
    src = parse_pattern(pattern)
    dst = parse_pattern(target)
    assert all(d in dst for d in src), (pattern, target)
    xp = np if isinstance(x, np.ndarray) else __import__("jax.numpy",
                                                         fromlist=["x"])
    out = x
    for i, d in enumerate(dst):
        if d not in src:
            out = xp.expand_dims(out, axis=i)
            size = {"t": t, "n": n}.get(d)
            if size is not None:
                shape = list(out.shape)
                shape[i] = size
                out = xp.broadcast_to(out, tuple(shape))
    return out
