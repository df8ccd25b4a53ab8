"""Seeded PRNG key threading.

Replaces the reference's global seeding (/root/reference/main.py:320-327):
XLA is deterministic by default, so reproducibility reduces to threading
`jax.random` keys explicitly.
"""

from __future__ import annotations

import jax


class KeySeq:
    """A stateful stream of fresh PRNG keys derived from one seed."""

    def __init__(self, seed: int | jax.Array = 0):
        self._key = seed if not isinstance(seed, int) else jax.random.key(seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def __call__(self) -> jax.Array:
        return self.next()

    def fold_in(self, data: int) -> jax.Array:
        return jax.random.fold_in(self._key, data)
