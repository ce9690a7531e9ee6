"""PRNG-key discipline helpers.

One root key per run; every consumer folds in a static tag + step so streams never
collide (replaces the reference's global torch.manual_seed tricks,
custom_dataset.py:89-95).
"""

import jax


def key_for(root_key, tag: str, step: int = 0):
    """Derive a stream key from a root key, a string tag and an integer step."""
    k = jax.random.fold_in(root_key, hash(tag) & 0x7FFFFFFF)
    return jax.random.fold_in(k, step)
