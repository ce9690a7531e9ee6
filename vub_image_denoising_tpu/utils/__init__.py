from . import checkpoint, prng
