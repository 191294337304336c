from . import rng
