from . import math, rng, spectrum, warp  # noqa: F401
