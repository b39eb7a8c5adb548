from . import grid, phase, rng, tetra, tonemap, welford  # noqa: F401
