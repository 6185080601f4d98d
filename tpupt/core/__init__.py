from . import linalg, rng  # noqa: F401
