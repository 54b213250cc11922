from . import bessel, greens2d, greens3d, sampling, diff_ops  # noqa: F401
