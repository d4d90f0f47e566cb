from . import functions, kernels, wkb  # noqa: F401
