from . import geometry, lie, symmetry  # noqa: F401
