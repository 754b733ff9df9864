from . import ba, p3p, pnp  # noqa: F401
