from . import p3p, pnp  # noqa: F401
