from .engine import ObjectSlam, SlamConfig  # noqa: F401
