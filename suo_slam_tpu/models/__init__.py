from .hourglass import HourglassNet, Residual, Hourglass  # noqa: F401
from .pkpnet import PkpNet, PkpNetOutput  # noqa: F401
