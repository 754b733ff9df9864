from .profiling import AverageMeter, Timer, device_time, ram_guard, trace  # noqa: F401
