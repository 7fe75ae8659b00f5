from . import corr, depth_filter, distance, upsample  # noqa: F401
