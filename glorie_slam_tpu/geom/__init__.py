from . import lie, projective, alignment, ba  # noqa: F401
