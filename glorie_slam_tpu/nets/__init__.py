from .droid_net import DroidNet  # noqa: F401
