from . import config, logging, platform, roofline  # noqa: F401
