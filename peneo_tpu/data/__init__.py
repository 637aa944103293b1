from . import box_utils, fetchers, tagging  # noqa: F401
