from . import bp1  # noqa: F401
from .events import merged_events  # noqa: F401
