from .blend import (  # noqa: F401
    transfinite_blend,
    transfinite_blend_corners,
    transfinite_blend_sbp,
)
from .connectivity import connectivityarrays  # noqa: F401
from .inp import LF_TO_LV, read_inp_2d  # noqa: F401
from .metrics import Metrics, create_metrics  # noqa: F401
