from .bc import locbcarray, locbcarray_mod, locsourcearray  # noqa: F401
from .local_op import LocalOperator, locoperator  # noqa: F401
from .traction import computetraction, computetraction_mod  # noqa: F401
