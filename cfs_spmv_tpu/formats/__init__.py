from .bell import BellPlan, build_bell_plan  # noqa: F401
from .coo import COO  # noqa: F401
from .csr import CSR  # noqa: F401
from .sss import SSSPlan, build_sss_plan  # noqa: F401
