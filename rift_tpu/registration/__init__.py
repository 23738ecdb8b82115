"""Registration & eval backend (SURVEY.md §2.7), all-JAX robust estimators."""
from .gnc import compatibility_core, fgr_pose, gnc_pose, teaser_pose  # noqa: F401
from .icp import icp_pose  # noqa: F401
from .kabsch import weighted_kabsch  # noqa: F401
from .metrics import pair_errors  # noqa: F401
from .pipeline import METHODS, register_pair  # noqa: F401
from .ransac import ransac_pose  # noqa: F401
