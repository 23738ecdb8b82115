"""Geometry op layer: JAX/XLA formulations (+ Pallas kernels in ops.pallas)
of the reference's CUDA extension `_multi_shape_pvcnn_backend`
(SURVEY.md §2.4). All ops are pure, jittable, channels-last.
"""
from . import se3  # noqa: F401
from .frustum import frustum_pointnet_loss, get_box_corners_3d  # noqa: F401
from .lrf import change_coords, global_lrf, local_lrf, pca_align  # noqa: F401
from .neighbors import (  # noqa: F401
    ball_group,
    ball_query,
    ball_query_group,
    bilateral_knn,
    grouping,
    knn,
    knn_select,
    mutual_nearest_neighbors,
    pairwise_sqdist,
    three_nn_interpolate,
)
from .normals import estimate_normals  # noqa: F401
from .ppf import global_ppf, local_ppf, new_ppf, ppf  # noqa: F401
from .sampling import furthest_point_sample, gather, random_choice  # noqa: F401
from .spherical import (  # noqa: F401
    spherical_avg_voxelize,
    spherical_trilinear_devoxelize,
    spherical_voxel_indices,
)
from .voxelize import (  # noqa: F401
    avg_voxelize,
    avg_voxelize_fast,
    scatter_mean,
    trilinear_devoxelize,
    trilinear_devoxelize_fast,
)
from .factored_vox import (  # noqa: F401
    corner_gather_factored,
    corner_scatter_factored,
    scatter_mean_factored,
)
