"""Alias namespace: core compute ops (geometry, detection ops, filters,
association kernels)."""

from macaque_tpu.geometry import (  # noqa: F401
    triangulate_dlt, triangulate_dlt_pinv, triangulate_ransac,
    reprojection_error, reprojection_error_mean,
    refine_points_3d, RefineConfig,
)
from macaque_tpu.geometry.lm import lm_solve, LMConfig  # noqa: F401
from macaque_tpu.nn.ops import (  # noqa: F401
    nms_fixed, batched_nms_fixed, roi_align, roi_align_pyramid,
    bbox_iou, delta2bbox, make_anchors,
)
from macaque_tpu.nn.heatmap import udp_decode, flip_heatmaps  # noqa: F401
from macaque_tpu.nn.pallas_attention import fused_attention  # noqa: F401
from macaque_tpu.filters import (  # noqa: F401
    viterbi_filter, viterbi_filter_joints, ema_smooth,
    interpolate_nan, median_filter_1d,
)
from macaque_tpu.association import (  # noqa: F401
    geometry_affinity, combined_affinity, match_svt,
    infer_pictorial_3d, transitive_closure,
)
