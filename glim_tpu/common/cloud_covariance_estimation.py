"""Per-point covariance estimation front-end.

Equivalent surface to the reference's ``CloudCovarianceEstimation``
(reference: src/glim/common/cloud_covariance_estimation.cpp:24-226) with the
PLANE / NORMALIZED_MIN_EIG / FROBENIUS regularization modes. Device kernels
live in glim_tpu.ops.covariance (closed-form 3x3 eigendecomposition).
"""

from __future__ import annotations

from glim_tpu.ops import covariance as cov_ops


class CloudCovarianceEstimation:
    PLANE = cov_ops.PLANE
    NORMALIZED_MIN_EIG = cov_ops.NORMALIZED_MIN_EIG
    FROBENIUS = cov_ops.FROBENIUS

    def __init__(self, regularization: str = cov_ops.PLANE):
        self.regularization = regularization

    def estimate(self, points, mask, neighbors):
        """Returns (covs (C,3,3), normals (C,3))."""
        return cov_ops.estimate_covariances(points, mask, neighbors,
                                            self.regularization)
