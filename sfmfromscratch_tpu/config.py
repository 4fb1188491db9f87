"""Dataclass configuration for the whole engine.

The reference configures everything through an ``extractor_params`` dict plus
``SFMRunner`` constructor kwargs (reference: main.py:19-30, Runner.py:129-131).
Here the same knobs are typed dataclasses; ``from_params_dict`` accepts the
reference's dict spelling so configs written for the reference drop in
unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ExtractorConfig:
    """Feature-extraction knobs (reference: NaiveSIFT.py:35-39, ScaleRotInvSIFT.py:12-13,
    FeatureExtractor.py:11)."""

    num_interest_points: int = 2500
    ksize: int = 7               # Harris NMS max-pool window
    gaussian_size: int = 7       # second-moment smoothing kernel size
    sigma: float = 5.0
    alpha: float = 0.05
    feature_width: int = 16
    pyramid_level: int = 4
    pyramid_scale_factor: float = 2.0

    @staticmethod
    def from_params_dict(params: dict) -> "ExtractorConfig":
        """Accept the reference's ``extractor_params`` dict verbatim."""
        fields = {f.name for f in dataclasses.fields(ExtractorConfig)}
        return ExtractorConfig(**{k: v for k, v in params.items() if k in fields})

    def to_params_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """NN-ratio matcher knobs (reference: NNRatioFeatureMatcher.py:5, main.py:30)."""

    ratio_threshold: float = 0.8
    max_matches: int = 2500      # fixed output capacity (masked)


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Robust-estimation knobs (reference: SFM.py:38,126,184-187; Runner.py:170)."""

    prob_success: float = 0.98
    sample_size: int = 8
    ind_prob_correct: float = 0.4
    epipolar_threshold: float = 1.0
    pnp_reproj_threshold: float = 8.0
    max_iterations: Optional[int] = None  # None => derived from the probabilities
    # PnP hypothesis generator: "p3p" (closed-form Grunert minimal solver,
    # 3-point samples, no eigendecomposition — geometry/p3p.py) or "dlt"
    # (6-point DLT; the reference's cv2.solvePnPRansac uses an iterative
    # minimal solver internally, PoseEstimator.py:54-62).
    pnp_solver: str = "p3p"
    pnp_max_iterations: Optional[int] = None
    # Adaptive (early-terminating) RANSAC for the pairwise epipolar stages:
    # fixed-shape stages of ``stage_size`` hypotheses inside one
    # ``lax.while_loop``; after each stage the required count is re-derived
    # from the best support found (the formula the reference evaluates ONCE
    # with an assumed inlier ratio, SFM.py:184-187). Worst case still runs
    # ``num_iterations()`` hypotheses; typical pairs stop after 1-2 stages.
    adaptive: bool = True
    stage_size: int = 512

    def num_iterations(self) -> int:
        if self.max_iterations is not None:
            return self.max_iterations
        import math

        n = math.log(1.0 - self.prob_success) / math.log(
            1.0 - self.ind_prob_correct ** self.sample_size
        )
        return int(n)

    def max_hypotheses(self) -> int:
        """``num_iterations()`` rounded up to a whole number of adaptive
        stages (the early-termination cap)."""
        n = self.num_iterations()
        s = self.stage_size
        return ((n + s - 1) // s) * s

    def pnp_num_iterations(self) -> int:
        """Hypothesis count for the PnP stage.  3-point samples hit an
        all-inlier draw ~w^3 vs the 8-point stage's w^8, so far fewer
        iterations reach the same confidence; a generous floor of 512 keeps
        robustness headroom (each P3P sample is ~pure arithmetic)."""
        if self.pnp_max_iterations is not None:
            return self.pnp_max_iterations
        if self.pnp_solver == "p3p":
            import math

            n = math.log(1.0 - self.prob_success) / math.log(
                1.0 - self.ind_prob_correct ** 3
            )
            return max(512, int(n))
        return self.num_iterations()


@dataclasses.dataclass(frozen=True)
class BundleAdjustConfig:
    """LM + Schur bundle-adjustment knobs (replaces scipy trf at reference SFM.py:421-429)."""

    max_lm_iters: int = 30
    init_damping: float = 1e-3
    damping_up: float = 4.0
    damping_down: float = 0.5
    ftol: float = 1e-2           # relative cost decrease stop (reference ftol, SFM.py:427)
    huber_delta: float = 0.0     # 0 => plain least squares (reference behavior)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end incremental-SfM knobs (reference: Runner.py:129-131, main.py:29-30)."""

    extractor: ExtractorConfig = ExtractorConfig()
    matcher: MatcherConfig = MatcherConfig(ratio_threshold=0.85)
    ransac: RansacConfig = RansacConfig()
    ba: BundleAdjustConfig = BundleAdjustConfig()
    scale_factor: float = 0.5    # image prescale (reference Runner.py:23)
    dist_threshold: float = 5.0  # 2D association gate (reference Runner.py:129)
    max_points: int = 200_000    # global map capacity (fixed shape, masked)
    seed: int = 5                # reference RNG anchor (SFM.py:45)
