"""TPU-native self-supervised (DINOv2-style) training sub-framework.

Re-architecture of the reference's vendored dinov2/ sub-framework
(SURVEY.md §2.8) — which is not runnable as vendored (its data module is
stripped) — as a working JAX/pjit implementation: student/teacher ViTs with
DINO + iBOT + KoLeo objectives, cosine schedules with layerwise LR decay,
sharded infinite samplers, and a kNN/linear/logistic-regression eval suite.
"""

from .train import SSLTrainer

__all__ = ["SSLTrainer"]
