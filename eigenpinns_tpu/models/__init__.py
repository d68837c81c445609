from eigenpinns_tpu.models.mlp import MLP, ACTIVATIONS, small_init
from eigenpinns_tpu.models.correctors import (
    SimpleCorrector,
    SpectralCorrector,
    AdaptiveCorrector,
    make_corrector,
)
from eigenpinns_tpu.models.eigennet import JointEigenNet, LambdaEigenNet
from eigenpinns_tpu.models.ansatz import (
    ParametricAnsatz,
    dirichlet_window,
    gaussian_window,
)
from eigenpinns_tpu.models.upscaler import HierarchicalUpscaler
from eigenpinns_tpu.models.surgery import partial_weight_copy

__all__ = [
    "MLP", "ACTIVATIONS", "small_init",
    "SimpleCorrector", "SpectralCorrector", "AdaptiveCorrector",
    "make_corrector", "JointEigenNet", "LambdaEigenNet",
    "ParametricAnsatz", "dirichlet_window", "gaussian_window",
    "HierarchicalUpscaler", "partial_weight_copy",
]
