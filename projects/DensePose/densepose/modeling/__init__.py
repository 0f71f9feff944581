from .confidence import (
    DensePoseConfidenceModelConfig,
    DensePoseSegmConfidenceConfig,
    DensePoseUVConfidenceConfig,
    DensePoseUVConfidenceType,
)
from .heads import (
    ROI_DENSEPOSE_HEAD_REGISTRY,
    DensePoseDeepLabHead,
    DensePoseV1ConvXHead,
    build_densepose_head,
)
from .losses import (
    DENSEPOSE_LOSS_REGISTRY,
    DensePoseChartLoss,
    DensePoseChartWithConfidenceLoss,
    build_densepose_losses,
    iid_isotropic_gaussian_uv_nll,
    indep_anisotropic_gaussian_uv_nll,
)
from .predictors import (
    DENSEPOSE_PREDICTOR_REGISTRY,
    DensePoseChartPredictor,
    DensePoseChartWithConfidencePredictor,
    build_densepose_predictor,
)
from .cse import (
    DensePoseEmbeddingPredictor,
    Embedder,
    VertexDirectEmbedder,
    VertexFeatureEmbedder,
    embedding_loss,
    normalize_embeddings,
    soft_embedding_loss,
    squared_euclidean_distance_matrix,
)
