from .frequency import (
    AdaptiveFrequencyDecomposition,
    DCTDecomposition, DWTDecomposition, FFTDecomposition,
    AdaptiveBandFusion, MultiDomainFrequencyDecomposition,
)
from .lka import (
    LargeKernelAttention, LKABlock,
    EnhancedCrossBandWithLKA, EnhancedCollaborativeWithLKA,
)
from .hierarchical import HierarchicalMultiResolutionFusion
from .edge import LaplacianPyramidRefinement
from .fusion_v2 import CompleteEnhancedFusionSR, DynamicExpertSelector
from .legacy_v1 import (
    ChannelSpatialAttention, FrequencyRouter, MultiScaleFeatureExtractor,
    FrequencyAwareFusion, MultiResolutionFusion,
)
