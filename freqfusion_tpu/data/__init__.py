from .dataset import SRPairDataset, find_pairs, detect_df2k_layout
from .cached import CachedFeatureDataset, convert_reference_cache
from .augment import paired_random_crop, paired_geometric_augment
from .loader import Batcher
