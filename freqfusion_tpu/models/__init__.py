from .nafnet import NAFNet, NAFNetSR
from .drct import DRCT
from .grl import GRL
from .mambair import MambaIR
from .dat import DAT
from .hat import HAT
from .edsr import EDSR
from .pipeline import FreqFusionPipeline, build_expert_models, EXPERT_ORDER
