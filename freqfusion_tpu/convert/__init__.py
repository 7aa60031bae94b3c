from .common import (
    load_torch_state_dict, conv_kernel, dw_conv_kernel, linear_kernel,
    unflatten, assert_tree_shapes, stack_layers, stack_layer_runs,
)
from .drct import convert_drct
from .grl import convert_grl
from .nafnet import convert_nafnet
from .mambair import convert_mambair
from .dat import convert_dat
from .hat import convert_hat
from .edsr import convert_edsr
from .fusion import convert_fusion
