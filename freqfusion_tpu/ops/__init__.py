from .resize import resize_bilinear, resize_bicubic, upscale_bicubic
from .pad import pad_reflect, pad_to_multiple, pad_zeros
from .pixel_shuffle import pixel_shuffle
from .pooling import avg_pool_2x2, global_avg_pool
