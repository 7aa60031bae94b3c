from .combined import (
    l1_loss, l2_loss, charbonnier_loss, ssim_loss, fft_loss, swt_loss,
    edge_loss, CombinedLoss,
)
from .perceptual import vgg_loss_fn, clip_loss_fn
