from .combined import (
    l1_loss, l2_loss, charbonnier_loss, ssim_loss, fft_loss, swt_loss,
    edge_loss, CombinedLoss,
)
