from .metrics import rgb_to_y, psnr, ssim, psnr_ssim, MetricAccumulator
from .image_io import read_image, write_image
from .logger import MetricLogger, Stopwatch, TensorBoardLogger
