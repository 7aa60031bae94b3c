from .nafnet import NAFNet, NAFNetSR
