from .losses import label_smoothing_loss
from .optim import build_optimizer, lr_schedule
