from kraken_tpu.train.losses import ctc_loss, bce_logits_loss, dice_loss, segmentation_loss
from kraken_tpu.train.optim import build_optimizer, build_lr_schedule

__all__ = ['ctc_loss', 'bce_logits_loss', 'dice_loss', 'segmentation_loss',
           'build_optimizer', 'build_lr_schedule']
