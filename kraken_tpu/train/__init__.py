from kraken_tpu.train.losses import ctc_loss, bce_logits_loss, dice_loss, segmentation_loss
from kraken_tpu.train.optim import build_optimizer, build_lr_schedule
from kraken_tpu.train.trainer import KrakenTrainer
from kraken_tpu.train.recognition import RecognitionModel, RecognitionDataModule
from kraken_tpu.train.segmentation import SegmentationModel, SegmentationDataModule
from kraken_tpu.train.ro import ROModel, RODataModule
from kraken_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                         convert_checkpoint, config_from_checkpoint)

__all__ = ['ctc_loss', 'bce_logits_loss', 'dice_loss', 'segmentation_loss',
           'build_optimizer', 'build_lr_schedule', 'KrakenTrainer',
           'RecognitionModel', 'RecognitionDataModule',
           'SegmentationModel', 'SegmentationDataModule',
           'ROModel', 'RODataModule',
           'save_checkpoint', 'load_checkpoint', 'convert_checkpoint',
           'config_from_checkpoint']
