"""
kraken_tpu.train.optim
~~~~~~~~~~~~~~~~~~~~~~

Optimizer and learning-rate schedule construction (reference:
kraken/train/utils.py:246-313 + kraken/registry.py): Adam/AdamW/SGD/RMSprop
crossed with constant/exponential/cosine/step/reduce-on-plateau/1cycle
schedules and linear warmup, built on optax.
"""
from typing import Optional

import optax

__all__ = ['build_optimizer', 'build_lr_schedule', 'OPTIMIZERS', 'SCHEDULES']

OPTIMIZERS = ('Adam', 'AdamW', 'SGD', 'RMSprop', 'Lamb')
SCHEDULES = ('constant', 'exponential', 'cosine', 'step', 'reduceonplateau', '1cycle')


def build_lr_schedule(config, steps_per_epoch: int = 1):
    """
    Builds an optax schedule from a TrainingConfig. Warmup is linear over
    `config.warmup` steps; epoch-granular schedules are scaled by
    steps_per_epoch. Reduce-on-plateau is handled outside the schedule (it
    depends on validation metrics), returning the base rate here.
    """
    lr = config.lrate
    schedule = getattr(config, 'schedule', 'constant')
    if schedule == 'exponential':
        base = optax.exponential_decay(lr, steps_per_epoch, config.gamma, staircase=True)
    elif schedule == 'cosine':
        base = optax.cosine_decay_schedule(lr, max(1, config.cos_t_max * steps_per_epoch),
                                           alpha=config.cos_min_lr / lr)
    elif schedule == 'step':
        base = optax.exponential_decay(lr, config.step_size * steps_per_epoch,
                                       config.gamma, staircase=True)
    elif schedule == '1cycle':
        total = max(1, (config.epochs if config.epochs > 0 else 10) * steps_per_epoch)
        base = optax.cosine_onecycle_schedule(total, peak_value=lr)
    else:  # constant / reduceonplateau
        base = optax.constant_schedule(lr)
    if getattr(config, 'warmup', 0) > 0:
        warm = optax.linear_schedule(0.0, lr, config.warmup)
        return optax.join_schedules([warm, base], [config.warmup])
    return base


def build_optimizer(config, steps_per_epoch: int = 1,
                    schedule=None) -> optax.GradientTransformation:
    """
    Builds the full gradient transformation: clipping → optimizer with
    schedule → (optional) gradient accumulation.
    """
    if schedule is None:
        schedule = build_lr_schedule(config, steps_per_epoch)
    name = getattr(config, 'optimizer', 'AdamW')
    wd = getattr(config, 'weight_decay', 0.0)
    momentum = getattr(config, 'momentum', 0.9)
    if name == 'Adam':
        tx = optax.adam(schedule)
    elif name == 'AdamW':
        tx = optax.adamw(schedule, weight_decay=wd)
    elif name == 'SGD':
        tx = optax.sgd(schedule, momentum=momentum)
    elif name == 'RMSprop':
        tx = optax.rmsprop(schedule, momentum=momentum)
    elif name == 'Lamb':
        tx = optax.lamb(schedule, weight_decay=wd)
    else:
        raise ValueError(f'Unknown optimizer {name}')
    chain = []
    clip = getattr(config, 'gradient_clip_val', 0)
    if clip:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(tx)
    tx = optax.chain(*chain)
    accum = getattr(config, 'accumulate_grad_batches', 1)
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
