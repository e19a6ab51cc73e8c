"""
kraken_tpu.train.trainer
~~~~~~~~~~~~~~~~~~~~~~~~

Generic training loop (functional replacement of the reference's Lightning
KrakenTrainer, kraken/train/utils.py): epoch/step loops around a jitted
optax update, validation at a configurable frequency, top-K checkpointing by
validation metric, early stopping, reduce-on-plateau, abort checkpoints on
exceptions, and optional data-parallel execution over a device mesh.

Task modules provide:
    net          — the model (VGSLModel/ROMLP)
    setup(stage, datamodule)
    loss_fn(params, batch, rng) -> scalar     (pure, jittable)
    validate(params, datamodule) -> dict with 'val_metric' (higher = better)
    checkpoint_extras() -> dict               (metadata persisted in ckpts)
"""
import logging
import math
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kraken_tpu.exceptions import KrakenStopTrainingException
from kraken_tpu.train.checkpoint import save_checkpoint
from kraken_tpu.train.optim import build_optimizer, build_lr_schedule

logger = logging.getLogger(__name__)

__all__ = ['KrakenTrainer']


class _ExperimentLogger:
    """
    Minimal scalar logger behind the reference's `--logger tensorboard|wandb`
    option (reference: kraken/train/utils.py:124-141). tensorboard uses the
    torch SummaryWriter (always available in this stack); wandb is gated on
    the package being importable.
    """

    def __init__(self, backend: Optional[str], log_dir: str, config) -> None:
        self._tb = None
        self._wandb = None
        if backend == 'tensorboard':
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=log_dir)
            except ImportError:
                logger.warning('tensorboard not available; scalar logging disabled.')
        elif backend == 'wandb':
            try:
                import wandb
                self._wandb = wandb.init(dir=log_dir, config=vars(config))
            except ImportError:
                logger.warning('wandb not available; scalar logging disabled.')

    def log_scalars(self, scalars: dict, step: int) -> None:
        numeric = {k: float(v) for k, v in scalars.items()
                   if isinstance(v, (int, float, np.floating))}
        if self._tb is not None:
            for k, v in numeric.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(numeric, step=step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


class KrakenTrainer:
    """
    Drives training of a task module according to a TrainingConfig.
    """

    def __init__(self, config, mesh=None, progress: bool = True,
                 fast_dev_run: bool = False, log_dir: Optional[str] = None):
        from kraken_tpu.lib.util import enable_xla_cache
        enable_xla_cache()
        self.config = config
        self.mesh = mesh
        self.progress = progress
        self.fast_dev_run = fast_dev_run
        self.log_dir = log_dir
        self.current_epoch = 0
        self.global_step = 0
        self.best_metric = -math.inf
        self.best_epoch = -1
        self.metrics_history: list[dict] = []
        self._ckpt_ledger: list[tuple[float, Path]] = []

    # ------------------------------------------------------------------ fit
    def fit(self, module, datamodule, resume: Optional[str] = None) -> None:
        config = self.config
        module.trainer = self
        datamodule.setup('fit')
        module.setup('fit', datamodule)

        train_loader = datamodule.train_dataloader()
        if len(train_loader) == 0:
            # drop_last with batch_size > dataset size would silently train
            # for zero steps per epoch
            raise ValueError(
                f'Training dataloader yields no batches: batch size '
                f'({getattr(datamodule.config, "batch_size", "?")}) exceeds '
                f'the training set size with drop_last. Lower the batch size.')
        steps_per_epoch = max(1, len(train_loader))
        tx = build_optimizer(config, steps_per_epoch)
        params = module.net.params
        opt_state = tx.init(params)
        self._lr_schedule = build_lr_schedule(config, steps_per_epoch)

        if resume is not None:
            # restore weights, optimizer state, and epoch/step counters from
            # a checkpoint (reference: ketos/recognition.py --resume)
            from kraken_tpu.train.checkpoint import load_checkpoint
            ckpt_model, ckpt_opt_state, meta = load_checkpoint(resume, opt_state)
            module.net.load_state_dict(ckpt_model.state_dict(), prefix='nn.')
            params = module.net.params
            if ckpt_opt_state is not None:
                opt_state = ckpt_opt_state
            config.completed_epochs = int(meta.get('epoch', -1)) + 1
            self.global_step = int(meta.get('global_step', 0))
            logger.info(f'Resumed from {resume} at epoch {config.completed_epochs}, '
                        f'step {self.global_step}.')

        exp_logger = _ExperimentLogger(getattr(config, 'loggers', None),
                                       self.log_dir or str(Path(self.config.checkpoint_path).parent / 'runs'),
                                       config)
        profile_dir = getattr(config, 'profile_dir', None)

        loss_fn = module.loss_fn

        # freeze all but the output layer for the first N steps (reference
        # unfreezes when trainer.global_step hits unfreeze_at_iteration:
        # KrakenFreezeBackbone.on_train_batch_start,
        # kraken/train/utils.py:197-225 — iteration-based, like here)
        freeze_steps = int(getattr(config, 'freeze_backbone', 0) or 0)
        head_name = None
        if freeze_steps and hasattr(module.net, 'net'):
            head_name = module.net.net.names[-1]

        def _train_step(params, opt_state, batch, rng, step, rop_scale):
            value, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            mask = None
            if freeze_steps and head_name is not None:
                scale = jnp.where(step < freeze_steps, 0.0, 1.0)
                mask = lambda tree: {k: (v if k == head_name else
                                         jax.tree.map(lambda g: g * scale, v))
                                     for k, v in tree.items()}
                grads = mask(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            if mask is not None:
                # zero the updates too: decoupled weight decay must not move
                # frozen parameters either
                updates = mask(updates)
            # reduce-on-plateau enters as a multiplier on the applied update
            # — identical to scaling the lr (optax applies the lr as the
            # final update scaling) but without touching opt_state, so Adam
            # moments survive every reduction (the reference's ROP likewise
            # only changes the lr of the live optimizer).
            updates = jax.tree.map(lambda u: u * rop_scale, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, value

        # data-parallel execution over a device mesh: parameters/optimizer
        # state replicated, batches sharded on the leading dim, gradient
        # all-reduce inserted by XLA over ICI (SURVEY §2.5 TPU mapping)
        mesh = self.mesh
        if mesh is not None and mesh.devices.size <= 1:
            mesh = None
        if mesh is not None:
            from kraken_tpu.parallel import (batch_sharding, replicate,
                                             pad_batch_to_multiple, shard_batch)
            repl = replicate(mesh)
            data = batch_sharding(mesh)
            train_step = jax.jit(_train_step,
                                 in_shardings=(repl, repl, data, repl, repl, repl),
                                 out_shardings=(repl, repl, repl))
            params = jax.device_put(params, repl)
            opt_state = jax.device_put(opt_state, repl)
            n_shards = mesh.devices.size

            def prepare_batch(batch):
                batch = pad_batch_to_multiple(batch, n_shards)
                return shard_batch(batch, mesh)
        else:
            train_step = jax.jit(_train_step)

            def prepare_batch(batch):
                return {k: jnp.asarray(v) for k, v in batch.items()}

        rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        epochs = config.epochs if config.epochs and config.epochs > 0 else (1 if self.fast_dev_run else 10**6)
        lag_counter = 0
        rop_counter = 0
        rop_scale = 1.0
        # fractional freq validates several times per epoch (reference:
        # Lightning val_check_interval, kraken/ketos/recognition.py:192-195)
        val_interval = (max(1, int(steps_per_epoch * config.freq))
                        if 0 < config.freq < 1 else None)

        def run_validation(tag, avg_loss, opt_state):
            """Validation + checkpointing + early-stop/ROP bookkeeping.
            Returns True when training should stop."""
            nonlocal lag_counter, rop_counter, rop_scale
            epoch = self.current_epoch
            val_metrics = module.validate(module.net.params, datamodule)
            val_metrics['loss'] = avg_loss
            val_metrics['epoch'] = epoch
            self.metrics_history.append(val_metrics)
            module.net.user_metadata.setdefault('metrics', []).append(
                (epoch, {k: float(v) if isinstance(v, (int, float, np.floating)) else v
                         for k, v in val_metrics.items()}))
            metric = val_metrics.get('val_metric', -avg_loss)
            exp_logger.log_scalars(val_metrics, epoch)
            logger.info(f'validation @{tag}: ' + ' '.join(
                f'{k}={v:.4f}' for k, v in val_metrics.items()
                if isinstance(v, (int, float, np.floating))))
            self._checkpoint(module, opt_state, tag, metric)
            if metric > self.best_metric + config.min_delta:
                self.best_metric = metric
                self.best_epoch = epoch
                lag_counter = 0
                rop_counter = 0
            else:
                lag_counter += 1
                rop_counter += 1
            if (config.quit == 'early' and epoch >= config.min_epochs
                    and lag_counter >= config.lag):
                logger.info(f'Early stopping after {config.lag} validations '
                            'without improvement.')
                return True
            if config.schedule == 'reduceonplateau' and rop_counter >= config.rop_patience:
                # only the applied-update multiplier changes — the jitted
                # step, optimizer state, and Adam moments all carry over
                rop_scale *= config.rop_factor
                rop_counter = 0
                logger.info(f'Reducing learning rate by {config.rop_factor} '
                            f'(scale now {rop_scale}).')
            return False

        profiling = False
        stop = False
        try:
            for epoch in range(config.completed_epochs, epochs):
                self.current_epoch = epoch
                epoch_loss = 0.0
                n_batches = 0
                # one-deep loss materialization: step k's (tiny) loss
                # transfer happens while step k+1 computes, so host batch
                # prep overlaps device compute instead of syncing per step
                prev_loss = None
                if profile_dir and epoch == config.completed_epochs:
                    # trace the first epoch (compilation + steady-state steps)
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                for batch in train_loader:
                    rng, step_rng = jax.random.split(rng)
                    jbatch = prepare_batch({k: v for k, v in batch.items()
                                            if not isinstance(v, (list, str))})
                    params, opt_state, loss = train_step(params, opt_state, jbatch, step_rng,
                                                         jnp.int32(self.global_step),
                                                         jnp.float32(rop_scale))
                    self.global_step += 1
                    if prev_loss is not None:
                        epoch_loss += float(prev_loss)
                    prev_loss = loss
                    n_batches += 1
                    if (val_interval and not self.fast_dev_run
                            and self.global_step % val_interval == 0):
                        epoch_loss += float(prev_loss)
                        prev_loss = None
                        module.net.params = params
                        stop = run_validation(f'{epoch}_s{self.global_step}',
                                              epoch_loss / n_batches, opt_state)
                        if stop:
                            break
                    if self.fast_dev_run:
                        break
                if prev_loss is not None:
                    epoch_loss += float(prev_loss)
                module.net.params = params
                if profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info(f'Wrote profiler trace for epoch {epoch} to {profile_dir}')
                avg_loss = epoch_loss / max(n_batches, 1)
                logger.info(f'epoch {epoch}: loss {avg_loss:.4f}')
                exp_logger.log_scalars({'train_loss': avg_loss,
                                        'lr': float(self._lr_schedule(self.global_step)) * rop_scale},
                                       epoch)
                if stop:
                    break
                # epoch-granular validation for integer freq; fractional freq
                # validated inside the batch loop and also closes the epoch
                # when the interval does not divide steps_per_epoch evenly
                run_val = ((config.freq >= 1 and (epoch + 1) % int(config.freq) == 0)
                           or (val_interval is not None
                               and (self.fast_dev_run
                                    or self.global_step % val_interval != 0)))
                if run_val:
                    stop = run_validation(str(epoch), avg_loss, opt_state)
                    if stop:
                        break
                if self.fast_dev_run:
                    break
        except KeyboardInterrupt:
            logger.warning('Training interrupted. Writing abort checkpoint.')
            self._write(module, opt_state, 'checkpoint_abort')
            raise
        except KrakenStopTrainingException:
            logger.info('Training stopped by callback.')
        except Exception:
            self._write(module, opt_state, 'checkpoint_abort')
            raise
        finally:
            if profiling:
                jax.profiler.stop_trace()
            exp_logger.close()
        module.net.params = params
        self._final_opt_state = opt_state

    # ----------------------------------------------------------- checkpoint
    def _ckpt_path(self, name: str) -> Path:
        base = Path(self.config.checkpoint_path)
        if base.suffix:
            base = base.with_suffix('')
        base.parent.mkdir(parents=True, exist_ok=True)
        return base.parent / f'{base.name}_{name}.safetensors'

    def _write(self, module, opt_state, name: str) -> Path:
        path = self._ckpt_path(name)
        save_checkpoint(module.net, opt_state, path,
                        epoch=self.current_epoch,
                        global_step=self.global_step,
                        hyper_params={'config_class': type(self.config).__name__,
                                      **vars(self.config)},
                        extras=module.checkpoint_extras())
        logger.info(f'Wrote checkpoint {path}')
        return path

    def _checkpoint(self, module, opt_state, epoch: int, metric: float) -> None:
        # keep only the top-K epoch checkpoints by validation metric
        # (reference: ModelCheckpoint(save_top_k=10),
        # kraken/ketos/recognition.py:199-205); 'best' is always retained
        path = self._write(module, opt_state, f'{epoch}')
        self._ckpt_ledger.append((metric, path))
        top_k = int(getattr(self.config, 'save_top_k', 10) or 0)
        if top_k > 0 and len(self._ckpt_ledger) > top_k:
            self._ckpt_ledger.sort(key=lambda t: t[0], reverse=True)
            for _, stale in self._ckpt_ledger[top_k:]:
                stale.unlink(missing_ok=True)
                logger.info(f'Pruned checkpoint {stale}')
            self._ckpt_ledger = self._ckpt_ledger[:top_k]
        if metric > self.best_metric:
            self._write(module, opt_state, 'best')

    # ----------------------------------------------------------------- test
    def test(self, module, datamodule):
        datamodule.setup('test')
        module.setup('test', datamodule)
        return module.test(module.net.params, datamodule)
