"""
kraken_tpu.parallel.mesh
~~~~~~~~~~~~~~~~~~~~~~~~

Multi-chip execution: device meshes, shardings, and SPMD train/infer steps.

Design (see SURVEY.md §2.5): kraken-class models are small CNN+BiLSTM /
U-Net networks (tens of MB), so the profitable parallelism is **data
parallelism over the line/page batch dimension** — parameters replicated,
batches sharded over the `data` mesh axis, gradients reduced by XLA
all-reduce over ICI. Tensor/pipeline parallelism would add collectives with
no FLOPs to amortize them and is deliberately out of scope; the mesh is
therefore 1-D but all entry points accept arbitrary device lists so larger
meshes compose if model families grow.

The reference has no distributed backend of its own (it delegates to
Lightning's implicit DDP); this module is the TPU-native replacement.
"""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import optax

__all__ = ['make_mesh', 'batch_sharding', 'shard_batch', 'replicate',
           'pad_batch_to_multiple', 'make_train_step', 'make_infer_fn']


def make_mesh(devices: Optional[Sequence] = None, axis: str = 'data') -> Mesh:
    """
    Builds a 1-D device mesh over `devices` (default: all available).
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Sharding placing the leading (batch) dim across the mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = 'data') -> dict:
    """
    Places every array in `batch` with its leading dim sharded over the mesh.
    Batch sizes must be divisible by the mesh size.
    """
    sharding = batch_sharding(mesh, axis)
    return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}


def pad_batch_to_multiple(batch: dict, n: int) -> dict:
    """
    Pads every array's leading (batch) dim to the next multiple of `n` by
    repeating samples from the start of the batch — the same strategy torch's
    DistributedSampler uses for ragged final batches, so data-parallel
    gradients stay well-defined at a tiny duplicate-sample bias on the last
    batch per epoch.
    """
    sizes = {v.shape[0] for v in batch.values()}
    if len(sizes) != 1:
        raise ValueError(f'inconsistent leading batch dims: {sizes}')
    bs = sizes.pop()
    rem = (-bs) % n
    if rem == 0:
        return batch
    idx = np.arange(rem) % bs
    return {k: np.concatenate([np.asarray(v), np.asarray(v)[idx]], axis=0)
            for k, v in batch.items()}


def make_infer_fn(net, mesh: Mesh, temperature: float = 1.0):
    """
    Builds a jitted SPMD recognition forward over a device mesh: parameters
    replicated, the (bucketed, padded) line batch sharded on the leading dim.
    Returns fn(params, x, seq_lens) -> (labels, confs, olens) — the decoder's
    device-side reductions, so only (N, W) tensors leave the mesh.

    Batch sizes must be divisible by the mesh size; the recognition engine's
    width buckets keep per-shard shapes static.
    """
    def fwd(params, x, seq_lens):
        logits, olens = net.apply(params, x, seq_lens)
        probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=1)
        probs = probs.squeeze(2)
        return jnp.argmax(probs, axis=1), jnp.max(probs, axis=1), olens

    repl = replicate(mesh)
    data = batch_sharding(mesh)
    return jax.jit(fwd, in_shardings=(repl, data, data),
                   out_shardings=(data, data, data))


def make_train_step(net, tx: optax.GradientTransformation, loss: str = 'ctc',
                    mesh: Optional[Mesh] = None, remat: bool = False):
    """
    Builds a jitted SPMD training step for a VGSL layer tree.

    With a mesh, parameters/optimizer state are replicated and batches are
    expected sharded on the leading dim; XLA inserts the gradient
    all-reduce over ICI automatically.

    With `remat`, the network forward is rematerialized on the backward pass
    (`jax.checkpoint`), trading FLOPs for HBM — lets full-page segmentation
    batches or very wide line batches fit on a single chip.

    Returns:
        step(params, opt_state, batch, rng) -> (params, opt_state, loss)
        where batch has keys image/seq_lens and either target/target_lens
        (ctc) or target heatmaps (bce+dice).
    """
    from kraken_tpu.train.losses import ctc_loss, segmentation_loss

    apply = net.apply
    if remat:
        def apply(params, image, seq_lens, train=True, rng=None):
            def fwd(p, im, sl, r):
                return net.apply(p, im, sl, train=train, rng=r)
            return jax.checkpoint(fwd)(params, image, seq_lens, rng)

    def loss_fn(params, batch, rng):
        if loss == 'ctc':
            logits, olens = apply(params, batch['image'], batch['seq_lens'],
                                  train=True, rng=rng)
            total = ctc_loss(logits, olens, batch['target'], batch['target_lens'])
            return total / batch['image'].shape[0]
        logits, _ = apply(params, batch['image'], None, train=True, rng=rng)
        return segmentation_loss(logits, batch['target'])

    def step(params, opt_state, batch, rng):
        value, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    if mesh is None:
        return jax.jit(step)
    repl = replicate(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step,
                   in_shardings=(repl, repl, data, repl),
                   out_shardings=(repl, repl, repl))
