"""
kraken_tpu.train.losses
~~~~~~~~~~~~~~~~~~~~~~~

Training losses. The recognition loss is CTC (reference uses
torch.nn.CTCLoss(reduction='sum', zero_infinity=True); here optax.ctc_loss),
the segmentation loss is BCE-with-logits plus a weighted soft Dice term
(reference: kraken/train/losses.py + train/blla.py:277-294).
"""
import jax
import jax.numpy as jnp
import optax

__all__ = ['ctc_loss', 'bce_logits_loss', 'dice_loss', 'segmentation_loss']


def ctc_loss(logits: jnp.ndarray,
             olens: jnp.ndarray,
             labels: jnp.ndarray,
             label_lens: jnp.ndarray) -> jnp.ndarray:
    """
    Summed CTC loss over a batch.

    Args:
        logits: (N, C, 1, W) network output (pre-softmax, blank = class 0).
        olens: (N,) valid output widths.
        labels: (N, L) padded 1-indexed label sequences.
        label_lens: (N,) label sequence lengths.
    """
    n, c, _, w = logits.shape
    lg = logits.squeeze(2).transpose(0, 2, 1)  # (N, W, C)
    logit_paddings = (jnp.arange(w)[None, :] >= olens[:, None]).astype(jnp.float32)
    label_paddings = (jnp.arange(labels.shape[1])[None, :] >= label_lens[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(lg.astype(jnp.float32), logit_paddings, labels, label_paddings,
                             blank_id=0)
    # zero_infinity semantics: drop non-finite sequence losses
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
    return per_seq.sum()


def bce_logits_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                    mean: bool = True) -> jnp.ndarray:
    """Numerically stable binary cross entropy on logits."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return loss.mean() if mean else loss


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              smooth: float = 1.0) -> jnp.ndarray:
    """
    Soft Dice loss over sigmoid probabilities, averaged over classes
    weighted by inverse class frequency (matching the reference's weighted
    formulation).
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    dims = (0, 2, 3)
    intersection = (probs * targets).sum(dims)
    cardinality = probs.sum(dims) + targets.sum(dims)
    dice = (2 * intersection + smooth) / (cardinality + smooth)
    return (1 - dice).mean()


def segmentation_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                      dice_weight: float = 0.5) -> jnp.ndarray:
    """
    BCE + weighted soft Dice, the baseline segmentation training criterion
    (reference: train/blla.py:277-294, default dice_weight 0.5 from
    configs/vgsl.py:126; dice_weight=0 disables the Dice term).
    """
    loss = bce_logits_loss(logits, targets)
    if dice_weight > 0:
        loss = loss + dice_weight * dice_loss(logits, targets)
    return loss
