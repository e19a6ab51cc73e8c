"""
kraken_tpu.align
~~~~~~~~~~~~~~~~

Forced alignment of existing transcriptions against CTC network output
(reference: kraken/align.py, itself adapted from the torchaudio forced
alignment tutorial): a log-domain trellis over (frames × tokens), greedy
backtrack, and repeat merging.

The trellis is built with a vectorized numpy recurrence (one pass over
frames); a jax.lax.scan variant is exposed for batched device-side
alignment.
"""
import logging
import warnings
from dataclasses import dataclass, replace
from typing import TYPE_CHECKING, Literal, Optional

import numpy as np

from kraken_tpu.containers import BaselineOCRRecord
from kraken_tpu.lib.bidi import get_display
from kraken_tpu.lib.util import open_image

if TYPE_CHECKING:
    from kraken_tpu.containers import Segmentation
    from kraken_tpu.lib.models import SeqRecognizer

logger = logging.getLogger(__name__)

__all__ = ['forced_align', 'get_trellis', 'backtrack', 'merge_repeats']


@dataclass
class Point:
    token_index: int
    time_index: int
    score: float


@dataclass
class Segment:
    label: str
    start: int
    end: int
    score: float

    @property
    def length(self):
        return self.end - self.start


def get_trellis(emission: np.ndarray, tokens: np.ndarray) -> np.ndarray:
    """
    Builds the alignment trellis.

    Args:
        emission: (frames, classes) log-probabilities.
        tokens: token label sequence (1-indexed, 0 = blank).

    Returns:
        (frames+1, tokens+1) trellis of cumulative log-probabilities.
    """
    num_frames = emission.shape[0]
    num_tokens = len(tokens)
    trellis = np.empty((num_frames + 1, num_tokens + 1), np.float32)
    trellis[0, 0] = 0
    trellis[1:, 0] = np.cumsum(emission[:, 0])
    trellis[0, 1:] = -np.inf
    trellis[-num_tokens:, 0] = np.inf
    token_emissions = emission[:, tokens]  # (frames, tokens)
    for t in range(num_frames):
        trellis[t + 1, 1:] = np.maximum(trellis[t, 1:] + emission[t, 0],
                                        trellis[t, :-1] + token_emissions[t])
    return trellis


def get_trellis_device(emission, tokens):
    """
    Device (jit/lax.scan) form of :func:`get_trellis`: the frame loop becomes
    a scan carrying one trellis row, so whole-batch alignment of many lines
    runs as one XLA program. Bit-compatible with the numpy version.
    """
    import jax
    import jax.numpy as jnp

    emission = jnp.asarray(emission)
    tokens = jnp.asarray(tokens)
    num_frames = emission.shape[0]
    num_tokens = tokens.shape[0]
    token_emissions = emission[:, tokens]

    # column 0 exactly as the numpy version: cumulative blank path with the
    # final `num_tokens` cells forced to +inf (unreachable sentinels that
    # must propagate through the recurrence)
    col0 = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                            jnp.cumsum(emission[:, 0])])
    col0 = jnp.where(jnp.arange(num_frames + 1) >= num_frames + 1 - num_tokens,
                     jnp.inf, col0)
    row0 = jnp.concatenate([col0[:1],
                            jnp.full((num_tokens,), -jnp.inf, jnp.float32)])

    def step(prev, inputs):
        blank_e, tok_e, head = inputs
        stay = prev[1:] + blank_e
        advance = prev[:-1] + tok_e
        row = jnp.concatenate([head[None], jnp.maximum(stay, advance)])
        return row, row

    _, rows = jax.lax.scan(step, row0,
                           (emission[:, 0], token_emissions, col0[1:]))
    return jnp.concatenate([row0[None], rows], axis=0)


def backtrack(trellis: np.ndarray, emission: np.ndarray, tokens: np.ndarray) -> list[Point]:
    """Backtracks the best path through the trellis into per-frame points."""
    j = trellis.shape[1] - 1
    t_start = int(np.argmax(trellis[:, j]))
    path = []
    for t in range(t_start, 0, -1):
        stayed = trellis[t - 1, j] + emission[t - 1, 0]
        changed = trellis[t - 1, j - 1] + emission[t - 1, tokens[j - 1]]
        prob = float(np.exp(emission[t - 1, tokens[j - 1] if changed > stayed else 0]))
        path.append(Point(j - 1, t - 1, prob))
        if changed > stayed:
            j -= 1
            if j == 0:
                break
    else:
        raise ValueError('Failed to align')
    return path[::-1]


def merge_repeats(path: list[Point], ground_truth: str) -> list[Segment]:
    """Merges consecutive points of the same token into segments."""
    i1 = i2 = 0
    segments = []
    while i1 < len(path):
        while i2 < len(path) and path[i1].token_index == path[i2].token_index:
            i2 += 1
        score = sum(path[k].score for k in range(i1, i2)) / (i2 - i1)
        segments.append(Segment(ground_truth[path[i1].token_index],
                                path[i1].time_index,
                                path[i2 - 1].time_index + 1,
                                score))
        i1 = i2
    return segments


def align_line(logits: np.ndarray, codec, text: str,
               base_dir: Optional[Literal['L', 'R']] = None):
    """
    Aligns one line: returns (display text, segments) or None when the
    output is too short for the encoded transcription.
    """
    do_text = get_display(text, base_dir=base_dir)
    labels = codec.encode(do_text).astype(np.int64)
    if len(labels) == 0 or logits.shape[-1] < 2 * len(labels):
        # nothing encodable (codec/transcription mismatch) or output too
        # short for the label sequence — no feasible alignment
        return None
    probs = logits.squeeze()
    # log-softmax over classes
    shifted = probs - probs.max(axis=0, keepdims=True)
    log_probs = shifted - np.log(np.exp(shifted).sum(axis=0, keepdims=True))
    emission = log_probs.T  # (frames, classes)
    trellis = get_trellis(emission, labels)
    path = backtrack(trellis, emission, labels)
    return do_text, merge_repeats(path, do_text)


def forced_align(doc: 'Segmentation', model: 'SeqRecognizer',
                 base_dir: Optional[Literal['L', 'R']] = None) -> 'Segmentation':
    """
    Aligns the transcriptions of a parsed document against recognition model
    activations, producing approximate character cut positions.
    """
    warnings.warn('`forced_align` is deprecated; use `ForcedAlignmentTaskModel` instead.',
                  DeprecationWarning)
    from kraken_tpu import rpred as rpred_mod

    im = open_image(doc.imagename)
    predictor = rpred_mod.rpred(model, im, doc)

    records = []
    for idx, line in enumerate(doc.lines):
        next(predictor)
        # the reference feeds the softmax outputs straight into a log-softmax
        # (align.py:72); replicated here by passing them as pseudo-logits
        result = align_line(model.outputs[0], model.codec, line.text, base_dir)
        if result is None:
            logger.warning(f'Could not align line {idx}: output too short for transcription.')
            records.append(BaselineOCRRecord('', [], [], line))
            continue
        do_text, segments = result
        pred = ''.join(seg.label for seg in segments)
        pos = [(predictor._scale_val(seg.start, 0, predictor.box.size[0]),
                predictor._scale_val(seg.end, 0, predictor.box.size[0]))
               for seg in segments]
        conf = [seg.score for seg in segments]
        records.append(BaselineOCRRecord(pred, pos, conf, line, display_order=True))
    return replace(doc, lines=records)
