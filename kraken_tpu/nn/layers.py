"""
kraken_tpu.nn.layers
~~~~~~~~~~~~~~~~~~~~

Functional JAX layers for VGSL networks.

Design: each layer is a frozen dataclass holding only static configuration.
Parameters live in plain nested dicts (pytrees) whose keys mirror the
reference engine's torch module attribute paths (`co.weight`, `lin.bias`,
`layer.weight_ih_l0`, ...; see /root/reference/kraken/lib/vgsl/layers.py) so
kraken safetensors files load without any name translation.

All data is NCHW with C as the feature dimension (LSTM outputs go into C like
conv filters). Every layer exposes:

  * ``init(rng) -> params``   — fresh parameters (reference init semantics:
      orthogonal LSTM with Jozefowicz forget bias, uniform(-0.1, 0.1) convs,
      Xavier linear; /root/reference/kraken/lib/vgsl/model.py:450-479)
  * ``apply(params, x, seq_len, ...) -> (y, seq_len)`` — pure function,
      jit/vmap/grad-safe
  * ``get_shape(input) -> output shape``  — VGSL shape arithmetic

Sequence lengths thread through every layer with the same arithmetic as the
reference so batched variable-width lines stay correctly masked.
"""
import math
from dataclasses import dataclass, field
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ['ActConv2D', 'Addition', 'Dropout', 'GroupNorm', 'Identity',
           'LinSoftmax', 'MaxPool', 'Parallel', 'Reshape', 'Series',
           'TransposedSummarizingRNN']

Shape = tuple[int, int, int, int]

# LSTM recurrence backend: 'scan' (lax.scan with hoisted input projection,
# the default) or 'pallas' (ops/lstm.py fused kernel, VMEM-resident carry).
# Module-level because layer dataclasses are static configuration shared
# across models; set via set_lstm_backend (wired from
# RecognitionInferenceConfig.lstm_backend in prepare_recognition).
_LSTM_BACKEND = 'scan'


def set_lstm_backend(name: str) -> None:
    """Selects the LSTM recurrence implementation ('scan' or 'pallas')."""
    global _LSTM_BACKEND
    if name not in ('scan', 'pallas'):
        raise ValueError(f'Unknown LSTM backend {name!r}')
    _LSTM_BACKEND = name


def _uniform(rng, shape, lo, hi, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, lo, hi)


def _xavier_uniform(rng, shape, dtype=jnp.float32):
    fan_out, fan_in = shape[0], int(np.prod(shape[1:]))
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -a, a)


def _orthogonal(rng, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(rng, shape, dtype)


class Layer:
    """Base class: layers are static configs over parameter pytrees."""

    def init(self, rng) -> dict:
        return {}

    def get_shape(self, input: Shape) -> Shape:
        return input

    def apply(self, params: dict, x: jnp.ndarray,
              seq_len: Optional[jnp.ndarray] = None,
              output_shape: Optional[tuple[int, int]] = None,
              train: bool = False,
              rng: Optional[jax.Array] = None) -> tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        raise NotImplementedError


@dataclass(frozen=True)
class Identity(Layer):
    """Identity (used for residual branches in parallel blocks)."""

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        return x, seq_len


@dataclass(frozen=True)
class Addition(Layer):
    """
    Splits `dim` into chunks of `chunk_size` and sums the chunks
    (reference semantics: lib/vgsl/layers.py:188-221).
    """
    dim: int
    chunk_size: int

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        d = self.dim % x.ndim
        n = x.shape[d] // self.chunk_size
        shape = x.shape[:d] + (n, self.chunk_size) + x.shape[d + 1:]
        return jnp.reshape(x, shape).sum(axis=d), seq_len

    def get_shape(self, input: Shape) -> Shape:
        out = list(input)
        out[self.dim] = self.chunk_size
        return tuple(out)


@dataclass(frozen=True)
class MaxPool(Layer):
    """2D max pooling, VALID padding (reference: lib/vgsl/layers.py:367-395)."""
    kernel_size: tuple[int, int]
    stride: tuple[int, int]

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        y = lax.reduce_window(x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
                              lax.max,
                              (1, 1, self.kernel_size[0], self.kernel_size[1]),
                              (1, 1, self.stride[0], self.stride[1]),
                              'VALID')
        if seq_len is not None:
            seq_len = (jnp.floor((seq_len - (self.kernel_size[1] - 1) - 1).astype(jnp.float32)
                                 / self.stride[1] + 1)).astype(jnp.int32)
        return y, seq_len

    def get_shape(self, input: Shape) -> Shape:
        return (input[0], input[1],
                int(np.floor((input[2] - (self.kernel_size[0] - 1) - 1) / self.stride[0] + 1) if input[2] != 0 else 0),
                int(np.floor((input[3] - (self.kernel_size[1] - 1) - 1) / self.stride[1] + 1) if input[3] != 0 else 0))


@dataclass(frozen=True)
class Reshape(Layer):
    """
    Splits dimension `src_dim` into (part_a, part_b) and moves one part to
    another dimension (reference: lib/vgsl/layers.py:285-342). Dimensions are
    in NCHW index space (already mapped from the VGSL 0/1/2/3 convention by
    the parser).
    """
    src_dim: int
    part_a: int
    part_b: int
    high: int
    low: int

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        initial_len = x.shape[3]
        shape = x.shape[:self.src_dim] + (self.part_a, self.part_b) + x.shape[self.src_dim + 1:]
        # -1 sizes are resolved by numpy-style reshape
        x = jnp.reshape(x, shape)
        dest = self.low
        src_dim = self.src_dim
        if self.high != src_dim:
            dest = self.high
        else:
            src_dim += 1
        perm = list(range(x.ndim))
        step = 1 if dest > src_dim else -1
        for i in range(src_dim, dest, step):
            perm[i], perm[i + step] = perm[i + step], perm[i]
        x = jnp.transpose(x, perm)
        out = jnp.reshape(x, x.shape[:dest] + (x.shape[dest] * x.shape[dest + 1],) + x.shape[dest + 2:])
        if seq_len is not None:
            seq_len = (seq_len * (float(initial_len) / out.shape[3])).astype(jnp.int32)
        return out, seq_len

    def get_shape(self, input: Shape) -> Shape:
        probe = jnp.zeros([x if x else 1 for x in input])
        out, _ = self.apply({}, probe)
        return tuple(out.shape)


@dataclass(frozen=True)
class Dropout(Layer):
    """1D (per-element) or 2D (per-channel) dropout."""
    p: float
    dim: int

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        if not train or self.p <= 0 or rng is None:
            return x, seq_len
        if self.dim == 2:
            mask_shape = x.shape[:2] + (1, 1)
        else:
            mask_shape = x.shape
        keep = jax.random.bernoulli(rng, 1.0 - self.p, mask_shape)
        return jnp.where(keep, x / (1.0 - self.p), 0.0).astype(x.dtype), seq_len


@dataclass(frozen=True)
class GroupNorm(Layer):
    """
    Group normalization, padding-aware: when sequence lengths are shorter
    than the width, statistics are computed over the valid region only
    (reference: lib/vgsl/layers.py:955-984 uses a per-sample python loop;
    here it is a fully vectorized masked reduction).
    """
    in_channels: int
    num_groups: int
    eps: float = 1e-5

    def init(self, rng):
        return {'layer.weight': jnp.ones((self.in_channels,), jnp.float32),
                'layer.bias': jnp.zeros((self.in_channels,), jnp.float32)}

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        t = x.dtype
        x32 = x.astype(jnp.float32)
        N, C, H, W = x32.shape
        G = self.num_groups
        grouped = x32.reshape(N, G, C // G, H, W)
        if seq_len is None:
            mean = grouped.mean(axis=(2, 3, 4), keepdims=True)
            var = grouped.var(axis=(2, 3, 4), keepdims=True)
            normed = (grouped - mean) * lax.rsqrt(var + self.eps)
        else:
            lens = jnp.clip(seq_len, 1, W)
            mask = (jnp.arange(W)[None, :] < lens[:, None]).astype(jnp.float32)  # (N, W)
            m = mask[:, None, None, None, :]                                     # (N,1,1,1,W)
            count = (C // G) * H * lens.astype(jnp.float32)                      # (N,)
            count = count[:, None, None, None, None]
            mean = (grouped * m).sum(axis=(2, 3, 4), keepdims=True) / count
            var = (((grouped - mean) ** 2) * m).sum(axis=(2, 3, 4), keepdims=True) / count
            normed = (grouped - mean) * lax.rsqrt(var + self.eps)
            # zero padding region like the reference (output buffer is zeros there)
            normed = normed * m
        normed = normed.reshape(N, C, H, W)
        y = normed * params['layer.weight'][None, :, None, None] + params['layer.bias'][None, :, None, None]
        if seq_len is not None:
            y = y * (jnp.arange(W)[None, None, None, :] < jnp.clip(seq_len, 1, W)[:, None, None, None])
        return y.astype(t), seq_len


_ACTIVATIONS = {
    's': ('SIGMOID', jax.nn.sigmoid),
    't': ('TANH', jnp.tanh),
    'm': ('SOFTMAX', lambda x: jax.nn.softmax(x, axis=1)),
    'r': ('RELU', jax.nn.relu),
    'lr': ('LEAKYRELU', lambda x: jax.nn.leaky_relu(x, 0.01)),
    'l': ('LINEAR', lambda x: x),
}


@dataclass(frozen=True)
class ActConv2D(Layer):
    """
    Convolution (or transposed convolution) + activation with automatic
    'same-ish' padding (reference: lib/vgsl/layers.py:785-923).

    Note the reference quirk: sigmoid-activated convolutions emit *logits*
    in the forward pass (the sigmoid is applied downstream), which we
    replicate.
    """
    in_channels: int
    out_channels: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int]
    nl: str = 'l'
    dilation: tuple[int, int] = (1, 1)
    transposed: bool = False

    @property
    def padding(self) -> tuple[int, int]:
        return tuple((self.dilation[i] * (self.kernel_size[i] - 1)) // 2 for i in range(2))

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        if self.transposed:
            w_shape = (self.in_channels, self.out_channels, *self.kernel_size)
        else:
            w_shape = (self.out_channels, self.in_channels, *self.kernel_size)
        return {'co.weight': _uniform(k1, w_shape, -0.1, 0.1),
                'co.bias': _uniform(k2, (self.out_channels,), -0.1, 0.1)}

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        w = params['co.weight'].astype(x.dtype)
        b = params['co.bias'].astype(x.dtype)
        p = self.padding
        if self.transposed:
            # torch ConvTranspose2d == gradient of conv: dilate input by
            # stride, pad with (dilation*(k-1) - padding), flip kernel, swap
            # in/out channels.
            kh, kw = self.kernel_size
            dh, dw = self.dilation
            pad_h = dh * (kh - 1) - p[0]
            pad_w = dw * (kw - 1) - p[1]
            min_h = (x.shape[2] - 1) * self.stride[0] - 2 * p[0] + dh * (kh - 1) + 1
            min_w = (x.shape[3] - 1) * self.stride[1] - 2 * p[1] + dw * (kw - 1) + 1
            out_pad_h = out_pad_w = 0
            if output_shape is not None:
                out_pad_h = int(output_shape[0]) - min_h
                out_pad_w = int(output_shape[1]) - min_w
            w_t = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)
            y = lax.conv_general_dilated(
                x, w_t,
                window_strides=(1, 1),
                padding=[(pad_h, pad_h + out_pad_h), (pad_w, pad_w + out_pad_w)],
                lhs_dilation=self.stride,
                rhs_dilation=self.dilation,
                dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
        else:
            y = lax.conv_general_dilated(
                x, w,
                window_strides=self.stride,
                padding=[(p[0], p[0]), (p[1], p[1])],
                rhs_dilation=self.dilation,
                dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
        y = y + b[None, :, None, None]
        name, fn = _ACTIVATIONS[self.nl]
        if name != 'SIGMOID':
            y = fn(y)
        if seq_len is not None:
            if self.transposed:
                seq_len = jnp.floor((seq_len - 1) * self.stride[1] - 2 * p[1]
                                    + self.dilation[1] * (self.kernel_size[1] - 1) + 1).astype(jnp.int32)
            else:
                seq_len = jnp.clip(jnp.floor(
                    (seq_len + 2 * p[1] - self.dilation[1] * (self.kernel_size[1] - 1) - 1).astype(jnp.float32)
                    / self.stride[1] + 1), min=1).astype(jnp.int32)
        return y, seq_len

    def get_shape(self, input: Shape, target_shape: Optional[Shape] = None) -> Shape:
        p = self.padding
        if self.transposed:
            min_y = int((input[2] - 1) * self.stride[0] - 2 * p[0] + self.dilation[0] * (self.kernel_size[0] - 1) + 1 if input[2] != 0 else 0)
            target_y = min_y if not target_shape or target_shape[2] == 0 else target_shape[2]
            min_x = int((input[3] - 1) * self.stride[1] - 2 * p[1] + self.dilation[1] * (self.kernel_size[1] - 1) + 1 if input[3] != 0 else 0)
            target_x = min_x if not target_shape or target_shape[3] == 0 else target_shape[3]
            return (input[0], self.out_channels,
                    min(min_y + self.stride[0] - 1, max(target_y, min_y)),
                    min(min_x + self.stride[1] - 1, max(target_x, min_x)))
        return (input[0], self.out_channels,
                int(max(np.floor((input[2] + 2 * p[0] - self.dilation[0] * (self.kernel_size[0] - 1) - 1) / self.stride[0] + 1), 1) if input[2] != 0 else 0),
                int(max(np.floor((input[3] + 2 * p[1] - self.dilation[1] * (self.kernel_size[1] - 1) - 1) / self.stride[1] + 1), 1) if input[3] != 0 else 0))

    def resize(self, params: dict, output_size: int, del_indices=None, rng=None) -> dict:
        """
        Resizes the output filters with minimal disturbance: deletes filters
        at `del_indices`, appends fresh Xavier-initialized ones up to
        `output_size`.
        """
        del_indices = set(del_indices or [])
        keep = [i for i in range(params['co.weight'].shape[0]) if i not in del_indices]
        weight = params['co.weight'][jnp.asarray(keep)]
        bias = params['co.bias'][jnp.asarray(keep)]
        extra = output_size - weight.shape[0]
        if extra > 0:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            weight = jnp.concatenate([weight, _xavier_uniform(rng, (extra, *weight.shape[1:]))])
            bias = jnp.concatenate([bias, jnp.zeros((extra,), bias.dtype)])
        return {'co.weight': weight, 'co.bias': bias}


@dataclass(frozen=True)
class LinSoftmax(Layer):
    """
    Linear projection over the feature (C) dimension. Softmax itself is
    applied downstream by CTC decoding / losses (reference:
    lib/vgsl/layers.py:679-782).
    """
    input_size: int
    output_size: int
    augmentation: bool = False

    @property
    def _in(self):
        return self.input_size + 1 if self.augmentation else self.input_size

    def init(self, rng):
        return {'lin.weight': _xavier_uniform(rng, (self.output_size, self._in)),
                'lin.bias': jnp.zeros((self.output_size,), jnp.float32)}

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        # NCHW -> NWHC
        x = jnp.transpose(x, (0, 3, 2, 1))
        if self.augmentation:
            x = jnp.concatenate([jnp.ones(x.shape[:3] + (1,), x.dtype), x], axis=3)
        y = x @ params['lin.weight'].T.astype(x.dtype) + params['lin.bias'].astype(x.dtype)
        return jnp.transpose(y, (0, 3, 2, 1)), seq_len

    def get_shape(self, input: Shape) -> Shape:
        return (input[0], self.output_size, input[2], input[3])

    def resize(self, params: dict, output_size: int, del_indices=None, rng=None) -> dict:
        del_indices = set(del_indices or [])
        keep = [i for i in range(params['lin.weight'].shape[0]) if i not in del_indices]
        weight = params['lin.weight'][jnp.asarray(keep)]
        bias = params['lin.bias'][jnp.asarray(keep)]
        extra = output_size - weight.shape[0]
        if extra > 0:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            weight = jnp.concatenate([weight, _xavier_uniform(rng, (extra, weight.shape[1]))])
            bias = jnp.concatenate([bias, jnp.zeros((extra,), bias.dtype)])
        return {'lin.weight': weight, 'lin.bias': bias}


def _lstm_scan(x: jnp.ndarray,
               lens: Optional[jnp.ndarray],
               w_ih: jnp.ndarray, w_hh: jnp.ndarray,
               b: Optional[jnp.ndarray],
               reverse: bool) -> jnp.ndarray:
    """
    Single-direction LSTM over (B, T, C) input with optional per-row valid
    lengths, matching torch packed-sequence semantics (outputs beyond the
    valid length are zero; the reverse direction starts at each row's true
    end).

    The input projection is hoisted out of the scan as one large matmul so
    the MXU sees a (B*T, C) @ (C, 4H) contraction; the scan body only
    contains the (B, H) @ (H, 4H) recurrent matmul.
    """
    B, T, _ = x.shape
    H = w_hh.shape[1]
    dtype = x.dtype
    # hoisted input projection
    gates_x = x @ w_ih.T.astype(dtype)
    if b is not None:
        gates_x = gates_x + b.astype(dtype)
    if reverse:
        gates_x = jnp.flip(gates_x, axis=1)
    if lens is not None:
        t_idx = jnp.arange(T)
        if reverse:
            # after the flip, row padding sits at the start
            mask = (t_idx[None, :] >= (T - lens)[:, None])
        else:
            mask = (t_idx[None, :] < lens[:, None])
        mask = mask.astype(dtype)[..., None]  # (B, T, 1)
    else:
        mask = None

    w_hh_t = w_hh.T.astype(dtype)

    def step(carry, inp):
        h, c = carry
        if mask is None:
            gx = inp
            m = None
        else:
            gx, m = inp
        gates = gx + h @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if m is not None:
            c_new = m * c_new + (1 - m) * c
            h_out = m * h_new
            h_new = m * h_new + (1 - m) * h
        else:
            h_out = h_new
        return (h_new, c_new), h_out

    init = (jnp.zeros((B, H), dtype), jnp.zeros((B, H), dtype))
    xs = jnp.swapaxes(gates_x, 0, 1) if mask is None else (jnp.swapaxes(gates_x, 0, 1), jnp.swapaxes(mask, 0, 1))
    _, ys = lax.scan(step, init, xs)
    ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys


def _lstm_pallas_run(x: jnp.ndarray,
                     lens: Optional[jnp.ndarray],
                     w_ih: jnp.ndarray, w_hh: jnp.ndarray,
                     b: Optional[jnp.ndarray],
                     reverse: bool) -> jnp.ndarray:
    """
    Same contract as :func:`_lstm_scan`, with the recurrence running in the
    Pallas fused kernel (ops/lstm.py): input projection hoisted identically,
    carry VMEM-resident. Bit-compatible with the scan path on the same
    backend (tests/test_ops.py).
    """
    from kraken_tpu.ops.lstm import lstm_pallas
    B, T, _ = x.shape
    dtype = x.dtype
    gates_x = x @ w_ih.T.astype(dtype)
    if b is not None:
        gates_x = gates_x + b.astype(dtype)
    if lens is not None:
        mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(dtype)
    else:
        mask = jnp.ones((B, T), dtype)
    return lstm_pallas(gates_x, w_hh, mask, reverse=reverse)


def _bilstm_scan(x: jnp.ndarray,
                 lens: Optional[jnp.ndarray],
                 w_ih_f: jnp.ndarray, w_hh_f: jnp.ndarray, b_f: Optional[jnp.ndarray],
                 w_ih_r: jnp.ndarray, w_hh_r: jnp.ndarray, b_r: Optional[jnp.ndarray]) -> jnp.ndarray:
    """
    Both directions of a bidirectional LSTM fused into ONE scan: the
    directions are independent recurrences, so they stack on a leading axis
    and the per-step recurrent GEMM becomes a single batched
    (2, B, H) @ (2, H, 4H) contraction. This halves the number of serialized
    scan steps — the dominant cost of the LSTM stack on TPU (the MXU is idle
    between steps; see docs/architecture.md roofline) — while computing
    exactly the per-direction math of :func:`_lstm_scan`.

    Returns (B, T, 2H) with forward/reverse features concatenated like
    torch.nn.LSTM(bidirectional=True).
    """
    B, T, _ = x.shape
    H = w_hh_f.shape[1]
    dtype = x.dtype
    # hoisted input projections, both directions in one contraction
    w_ih = jnp.stack([w_ih_f, w_ih_r]).astype(dtype)          # (2, 4H, C)
    gates_x = jnp.einsum('btc,dgc->dbtg', x, w_ih)            # (2, B, T, 4H)
    if b_f is not None:
        gates_x = gates_x + jnp.stack([b_f, b_r]).astype(dtype)[:, None, None, :]
    # the reverse direction consumes the flipped sequence
    gates_x = jnp.concatenate([gates_x[:1], jnp.flip(gates_x[1:], axis=2)], axis=0)
    if lens is not None:
        t_idx = jnp.arange(T)
        mask_f = (t_idx[None, :] < lens[:, None])
        mask_r = (t_idx[None, :] >= (T - lens)[:, None])
        mask = jnp.stack([mask_f, mask_r]).astype(dtype)[..., None]  # (2, B, T, 1)
    else:
        mask = None
    w_hh = jnp.stack([w_hh_f.T, w_hh_r.T]).astype(dtype)      # (2, H, 4H)

    def step(carry, inp):
        h, c = carry                                          # (2, B, H)
        if mask is None:
            gx = inp
            m = None
        else:
            gx, m = inp
        gates = gx + jnp.einsum('dbh,dhg->dbg', h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if m is not None:
            c_new = m * c_new + (1 - m) * c
            h_out = m * h_new
            h_new = m * h_new + (1 - m) * h
        else:
            h_out = h_new
        return (h_new, c_new), h_out

    init = (jnp.zeros((2, B, H), dtype), jnp.zeros((2, B, H), dtype))
    xs = (jnp.transpose(gates_x, (2, 0, 1, 3)) if mask is None
          else (jnp.transpose(gates_x, (2, 0, 1, 3)), jnp.transpose(mask, (2, 0, 1, 3))))
    _, ys = lax.scan(step, init, xs)                          # (T, 2, B, H)
    ys = jnp.transpose(ys, (1, 2, 0, 3))                      # (2, B, T, H)
    return jnp.concatenate([ys[0], jnp.flip(ys[1], axis=1)], axis=-1)


def _peephole_scan(x: jnp.ndarray, w_ih, w_hh, w_ip, w_fp, w_op, reverse: bool) -> jnp.ndarray:
    """Legacy ocropy peephole LSTM (no biases; reference: layers.py:74-103)."""
    B, T, _ = x.shape
    dtype = x.dtype
    H = w_hh.shape[1]
    gates_x = x @ w_ih.T.astype(dtype)
    if reverse:
        gates_x = jnp.flip(gates_x, axis=1)

    w_hh_t = w_hh.T.astype(dtype)

    def step(carry, gx):
        h, c = carry
        gates = gx + h @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i + w_ip * c)
        f = jax.nn.sigmoid(f + w_fp * c)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        o = jax.nn.sigmoid(o + w_op * c_new)
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    init = (jnp.zeros((B, H), dtype), jnp.zeros((B, H), dtype))
    _, ys = lax.scan(step, init, jnp.swapaxes(gates_x, 0, 1))
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys


@dataclass(frozen=True)
class TransposedSummarizingRNN(Layer):
    """
    LSTM wrapper allowing time-axis transposition (y-dim recurrence) and
    summarization (only the final step is emitted), matching the reference
    TransposedSummarizingRNN (lib/vgsl/layers.py:462-676).

    Parameter names and gate order (i, f, g, o) follow torch.nn.LSTM so
    kraken weights load directly.
    """
    input_size: int
    hidden_size: int
    direction: str = 'b'
    transpose: bool = True
    summarize: bool = True
    legacy: Optional[str] = None

    @property
    def bidi(self) -> bool:
        return self.direction == 'b'

    @property
    def output_size(self) -> int:
        return 2 * self.hidden_size if self.bidi else self.hidden_size

    @property
    def _in(self) -> int:
        return self.input_size + 1 if self.legacy is not None else self.input_size

    def init(self, rng):
        H = self.hidden_size
        params = {}
        dirs = ['', '_reverse'] if (self.bidi or self.legacy == 'ocropy') else ['']
        keys = jax.random.split(rng, 2 * len(dirs))
        for i, sfx in enumerate(dirs):
            if self.legacy == 'ocropy':
                params[f'layer.weight_ih_l0{sfx}'] = _orthogonal(keys[2 * i], (4 * H, self._in))
                params[f'layer.weight_hh_l0{sfx}'] = _orthogonal(keys[2 * i + 1], (4 * H, H))
                params[f'layer.weight_ip_l0{sfx}'] = jnp.zeros((H,), jnp.float32)
                params[f'layer.weight_fp_l0{sfx}'] = jnp.zeros((H,), jnp.float32)
                params[f'layer.weight_op_l0{sfx}'] = jnp.zeros((H,), jnp.float32)
            else:
                params[f'layer.weight_ih_l0{sfx}'] = _orthogonal(keys[2 * i], (4 * H, self._in))
                params[f'layer.weight_hh_l0{sfx}'] = _orthogonal(keys[2 * i + 1], (4 * H, H))
                if not self.legacy:
                    # Jozefowicz forget-gate bias of 1
                    bias = jnp.zeros((4 * H,), jnp.float32).at[H:2 * H].set(1.0)
                    params[f'layer.bias_ih_l0{sfx}'] = bias
                    params[f'layer.bias_hh_l0{sfx}'] = bias
        return params

    def _run(self, params, x, lens):
        """(B, T, C) -> (B, T, O)"""
        # note: a fused both-direction scan (_bilstm_scan, half the
        # sequential steps via a batched per-step GEMM) measures within
        # noise of the two separate scans on v5e — the steps are GEMM-
        # latency bound, not loop-overhead bound — so the simpler layout
        # stays the default
        outs = []
        directions = [(False, '')]
        if self.bidi or self.legacy == 'ocropy':
            directions.append((True, '_reverse'))
        for reverse, sfx in directions:
            if self.legacy == 'ocropy':
                ys = _peephole_scan(x,
                                    params[f'layer.weight_ih_l0{sfx}'],
                                    params[f'layer.weight_hh_l0{sfx}'],
                                    params[f'layer.weight_ip_l0{sfx}'],
                                    params[f'layer.weight_fp_l0{sfx}'],
                                    params[f'layer.weight_op_l0{sfx}'],
                                    reverse)
            else:
                b = None
                if f'layer.bias_ih_l0{sfx}' in params:
                    b = params[f'layer.bias_ih_l0{sfx}'] + params[f'layer.bias_hh_l0{sfx}']
                if _LSTM_BACKEND == 'pallas':
                    ys = _lstm_pallas_run(x, lens,
                                          params[f'layer.weight_ih_l0{sfx}'],
                                          params[f'layer.weight_hh_l0{sfx}'],
                                          b, reverse)
                else:
                    ys = _lstm_scan(x, lens,
                                    params[f'layer.weight_ih_l0{sfx}'],
                                    params[f'layer.weight_hh_l0{sfx}'],
                                    b, reverse)
            outs.append(ys)
        return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        # NCHW -> HNWC
        x = jnp.transpose(x, (2, 0, 3, 1))
        if self.transpose:
            # HNWC -> WNHC (recurrence along H)
            x = jnp.swapaxes(x, 0, 2)
        if self.legacy is not None:
            x = jnp.concatenate([jnp.ones(x.shape[:3] + (1,), x.dtype), x], axis=3)
        H_, N_, W_, C_ = x.shape
        x = x.reshape(H_ * N_, W_, C_)
        lens = None
        if not self.transpose and seq_len is not None:
            if H_ != 1:
                raise ValueError('Height must be 1 for batched sequence recurrence.')
            lens = seq_len
        ys = self._run(params, x, lens)  # (H*N, W, O)
        ys = ys.reshape(H_, N_, W_, self.output_size)
        if self.summarize:
            if lens is not None:
                # last valid step per row
                idx = jnp.clip(lens - 1, 0, W_ - 1)
                ys = jnp.take_along_axis(ys, idx[None, :, None, None], axis=2)
            else:
                ys = ys[:, :, -1:, :]
        if self.transpose:
            ys = jnp.swapaxes(ys, 0, 2)
        # HNWO -> NOHW
        return jnp.transpose(ys, (1, 3, 0, 2)), seq_len

    def get_shape(self, input: Shape) -> Shape:
        if self.summarize:
            hw = (1, input[3]) if self.transpose else (input[2], 1)
        else:
            hw = (input[2], input[3])
        return (input[0], self.output_size) + hw


@dataclass(frozen=True)
class TransformerEncoder(Layer):
    """
    Pre-LN transformer encoder block over the width axis (one VGSL `Te`
    token per block): LN → rotary-embedded multi-head self-attention →
    residual, LN → GELU FFN → residual.

    This is a TPU-native *extension* of the reference's VGSL grammar (the
    reference's recurrent option is lib/vgsl/layers.py:462-676): unlike the
    BiLSTM stack, every width position computes in parallel — no serialized
    timestep chain — so throughput is set by MXU GEMMs, not recurrence
    latency. Positions beyond a sample's `seq_len` are masked out of the
    attention softmax and zeroed on output, so bucket-padded batches are
    numerically independent of the padding (same contract as GroupNorm
    above). Requires H == 1 (apply after an `S1(1x0)1,3` collapse and a
    projection to `dim` channels).
    """
    input_size: int
    heads: int
    dim: int
    ffn_dim: int
    dropout: float = 0.1

    def __post_init__(self):
        if self.input_size != self.dim:
            raise ValueError(f'Te input channels ({self.input_size}) must '
                             f'equal the block dim ({self.dim}); project '
                             'with e.g. Cl1,1,{dim} first')
        if self.dim % self.heads:
            raise ValueError(f'Te dim {self.dim} not divisible by heads {self.heads}')
        if (self.dim // self.heads) % 2:
            raise ValueError('Te head dim must be even for rotary embeddings')

    @property
    def output_size(self) -> int:
        return self.dim

    def init(self, rng):
        D, F = self.dim, self.ffn_dim
        k = jax.random.split(rng, 4)
        return {
            'norm1.weight': jnp.ones((D,), jnp.float32),
            'norm1.bias': jnp.zeros((D,), jnp.float32),
            'attn.qkv.weight': _xavier_uniform(k[0], (3 * D, D)),
            'attn.qkv.bias': jnp.zeros((3 * D,), jnp.float32),
            'attn.out.weight': _xavier_uniform(k[1], (D, D)),
            'attn.out.bias': jnp.zeros((D,), jnp.float32),
            'norm2.weight': jnp.ones((D,), jnp.float32),
            'norm2.bias': jnp.zeros((D,), jnp.float32),
            'ffn.lin1.weight': _xavier_uniform(k[2], (F, D)),
            'ffn.lin1.bias': jnp.zeros((F,), jnp.float32),
            'ffn.lin2.weight': _xavier_uniform(k[3], (D, F)),
            'ffn.lin2.bias': jnp.zeros((D,), jnp.float32),
        }

    @staticmethod
    def _layernorm(x, w, b, eps=1e-5):
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=-1, keepdims=True)
        var = x32.var(axis=-1, keepdims=True)
        return ((x32 - mean) * lax.rsqrt(var + eps) * w + b).astype(x.dtype)

    @staticmethod
    def _rope(x):
        """Rotary position embedding over (B, h, W, d)."""
        d = x.shape[-1]
        W = x.shape[-2]
        pos = jnp.arange(W, dtype=jnp.float32)[:, None]
        inv = 10000.0 ** (-jnp.arange(0, d, 2, dtype=jnp.float32) / d)
        ang = pos * inv[None, :]                       # (W, d/2)
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        x1, x2 = x[..., 0::2], x[..., 1::2]
        y1 = x1 * cos - x2 * sin
        y2 = x1 * sin + x2 * cos
        return jnp.stack([y1, y2], axis=-1).reshape(x.shape).astype(x.dtype)

    def _block(self, params, x, mask, train, rng):
        """(B, W, D) with additive mask (B, 1, 1, W)."""
        B, W, D = x.shape
        h, hd = self.heads, D // self.heads
        p = {k: v.astype(x.dtype) for k, v in params.items()}
        y = self._layernorm(x, p['norm1.weight'], p['norm1.bias'])
        qkv = y @ p['attn.qkv.weight'].T + p['attn.qkv.bias']
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_of(t):
            return t.reshape(B, W, h, hd).transpose(0, 2, 1, 3)  # (B,h,W,hd)
        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        q, k = self._rope(q), self._rope(k)
        scores = (q @ jnp.swapaxes(k, -1, -2)).astype(jnp.float32) / math.sqrt(hd)
        if mask is not None:
            scores = scores + mask
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        if train and self.dropout > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            attn = attn * jax.random.bernoulli(
                sub, 1.0 - self.dropout, attn.shape).astype(attn.dtype) / (1.0 - self.dropout)
        ctx = (attn @ v).transpose(0, 2, 1, 3).reshape(B, W, D)
        x = x + ctx @ p['attn.out.weight'].T + p['attn.out.bias']
        y = self._layernorm(x, p['norm2.weight'], p['norm2.bias'])
        y = jax.nn.gelu(y @ p['ffn.lin1.weight'].T + p['ffn.lin1.bias'])
        if train and self.dropout > 0 and rng is not None:
            rng, sub = jax.random.split(rng)
            y = y * jax.random.bernoulli(
                sub, 1.0 - self.dropout, y.shape).astype(y.dtype) / (1.0 - self.dropout)
        return x + y @ p['ffn.lin2.weight'].T + p['ffn.lin2.bias']

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        N, C, H, W = x.shape
        if H != 1:
            raise ValueError('Te blocks require height 1 (apply S1(1x0)1,3 first)')
        y = x[:, :, 0, :].transpose(0, 2, 1)  # (N, W, C)
        mask = None
        if seq_len is not None:
            lens = jnp.clip(seq_len, 1, W)
            valid = jnp.arange(W)[None, :] < lens[:, None]          # (N, W)
            mask = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)[:, None, None, :]
        y = self._block(params, y, mask, train, rng)
        if seq_len is not None:
            y = y * valid[:, :, None].astype(y.dtype)
        return y.transpose(0, 2, 1)[:, :, None, :], seq_len

    def get_shape(self, input: Shape) -> Shape:
        return (input[0], self.dim, 1, input[3])


@dataclass(frozen=True)
class FusedConvPool(Layer):
    """
    Exact TPU rewrite of [ActConv2D(stride 1) → MaxPool(2,2)]: the input is
    space-to-depth'd 1x2 along the width (2·C_in channels at half width),
    the two width-pooling phases of the original convolution become 2·C_out
    output channels of ONE half-width convolution (kernel folded from the
    original weights), the width pool collapses to a max over the phase
    axis, and the height pool stays a (2,1) window reduction.

    Why: kraken-class models have C_out ≤ 64, underfilling the 128-wide MXU
    by 2-4x; the width-phase layout doubles the contraction's output columns
    while halving the spatial extent at ~8% extra multiply-adds (the folded
    kernel is ~93% dense for the 3x13/3x9 line kernels), lifting conv MFU
    without changing any result — max commutes with the monotone activation,
    so relu(conv(x)).maxpool == pool_h(max over phases of
    phase_conv(s2d_w(x))). Reads the ORIGINAL conv's parameters (same
    name/tree); built at inference-preparation time by
    :func:`fuse_conv_pools`.
    """
    conv: 'ActConv2D'

    def init(self, rng):
        return self.conv.init(rng)

    def _fold_indices(self):
        """Static gather map original w[c,ci,a,b] -> folded w2 slots."""
        kw = self.conv.kernel_size[1]
        pw = self.conv.padding[1]
        fv_min = (-pw) // 2
        kv = 2 * -fv_min + 1   # symmetric for same-padded odd kernels
        out_ph, in_sub, vs, b_src = [], [], [], []
        for dj in range(2):
            for b in range(kw):
                beta = dj + b - pw
                out_ph.append(dj)
                in_sub.append(beta % 2)
                vs.append(beta // 2 - fv_min)
                b_src.append(b)
        return np.array(out_ph), np.array(in_sub), np.array(vs), np.array(b_src), kv

    def _folded_weight(self, w):
        """(C_out, C_in, kh, kw) -> (2*C_out, 2*C_in, kh, kv)."""
        c_out, c_in, kh = self.conv.out_channels, self.conv.in_channels, self.conv.kernel_size[0]
        out_ph, in_sub, vs, b_src, kv = self._fold_indices()
        oc = out_ph[:, None] * c_out + np.arange(c_out)[None, :]   # (E, C_out)
        ic = in_sub[:, None] * c_in + np.arange(c_in)[None, :]     # (E, C_in)
        vals = jnp.transpose(w[:, :, :, b_src], (3, 0, 1, 2))      # (E, C_out, C_in, kh)
        w2 = jnp.zeros((2 * c_out, 2 * c_in, kh, kv), w.dtype)
        return w2.at[oc[:, :, None, None],
                     ic[:, None, :, None],
                     np.arange(kh)[None, None, None, :],
                     vs[:, None, None, None]].set(vals)

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        conv = self.conv
        N, C, H, W = x.shape
        if W % 2:
            # odd width can't be cell-aligned — run the unfused pair
            y, seq_len = conv.apply(params, x, seq_len, train=train, rng=rng)
            return MaxPool((2, 2), (2, 2)).apply({}, y, seq_len)
        w = params['co.weight'].astype(x.dtype)
        b = params['co.bias'].astype(x.dtype)
        # width space-to-depth: channel order subcol*C + ci
        xs = x.reshape(N, C, H, W // 2, 2)
        xs = jnp.transpose(xs, (0, 4, 1, 2, 3)).reshape(N, 2 * C, H, W // 2)
        w2 = self._folded_weight(w)
        ph, pw = conv.padding
        pad_v = -((-pw) // 2)   # ceil(pw/2) cells cover the full-res pad
        y = lax.conv_general_dilated(
            xs, w2, window_strides=(1, 1),
            padding=[(ph, ph), (pad_v, pad_v)],
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
        y = y + jnp.tile(b, 2)[None, :, None, None]
        act = _ACTIVATIONS[conv.nl][1] if conv.nl != 's' else (lambda v: v)
        y = act(y)
        # max over the two width phases, then the height pool
        y = y.reshape(N, 2, conv.out_channels, y.shape[2], y.shape[3]).max(axis=1)
        y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 1, 2, 1), (1, 1, 2, 1), 'VALID')
        if seq_len is not None:
            # conv(s=1) preserves lengths; pool(2,2) floors l/2
            seq_len = (seq_len // 2).astype(jnp.int32)
        return y, seq_len

    def get_shape(self, input: Shape) -> Shape:
        return (input[0], self.conv.out_channels,
                input[2] // 2 if input[2] else 0,
                input[3] // 2 if input[3] else 0)


def fuse_conv_pools(net: 'Series') -> 'Series':
    """
    Inference-time graph rewrite: replaces eligible
    [Cr(stride 1, dilation 1) → (Dropout)* → Mp(2,2)] runs with
    :class:`FusedConvPool` (exact, see its docstring). Parameter names are
    preserved — the fused layer keeps the conv's name and reads its weights —
    so the rewritten Series runs against the unmodified parameter tree.
    """
    layers = list(net.layers)
    names = list(net.names)
    out_layers, out_names = [], []
    i = 0
    while i < len(layers):
        layer = layers[i]
        if (isinstance(layer, ActConv2D) and not layer.transposed
                and layer.stride == (1, 1) and layer.dilation == (1, 1)
                and layer.nl in ('r', 'l', 's', 't')):
            j = i + 1
            dropouts = []
            while j < len(layers) and isinstance(layers[j], Dropout):
                dropouts.append(j)
                j += 1
            if (j < len(layers) and isinstance(layers[j], MaxPool)
                    and layers[j].kernel_size == (2, 2)
                    and layers[j].stride == (2, 2)):
                out_layers.append(FusedConvPool(conv=layer))
                out_names.append(names[i])
                for d in dropouts:
                    out_layers.append(layers[d])
                    out_names.append(names[d])
                i = j + 1
                continue
        if isinstance(layer, Series):
            fused = fuse_conv_pools(layer)
            out_layers.append(fused)
        else:
            out_layers.append(layer)
        out_names.append(names[i])
        i += 1
    return Series(layers=tuple(out_layers), names=tuple(out_names))


@dataclass(frozen=True)
class Series(Layer):
    """
    Sequential container threading (x, seq_len); a target output_shape is
    forwarded only to the final module (reference MultiParamSequential,
    lib/vgsl/layers.py:39-53).
    """
    layers: tuple = field(default_factory=tuple)
    names: tuple = field(default_factory=tuple)

    def init(self, rng):
        keys = jax.random.split(rng, max(len(self.layers), 1))
        return {name: layer.init(k) for name, layer, k in zip(self.names, self.layers, keys)}

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        n = len(self.layers)
        rngs = jax.random.split(rng, max(n, 1)) if rng is not None else [None] * n
        for i, (name, layer) in enumerate(zip(self.names, self.layers)):
            x, seq_len = layer.apply(params.get(name, {}), x, seq_len,
                                     output_shape=output_shape if i == n - 1 else None,
                                     train=train, rng=rngs[i])
        return x, seq_len

    def get_shape(self, input: Shape) -> Shape:
        for layer in self.layers:
            input = layer.get_shape(input)
        return input


@dataclass(frozen=True)
class Parallel(Layer):
    """
    Parallel container concatenating branch outputs on the channel dim; the
    first branch's spatial output shape becomes the target for later branches
    (reference MultiParamParallel, lib/vgsl/layers.py:56-71).
    """
    layers: tuple = field(default_factory=tuple)
    names: tuple = field(default_factory=tuple)

    def init(self, rng):
        keys = jax.random.split(rng, max(len(self.layers), 1))
        return {name: layer.init(k) for name, layer, k in zip(self.names, self.layers, keys)}

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        n = len(self.layers)
        rngs = jax.random.split(rng, max(n, 1)) if rng is not None else [None] * n
        outputs = []
        out_len = seq_len
        for i, (name, layer) in enumerate(zip(self.names, self.layers)):
            y, out_len = layer.apply(params.get(name, {}), x, seq_len,
                                     output_shape=output_shape, train=train, rng=rngs[i])
            outputs.append(y)
            if output_shape is None:
                output_shape = y.shape[2:]
        return jnp.concatenate(outputs, axis=1), out_len

    def get_shape(self, input: Shape) -> Shape:
        shapes = [layer.get_shape(input) for layer in self.layers]
        channels = sum(s[1] for s in shapes)
        return (shapes[0][0], channels, *shapes[0][2:])
