"""
kraken_tpu.ops.lstm
~~~~~~~~~~~~~~~~~~~

Pallas TPU kernel for the LSTM recurrence.

The input projection (x @ W_ih) is a large MXU-friendly matmul hoisted out
of the time loop (see kraken_tpu.nn.layers._lstm_scan); what remains per
step is the small recurrent matmul h @ W_hh plus gate nonlinearities. As an
XLA scan each step pays while-loop and dynamic-slice overhead; this kernel
instead walks the time axis as a sequential Pallas grid keeping the (h, c)
carry in VMEM scratch, so each step is one fused VMEM-resident
matmul+gating block.

Data is laid out time-major — (T, B, 4H) — so each grid step's block is a
full (B, 4H) tile satisfying the TPU (8, 128) tiling constraints.

Masking follows torch packed-sequence semantics: steps at or beyond a row's
valid length neither update the carry nor emit output. The reverse direction
runs the same kernel over a time-reversed grid, which together with the
same validity mask starts each row's recurrence at its true end.
(Behavioral contract: torch LSTM packed-sequence semantics used by the
reference, kraken/lib/vgsl/layers.py:528-536; the kernel itself has no
reference equivalent.)
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['lstm_pallas']


def _lstm_kernel(gates_ref, w_hh_ref, mask_ref, out_ref, h_ref, c_ref, *,
                 hidden: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    h = h_ref[:]
    c = c_ref[:]
    gates = gates_ref[0].astype(jnp.float32)
    gates += jnp.dot(h, w_hh_ref[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    m = mask_ref[0].astype(jnp.float32)
    c_ref[:] = m * c_new + (1 - m) * c
    h_ref[:] = m * h_new + (1 - m) * h
    out_ref[0] = (m * h_new).astype(out_ref.dtype)


def lstm_pallas(gates_x: jnp.ndarray,
                w_hh: jnp.ndarray,
                mask: jnp.ndarray,
                reverse: bool = False,
                interpret: bool = None) -> jnp.ndarray:
    """
    Runs the LSTM recurrence over precomputed input projections.

    Args:
        gates_x: (B, T, 4H) input projections incl. biases.
        w_hh: (4H, H) torch-convention recurrent weights (gate order i,f,g,o).
        mask: (B, T) validity mask (1 = valid).
        reverse: process the time axis back-to-front.

    Returns:
        (B, T, H) hidden state outputs (zero at masked steps).
    """
    B, T, G = gates_x.shape
    H = G // 4
    gates_tm = jnp.swapaxes(gates_x, 0, 1)         # (T, B, 4H)
    mask_tm = jnp.swapaxes(mask, 0, 1)[:, :, None]  # (T, B, 1)
    w_hh_t = w_hh.T                                 # (H, 4H)

    if reverse:
        tidx = lambda t: (T - 1 - t, 0, 0)
    else:
        tidx = lambda t: (t, 0, 0)

    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    kernel = functools.partial(_lstm_kernel, hidden=H)
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, G), tidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), tidx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), tidx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), gates_x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )(gates_tm, w_hh_t, mask_tm)
    return jnp.swapaxes(out, 0, 1)
