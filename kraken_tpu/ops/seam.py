"""
kraken_tpu.ops.seam
~~~~~~~~~~~~~~~~~~~

Device-side batched seam carving for line polygonization.

The polygonizer carves one minimum-energy seam per baseline through a
rotated energy patch (host path: kraken_tpu/lib/polygonization.py:230,
behavioral ancestor: the per-line `_calc_seam` DP of reference
kraken/lib/segmentation.py:560). Host execution is O(lines) sequential;
this kernel expresses the forward DP as a `lax.scan` over columns with the
per-row cost vector as carry, vmapped over a page's worth of
bucket-padded patches, so every line's seam computes in one XLA program.

Padding convention: callers pad patches to a common (H, W) with +inf energy
rows/columns; +inf padding never participates in a minimum path, so results
on the valid region equal the host DP exactly. The backward pass (argmin
backtrace) stays on the host — it is O(W) pointer chasing over the small
backtrack matrix this kernel returns.
"""
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['carve_seams_device']

_BIG = jnp.float32(3.4e38)


def _seam_forward(patch):
    """(H, W) energy → (backtrack offsets (W-1, H) int8, costs (W-1, H))."""

    def step(cost, col):
        up = jnp.concatenate([_BIG[None], cost[:-1]])
        down = jnp.concatenate([cost[1:], _BIG[None]])
        stacked = jnp.stack([up, cost, down])          # (3, H)
        arg = jnp.argmin(stacked, axis=0).astype(jnp.int8)  # 0=up,1=stay,2=down
        new_cost = col + jnp.min(stacked, axis=0)
        return new_cost, (arg, new_cost)

    cost0 = patch[:, 0]
    _, (back, costs) = jax.lax.scan(step, cost0, patch[:, 1:].T)
    return back, costs


@jax.jit
def _seam_forward_batch(patches):
    return jax.vmap(_seam_forward)(patches)


def carve_seams_device(patches: np.ndarray, widths=None) -> np.ndarray:
    """
    Batched minimum-energy seams.

    Args:
        patches: (N, H, W) float32 energy patches, +inf padded to the
                 common shape.
        widths: per-patch valid widths (defaults to W); the backtrace starts
                at each patch's true last column so width padding cannot
                perturb the path.

    Returns:
        (N, W) int32 row index per column (valid through each patch's width).
    """
    arr = np.asarray(patches, np.float32)
    n, h, w = arr.shape
    if widths is None:
        widths = np.full(n, w, np.int32)
    widths = np.asarray(widths, np.int32)
    dev = jnp.asarray(np.nan_to_num(arr, posinf=3.4e38))
    back, costs = _seam_forward_batch(dev)
    back = np.asarray(back)            # (N, W-1, H) offsets in {0,1,2}
    costs = np.asarray(costs)          # (N, W-1, H)
    seams = np.zeros((n, w), np.int32)
    idx = np.arange(n)
    # per-patch start at its true last column (width-1 patches degenerate to
    # a per-column argmin of the raw energy). Rows 0 and H-1 are the +inf
    # pad rows — excluded from the start selection like the host DP, which
    # matters only when a patch's entire last column is masked.
    seams[idx, widths - 1] = np.argmin(costs[idx, np.maximum(widths - 2, 0), 1:h - 1], axis=1) + 1
    if (widths == 1).any():
        seams[widths == 1, 0] = np.argmin(arr[widths == 1, 1:h - 1, 0], axis=1) + 1
    # host backtrace: tiny O(N*W) loop over int8 offsets
    for j in range(w - 2, -1, -1):
        active = j + 1 <= widths - 1
        cur = seams[:, j + 1]
        off = back[idx, j, cur]
        seams[:, j] = np.where(active, cur + off.astype(np.int32) - 1, seams[:, j])
    return seams
