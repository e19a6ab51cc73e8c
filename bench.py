"""
Benchmark: recognition throughput (lines/sec/chip) of the flagship
CNN+BiLSTM VGSL network on the current JAX device, compared against an
architecturally identical torch CPU forward pass (the reference engine's
substrate and default deployment mode — kraken publishes no benchmark
numbers of its own, see BASELINE.md).

The JAX measurement pipelines batches (async dispatch, drain at the end)
exactly like the production line-recognition engine; per-frame argmax/conf
reductions happen on device so only small label tensors cross the tunnel.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

BATCH = 512
WIDTH = 1024
HEIGHT = 120
CLASSES = 250
N_ITER = 8
TORCH_BATCH = 16


def bench_jax():
    import os

    import jax
    import jax.numpy as jnp
    # persistent XLA compile cache: repeated runs skip the cold compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    from __graft_entry__ import entry

    fwd, (params, _, _) = entry()
    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                              if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 1, HEIGHT, WIDTH), dtype)
    lens = jnp.full((BATCH,), WIDTH, jnp.int32)
    jfwd = jax.jit(fwd)
    out = jfwd(params, x, lens)
    _ = np.asarray(out[0])
    start = time.perf_counter()
    outs = [jfwd(params, x, lens) for _ in range(N_ITER)]
    for o in outs:
        _ = np.asarray(o[0])
    elapsed = time.perf_counter() - start
    return BATCH * N_ITER / elapsed


def bench_torch_cpu():
    """Reference-equivalent torch CPU forward on the same shapes."""
    import torch

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(1, 32, (3, 13), padding=(1, 6))
            self.p1 = torch.nn.MaxPool2d(2, 2)
            self.c2 = torch.nn.Conv2d(32, 32, (3, 13), padding=(1, 6))
            self.p2 = torch.nn.MaxPool2d(2, 2)
            self.c3 = torch.nn.Conv2d(32, 64, (3, 9), padding=(1, 4))
            self.p3 = torch.nn.MaxPool2d(2, 2)
            self.c4 = torch.nn.Conv2d(64, 64, (3, 9), padding=(1, 4))
            h = HEIGHT // 8
            self.l1 = torch.nn.LSTM(64 * h, 200, bidirectional=True, batch_first=True)
            self.l2 = torch.nn.LSTM(400, 200, bidirectional=True, batch_first=True)
            self.l3 = torch.nn.LSTM(400, 200, bidirectional=True, batch_first=True)
            self.o = torch.nn.Linear(400, CLASSES)

        def forward(self, x):
            x = torch.relu(self.c1(x))
            x = self.p1(x)
            x = torch.relu(self.c2(x))
            x = self.p2(x)
            x = torch.relu(self.c3(x))
            x = self.p3(x)
            x = torch.relu(self.c4(x))
            n, c, h, w = x.shape
            x = x.permute(0, 3, 1, 2).reshape(n, w, c * h)
            x, _ = self.l1(x)
            x, _ = self.l2(x)
            x, _ = self.l3(x)
            return self.o(x)

    net = RefNet().eval()
    x = torch.rand(TORCH_BATCH, 1, HEIGHT, WIDTH)
    with torch.inference_mode():
        net(x[:2, :, :, :128])  # warmup
        # best of 3: favors the baseline (conservative speedup claim) and
        # shields the single-core host's scheduling noise
        best = float('inf')
        for _ in range(3):
            start = time.perf_counter()
            net(x)
            best = min(best, time.perf_counter() - start)
    return TORCH_BATCH / best


def main():
    jax_lps = bench_jax()
    torch_lps = bench_torch_cpu()
    print(json.dumps({
        'metric': f'recognition lines/sec/chip (CNN+3xBiLSTM-200, 120x1024 lines, batch {BATCH}, pipelined)',
        'value': round(jax_lps, 2),
        'unit': 'lines/sec',
        'vs_baseline': round(jax_lps / torch_lps, 2),
    }))


if __name__ == '__main__':
    main()
