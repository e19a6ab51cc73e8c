"""
Measures the Pallas fused LSTM kernel (ops/lstm.py, VMEM-resident carry)
against the default lax.scan recurrence at the flagship recognizer's LSTM
shapes, on the current device. Run on a real TPU; result recorded in
docs/architecture.md.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')


def main():
    from kraken_tpu.nn.layers import _lstm_scan, _lstm_pallas_run

    B, T, C, H = 512, 128, 464, 200
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, T, C).astype(np.float32) * 0.1, jnp.bfloat16)
    lens = jnp.asarray(rng.randint(T // 2, T + 1, B), jnp.int32)
    w_ih = jnp.asarray(rng.randn(4 * H, C).astype(np.float32) * 0.05)
    w_hh = jnp.asarray(rng.randn(4 * H, H).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(4 * H).astype(np.float32) * 0.05)

    # a 3-layer-equivalent stack: 6 directional recurrences back to back
    def stack(fn):
        def run(x_):
            y = x_
            for i in range(3):
                f = fn(y, lens, w_ih if i == 0 else w_ih2, w_hh, b, False)
                r = fn(y, lens, w_ih if i == 0 else w_ih2, w_hh, b, True)
                y = jnp.concatenate([f, r], axis=-1)
            return y
        return run

    w_ih2 = jnp.asarray(rng.randn(4 * H, 2 * H).astype(np.float32) * 0.05)

    results = {}
    for name, fn in (('scan', _lstm_scan), ('pallas', _lstm_pallas_run)):
        jrun = jax.jit(stack(fn))
        out = jrun(x)
        _ = np.asarray(out)  # block (axon: block_until_ready is a no-op)
        best = float('inf')
        for _ in range(5):
            t0 = time.perf_counter()
            out = jrun(x)
            _ = np.asarray(out[:1, :1])
            best = min(best, time.perf_counter() - t0)
        results[name] = (best, np.asarray(out, np.float32))
        print(f'{name}: {best * 1000:.1f} ms '
              f'({B * T / best / 1e6:.2f} M line-steps/s)')

    diff = np.abs(results['scan'][1] - results['pallas'][1]).max()
    print(f'max |scan - pallas| = {diff}')
    print(f'pallas/scan wall ratio: {results["pallas"][0] / results["scan"][0]:.3f}')


if __name__ == '__main__':
    main()
