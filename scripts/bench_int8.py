"""
Microbenchmark: does XLA:TPU map int8 GEMMs and convolutions onto the
v5e's double-rate int8 MXU path?

Gates any int8 quantized-inference work: the flagship recognition forward
is ~78 % conv stack / ~22 % LSTM GEMMs, so int8 only pays if at least the
convolutions hit the fast path. Each case loops the op inside one jit so
the tunneled dispatch overhead is amortized; the loop body writes the
running accumulator into the operand and reduces the full result, so XLA
can neither hoist the op out of the loop nor elide the computation.

Usage: python scripts/bench_int8.py
"""
import os
import time

import numpy as np


ITER = int(os.environ.get('INT8_BENCH_ITERS', 30))


def _bench_loop(body, flops_per_iter, name):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def step(i, acc):
            return body(acc)
        return jax.lax.fori_loop(0, ITER, step, jnp.float32(0))

    float(run())  # compile + warm (axon block_until_ready is a no-op; transfer blocks)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    per = best / ITER
    tops = flops_per_iter / per / 1e12
    print(f'{name}: {per * 1e3:.3f} ms/iter -> {tops:.1f} T(FL)OPS', flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    print('devices:', jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    # ---- GEMM: LSTM input-projection sized (B*T collapsed) x (in, 4H)
    M, K, N = 8192, 960, 800
    flops = 2 * M * K * N
    a_bf = jnp.asarray(rng.rand(M, K), jnp.bfloat16)
    b_bf = jnp.asarray(rng.rand(K, N), jnp.bfloat16)

    def gemm_bf16(acc):
        a = a_bf.at[0, 0].set(acc.astype(jnp.bfloat16))
        return (a @ b_bf).sum().astype(jnp.float32) * 1e-9

    a_i8 = jnp.asarray(rng.randint(-127, 127, (M, K)), jnp.int8)
    b_i8 = jnp.asarray(rng.randint(-127, 127, (K, N)), jnp.int8)

    def gemm_int8(acc):
        a = a_i8.at[0, 0].set(acc.astype(jnp.int8))
        r = jax.lax.dot_general(a, b_i8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return r.sum(dtype=jnp.int32).astype(jnp.float32) * 1e-9

    t_bf = _bench_loop(gemm_bf16, flops, f'GEMM {M}x{K}x{N} bf16')
    t_i8 = _bench_loop(gemm_int8, flops, f'GEMM {M}x{K}x{N} int8')
    print(f'  -> int8 GEMM speedup over bf16: {t_bf / t_i8:.2f}x', flush=True)

    # ---- conv: the flagship's 2nd conv (32->32, 3x13) at inference shape
    B, C, H, W = 64, 32, 60, 512
    CO, KH, KW = 32, 3, 13
    cflops = 2 * B * CO * C * KH * KW * H * W
    x_bf = jnp.asarray(rng.rand(B, C, H, W), jnp.bfloat16)
    w_bf = jnp.asarray(rng.rand(CO, C, KH, KW), jnp.bfloat16)

    def conv_bf16(acc):
        x = x_bf.at[0, 0, 0, 0].set(acc.astype(jnp.bfloat16))
        r = jax.lax.conv_general_dilated(x, w_bf, (1, 1), 'SAME',
                                         preferred_element_type=jnp.float32)
        return r.sum().astype(jnp.float32) * 1e-9

    x_i8 = jnp.asarray(rng.randint(-127, 127, (B, C, H, W)), jnp.int8)
    w_i8 = jnp.asarray(rng.randint(-127, 127, (CO, C, KH, KW)), jnp.int8)

    def conv_int8(acc):
        x = x_i8.at[0, 0, 0, 0].set(acc.astype(jnp.int8))
        r = jax.lax.conv_general_dilated(x, w_i8, (1, 1), 'SAME',
                                         preferred_element_type=jnp.int32)
        return r.sum(dtype=jnp.int32).astype(jnp.float32) * 1e-9

    c_bf = _bench_loop(conv_bf16, cflops, f'conv {C}->{CO} {KH}x{KW} bf16')
    c_i8 = _bench_loop(conv_int8, cflops, f'conv {C}->{CO} {KH}x{KW} int8')
    print(f'  -> int8 conv speedup over bf16: {c_bf / c_i8:.2f}x', flush=True)


if __name__ == '__main__':
    main()
