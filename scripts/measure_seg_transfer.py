#!/usr/bin/env python
"""
Segmentation transfer-policy study (VERDICT r3 item 2): measures, on the
CURRENT device/link, every candidate policy for getting U-Net outputs to
the host vectorizer:

  float32   — full-precision upsampled heatmaps + uint8 ridge maps
  uint8     — device-quantized heatmaps + uint8 ridge maps (r3 production)
  packbits  — device-computed binary decision masks, bit-packed 8 px/byte
              (r4 production on tunnel-grade links; heatmap_precision doc)
  pre-up    — pre-upsample uint8 sigmoid shipped at network-output
              resolution, bilinear-upsampled on the host (cv2): an
              alternative byte-cutter that trades transfer for host work —
              measured here WITHOUT a production code path because
              packbits dominates it on both axes wherever the fused-ridge
              layout is available.

Per policy: bytes down/page, segmentation_pred wall (best of N same-pass),
baseline agreement vs the float32 reference. A link sample is taken
adjacent to each policy so the walls are interpretable under tunnel noise.

Usage: python scripts/measure_seg_transfer.py [N_PASSES]
Results recorded in docs/architecture.md + BENCH_DETAIL.json context.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

RES = pathlib.Path(__file__).parent.parent / 'tests/resources'
PAGE = RES / '170025120000003,0074.jpg'
MODEL = RES / 'blla_small.safetensors'


def _link_sample():
    import bench
    return {'roundtrip_ms': round(bench._tunnel_roundtrip_ms(), 1),
            'up_mbps': round(bench._tunnel_upload_mbps(), 1)}


def _prepare(prec):
    from kraken_tpu.configs import SegmentationInferenceConfig
    from kraken_tpu.models import load_models
    model = load_models(str(MODEL))[0]
    from kraken_tpu.inference.segmentation import prepare_segmentation
    prepare_segmentation(model, SegmentationInferenceConfig(
        precision='bf16', heatmap_precision=prec, input_transfer='uint8'))
    return model


def _preup_model():
    """uint8 pre-upsample variant: the jitted forward returns the sigmoid
    at the network's native output resolution; a wrapper upsamples on the
    host with cv2 bilinear before the normal vectorize path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import cv2
    model = _prepare('float32')
    net = model.net
    dtype = model._m_dtype

    def fwd_lowres(params, x, seq_lens=None):
        x = (x.astype(jnp.float32) / 255.0).astype(dtype)
        logits, _ = net.apply(params, x, seq_lens)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        return jnp.round(probs * 255).astype(jnp.uint8)

    jfwd = jax.jit(fwd_lowres)

    true_down = []

    def seg_fwd(params, x, out_h, out_w, seq_lens=None):
        low = np.asarray(jfwd(params, x, seq_lens))
        true_down.append(low.nbytes)
        n, c, h, w = low.shape
        up = np.empty((n, c, out_h, out_w), np.float32)
        for i in range(n):
            for j in range(c):
                up[i, j] = cv2.resize(low[i, j], (out_w, out_h),
                                      interpolation=cv2.INTER_LINEAR)
        return up / 255.0

    model._seg_fwd = seg_fwd
    model._seg_fused_channels = ()   # ridge runs on host in this variant
    model._seg_transfer = 'preup-study'
    return model, true_down


def measure(model, im, passes, true_down=None):
    """true_down: the pre-upsample variant returns a host array, which the
    generic telemetry hook would mis-account (it never crossed the link) —
    its actual device download is tallied by the injected forward instead."""
    from kraken_tpu.inference.segmentation import segmentation_pred
    from kraken_tpu.lib import telemetry
    seg = segmentation_pred(model, im)  # warm compile + host caches
    if true_down is not None:
        true_down.clear()
    best = float('inf')
    with telemetry.collect() as xfer:
        for _ in range(passes):
            t0 = time.perf_counter()
            seg = segmentation_pred(model, im)
            best = min(best, time.perf_counter() - t0)
    down = (sum(true_down) if true_down is not None
            else xfer.down_bytes) / passes
    return seg, best * 1000, down


def agreement(ref, seg):
    """Share of reference baselines reproduced exactly plus counts."""
    a = {tuple(map(tuple, l.baseline)) for l in ref.lines}
    b = {tuple(map(tuple, l.baseline)) for l in seg.lines}
    return {'exact_match': round(len(a & b) / max(len(a), 1), 3),
            'ref_lines': len(a), 'lines': len(b)}


def main():
    from PIL import Image
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    im = Image.open(PAGE)
    im.load()

    rows = {}
    ref_seg = None
    for name in ('float32', 'uint8', 'packbits', 'pre-upsample-uint8'):
        link = _link_sample()
        true_down = None
        if name == 'pre-upsample-uint8':
            model, true_down = _preup_model()
        else:
            model = _prepare(name)
        seg, wall_ms, down = measure(model, im, passes, true_down)
        if ref_seg is None:
            ref_seg = seg
        rows[name] = {'wall_ms': round(wall_ms, 1),
                      'down_bytes_per_page': int(down),
                      'agreement_vs_float32': agreement(ref_seg, seg),
                      'link_at_start': link}
        print(json.dumps({name: rows[name]}), flush=True)
    print(json.dumps({'table': rows}))


if __name__ == '__main__':
    main()
