"""
Supplementary benchmark: full single-page segment+ocr wall-clock through the
production pipeline (legacy bitonal segmenter + batched TPU recognition) on
the tests/resources corpus. The driver-facing benchmark is bench.py; this
script tracks the end-to-end page path (BASELINE.md "single-page
segment+ocr" target).

Prints one JSON line {"metric", "value", "unit", "breakdown"}.
"""
import json
import time

from PIL import Image

N_PAGES = 5


def main():
    from kraken_tpu.configs import RecognitionInferenceConfig
    from kraken_tpu.models import load_models
    from kraken_tpu.pageseg import segment

    im = Image.open('tests/resources/bw.png')
    im.load()
    model = load_models('tests/resources/overfit.mlmodel')[0]
    model.prepare_for_inference(RecognitionInferenceConfig(batch_size=32,
                                                           num_line_workers=2,
                                                           precision='bf16'))
    # warm: compile the recognition buckets
    seg = segment(im)
    list(model.predict(im, seg))

    t_seg = t_ocr = 0.0
    n_lines = 0
    start = time.perf_counter()
    for _ in range(N_PAGES):
        t0 = time.perf_counter()
        seg = segment(im)
        t_seg += time.perf_counter() - t0
        t0 = time.perf_counter()
        records = list(model.predict(im, seg))
        t_ocr += time.perf_counter() - t0
        n_lines += len(records)
    elapsed = time.perf_counter() - start

    print(json.dumps({
        'metric': 'single-page segment+ocr (legacy bitonal segmenter, 30-line page)',
        'value': round(N_PAGES / elapsed, 3),
        'unit': 'pages/sec',
        'breakdown': {'segment_ms_per_page': round(1000 * t_seg / N_PAGES, 1),
                      'ocr_ms_per_page': round(1000 * t_ocr / N_PAGES, 1),
                      'lines_per_page': n_lines // N_PAGES},
    }))
    bench_neural_seg()


def bench_neural_seg():
    """Device time of the production-scale segmentation net (blla spec) on a
    1800px page: the compute half of `kraken segment -bl`."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kraken_tpu.configs import SegmentationInferenceConfig, SegmentationTrainingConfig
    from kraken_tpu.inference.segmentation import prepare_segmentation
    from kraken_tpu.vgsl import VGSLModel

    spec = SegmentationTrainingConfig().spec
    model = VGSLModel(vgsl=f'[{spec.strip()[1:-1]} O2l5]', rng=jax.random.PRNGKey(0))
    model.model_type = 'segmentation'
    model.user_metadata['class_mapping'] = {
        'aux': {'_start_separator': 0, '_end_separator': 1},
        'baselines': {'default': 2}, 'regions': {'text': 3, 'x': 4}}
    prepare_segmentation(model, SegmentationInferenceConfig(precision='bf16'))
    x = jax.device_put(jnp.asarray(
        np.random.RandomState(0).rand(1, 3, 1800, 1200), model._m_dtype), model._device)
    out = model._seg_fwd(model._inf_params, x, 1800, 1200)
    np.asarray(out)  # warm/compile
    start = time.perf_counter()
    for _ in range(4):
        out = model._seg_fwd(model._inf_params, x, 1800, 1200)
    np.asarray(out)
    dt = (time.perf_counter() - start) / 4
    print(json.dumps({
        'metric': 'neural segmentation forward (blla-scale net, 1800x1200 page)',
        'value': round(1 / dt, 2),
        'unit': 'pages/sec',
        'breakdown': {'device_ms_per_page': round(1000 * dt, 1)},
    }))


if __name__ == '__main__':
    main()
