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


if __name__ == '__main__':
    main()
