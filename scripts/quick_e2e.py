"""
Lean on-chip neural segment+ocr steady-state measurement: the same
formulas as bench.py's neural leg (marginal (n-1)/(T_n - T_1), paired per
pass) plus the per-stage budget, without the torch child or the other
legs. For fast iteration on the host pipeline between full bench runs.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_pages: int = 6, passes: int = 2):
    from PIL import Image
    import bench as benchmod
    from kraken_tpu.configs import (RecognitionInferenceConfig,
                                    SegmentationInferenceConfig)
    from kraken_tpu.models import load_models
    from kraken_tpu.inference.segmentation import (prepare_segmentation,
                                                   segmentation_pred,
                                                   segmentation_pred_batch)
    from kraken_tpu.pipeline import process_pages

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    im = Image.open(os.path.join(repo, 'tests/resources/170025120000003,0074.jpg'))
    im.load()
    seg_model = load_models(os.path.join(repo, 'tests/resources/blla_small.safetensors'))[0]
    prepare_segmentation(seg_model, SegmentationInferenceConfig(
        precision='bf16', heatmap_precision='uint8',
        input_transfer='uint8'))
    rec_model = benchmod._flagship_model()
    rec_model.prepare_for_inference(RecognitionInferenceConfig(
        batch_size=32, num_line_workers=1, precision='bf16',
        input_transfer='uint8'))

    def segmenter(page):
        return segmentation_pred(seg_model, page)

    seg = segmenter(im)
    recs = list(rec_model.predict(im, seg))
    print(f'warm: {len(seg.lines)} lines, {len(recs)} records', flush=True)
    segmentation_pred_batch(seg_model, [im, im])

    kw = {'segmenter_batch': lambda ps: segmentation_pred_batch(seg_model, ps),
          'seg_batch': 2}

    def run_once(n):
        cnt = 0
        for _im, _seg, rr in process_pages([im] * n, rec_model, segmenter, **kw):
            cnt += len(rr)
        return cnt

    best_marginal = best_tn = float('inf')
    for p in range(passes):
        t0 = time.perf_counter()
        run_once(1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_once(n_pages)
        tn = time.perf_counter() - t0
        print(f'pass {p}: T1={t1:.2f}s Tn={tn:.2f}s marginal='
              f'{(tn - t1) / (n_pages - 1) * 1000:.0f} ms/page', flush=True)
        best_tn = min(best_tn, tn)
        best_marginal = min(best_marginal, tn - t1)
    steady = (n_pages - 1) / best_marginal
    print(f'steady: {steady:.3f} pages/sec ({best_marginal / (n_pages - 1) * 1000:.0f} ms/page)')

    stages = benchmod._stage_budget()
    import json
    print(json.dumps(stages, indent=1))


if __name__ == '__main__':
    main()
