"""
Per-stage profile of the neural segment+ocr pipeline on the current device:
U-Net forward + heatmap transfer, host vectorization (ridge/skeleton/link),
polygonization (seam carving), line extraction, and batched recognition.
Feeds the stage decomposition recorded in bench.py's e2e leg.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(device_vectorize=False):
    from PIL import Image
    import bench as benchmod
    from kraken_tpu.configs import (RecognitionInferenceConfig,
                                    SegmentationInferenceConfig)
    from kraken_tpu.models import load_models
    from kraken_tpu.inference import segmentation as seg_mod
    from kraken_tpu.inference.segmentation import (_compute_segmentation_map,
                                                   prepare_segmentation,
                                                   segmentation_pred,
                                                   vec_lines, vec_regions)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    im = Image.open(os.path.join(repo, 'tests/resources/170025120000003,0074.jpg'))
    im.load()
    seg_model = load_models(os.path.join(repo, 'tests/resources/blla_small.safetensors'))[0]
    prepare_segmentation(seg_model, SegmentationInferenceConfig(
        precision='bf16', heatmap_precision='uint8',
        device_vectorize=device_vectorize))

    def best_of(f, n=3):
        b = float('inf')
        for _ in range(n):
            t = time.perf_counter()
            r = f()
            b = min(b, time.perf_counter() - t)
        return b, r

    # stage 1: U-Net forward + heatmap transfer (includes host resize)
    rets = _compute_segmentation_map(seg_model, im)  # warm/compile
    t_heat, rets = best_of(lambda: _compute_segmentation_map(seg_model, im))

    # stage 2+3: vectorize + polygonize
    config = seg_model._inf_config
    regions = vec_regions(**rets)
    t_vecreg, regions = best_of(lambda: vec_regions(**rets))

    from kraken_tpu.lib.geometry import scale_regions
    line_regs = [r for regs in regions.values() for r in regs]
    line_regs = scale_regions([x.boundary for x in line_regs], tuple(1 / rets['scale']))

    def _lines():
        return vec_lines(**rets, regions=line_regs,
                         text_direction='horizontal-lr',
                         topline=False,
                         device_vectorize=device_vectorize)
    lines = _lines()
    t_veclines, lines = best_of(_lines)

    # isolate the ridge+skeleton+link part from polygonization: time
    # vectorize_lines alone
    from kraken_tpu.lib.vectorization import vectorize_lines
    from kraken_tpu.lib.fastfilters import maximum_filter
    cls_map = rets['cls_map']
    st = cls_map['aux']['_start_separator']
    en = cls_map['aux']['_end_separator']
    heat = rets['heatmap']
    sep_filters = (maximum_filter(heat[st], 20), maximum_filter(heat[en], 20))
    idx = list(cls_map['baselines'].values())[0]
    ridge_fn = None
    if device_vectorize:
        from kraken_tpu.ops.ridge import sato_ridge_device
        ridge_fn = sato_ridge_device
    t_vec, _ = best_of(lambda: vectorize_lines(heat[(st, en, idx), :, :],
                                               ridge_fn=ridge_fn,
                                               sep_filters=sep_filters))

    # stage 4: full page segmentation (sanity: sum of parts)
    t_seg_total, seg = best_of(lambda: segmentation_pred(seg_model, im))

    # stage 5: recognition with the flagship model
    rec_model = benchmod._flagship_model()
    rec_model.prepare_for_inference(RecognitionInferenceConfig(
        batch_size=32, num_line_workers=1, precision='bf16',
        input_transfer='uint8'))
    recs = list(rec_model.predict(im, seg))  # warm
    t_rec, recs = best_of(lambda: list(rec_model.predict(im, seg)))

    # recognition sub-stages: extraction vs device
    from kraken_tpu.lib.geometry import extract_polygons
    t_extract, _ = best_of(lambda: [next(extract_polygons(im, seg.__class__(
        **{**seg.__dict__, 'lines': [ln]}))) for ln in seg.lines[:10]])

    print(f'device_vectorize={device_vectorize}')
    print(f'  unet_forward+heatmap_transfer_ms {t_heat*1000:8.1f}')
    print(f'  vec_regions_ms                   {t_vecreg*1000:8.1f}')
    print(f'  vectorize_lines_ms               {t_vec*1000:8.1f}')
    print(f'  vec_lines_total_ms (incl poly)   {t_veclines*1000:8.1f}')
    print(f'  polygonize_ms (diff)             {(t_veclines-t_vec)*1000:8.1f}')
    print(f'  segmentation_total_ms            {t_seg_total*1000:8.1f}')
    print(f'  extract_10_lines_ms              {t_extract*1000:8.1f}')
    print(f'  recognition_ms ({len(recs)} lines)      {t_rec*1000:8.1f}')
    print(f'  e2e est ms                       {(t_seg_total+t_rec)*1000:8.1f}')


if __name__ == '__main__':
    main(device_vectorize='--device-vectorize' in sys.argv)
