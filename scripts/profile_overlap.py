"""
Overlap diagnosis for the neural e2e pipeline: wall vs main-process CPU time
over an 8-page steady run, plus per-page emission intervals. If wall >> CPU
the pipeline is waiting (overlap headroom); if wall ~= CPU the 1-core host
is compute-bound and only device/tunnel wait can be hidden.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_pages=8):
    import bench as benchmod
    from PIL import Image
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
        precision='bf16', heatmap_precision='uint8'))
    rec_model = benchmod._flagship_model()
    rec_model.prepare_for_inference(RecognitionInferenceConfig(
        batch_size=32, num_line_workers=1, precision='bf16',
        input_transfer='uint8'))

    def segmenter(page):
        return segmentation_pred(seg_model, page)

    seg = segmenter(im)
    list(rec_model.predict(im, seg))  # warm
    segmentation_pred_batch(seg_model, [im, im])  # warm batch-2

    variants = {
        'per-page seg, stream': {},
        'batch-2 seg, stream': {'segmenter_batch':
                                lambda ps: segmentation_pred_batch(seg_model, ps),
                                'seg_batch': 2},
    }
    for name, kwargs in variants.items():
        for _pass in range(2):
            t0w, t0c = time.perf_counter(), time.process_time()
            emits = []
            for _im, _seg, recs in process_pages([im] * n_pages, rec_model,
                                                 segmenter, **kwargs):
                emits.append(time.perf_counter() - t0w)
            wall = time.perf_counter() - t0w
            cpu = time.process_time() - t0c
            ivals = [round(b - a, 2) for a, b in zip(emits, emits[1:])]
            print(f'{name} pass{_pass}: wall {wall:.2f}s cpu {cpu:.2f}s '
                  f'wait {wall-cpu:.2f}s emits {ivals}')


if __name__ == '__main__':
    main()
