"""
Supplementary page-level benchmark: runs the end-to-end legs of bench.py
individually (legacy segment+ocr, production-scale recognizer, neural BLLA
pipeline) on the current backend and prints one JSON line per leg. The
driver-facing benchmark with torch-CPU baselines is bench.py; this script is
for quick iteration on a single leg.

Usage: python bench_page.py [legacy|flagship|neural|all]
"""
import json
import sys

import bench


def main(which: str = 'all') -> None:
    if which in ('legacy', 'all'):
        pps, texts = bench._page_pipeline(torch_backend=False)
        print(json.dumps({'metric': 'legacy segment+ocr', 'value': round(pps, 3),
                          'unit': 'pages/sec', 'lines_per_page': len(texts)}))
    if which in ('flagship', 'all'):
        pps, _ = bench._page_pipeline(torch_backend=False, n_pages=3, flagship=True)
        print(json.dumps({'metric': 'segment+ocr, CNN+3xBiLSTM-200',
                          'value': round(pps, 3), 'unit': 'pages/sec'}))
    if which in ('neural', 'all'):
        pps, lines = bench._neural_page_pipeline(torch_backend=False)
        print(json.dumps({'metric': 'BLLA segment + CNN+3xBiLSTM-200 ocr',
                          'value': round(pps, 3), 'unit': 'pages/sec',
                          'lines_per_page': lines}))


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'all')
