"""
Pins the driver-facing bench.py output contract: the FINAL stdout line
must be a single JSON object carrying metric/value/unit/vs_baseline plus
every leg's ratio, and must stay well inside the driver's bounded tail
capture (~2000 chars — round 3's record printed one oversized line and
the round's headline numbers vanished from the official record).
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import bench


def _fake_detail():
    """A detail blob with representative worst-case value widths (longest
    metric strings, full-precision floats, all legs present)."""
    link = {'roundtrip_ms': 2888.9, 'up_mbps': 11888.7}
    leg = {'tpu_pages_per_sec': 1234.888, 'tpu_pages_per_sec_total': 999.999,
           'torch_cpu_pages_per_sec': 0.001, 'vs_baseline': 99999.99,
           'link_at_leg_start': link,
           'steady_spread': [111.111, 99999.999],
           'transfer': {'up_mb_per_page': 99.999, 'down_mb_per_page': 99.999,
                        'up_calls': 99999, 'down_calls': 99999}}
    budget = {'per_page_ms': {
        'seg_unet_device_and_page_resize': 99999.9,
        'seg_vectorize_polygonize_host': 99999.9,
        'rec_extract_transform_host': 99999.9,
        'rec_upload_forward_download': 99999.9,
        'rec_decode_records_host': 99999.9,
        'serial_sum': 999999.9}}
    return {
        'metric': 'recognition lines/sec/chip (CNN+3xBiLSTM-200, '
                  '120x1024 lines, batch 512, pipelined)',
        'value': 123456.78, 'unit': 'lines/sec', 'vs_baseline': 99999.99,
        'train': {'vs_baseline': 99999.99},
        'e2e': {
            'flagship': {**leg, 'stage_budget': {'per_page_ms': {
                'pageseg_host': 99999.9,
                'rec_extract_transform_host': 99999.9,
                'rec_upload_forward_download': 99999.9,
                'rec_decode_records_host': 99999.9,
                'serial_sum': 999999.9}}},
            'neural': {**leg, 'stage_budget': budget},
            'cer_parity': {**leg, 'tpu_cer_vs_golden': 0.9999,
                           'torch_cer_vs_golden': 0.9999},
            'sustained': {'pages_per_sec': 99999.999,
                          'adjacent_single_page_steady': 99999.999,
                          'vs_adjacent_single_page': 99999.999,
                          'link_at_leg_start': link}}}


def test_compact_summary_fits_driver_tail():
    line = json.dumps(bench.compact_summary(_fake_detail()))
    assert len(line) < 1500, f'final bench line too long: {len(line)} chars'


def test_compact_summary_carries_required_keys():
    s = bench.compact_summary(_fake_detail())
    assert {'metric', 'value', 'unit', 'vs_baseline'} <= set(s)
    assert set(s['legs_vs_torch_cpu_baseline']) == {
        'train_ctc_step', 'e2e_flagship', 'e2e_neural_seg_ocr',
        'e2e_cer_parity'}
    assert set(s['tpu_pages_per_sec']) == {'flagship', 'neural',
                                           'sustained_100pg_pdf',
                                           'sustained_vs_adjacent_single'}
    assert set(s['link_up_mbps_per_leg']) == {'cer_parity', 'flagship',
                                              'neural', 'sustained'}
    # one JSON object, parseable round trip
    assert json.loads(json.dumps(s)) == s
