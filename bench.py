"""
Benchmark: recognition throughput (lines/sec/chip) of the flagship
CNN+BiLSTM VGSL network on the current JAX device, compared against an
architecturally identical torch CPU forward pass (the reference engine's
substrate and default deployment mode — kraken publishes no benchmark
numbers of its own, see BASELINE.md).

The JAX measurement pipelines batches (async dispatch, drain at the end)
exactly like the production line-recognition engine; per-frame argmax/conf
reductions happen on device so only small label tensors cross the tunnel.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

BATCH = 512
WIDTH = 1024
HEIGHT = 120
CLASSES = 250
N_ITER = 8
TORCH_BATCH = 16


def bench_jax():
    import os

    import jax
    import jax.numpy as jnp
    # persistent XLA compile cache: repeated runs skip the cold compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    from __graft_entry__ import entry

    fwd, (params, _, _) = entry()
    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                              if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 1, HEIGHT, WIDTH), dtype)
    lens = jnp.full((BATCH,), WIDTH, jnp.int32)
    jfwd = jax.jit(fwd)
    out = jfwd(params, x, lens)
    _ = np.asarray(out[0])
    best = float('inf')
    for _ in range(3):
        start = time.perf_counter()
        outs = [jfwd(params, x, lens) for _ in range(N_ITER)]
        for o in outs:
            _ = np.asarray(o[0])
        best = min(best, time.perf_counter() - start)
    return BATCH * N_ITER / best


def _torch_refnet():
    """Architecturally identical torch module for the flagship spec."""
    import torch

    class RefNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(1, 32, (3, 13), padding=(1, 6))
            self.p1 = torch.nn.MaxPool2d(2, 2)
            self.c2 = torch.nn.Conv2d(32, 32, (3, 13), padding=(1, 6))
            self.p2 = torch.nn.MaxPool2d(2, 2)
            self.c3 = torch.nn.Conv2d(32, 64, (3, 9), padding=(1, 4))
            self.p3 = torch.nn.MaxPool2d(2, 2)
            self.c4 = torch.nn.Conv2d(64, 64, (3, 9), padding=(1, 4))
            h = HEIGHT // 8
            self.l1 = torch.nn.LSTM(64 * h, 200, bidirectional=True, batch_first=True)
            self.l2 = torch.nn.LSTM(400, 200, bidirectional=True, batch_first=True)
            self.l3 = torch.nn.LSTM(400, 200, bidirectional=True, batch_first=True)
            self.o = torch.nn.Linear(400, CLASSES)

        def forward(self, x):
            x = torch.relu(self.c1(x))
            x = self.p1(x)
            x = torch.relu(self.c2(x))
            x = self.p2(x)
            x = torch.relu(self.c3(x))
            x = self.p3(x)
            x = torch.relu(self.c4(x))
            n, c, h, w = x.shape
            x = x.permute(0, 3, 1, 2).reshape(n, w, c * h)
            x, _ = self.l1(x)
            x, _ = self.l2(x)
            x, _ = self.l3(x)
            return self.o(x)

    return RefNet()


def bench_torch_cpu():
    """Reference-equivalent torch CPU forward on the same shapes."""
    import torch

    net = _torch_refnet().eval()
    x = torch.rand(TORCH_BATCH, 1, HEIGHT, WIDTH)
    with torch.inference_mode():
        net(x[:2, :, :, :128])  # warmup
        # best of 5: favors the baseline (conservative speedup claim) and
        # shields the single-core host's scheduling noise, which swings 2x+
        # between runs on this shared dev box
        best = float('inf')
        for _ in range(5):
            start = time.perf_counter()
            net(x)
            best = min(best, time.perf_counter() - start)
    return TORCH_BATCH / best


def _flagship_model():
    """Production-scale recognizer (the catmus-print class CNN+3xBiLSTM-200
    architecture) with deterministic weights and a synthetic 250-label codec;
    both backends rebuild the identical model from PRNGKey(0)."""
    import jax
    from kraken_tpu.codec import Codec
    from kraken_tpu.vgsl import VGSLModel
    from __graft_entry__ import FLAGSHIP_SPEC

    model = VGSLModel(vgsl=FLAGSHIP_SPEC, rng=jax.random.PRNGKey(0))
    model.add_codec(Codec([chr(0x0900 + i) for i in range(249)]))
    model.model_type = ['recognition']
    model.seg_type = 'bbox'
    return model


def _steady_throughput(run_once, n_pages: int, passes: int = 3):
    """
    Pages/sec measured two ways: `steady` is the marginal throughput
    (n-1) / (T_n - T_1) — wall time of an n-page run minus a 1-page run,
    i.e. the per-page cost with pipeline-fill latency amortized out, which
    is what a long document converges to. `total` is the fill-inclusive
    n / T_n. Both backends use the identical formula; end-to-end wall
    times are burst-robust (per-page emission intervals are not, because
    the streaming engine drains several pages at once). T_1 and T_n are
    PAIRED per pass and the best difference taken: the host's scheduling
    noise swings 2-3x between minutes, and an unpaired best-T_1 minus a
    noise-hit best-T_n poisons the marginal upward (observed: a stall in
    one 8-page pass inflating the round-2 steady numbers ~40%).

    Returns (steady, total, meta) where meta carries the per-pass
    marginal-throughput spread (so readers can tell noise from signal)
    and the measured bytes-up/down per page crossing the device boundary.
    """
    from kraken_tpu.lib import telemetry
    best_tn = best_marginal = float('inf')
    marginals = []
    with telemetry.collect() as xfer:
        for _ in range(passes):
            t0 = time.perf_counter()
            run_once(1)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_once(n_pages)
            tn = time.perf_counter() - t0
            best_tn = min(best_tn, tn)
            marginal = tn - t1
            best_marginal = min(best_marginal, marginal)
            if marginal > 0:
                marginals.append((n_pages - 1) / marginal)
    total = n_pages / best_tn
    steady = (n_pages - 1) / best_marginal if best_marginal > 0 else total
    meta = {'steady_spread': [round(min(marginals), 3), round(max(marginals), 3)]
            if marginals else None,
            'transfer': xfer.as_dict(pages=passes * (n_pages + 1))}
    return steady, total, meta


def _page_pipeline(torch_backend: bool, n_pages: int = 5, flagship: bool = False):
    """
    Full single-page segment+ocr through the production pipeline (legacy
    bitonal segmenter + batched recognition) on tests/resources/bw.png,
    identical host path for both backends; only the per-batch network
    forward differs (jitted TPU vs torch CPU — the reference engine's
    substrate). Returns (pages_per_sec, {line_idx: text}).
    """
    import os
    import sys
    from PIL import Image
    from kraken_tpu.configs import RecognitionInferenceConfig
    from kraken_tpu.models import load_models
    from kraken_tpu.pageseg import segment

    repo = os.path.dirname(os.path.abspath(__file__))
    im = Image.open(os.path.join(repo, 'tests/resources/bw.png'))
    im.load()
    if flagship:
        model = _flagship_model()
    else:
        model = load_models(os.path.join(repo, 'tests/resources/overfit.mlmodel'))[0]
    # one extraction thread: measured fastest on this 1-core host (a second
    # worker adds contention; multi-core TPU-VMs want more)
    config = RecognitionInferenceConfig(
        batch_size=32, num_line_workers=1,
        # flagship leg: production bf16; CER-parity leg: fp32 (the caller
        # additionally scopes jax.default_matmul_precision('highest') so the
        # TPU decode is digit-exact against the torch fp32 golden)
        precision='bf16' if flagship and not torch_backend else '32-true',
        # production link config for the flagship leg: packed-atlas byte
        # uploads strip both the float width and the bucket/batch padding
        # from the wire (bit-identical activations, tests/test_rpred.py).
        # The CER-parity leg keeps full-precision transfers.
        input_transfer='packed' if flagship and not torch_backend else 'float',
        # depth-2 device pipeline on the TPU flagship leg: two undecoded
        # batches in flight keep the wire busy across page boundaries
        # (steady 1.92 vs 1.25 pages/s at depth 1, same link minute)
        device_pipeline_depth=2 if flagship and not torch_backend else 1)
    model.prepare_for_inference(config)
    if torch_backend:
        sys.path.insert(0, os.path.join(repo, 'scripts'))
        from torch_ref import torch_recognizer
        torch_fwd = torch_recognizer(model)

        def fwd(params, x, seq_lens, temperature):
            return torch_fwd(np.asarray(x), np.asarray(seq_lens),
                             float(temperature))
        model._rec_fwd = fwd

    from kraken_tpu.pipeline import process_pages

    seg = segment(im)
    records = list(model.predict(im, seg))  # warm: compile/trace all buckets
    texts = {i: r.prediction for i, r in enumerate(records)}

    # steady-state streaming throughput: host segmentation of upcoming pages
    # overlaps recognition of the current one (kraken_tpu.pipeline)
    def run_once(n):
        done = 0
        for _im, _seg, recs in process_pages([im] * n, model, segment):
            done += len(recs)
        assert done == n * len(texts)

    steady, total, meta = _steady_throughput(run_once, n_pages)
    return steady, total, texts, meta


def _neural_page_pipeline(torch_backend: bool, n_pages: int = 3):
    """
    Modern production pipeline: neural BLLA segmentation (the frozen
    blla_small fixture, docs/SEG_PARITY.md) + flagship recognition on the
    annotated test page. Host vectorization/polygonization is identical for
    both backends; the U-Net and CNN+BiLSTM forwards run on the TPU or as
    the weight-identical torch CPU mirror.
    """
    import os
    import sys
    from PIL import Image
    from kraken_tpu.configs import (RecognitionInferenceConfig,
                                    SegmentationInferenceConfig)
    from kraken_tpu.models import load_models
    from kraken_tpu.inference.segmentation import (prepare_segmentation,
                                                   segmentation_pred)
    from kraken_tpu.pipeline import process_pages

    repo = os.path.dirname(os.path.abspath(__file__))
    im = Image.open(os.path.join(repo, 'tests/resources/170025120000003,0074.jpg'))
    im.load()
    seg_model = load_models(os.path.join(repo, 'tests/resources/blla_small.safetensors'))[0]
    # uint8 transfer options: production config for remote/tunneled TPU
    # links (quantizes heatmaps, line batches, and page tensors on device;
    # parity-tested)
    prepare_segmentation(seg_model, SegmentationInferenceConfig(
        precision='32-true' if torch_backend else 'bf16',
        heatmap_precision='float32' if torch_backend else 'auto',
        input_transfer='float' if torch_backend else 'uint8'))
    rec_model = _flagship_model()
    rec_model.prepare_for_inference(RecognitionInferenceConfig(
        batch_size=32, num_line_workers=1,
        precision='32-true' if torch_backend else 'bf16',
        input_transfer='float' if torch_backend else 'packed',
        # depth-2 pipeline keeps the tunnel busy across page boundaries
        # (same rationale/measurement as the flagship and sustained legs)
        device_pipeline_depth=1 if torch_backend else 2))
    if torch_backend:
        import torch
        sys.path.insert(0, os.path.join(repo, 'scripts'))
        from torch_ref import TorchVGSLRef, torch_recognizer

        seg_ref = TorchVGSLRef(seg_model).eval()

        def seg_fwd(params, x, out_h, out_w):
            with torch.inference_mode():
                logits = seg_ref(torch.from_numpy(np.ascontiguousarray(x, np.float32)))
                probs = torch.sigmoid(torch.nn.functional.interpolate(
                    logits.float(), size=(out_h, out_w), mode='bilinear',
                    align_corners=False))
            return probs.numpy()
        seg_model._seg_fwd = seg_fwd

        torch_fwd = torch_recognizer(rec_model)

        def rec_fwd(params, x, seq_lens, temperature):
            return torch_fwd(np.asarray(x), np.asarray(seq_lens), float(temperature))
        rec_model._rec_fwd = rec_fwd

    def segmenter(page):
        return segmentation_pred(seg_model, page)

    pipe_kwargs = {}
    if not torch_backend:
        # page-batched U-Net: one dispatch per page pair amortizes the
        # per-dispatch tunnel latency (the torch mirror's custom _seg_fwd
        # is per-page; its fill fraction is negligible at its page cost)
        from kraken_tpu.inference.segmentation import segmentation_pred_batch
        pipe_kwargs = {'segmenter_batch':
                       lambda ps: segmentation_pred_batch(seg_model, ps),
                       'seg_batch': 2}

    seg = segmenter(im)
    list(rec_model.predict(im, seg))  # warm
    if pipe_kwargs:
        pipe_kwargs['segmenter_batch']([im, im])  # warm the batch-2 shape
    lines_holder = [0]

    def run_once(n):
        lines_holder[0] = 0
        for _im, _seg, recs in process_pages([im] * n, rec_model, segmenter,
                                             **pipe_kwargs):
            lines_holder[0] += len(recs)

    steady, total, meta = _steady_throughput(run_once, n_pages)
    return steady, total, lines_holder[0] // n_pages, meta


def _build_scanned_pdf(jpeg_path: str, n_pages: int, out_path: str) -> None:
    """Assembles a minimal scanned PDF (classic xref, one DCTDecode image
    XObject shared by all pages) — the bench document for the sustained
    leg, consumed through kraken_tpu.lib.pdf like any user PDF."""
    from PIL import Image
    with open(jpeg_path, 'rb') as fp:
        jpeg = fp.read()
    with Image.open(jpeg_path) as im:
        w, h = im.size
    objs = {}
    kids = ' '.join(f'{3 + i} 0 R' for i in range(n_pages))
    objs[1] = b'<< /Type /Catalog /Pages 2 0 R >>'
    objs[2] = (f'<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>').encode()
    img_num = 3 + n_pages
    for i in range(n_pages):
        objs[3 + i] = (f'<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] '
                       f'/Resources << /XObject << /Im0 {img_num} 0 R >> >> '
                       '>>').encode()
    img_body = (f'<< /Type /XObject /Subtype /Image /Width {w} /Height {h} '
                f'/ColorSpace /DeviceRGB /BitsPerComponent 8 '
                f'/Filter /DCTDecode /Length {len(jpeg)} >>').encode() \
        + b'\nstream\n' + jpeg + b'\nendstream'
    out = bytearray(b'%PDF-1.4\n%\xe2\xe3\xcf\xd3\n')
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f'{num} 0 obj\n'.encode() + objs[num] + b'\nendobj\n'
    offsets[img_num] = len(out)
    out += f'{img_num} 0 obj\n'.encode() + img_body + b'\nendobj\n'
    xref_at = len(out)
    out += f'xref\n0 {img_num + 1}\n'.encode() + b'0000000000 65535 f \n'
    for num in range(1, img_num + 1):
        out += f'{offsets[num]:010d} 00000 n \n'.encode()
    out += (f'trailer\n<< /Size {img_num + 1} /Root 1 0 R >>\n'
            f'startxref\n{xref_at}\n%%EOF\n').encode()
    with open(out_path, 'wb') as fp:
        fp.write(bytes(out))


def _sustained_pipeline(n_pages: int = 100):
    """
    BASELINE.md "page pipeline" target leg: pages/sec over a 100-page PDF
    through the full neural segment+ocr streaming pipeline, fill-inclusive
    single pass — what a 100-page scanned document actually takes
    (validates sustained throughput: no jit-cache churn, queue growth, or
    memory creep, plus real per-page PDF extraction + JPEG decode via
    kraken_tpu.lib.pdf — no pyvips/PyMuPDF needed). Pages replicate the
    annotated fixture page: the frozen blla_small seg model is only
    trained for that page's domain — on out-of-domain pages it emits 3-4x
    spurious baselines whose polygonization measures model blindness, not
    pipeline throughput.
    """
    import os
    import tempfile
    from PIL import Image
    from kraken_tpu.configs import (RecognitionInferenceConfig,
                                    SegmentationInferenceConfig)
    from kraken_tpu.lib.pdf import extract_page_images_lazy
    from kraken_tpu.models import load_models
    from kraken_tpu.inference.segmentation import (prepare_segmentation,
                                                   segmentation_pred,
                                                   segmentation_pred_batch)
    from kraken_tpu.pipeline import process_pages

    repo = os.path.dirname(os.path.abspath(__file__))
    ims = [Image.open(os.path.join(repo, 'tests/resources',
                                   '170025120000003,0074.jpg'))]
    ims[0].load()
    seg_model = load_models(os.path.join(repo, 'tests/resources/blla_small.safetensors'))[0]
    prepare_segmentation(seg_model, SegmentationInferenceConfig(
        precision='bf16', heatmap_precision='auto',
        input_transfer='uint8'))
    rec_model = _flagship_model()
    # depth-2 device pipeline: two undecoded batches in flight lengthen the
    # GIL-released windows the prefetch pool decodes/segments inside —
    # measured 1.705 vs 1.378 pps at depth 1 on the 24-page probe
    # (/tmp sweep, round 5), which is what lets the 100-page stream beat
    # the single-page steady state despite paying per-page JPEG decode
    rec_model.prepare_for_inference(RecognitionInferenceConfig(
        batch_size=32, num_line_workers=1, precision='bf16',
        input_transfer='packed', device_pipeline_depth=2))

    def segmenter(page):
        return segmentation_pred(seg_model, page)

    prefetch, seg_batch = 4, 3
    # warm every page shape (compile cache) outside the timed pass
    for im in ims:
        seg = segmenter(im)
        list(rec_model.predict(im, seg))
    segmentation_pred_batch(seg_model, [ims[0]] * 2)
    segmentation_pred_batch(seg_model, [ims[0]] * seg_batch)

    pdf_path = os.path.join(tempfile.mkdtemp(), 'bench_document.pdf')
    _build_scanned_pdf(os.path.join(repo, 'tests/resources',
                                    '170025120000003,0074.jpg'),
                       n_pages, pdf_path)
    from kraken_tpu.lib import telemetry

    # adjacent single-page comparator: the tunnel bandwidth swings 2-10x
    # between minutes and both legs are wire-bound, so "sustained vs
    # single-page" is only meaningful against a single-page steady state
    # measured seconds (not minutes) apart — the neural leg's own number
    # runs several minutes earlier
    def _probe_once(n):
        for _ in process_pages(ims * n, rec_model,
                               segmenter,
                               segmenter_batch=lambda ps:
                               segmentation_pred_batch(seg_model, ps),
                               seg_batch=2):
            pass
    # best-of-2 PAIRED marginals (the _steady_throughput discipline): a
    # single tunnel stall inside one unpaired pass poisons the number
    best_marginal = float('inf')
    for _ in range(2):
        t0 = time.perf_counter(); _probe_once(1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); _probe_once(5); t5 = time.perf_counter() - t0
        best_marginal = min(best_marginal, max(t5 - t1, 1e-9))
    adjacent_single = 4 / best_marginal

    lines = 0
    n_seen = 0
    t0 = time.perf_counter()
    # lazy page thunks: PDF parsing + JPEG decode run inside the prefetch
    # pool (overlapping the recognizer's device waits) instead of stalling
    # the page consumer — `prefetch` page groups are decoded+segmented ahead
    with telemetry.collect() as xfer:
        for _im, _seg, recs in process_pages(
                extract_page_images_lazy(pdf_path), rec_model, segmenter,
                prefetch=prefetch,
                segmenter_batch=lambda ps: segmentation_pred_batch(seg_model, ps),
                seg_batch=seg_batch):
            lines += len(recs)
            n_seen += 1
    wall = time.perf_counter() - t0
    os.unlink(pdf_path)
    assert n_seen == n_pages, f'PDF pipeline dropped pages: {n_seen}/{n_pages}'
    return {'metric': f'{n_pages}-page scanned PDF, neural segment+ocr, '
                      'single pass incl. PDF extraction and pipeline fill',
            'pages_per_sec': round(n_pages / wall, 3),
            'adjacent_single_page_steady': round(adjacent_single, 3),
            'vs_adjacent_single_page': round(n_pages / wall / adjacent_single, 3),
            'lines_per_sec': round(lines / wall, 1),
            'total_lines': lines,
            'wall_s': round(wall, 1),
            'pipeline_depth': {'prefetch_groups': prefetch,
                               'seg_batch': seg_batch,
                               'page_decode': 'lazy (in prefetch pool)'},
            'transfer': xfer.as_dict(pages=n_pages)}


TRAIN_BATCH = 128
TRAIN_LABELS = 40
TORCH_TRAIN_BATCH = 8


def bench_train_jax():
    """
    Jitted CTC training step (AdamW) of the flagship recognizer on the
    current device — BASELINE config #5's recognition-training leg.
    Returns lines/sec of training throughput.
    """
    import jax
    import jax.numpy as jnp
    from kraken_tpu.configs import RecognitionTrainingConfig
    from kraken_tpu.parallel import make_train_step
    from kraken_tpu.train.optim import build_optimizer
    from kraken_tpu.vgsl import VGSLModel
    from __graft_entry__ import FLAGSHIP_SPEC

    model = VGSLModel(vgsl=FLAGSHIP_SPEC, rng=jax.random.PRNGKey(0))
    tx = build_optimizer(RecognitionTrainingConfig(lrate=1e-4, warmup=0,
                                                   optimizer='AdamW'))
    step = make_train_step(model.net, tx, loss='ctc')  # jitted inside
    rng = np.random.RandomState(0)
    batch = {
        'image': jnp.asarray(rng.rand(TRAIN_BATCH, 1, HEIGHT, WIDTH), jnp.float32),
        'seq_lens': jnp.full((TRAIN_BATCH,), WIDTH, jnp.int32),
        'target': jnp.asarray(rng.randint(1, CLASSES, (TRAIN_BATCH, TRAIN_LABELS)), jnp.int32),
        'target_lens': jnp.full((TRAIN_BATCH,), TRAIN_LABELS, jnp.int32),
    }
    params = model.params
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)
    params, opt_state, loss = step(params, opt_state, batch, key)  # compile
    float(loss)  # block_until_ready does not synchronize on the axon backend
    best = float('inf')
    for _ in range(3):
        start = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, batch, key)
        value = float(loss)
        best = min(best, time.perf_counter() - start)
    assert np.isfinite(value)
    return TRAIN_BATCH / best


def bench_train_torch():
    """Reference-substrate baseline: one fwd+bwd+AdamW CTC training step of
    the architecturally identical torch net on CPU."""
    import torch
    net = _torch_refnet()
    opt = torch.optim.AdamW(net.parameters(), lr=1e-4)
    crit = torch.nn.CTCLoss(zero_infinity=True)
    x = torch.rand(TORCH_TRAIN_BATCH, 1, HEIGHT, WIDTH)
    tgt = torch.randint(1, CLASSES, (TORCH_TRAIN_BATCH, TRAIN_LABELS))
    in_lens = torch.full((TORCH_TRAIN_BATCH,), WIDTH // 8, dtype=torch.long)
    tgt_lens = torch.full((TORCH_TRAIN_BATCH,), TRAIN_LABELS, dtype=torch.long)

    def one_step():
        opt.zero_grad()
        logits = net(x)                       # (N, W/8, C)
        logp = torch.nn.functional.log_softmax(logits, dim=2).permute(1, 0, 2)
        loss = crit(logp, tgt, in_lens, tgt_lens)
        loss.backward()
        opt.step()

    one_step()  # warm
    best = float('inf')
    for _ in range(2):
        start = time.perf_counter()
        one_step()
        best = min(best, time.perf_counter() - start)
    return TORCH_TRAIN_BATCH / best


def _cer(texts: dict, golden: dict) -> float:
    from kraken_tpu.train.metrics import levenshtein
    errs = sum(levenshtein(texts.get(int(k), ''), v) for k, v in golden.items())
    chars = sum(len(v) for v in golden.values())
    return errs / max(chars, 1)


def _golden_path():
    import os
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'tests/resources/bw_page_golden.json')


def e2e_torch_child():
    """Child entry (JAX_PLATFORMS=cpu): torch-CPU e2e pipeline + CER."""
    pps, pps_total, texts, _ = _page_pipeline(torch_backend=True)
    with open(_golden_path()) as fp:
        golden = json.load(fp)
    pps_flag, _, _, _ = _page_pipeline(torch_backend=True, n_pages=3,
                                       flagship=True)
    pps_neural, _, lines, _ = _neural_page_pipeline(torch_backend=True)
    print(json.dumps({'pages_per_sec': pps, 'cer': _cer(texts, golden),
                      'flagship_pages_per_sec': pps_flag,
                      'neural_pages_per_sec': pps_neural,
                      'neural_lines_per_page': lines}))


def make_golden():
    """Regenerates the pinned page transcription from the fp32 CPU pipeline."""
    _, _, texts, _ = _page_pipeline(torch_backend=True, n_pages=1)
    with open(_golden_path(), 'w') as fp:
        json.dump({str(k): v for k, v in texts.items()}, fp, ensure_ascii=False)
    print(f'wrote {_golden_path()} ({len(texts)} lines)')


def _stage_budget():
    """
    Measured per-stage budget of the neural segment+ocr path on the current
    device — the decomposition the steady-state pages/sec must explain.

    Every pass times ALL sub-stages sequentially on the SAME data, so each
    component is a direct wall-time measurement and the serial sum is the
    sum of the components of the winning pass BY CONSTRUCTION. (Round 3
    derived the host-vectorize stage as best-of(seg_total) − best-of(unet)
    from two independently best-of'd measurements; under tunnel noise
    best-of(A+B) < best-of(A) and the official record captured −175.5 ms.)
    The winning pass additionally cross-checks against an independently
    timed full `segmentation_pred` wall (`seg_serial_check`).
    """
    import os
    from PIL import Image
    from kraken_tpu.configs import (RecognitionInferenceConfig,
                                    SegmentationInferenceConfig)
    from kraken_tpu.models import load_models
    from kraken_tpu.inference import recognition as R
    from kraken_tpu.inference.segmentation import (_compute_segmentation_map,
                                                   _vectorize_page,
                                                   prepare_segmentation,
                                                   segmentation_pred)

    repo = os.path.dirname(os.path.abspath(__file__))
    im = Image.open(os.path.join(repo, 'tests/resources/170025120000003,0074.jpg'))
    im.load()
    seg_model = load_models(os.path.join(repo, 'tests/resources/blla_small.safetensors'))[0]
    prepare_segmentation(seg_model, SegmentationInferenceConfig(
        precision='bf16', heatmap_precision='auto',
        input_transfer='uint8'))
    rec_model = _flagship_model()
    rec_model.prepare_for_inference(RecognitionInferenceConfig(
        batch_size=32, num_line_workers=1, precision='bf16',
        input_transfer='packed'))

    _ = _compute_segmentation_map(seg_model, im)   # warm seg forward
    seg = segmentation_pred(seg_model, im)         # warm host vectorize
    list(rec_model.predict(im, seg))               # warm rec buckets

    def dispatch_all(lines):
        outs = []
        cfg_bs = rec_model._inf_config.batch_size
        for i in range(0, len(lines), cfg_bs):
            outs.append(R._dispatch_batch(rec_model, lines[i:i + cfg_bs]))
        for out, _ in outs:
            _ = np.asarray(out[1])
        return outs

    passes = []
    for _ in range(3):
        marks = [time.perf_counter()]
        rets = _compute_segmentation_map(seg_model, im)
        marks.append(time.perf_counter())
        seg_p = _vectorize_page(seg_model, im, rets)
        marks.append(time.perf_counter())
        entries = list(R._produce_entries(rec_model, im, seg_p))
        marks.append(time.perf_counter())
        lines = [p for k, _, p in entries if k == 'line']
        outs = dispatch_all(lines)
        marks.append(time.perf_counter())
        for o, ls in outs:
            list(R._decode_batch_results(rec_model, o, ls))
        marks.append(time.perf_counter())
        passes.append([1000 * (b - a) for a, b in zip(marks, marks[1:])])
    best = min(passes, key=sum)
    assert all(v >= 0 for v in best), f'negative stage in budget: {best}'
    unet_ms, vect_ms, produce_ms, device_ms, decode_ms = best
    # independent cross-check: a full segmentation_pred call should take
    # about unet+vectorize (same code path; tolerance covers host noise)
    seg_wall = min(_timed(lambda: segmentation_pred(seg_model, im))
                   for _ in range(3)) * 1000
    check_ok = seg_wall <= (unet_ms + vect_ms) * 1.5 + 100 and \
        (unet_ms + vect_ms) <= seg_wall * 1.5 + 100
    return {
        'per_page_ms': {
            'seg_unet_device_and_page_resize': round(unet_ms, 1),
            'seg_vectorize_polygonize_host': round(vect_ms, 1),
            'rec_extract_transform_host': round(produce_ms, 1),
            'rec_upload_forward_download': round(device_ms, 1),
            'rec_decode_records_host': round(decode_ms, 1),
            'serial_sum': round(sum(best), 1)},
        'seg_serial_check': {
            'segmentation_pred_wall_ms': round(seg_wall, 1),
            'budget_seg_sum_ms': round(unet_ms + vect_ms, 1),
            'within_tolerance': check_ok},
        'lines_per_page': len(seg.lines),
        'note': ('all stages timed within the same pass (no subtraction of '
                 'independent best-ofs); host stages bound the steady-state '
                 'pipeline on this 1-core host, device stages overlap them '
                 'via kraken_tpu.pipeline prefetch. device_vectorize=False: '
                 're-measured round 5 as ONE fused dispatch per page (all '
                 '45 line patches padded into a single batched lax.scan '
                 'seam DP + device Sato) — 2003 ms device vs 81 ms host '
                 'C++, so the loss is the column-serial DP structure '
                 'itself (tiny per-step work on wide vector units), not '
                 'dispatch count; the fused-ridge-in-forward path keeps '
                 'the part of vectorization the TPU is good at.')}


def _stage_budget_flagship():
    """
    Same-pass stage decomposition of the FLAGSHIP leg (legacy bitonal
    pageseg + packed-transfer recognition on bw.png) — the least-
    instrumented, furthest-from-target leg until round 5. Methodology
    identical to `_stage_budget`: all stages timed sequentially within one
    pass, best pass by serial sum, cross-checked against an independently
    timed full pipeline pass.
    """
    import os
    from PIL import Image
    from kraken_tpu.configs import RecognitionInferenceConfig
    from kraken_tpu.inference import recognition as R
    from kraken_tpu.pageseg import segment

    repo = os.path.dirname(os.path.abspath(__file__))
    im = Image.open(os.path.join(repo, 'tests/resources/bw.png'))
    im.load()
    rec_model = _flagship_model()
    rec_model.prepare_for_inference(RecognitionInferenceConfig(
        batch_size=32, num_line_workers=1, precision='bf16',
        input_transfer='packed'))

    seg = segment(im)                              # warm nothing; host-only
    list(rec_model.predict(im, seg))               # warm rec buckets

    def dispatch_all(lines):
        outs = []
        cfg_bs = rec_model._inf_config.batch_size
        for i in range(0, len(lines), cfg_bs):
            outs.append(R._dispatch_batch(rec_model, lines[i:i + cfg_bs]))
        for out, _ in outs:
            _ = np.asarray(out[1])
        return outs

    passes = []
    for _ in range(3):
        marks = [time.perf_counter()]
        seg_p = segment(im)
        marks.append(time.perf_counter())
        entries = list(R._produce_entries(rec_model, im, seg_p))
        marks.append(time.perf_counter())
        lines = [p for k, _, p in entries if k == 'line']
        outs = dispatch_all(lines)
        marks.append(time.perf_counter())
        for o, ls in outs:
            list(R._decode_batch_results(rec_model, o, ls))
        marks.append(time.perf_counter())
        passes.append([1000 * (b - a) for a, b in zip(marks, marks[1:])])
    best = min(passes, key=sum)
    assert all(v >= 0 for v in best), f'negative stage in flagship budget: {best}'
    pageseg_ms, produce_ms, device_ms, decode_ms = best
    wall = min(_timed(lambda: list(rec_model.predict(im, segment(im))))
               for _ in range(3)) * 1000
    return {
        'per_page_ms': {
            'pageseg_host': round(pageseg_ms, 1),
            'rec_extract_transform_host': round(produce_ms, 1),
            'rec_upload_forward_download': round(device_ms, 1),
            'rec_decode_records_host': round(decode_ms, 1),
            'serial_sum': round(sum(best), 1)},
        'serial_check': {
            'segment_plus_predict_wall_ms': round(wall, 1),
            'within_tolerance': wall <= sum(best) * 1.5 + 100
            and sum(best) <= wall * 1.5 + 100},
        'lines_per_page': len(seg.lines)}


def _timed(f) -> float:
    t = time.perf_counter()
    f()
    return time.perf_counter() - t


def _tunnel_roundtrip_ms() -> float:
    """Measured host→device→host latency of a tiny transfer (the fixed
    per-dispatch cost every device call pays on this tunneled setup)."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1)
    x = np.zeros(8, np.float32)
    np.asarray(f(jnp.asarray(x)))  # compile
    best = float('inf')
    for _ in range(5):
        start = time.perf_counter()
        np.asarray(f(jnp.asarray(x)))
        best = min(best, time.perf_counter() - start)
    return best * 1000


def _tunnel_upload_mbps() -> float:
    """Measured host→device bandwidth on a recognition-batch-sized upload
    (the dominant per-batch cost on bandwidth-limited remote links)."""
    import jax
    import jax.numpy as jnp
    mb = 16
    x = np.zeros((mb, 1024, 1024), np.uint8)
    f = jax.jit(lambda a: a.sum(dtype=jnp.int32))
    int(f(jnp.asarray(x)))  # compile
    best = float('inf')
    for _ in range(3):
        start = time.perf_counter()
        int(f(jnp.asarray(x)))
        best = min(best, time.perf_counter() - start)
    return mb / best


def _link_sample() -> dict:
    """One adjacent sample of the tunnel's state (roundtrip + upload
    bandwidth), taken immediately before each e2e leg: the link swings
    2-10x between minutes (118 Mbps in r2, 16.8 in r3), so a leg's ratio
    is only interpretable next to a concurrent bandwidth reading."""
    return {'roundtrip_ms': round(_tunnel_roundtrip_ms(), 1),
            'up_mbps': round(_tunnel_upload_mbps(), 1)}


def bench_e2e():
    """BASELINE.md headline: single-page segment+ocr, TPU vs torch CPU, at
    equal CER against the pinned golden transcription."""
    import os
    import subprocess
    import sys

    import jax

    # fp32 six-pass matmuls for the CER-parity leg only: the overfit model
    # is host-bound, so exact-decode parity with the torch fp32 golden costs
    # no throughput (production legs stay bf16)
    link_cer = _link_sample()
    with jax.default_matmul_precision('highest'):
        pps_tpu, _, texts, meta_cer = _page_pipeline(torch_backend=False)
    with open(_golden_path()) as fp:
        golden = json.load(fp)
    cer_tpu = _cer(texts, golden)
    # larger page counts on the TPU side amortize pipeline-fill latency into
    # the steady-state number (the formula itself already excludes fill and
    # is identical for both backends)
    link_flag = _link_sample()
    pps_flag, pps_flag_total, _, meta_flag = _page_pipeline(
        torch_backend=False, n_pages=8, flagship=True)
    flag_stages = _stage_budget_flagship()
    link_neural = _link_sample()
    pps_neural, pps_neural_total, neural_lines, meta_neural = \
        _neural_page_pipeline(torch_backend=False, n_pages=8)
    stages = _stage_budget()
    link_sustained = _link_sample()
    sustained = _sustained_pipeline()
    rt_ms = link_neural['roundtrip_ms']
    up_mbps = link_neural['up_mbps']

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PALLAS_AXON_POOL_IPS', None)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--e2e-torch-child'],
        env=env, capture_output=True, text=True, timeout=3600)
    child = json.loads(proc.stdout.strip().splitlines()[-1])
    return {'metric': 'single-page segment+ocr pages/sec, TPU vs torch-CPU '
                      '(the reference substrate), identical host pipeline',
            'throughput_note': ('pages/sec are marginal steady-state '
                                '((n-1)/(T_n - T_1)), identical formula both '
                                'backends; *_total includes pipeline fill. '
                                'BOTH backends run the same optimized cv2/C++ '
                                'host-geometry pipeline, so the e2e ratio is '
                                'Amdahl-capped at (host+torch_net)/host by the '
                                'shared host stage (see stage_budget) — every '
                                'host optimization this framework ships speeds '
                                'the torch baseline too. The actual reference '
                                'package cannot run here (shapely/skimage/'
                                'lightning absent); its own host stack is '
                                'strictly slower (e.g. scipy Sato ridge '
                                'measured ~10x our fused/device path), so the '
                                'reported ratio understates the true gap to '
                                'upstream kraken.'),
            'flagship': {
                'metric': 'legacy segmenter + CNN+3xBiLSTM-200 recognizer '
                          f'({len(golden)} lines/page)',
                'tpu_pages_per_sec': round(pps_flag, 3),
                'tpu_pages_per_sec_total': round(pps_flag_total, 3),
                'torch_cpu_pages_per_sec': round(child['flagship_pages_per_sec'], 3),
                'vs_baseline': round(pps_flag / child['flagship_pages_per_sec'], 2),
                'link_at_leg_start': link_flag, **meta_flag,
                'stage_budget': flag_stages},
            'neural': {
                'metric': 'BLLA U-Net segment + CNN+3xBiLSTM-200 ocr '
                          f'({neural_lines} lines/page)',
                'tpu_pages_per_sec': round(pps_neural, 3),
                'tpu_pages_per_sec_total': round(pps_neural_total, 3),
                'torch_cpu_pages_per_sec': round(child['neural_pages_per_sec'], 3),
                'vs_baseline': round(pps_neural / child['neural_pages_per_sec'], 2),
                'link_at_leg_start': link_neural, **meta_neural,
                # fixed per-dispatch cost the pipeline must hide: every
                # upload call pays the tunnel round trip unless overlapped
                'dispatch_latency_ms_per_page': round(
                    meta_neural['transfer']['up_calls_per_page'] * rt_ms, 1),
                'stage_budget': stages},
            'sustained': {**sustained, 'link_at_leg_start': link_sustained},
            'cer_parity': {
                'metric': 'trained overfit model, CER vs pinned fp32 golden '
                          '(equal-quality evidence, fp32+highest-matmul on '
                          'TPU decodes digit-exact; model is host-bound-small)',
                'tpu_pages_per_sec': round(pps_tpu, 3),
                'torch_cpu_pages_per_sec': round(child['pages_per_sec'], 3),
                'vs_baseline': round(pps_tpu / child['pages_per_sec'], 2),
                'tpu_cer_vs_golden': round(cer_tpu, 4),
                'torch_cer_vs_golden': round(child['cer'], 4),
                'lines_per_page': len(golden),
                'link_at_leg_start': link_cer, **meta_cer},
            'tunnel_roundtrip_ms': round(rt_ms, 1),
            'tunnel_upload_mbps': round(up_mbps, 1),
            'note': ('single stream on a 1-core dev host behind a TPU tunnel: '
                     'every batch pays the measured tunnel_upload_mbps '
                     'bandwidth (recognition uploads are MBs/batch; uint8 '
                     'transfer quarters them) plus the tunnel_roundtrip_ms '
                     'floor, and the host segmentation stage shares one core '
                     'with decode (overlapped via kraken_tpu.pipeline + '
                     'cross-page batch streaming); device compute itself is '
                     '~3ms/page. The torch-CPU baseline swings 2-3x with host '
                     'load; all legs report best-of-N. On a real TPU-VM (many '
                     'host cores, PCIe-attached chips) both tunnel terms '
                     'vanish.')}


def _probe_device(timeout_s: int = 240) -> bool:
    """
    Runs a trivial device op in a subprocess with a hard timeout. The
    tunneled TPU backend hangs (rather than erroring) when the link is
    down, which would otherwise stall the whole benchmark silently.
    """
    import os
    import subprocess
    import sys
    try:
        proc = subprocess.run(
            [sys.executable, '-c',
             'import jax, jax.numpy as jnp; print(float(jnp.ones(2).sum()))'],
            env=dict(os.environ), capture_output=True, timeout=timeout_s)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _probe_device():
        print(json.dumps({
            'metric': 'recognition lines/sec/chip',
            'value': 0.0, 'unit': 'lines/sec', 'vs_baseline': 0.0,
            'error': 'TPU device unreachable (probe op timed out); benchmark '
                     'not run — this is an infrastructure failure, not a '
                     'framework result'}))
        raise SystemExit(1)
    import os
    jax_lps = bench_jax()
    torch_lps = bench_torch_cpu()
    train_lps = bench_train_jax()
    train_torch_lps = bench_train_torch()
    e2e = bench_e2e()
    detail = {
        'metric': f'recognition lines/sec/chip (CNN+3xBiLSTM-200, 120x1024 lines, batch {BATCH}, pipelined)',
        'value': round(jax_lps, 2),
        'unit': 'lines/sec',
        'vs_baseline': round(jax_lps / torch_lps, 2),
        'train': {
            'metric': f'CTC training lines/sec (AdamW step, batch {TRAIN_BATCH})',
            'tpu_lines_per_sec': round(train_lps, 2),
            'torch_cpu_lines_per_sec': round(train_torch_lps, 2),
            'vs_baseline': round(train_lps / train_torch_lps, 2)},
        'e2e': e2e,
    }
    # Full record: sidecar file + an EARLY stdout line. The FINAL stdout
    # line is a compact summary (every leg's ratio, <=~1500 chars) because
    # the driver's tail capture is bounded — round 3's single fat line
    # overflowed it and the round's best numbers vanished from the record.
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'BENCH_DETAIL.json')
    with open(sidecar, 'w') as fp:
        json.dump(detail, fp, indent=1)
    print(json.dumps(detail))
    print(json.dumps(compact_summary(detail)))


def compact_summary(detail: dict) -> dict:
    """
    The FINAL stdout line: metric/value/unit/vs_baseline plus every leg's
    ratio, the stage budget, and per-leg link context, guaranteed to fit
    the driver's bounded tail capture (tests/test_bench_contract.py pins
    the serialized length — round 3's record was lost to an oversized
    line).
    """
    e2e = detail['e2e']
    budget = e2e['neural']['stage_budget']
    return {
        'metric': detail['metric'],
        'value': detail['value'],
        'unit': detail['unit'],
        'vs_baseline': detail['vs_baseline'],
        'legs_vs_torch_cpu_baseline': {
            'train_ctc_step': detail['train']['vs_baseline'],
            'e2e_flagship': e2e['flagship']['vs_baseline'],
            'e2e_neural_seg_ocr': e2e['neural']['vs_baseline'],
            'e2e_cer_parity': e2e['cer_parity']['vs_baseline']},
        'tpu_pages_per_sec': {
            'flagship': e2e['flagship']['tpu_pages_per_sec'],
            'neural': e2e['neural']['tpu_pages_per_sec'],
            'sustained_100pg_pdf': e2e['sustained']['pages_per_sec'],
            # sustained vs a single-page steady state measured seconds
            # apart (the tunnel swings 2-10x between minutes, so only the
            # adjacent pair is a meaningful comparison)
            'sustained_vs_adjacent_single':
                e2e['sustained'].get('vs_adjacent_single_page')},
        'cer': {'tpu': e2e['cer_parity']['tpu_cer_vs_golden'],
                'torch': e2e['cer_parity']['torch_cer_vs_golden']},
        'stage_budget_ms': budget['per_page_ms'],
        'flagship_stage_budget_ms': e2e['flagship']['stage_budget']['per_page_ms'],
        'link_up_mbps_per_leg': {
            k: e2e[k]['link_at_leg_start']['up_mbps']
            for k in ('cer_parity', 'flagship', 'neural', 'sustained')},
        'detail': 'full per-leg record (spreads, bytes/page, notes) printed '
                  'above and in BENCH_DETAIL.json'}


if __name__ == '__main__':
    import sys
    if '--e2e-torch-child' in sys.argv:
        e2e_torch_child()
    elif '--make-golden' in sys.argv:
        make_golden()
    else:
        main()
