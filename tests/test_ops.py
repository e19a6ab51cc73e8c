"""
Device op tests: jitted nlbin agreement with the host implementation,
Pallas LSTM kernel parity with the scan reference (interpret mode on CPU),
and CTC decoder behaviors.
"""
import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from kraken_tpu.ops.ctc import beam_decoder, blank_threshold_decoder, greedy_decoder


def test_nlbin_device_agreement(resources):
    from kraken_tpu.binarization import nlbin
    from kraken_tpu.ops.binarize import nlbin_device
    im = Image.open(resources / 'input.jpg').convert('L')
    host = np.asarray(nlbin(im)) > 128
    dev = nlbin_device(np.asarray(im))
    assert (host == dev).mean() > 0.99


def test_nlbin_batch():
    from kraken_tpu.ops.binarize import nlbin_batch
    rng = np.random.RandomState(0)
    pages = np.clip(rng.rand(2, 64, 96) * 0.3 + 0.6, 0, 1)
    pages[:, 20:30, 10:80] = 0.1  # text band
    out = np.asarray(nlbin_batch(pages))
    assert out.shape == (2, 64, 96)
    assert out.dtype == bool
    # text darker than background -> text pixels False, paper True
    assert out[:, 25, 40].sum() == 0
    assert out[:, 5, 40].sum() == 2


def test_lstm_pallas_parity_interpret():
    from kraken_tpu.nn.layers import _lstm_scan
    from kraken_tpu.ops.lstm import lstm_pallas
    B, T, H, C = 4, 16, 8, 12
    rng = np.random.RandomState(0)
    w_ih = rng.randn(4 * H, C).astype(np.float32) * 0.1
    w_hh = rng.randn(4 * H, H).astype(np.float32) * 0.1
    b = rng.randn(4 * H).astype(np.float32) * 0.1
    x = rng.randn(B, T, C).astype(np.float32)
    lens = np.array([16, 10, 3, 16])
    gates = jnp.asarray(x) @ jnp.asarray(w_ih).T + jnp.asarray(b)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    for reverse in (False, True):
        ref = _lstm_scan(jnp.asarray(x), jnp.asarray(lens), jnp.asarray(w_ih),
                         jnp.asarray(w_hh), jnp.asarray(b), reverse)
        pal = lstm_pallas(gates, jnp.asarray(w_hh), jnp.asarray(mask),
                          reverse=reverse, interpret=True)
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                                   atol=1e-5, err_msg=f'reverse={reverse}')


def test_greedy_decoder_runs():
    # 5 frames, 3 classes: blank, a, b
    probs = np.array([[0.1, 0.1, 0.9, 0.9, 0.8],
                      [0.8, 0.7, 0.05, 0.05, 0.1],
                      [0.1, 0.2, 0.05, 0.05, 0.1]], np.float32)
    runs = greedy_decoder(probs)
    assert runs == [[(1, 0, 1, pytest.approx(0.8))]]


def test_greedy_decoder_batch_lens():
    probs = np.zeros((2, 3, 6), np.float32)
    probs[:, 0] = 0.9
    probs[0, 1, 1:3] = 1.0
    probs[1, 2, 4:] = 1.0  # beyond len for row 1
    out = greedy_decoder(probs, [6, 4])
    assert out[0][0][0] == 1
    assert out[1] == []


def test_beam_decoder_matches_greedy_on_peaked():
    rng = np.random.RandomState(0)
    # peaked distribution: beam and greedy must agree
    labels = [0, 1, 1, 0, 2, 2, 0]
    probs = np.full((4, len(labels)), 0.01, np.float32)
    for t, lab in enumerate(labels):
        probs[lab, t] = 0.97
    g = greedy_decoder(probs)[0]
    b = beam_decoder(probs, beam_size=4)[0]
    assert [x[0] for x in g] == [x[0] for x in b]


def test_blank_threshold_decoder():
    probs = np.array([[0.9, 0.1, 0.1, 0.9],
                      [0.05, 0.8, 0.8, 0.05],
                      [0.05, 0.1, 0.1, 0.05]], np.float32)
    runs = blank_threshold_decoder(probs)
    assert len(runs[0]) == 1
    assert runs[0][0][0] == 1


def test_native_skeletonize_parity():
    from kraken_tpu import native
    from kraken_tpu.lib.vectorization import _skeletonize_numpy
    if not native.available():
        pytest.skip('no C++ compiler available')
    rng = np.random.RandomState(0)
    mask = np.zeros((80, 120), bool)
    mask[20:30, 10:110] = True
    mask[50:53, 5:115] = True
    sk_np = _skeletonize_numpy(mask)
    sk_c = native.skeletonize_native(mask)
    assert np.array_equal(sk_np, sk_c)


def test_native_endpoints_parity():
    from scipy.ndimage import convolve
    from kraken_tpu import native
    if not native.available():
        pytest.skip('no C++ compiler available')
    skel = np.zeros((40, 60), bool)
    skel[20, 5:55] = True
    ep = native.endpoints_native(skel)
    assert sorted(map(tuple, ep)) == [(20, 5), (20, 54)]


def test_sato_device_parity():
    from kraken_tpu.lib.vectorization import sato_ridge
    from kraken_tpu.ops.ridge import sato_ridge_device
    from scipy.ndimage import gaussian_filter
    bl = np.zeros((64, 96), np.float32)
    bl[30, 10:86] = 1.0
    bl = np.clip(gaussian_filter(bl, 2) * 6, 0, 1)
    host = sato_ridge(bl)
    dev = sato_ridge_device(bl)
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_device_seam_parity():
    """Batched lax.scan seam carve matches the host DP on random patches
    (kernel contract: callers hand in the +inf row-padded patches, exactly
    as lib.polygonization._polygonize_batched builds them)."""
    from kraken_tpu.lib.polygonization import _carve_seam
    from kraken_tpu.ops.seam import carve_seams_device

    rng = np.random.RandomState(0)
    shapes = [(40, 120), (17, 60), (64, 200)]
    raw = [rng.rand(h, w).astype(np.float32) for h, w in shapes]
    # ties are the dangerous case for DP argmin priority — quantize one
    # patch coarsely so equal-cost paths are plentiful
    raw[1] = np.round(raw[1] * 4) / 4
    padded = [np.pad(p, ((1, 1), (0, 0)), constant_values=np.inf) for p in raw]
    H = max(p.shape[0] for p in padded)
    W = max(p.shape[1] for p in padded)
    patches = np.full((len(padded), H, W), np.inf, np.float32)
    for i, p in enumerate(padded):
        patches[i, :p.shape[0], :p.shape[1]] = p
    seams = carve_seams_device(patches, widths=[p.shape[1] for p in padded])
    for i, p in enumerate(raw):
        np.testing.assert_array_equal(seams[i, :p.shape[1]] - 1, _carve_seam(p),
                                      err_msg=f'patch {i} mismatch')


def test_lstm_backend_config_knob(resources):
    """RecognitionInferenceConfig(lstm_backend='pallas') routes the RNN
    layers through the fused kernel and produces the same predictions as
    the default scan backend (interpret mode on CPU)."""
    from PIL import Image
    from kraken_tpu.configs import RecognitionInferenceConfig
    from kraken_tpu.containers import BaselineLine, Segmentation
    from kraken_tpu.models import load_models
    from kraken_tpu.nn import layers as L

    im = Image.open(resources / '000236.png')
    seg = Segmentation(type='baselines', imagename=resources / 'bw.png',
                       text_direction='horizontal-lr', script_detection=False,
                       lines=[BaselineLine(id='l0',
                                           baseline=[[0, 10], [2543, 10]],
                                           boundary=[[0, 0], [2543, 0],
                                                     [2543, 155], [0, 155]])])
    import jax
    from kraken_tpu.vgsl import VGSLModel
    from kraken_tpu.codec import Codec
    model = VGSLModel(vgsl='[1,48,0,1 Cr3,3,8,2,2 S1(1x0)1,3 Lbx16 O1c8]',
                      rng=jax.random.PRNGKey(0))
    model.add_codec(Codec('abcdefg'))
    model.model_type = ['recognition']
    model.seg_type = 'baselines'

    outs = {}
    try:
        for backend in ('scan', 'pallas'):
            model._rec_fwd = None
            model.prepare_for_inference(RecognitionInferenceConfig(
                batch_size=4, num_line_workers=0, lstm_backend=backend))
            assert L._LSTM_BACKEND == backend
            recs = list(model.predict(im, seg))
            outs[backend] = [(r.prediction, r.cuts) for r in recs]
    finally:
        L.set_lstm_backend('scan')
        model._rec_fwd = None
    assert outs['scan'] == outs['pallas']
