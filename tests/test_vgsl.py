"""
VGSL compiler tests: grammar/shape parity with the reference parser and
numerical parity of the JAX layers against torch oracles (torch is the
reference substrate kraken models were trained with, so torch modules with
identical weights are the ground truth for layer semantics).
"""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from kraken_tpu.vgsl import VGSLModel, parse_vgsl
from kraken_tpu.nn import layers as L


def test_parse_simple():
    model = VGSLModel(vgsl='[1,1,0,48 Lbx10 Do O1c57]')
    assert model.input == (1, 48, 1, 0)
    assert model.output == (1, 57, 1, 0)
    assert model.criterion == 'ctc'
    assert model.spec == '[1,1,0,48 Lbx10 Do O1c57]'
    assert model.user_metadata['vgsl'] == '[1,1,0,48 Lbx{L_0}10 Do{Do_1} O{O_2}1c57]'


def test_layer_names():
    model = VGSLModel(vgsl='[1,30,0,1 Cr3,3,32,2,2 Gn32 Cr3,3,64,2,2 Gn32 S1(1x0)1,3 O1c16 O1c36]')
    assert model.net.names == ('C_0', 'Gn_1', 'C_2', 'Gn_3', 'S_4', 'O_5', 'O_6')


def test_append():
    model = VGSLModel(vgsl='[1,1,0,48 Lbx10 Do O1c57]')
    model.append(1, '[Cr1,1,2 Gn2 Cr3,3,4]')
    assert model.spec == '[1,1,0,48 Lbx{L_0}10 Cr{C_1}1,1,2 Gn{Gn_2}2 Cr{C_3}3,3,4]'


def test_resize():
    model = VGSLModel(vgsl='[1,1,0,48 Lbx10 Do O1c57]')
    model.resize_output(80)
    assert model.params['O_2']['lin.weight'].shape == (80, 20)
    assert model.output[1] == 80


def test_del_resize():
    model = VGSLModel(vgsl='[1,1,0,48 Lbx10 Do O1c57]')
    old = np.asarray(model.params['O_2']['lin.weight'])
    model.resize_output(80, [2, 4, 5, 6, 7, 12, 25])
    new = np.asarray(model.params['O_2']['lin.weight'])
    assert new.shape == (80, 20)
    # retained rows keep their values
    np.testing.assert_allclose(new[0], old[0])
    np.testing.assert_allclose(new[2], old[3])


def test_nested_serial_model():
    model = VGSLModel(vgsl='[1,48,0,1 Cr4,2,1,4,2 ([Cr4,2,1,1,1 Do Cr3,3,2,1,1] '
                           '[Cr4,2,1,1,1 Cr3,3,2,1,1 Do]) S1(1x0)1,3 Lbx2 Do0.5 Lbx2]')
    assert isinstance(model.net.layers[1], L.Parallel)
    for x in model.net.layers[1].layers:
        assert isinstance(x, L.Series)
        assert len(x.layers) == 3
    x = jnp.zeros((1, 1, 48, 32))
    y, _ = model.forward(x)
    assert y.shape[1] == 4


def test_parallel_model_inequal():
    with pytest.raises(ValueError):
        VGSLModel(vgsl='[1,48,0,1 Cr4,2,1,4,2 [Cr4,2,1,1,1 (Cr4,2,1,4,2 Cr3,3,2,1,1) '
                       'S1(1x0)1,3 Lbx2 Do0.5] Lbx2]')


def test_forward_shape_matches_inference():
    model = VGSLModel(vgsl='[1,48,0,1 Cr3,3,8,2,2 Mp2,2 S1(1x0)1,3 Lbx10 O1c12]')
    x = jnp.zeros((2, 1, 48, 100))
    lens = jnp.array([100, 80])
    y, olens = model.forward(x, lens)
    oshape = model.net.get_shape((2, 1, 48, 100))
    assert y.shape == oshape
    assert int(olens[0]) == y.shape[3]


# --------------------------------------------------------- torch parity

def _to_t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def test_conv_parity():
    for stride, dil, k in [((1, 1), (1, 1), (3, 3)), ((2, 2), (1, 1), (3, 3)),
                           ((1, 1), (2, 2), (3, 3)), ((4, 2), (1, 1), (4, 2))]:
        layer = L.ActConv2D(3, 8, k, stride, 'r', dil)
        params = layer.init(__import__('jax').random.PRNGKey(0))
        x = np.random.RandomState(1).rand(2, 3, 16, 32).astype(np.float32)
        y, _ = layer.apply(params, jnp.asarray(x))
        pad = tuple((dil[i] * (k[i] - 1)) // 2 for i in range(2))
        tconv = torch.nn.Conv2d(3, 8, k, stride=stride, padding=pad, dilation=dil)
        tconv.weight.data = _to_t(params['co.weight'])
        tconv.bias.data = _to_t(params['co.bias'])
        ref = torch.relu(tconv(_to_t(x))).detach().numpy()
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_transposed_conv_parity():
    layer = L.ActConv2D(4, 2, (3, 3), (2, 2), 'l', transposed=True)
    params = layer.init(__import__('jax').random.PRNGKey(0))
    x = np.random.RandomState(2).rand(1, 4, 8, 8).astype(np.float32)
    y, _ = layer.apply(params, jnp.asarray(x))
    tconv = torch.nn.ConvTranspose2d(4, 2, (3, 3), stride=(2, 2), padding=(1, 1))
    tconv.weight.data = _to_t(params['co.weight'])
    tconv.bias.data = _to_t(params['co.bias'])
    ref = tconv(_to_t(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    # with target output shape (like decoder skip connections)
    y2, _ = layer.apply(params, jnp.asarray(x), output_shape=(16, 16))
    ref2 = tconv(_to_t(x), output_size=(16, 16)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y2), ref2, atol=1e-5)


def test_lstm_parity_batched_lengths():
    """x-axis bidi LSTM over padded batch == torch packed-sequence LSTM."""
    import jax
    layer = L.TransposedSummarizingRNN(6, 5, 'b', transpose=False, summarize=False)
    params = layer.init(jax.random.PRNGKey(3))
    x = np.random.RandomState(3).rand(3, 6, 1, 12).astype(np.float32)
    lens = np.array([12, 7, 4])
    y, _ = layer.apply(params, jnp.asarray(x), jnp.asarray(lens))

    tl = torch.nn.LSTM(6, 5, bidirectional=True, batch_first=True)
    for name in ['weight_ih_l0', 'weight_hh_l0', 'bias_ih_l0', 'bias_hh_l0',
                 'weight_ih_l0_reverse', 'weight_hh_l0_reverse',
                 'bias_ih_l0_reverse', 'bias_hh_l0_reverse']:
        getattr(tl, name).data = _to_t(params[f'layer.{name}'])
    tx = _to_t(x).permute(2, 0, 3, 1).reshape(3, 12, 6)
    packed = torch.nn.utils.rnn.pack_padded_sequence(tx, torch.as_tensor(lens),
                                                     batch_first=True, enforce_sorted=False)
    out, _ = tl(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True, total_length=12)
    # out is (N, T, O); y is NOHW == (3, 10, 1, 12)
    ref = out.detach().numpy().transpose(0, 2, 1)[:, :, None, :]
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_lstm_parity_y_axis():
    """y-axis (transposed) LSTM parity with torch on full-height input."""
    import jax
    layer = L.TransposedSummarizingRNN(4, 3, 'b', transpose=True, summarize=False)
    params = layer.init(jax.random.PRNGKey(4))
    x = np.random.RandomState(4).rand(2, 4, 6, 5).astype(np.float32)
    y, _ = layer.apply(params, jnp.asarray(x))
    assert y.shape == (2, 6, 6, 5)

    tl = torch.nn.LSTM(4, 3, bidirectional=True, batch_first=True)
    for name in ['weight_ih_l0', 'weight_hh_l0', 'bias_ih_l0', 'bias_hh_l0',
                 'weight_ih_l0_reverse', 'weight_hh_l0_reverse',
                 'bias_ih_l0_reverse', 'bias_hh_l0_reverse']:
        getattr(tl, name).data = _to_t(params[f'layer.{name}'])
    # replicate reference forward: NCHW->HNWC->(transpose H/W)->WNHC->(W*N,H,C)
    tx = _to_t(x).permute(2, 0, 3, 1).transpose(0, 2)
    siz = tx.size()
    tx = tx.contiguous().view(-1, siz[2], siz[3])
    out, _ = tl(tx)
    out = out.view(siz[0], siz[1], siz[2], 6).transpose(0, 2)
    ref = out.permute(1, 3, 0, 2).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_lstm_summarize():
    import jax
    layer = L.TransposedSummarizingRNN(4, 3, 'f', transpose=False, summarize=True)
    params = layer.init(jax.random.PRNGKey(5))
    x = np.random.RandomState(5).rand(1, 4, 1, 9).astype(np.float32)
    y, _ = layer.apply(params, jnp.asarray(x))
    assert y.shape == (1, 3, 1, 1)
    full = L.TransposedSummarizingRNN(4, 3, 'f', transpose=False, summarize=False)
    yf, _ = full.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y[..., 0]), np.asarray(yf[..., -1]), atol=1e-6)


def test_groupnorm_parity():
    import jax
    layer = L.GroupNorm(8, 4)
    params = layer.init(jax.random.PRNGKey(6))
    params = {'layer.weight': jnp.asarray(np.random.RandomState(6).rand(8).astype(np.float32)),
              'layer.bias': jnp.asarray(np.random.RandomState(7).rand(8).astype(np.float32))}
    x = np.random.RandomState(8).rand(2, 8, 4, 10).astype(np.float32)
    y, _ = layer.apply(params, jnp.asarray(x))
    tgn = torch.nn.GroupNorm(4, 8)
    tgn.weight.data = _to_t(params['layer.weight'])
    tgn.bias.data = _to_t(params['layer.bias'])
    ref = tgn(_to_t(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    # padding-aware path: per-sample stats over the valid region only
    lens = np.array([10, 6])
    y2, _ = layer.apply(params, jnp.asarray(x), jnp.asarray(lens))
    ref0 = tgn(_to_t(x[0:1])).detach().numpy()[0]
    ref1 = tgn(_to_t(x[1:2, :, :, :6])).detach().numpy()[0]
    np.testing.assert_allclose(np.asarray(y2[0]), ref0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2[1, :, :, :6]), ref1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2[1, :, :, 6:]), 0, atol=1e-6)


def test_reshape_parity():
    # S1(1x0)1,3 on (1, 64, 8, 17): height folds into channels
    layer = L.Reshape(2, 1, -1, 2, 1)
    x = np.random.RandomState(9).rand(1, 64, 8, 17).astype(np.float32)
    y, _ = layer.apply({}, jnp.asarray(x))
    tx = _to_t(x)
    # reference semantics: split H into (1, 8), rotate the trailing split part
    # down to the channel dim -> out channel index = h*64 + c
    ref = tx.reshape(1, 64, 1, 8, 17).permute([0, 3, 1, 2, 4]).reshape(1, 512, 1, 17).numpy()
    assert y.shape == (1, 512, 1, 17)
    np.testing.assert_allclose(np.asarray(y), ref, atol=0)


def test_maxpool_parity():
    layer = L.MaxPool((2, 2), (2, 2))
    x = np.random.RandomState(10).rand(1, 3, 9, 9).astype(np.float32)
    y, lens = layer.apply({}, jnp.asarray(x), jnp.asarray([9]))
    ref = torch.nn.MaxPool2d((2, 2), (2, 2))(_to_t(x)).numpy()
    np.testing.assert_allclose(np.asarray(y), ref)
    assert int(lens[0]) == 4


def test_legacy_ocropy_peephole_lstm():
    """Legacy clstm-era `Lbxo` specs build and run the peephole LSTM path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from kraken_tpu.vgsl import VGSLModel

    m = VGSLModel('[1,16,0,1 S1(1x0)1,3 Lbxo8 O1c5]', rng=jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 1, 16, 32), jnp.float32)
    y, lens = m(x, jnp.asarray([32, 20]))
    assert y.shape == (2, 5, 1, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_bilstm_fused_scan_equivalence():
    """The fused both-direction scan computes exactly the two separate
    directional scans (kept as a tuning option for other TPU generations)."""
    import numpy as np
    import jax.numpy as jnp
    from kraken_tpu.nn.layers import _bilstm_scan, _lstm_scan

    rng = np.random.RandomState(0)
    B, T, C, H = 4, 13, 10, 6
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    lens = jnp.asarray(np.array([13, 2, 7, 1], np.int32))
    wf_ih, wr_ih = (jnp.asarray(rng.randn(4 * H, C).astype(np.float32)) for _ in range(2))
    wf_hh, wr_hh = (jnp.asarray(rng.randn(4 * H, H).astype(np.float32)) for _ in range(2))
    bf, br = (jnp.asarray(rng.randn(4 * H).astype(np.float32)) for _ in range(2))
    for L in (None, lens):
        sep = np.concatenate([np.asarray(_lstm_scan(x, L, wf_ih, wf_hh, bf, False)),
                              np.asarray(_lstm_scan(x, L, wr_ih, wr_hh, br, True))], -1)
        fused = np.asarray(_bilstm_scan(x, L, wf_ih, wf_hh, bf, wr_ih, wr_hh, br))
        np.testing.assert_allclose(sep, fused, atol=1e-6)


def test_fused_conv_pool_exactness():
    """fuse_conv_pools produces the same outputs and seq_lens as the literal
    [conv -> dropout -> maxpool] graph, including ragged batches."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from kraken_tpu.nn.layers import fuse_conv_pools, FusedConvPool
    from kraken_tpu.vgsl import VGSLModel

    spec = '[1,32,0,1 Cr3,13,16 Do0.1,2 Mp2,2 Cr3,9,24 Mp2,2 S1(1x0)1,3 O1c8]'
    model = VGSLModel(vgsl=spec, rng=jax.random.PRNGKey(1))
    fused = fuse_conv_pools(model.net)
    assert any(isinstance(l, FusedConvPool) for l in fused.layers)
    x = jnp.asarray(np.random.RandomState(0).rand(3, 1, 32, 96).astype(np.float32))
    lens = jnp.asarray(np.array([96, 40, 17], np.int32))
    y1, l1 = model.net.apply(model.params, x, lens)
    y2, l2 = fused.apply(model.params, x, lens)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_fused_conv_pool_inference_flag(resources):
    """fuse_conv_pools=True runs the rewritten graph through the engine with
    unchanged predictions."""
    from PIL import Image
    from kraken_tpu.configs import RecognitionInferenceConfig
    from kraken_tpu.models import load_models

    im = Image.open(resources / '000236.png')
    from kraken_tpu.containers import BaselineLine, Segmentation
    seg = Segmentation(type='baselines', imagename='x', text_direction='horizontal-lr',
                       script_detection=False,
                       lines=[BaselineLine(id='foo', baseline=[[0, 10], [2543, 10]],
                                           boundary=[[0, 0], [2543, 0], [2543, 155], [0, 155]])])
    preds = []
    for flag in (False, True):
        vmodel = load_models(resources / 'overfit.mlmodel')[0]
        vmodel.prepare_for_inference(RecognitionInferenceConfig(
            batch_size=4, num_line_workers=0, padding=1, fuse_conv_pools=flag))
        preds.append(next(vmodel.predict(im, seg)).prediction)
    assert preds[0] == preds[1]


# ------------------------------------------------------- Te (transformer)

def test_transformer_parse_and_shapes():
    model = VGSLModel(vgsl='[1,48,0,1 Cr3,3,32,2,2 Gn32 S1(1x0)1,3 '
                           'Cl1,1,64 Te4,64,128 Te4,64,128,20 O1c12]')
    assert model.output == (1, 12, 1, 1)
    te = [l for l in model.net.layers if isinstance(l, L.TransformerEncoder)]
    assert len(te) == 2
    assert te[0].heads == 4 and te[0].dim == 64 and te[0].ffn_dim == 128
    assert te[0].dropout == pytest.approx(0.1)   # default
    assert te[1].dropout == pytest.approx(0.2)   # explicit ,20
    x = jnp.asarray(np.random.rand(2, 1, 48, 96).astype(np.float32))
    y, sl = model.forward(x, seq_lens=jnp.asarray([96, 48]))
    assert y.shape == (2, 12, 1, 48)
    assert list(np.asarray(sl)) == [48, 24]


def test_transformer_rejects_bad_dims():
    with pytest.raises(ValueError, match='must equal'):
        VGSLModel(vgsl='[1,48,0,1 Cr3,3,32,2,2 S1(1x0)1,3 Te4,64,128 O1c12]')
    with pytest.raises(ValueError, match='divisible'):
        L.TransformerEncoder(input_size=60, heads=7, dim=60, ffn_dim=120)


def test_transformer_padding_independence():
    """Bucket padding must not leak into valid positions: a sample padded
    to a wider batch matches the same sample alone, up to fp32
    reduction-order noise (attention reduces over different padded widths;
    masked positions contribute exactly zero)."""
    spec = ('[1,48,0,1 Cr3,3,32,2,2 Gn32 S1(1x0)1,3 Cl1,1,64 '
            'Te4,64,128 Te4,64,128 O1c7]')
    model = VGSLModel(vgsl=spec)
    x = np.random.rand(2, 1, 48, 128).astype(np.float32)
    x[1, :, :, 80:] = 0.0
    y, _ = model.forward(jnp.asarray(x), seq_lens=jnp.asarray([128, 80]))
    y1, _ = model.forward(jnp.asarray(x[1:2, :, :, :80]),
                          seq_lens=jnp.asarray([80]))
    w = y1.shape[-1]
    np.testing.assert_allclose(np.asarray(y[1:2, :, :, :w]), np.asarray(y1),
                               atol=5e-4)


def test_transformer_state_dict_roundtrip(tmp_path):
    from kraken_tpu.models import load_models, write_models
    spec = ('[1,48,0,1 Cr3,3,32,2,2 S1(1x0)1,3 Cl1,1,64 Te4,64,128 O1c7]')
    model = VGSLModel(vgsl=spec)
    from kraken_tpu.codec import Codec
    model.add_codec(Codec(' abcdef'))
    path = tmp_path / 'te.safetensors'
    write_models([model], str(path))
    loaded = load_models(path)[0]
    x = jnp.asarray(np.random.rand(1, 1, 48, 64).astype(np.float32))
    y0, _ = model.forward(x)
    y1, _ = loaded.forward(x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_transformer_coreml_write_rejected(tmp_path):
    from kraken_tpu.models import write_models
    spec = ('[1,48,0,1 Cr3,3,32,2,2 S1(1x0)1,3 Cl1,1,64 Te4,64,128 O1c7]')
    model = VGSLModel(vgsl=spec)
    from kraken_tpu.codec import Codec
    model.add_codec(Codec(' abcdef'))
    with pytest.raises(ValueError, match='TransformerEncoder'):
        write_models([model], str(tmp_path / 'te.mlmodel'), format='coreml')


def test_transformer_preset_parses():
    from kraken_tpu.configs.base import RECOGNITION_SPEC_PRESETS
    spec = RECOGNITION_SPEC_PRESETS['tpu-attn']
    model = VGSLModel(vgsl=spec[:-1] + ' O1c17]')
    assert model.output[1] == 17
