"""
Model loader tests: kraken safetensors and CoreML files load with correct
metadata, codecs, and weights (cross-validated safetensors vs CoreML via a
write/load round trip and forward-pass equivalence).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from kraken_tpu.models import load_models, load_safetensors, load_coreml, write_safetensors


def test_load_safetensors_bl(resources):
    models = load_models(resources / 'overfit_bl.safetensors')
    assert len(models) == 1
    model = models[0]
    assert model.model_type == ['recognition']
    assert model.seg_type == 'baselines'
    assert model.one_channel_mode == 'L'
    assert model.codec is not None and len(model.codec) == 35
    assert model.net.names == ('C_0', 'Gn_1', 'C_2', 'Gn_3', 'S_4', 'O_5', 'O_6')
    assert np.asarray(model.params['O_5']['lin.weight']).shape == (16, 512)
    # forward pass runs and respects the codec size
    x = jnp.zeros((1, 1, 30, 50), jnp.float32)
    y, lens = model.forward(x, jnp.array([50]))
    assert y.shape[1] == 36


def test_load_safetensors_small_variants(resources):
    for name in ['model_small.safetensors', 'model_small_fp16.safetensors',
                 'model_small_mixed.safetensors']:
        model = load_models(resources / name)[0]
        assert model.spec.startswith('[1,48,0,1')
        assert np.asarray(model.params['C_0']['co.weight']).dtype == np.float32


def test_load_safetensors_task_filter(resources):
    models = load_safetensors(resources / 'overfit_bl.safetensors', tasks=['segmentation'])
    assert models == []
    models = load_safetensors(resources / 'overfit_bl.safetensors', tasks=['recognition'])
    assert len(models) == 1


def test_load_coreml(resources):
    models = load_coreml(resources / 'overfit.mlmodel')
    assert len(models) == 1
    model = models[0]
    assert 'recognition' in model.model_type
    assert model.codec is not None


def test_load_coreml_lstm(resources):
    models = load_coreml(resources / 'merge_tests' / 'merge_codec_nfd.mlmodel')
    model = models[0]
    # spec contains an LSTM layer
    assert any('L' == n.split('_')[0] for n in model.net.names)
    x = jnp.zeros((1, 1, model.input[2], 60), jnp.float32)
    y, _ = model.forward(x, jnp.array([60]))
    assert y.shape[1] == len(model.codec) + 1


def test_safetensors_roundtrip(resources, tmp_path):
    model = load_models(resources / 'overfit_bl.safetensors')[0]
    x = np.random.RandomState(0).rand(1, 1, 30, 64).astype(np.float32)
    y1, _ = model.forward(jnp.asarray(x), jnp.array([64]))
    write_safetensors([model], tmp_path / 'roundtrip.safetensors')
    reloaded = load_models(tmp_path / 'roundtrip.safetensors')[0]
    assert reloaded.codec.c2l == model.codec.c2l
    assert reloaded.spec == model.spec
    y2, _ = reloaded.forward(jnp.asarray(x), jnp.array([64]))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_coreml_vs_torch_forward(resources):
    """
    The CoreML-extracted weights drive the same forward pass as a torch
    replica of the reference layer stack, validating the wire-format reader.
    """
    import torch
    model = load_coreml(resources / 'overfit.mlmodel')[0]
    # torch oracle for the conv part of the net
    w = torch.from_numpy(np.asarray(model.params['C_0']['co.weight']).copy())
    b = torch.from_numpy(np.asarray(model.params['C_0']['co.bias']).copy())
    layer0 = model.net.layers[0]
    tconv = torch.nn.Conv2d(layer0.in_channels, layer0.out_channels,
                            layer0.kernel_size, stride=layer0.stride,
                            padding=layer0.padding)
    tconv.weight.data = w
    tconv.bias.data = b
    x = np.random.RandomState(1).rand(1, 1, model.input[2] or 48, 32).astype(np.float32)
    ref = torch.relu(tconv(torch.from_numpy(x))).detach().numpy()
    y, _ = layer0.apply(model.params['C_0'], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_load_invalid(tmp_path):
    bogus = tmp_path / 'bogus.bin'
    bogus.write_bytes(b'not a model')
    with pytest.raises(ValueError):
        load_models(bogus)
