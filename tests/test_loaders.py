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


# ---- reference edge-case matrix (reference tests/test_loaders.py) ----

import json


def test_load_models_nonexistent_file():
    with pytest.raises(ValueError, match='not a regular file'):
        load_models('/nonexistent/path/model.mlmodel')


def test_load_models_task_filter_mismatch(resources):
    assert load_models(resources / 'overfit.mlmodel', tasks=['segmentation']) == []
    assert len(load_models(resources / 'overfit.mlmodel', tasks=['recognition'])) == 1


def test_load_safetensors_invalid_tasks_metadata(resources, tmp_path):
    """Invalid _tasks type in safetensors metadata raises ValueError."""
    from safetensors import safe_open
    from safetensors.numpy import load_file, save_file

    src = resources / 'overfit_bl.safetensors'
    tensors = load_file(src)
    with safe_open(src, framework='np') as f:
        metadata = json.loads(f.metadata()['kraken_meta'])
    for rec in metadata.values():
        rec['_tasks'] = {'recognition': True}
    bad = tmp_path / 'bad_tasks.safetensors'
    save_file(tensors, bad, metadata={'kraken_meta': json.dumps(metadata)})
    with pytest.raises(ValueError, match='_tasks'):
        load_safetensors(bad)


def test_load_safetensors_invalid_meta_json(resources, tmp_path):
    from safetensors.numpy import load_file, save_file
    tensors = load_file(resources / 'overfit_bl.safetensors')
    bad = tmp_path / 'bad_json.safetensors'
    save_file(tensors, bad, metadata={'kraken_meta': '{not json'})
    with pytest.raises(ValueError, match='kraken_meta'):
        load_safetensors(bad)


def test_load_safetensors_version_gate(resources, monkeypatch):
    """Model classes demanding a newer kraken than supported are skipped
    with a warning — the class property is the single source of truth
    (reference: models/loaders.py:114-119)."""
    from kraken_tpu.vgsl import VGSLModel

    monkeypatch.setattr(VGSLModel, '_kraken_min_version', '99.0.0',
                        raising=False)
    assert load_safetensors(resources / 'overfit_bl.safetensors') == []
    monkeypatch.setattr(VGSLModel, '_kraken_min_version', '5.0.0',
                        raising=False)
    assert len(load_safetensors(resources / 'overfit_bl.safetensors')) == 1


def test_load_coreml_missing_model_type(resources, tmp_path):
    """kraken_meta present but without a valid model_type raises
    ValueError (legacy files WITHOUT kraken_meta still default to
    recognition)."""
    from kraken_tpu.models import write_models

    model = load_models(resources / 'overfit.mlmodel')[0]
    good = tmp_path / 'good.mlmodel'
    write_models([model], good, format='coreml')
    # length-preserving in-place rename of the model_type key inside the
    # embedded kraken_meta JSON keeps the protobuf wire format intact
    raw = good.read_bytes()
    assert b'"model_type"' in raw
    bad = tmp_path / 'missing_model_type.mlmodel'
    bad.write_bytes(raw.replace(b'"model_type"', b'"model_typ_"'))
    with pytest.raises(ValueError, match='model_type'):
        load_coreml(bad)


def test_write_read_multi_model_roundtrip(resources, tmp_path):
    """Two models in one safetensors container round-trip independently."""
    m1 = load_models(resources / 'overfit_bl.safetensors')[0]
    m2 = load_models(resources / 'overfit_bl_newpoly.safetensors')[0]
    out = tmp_path / 'multi.safetensors'
    write_safetensors([m1, m2], out)
    back = load_models(out)
    assert len(back) == 2
    # kraken_meta preserves insertion order, so models come back in order
    for orig, twin in zip((m1, m2), back):
        assert twin.spec == orig.spec
        for k, v in orig.state_dict().items():
            np.testing.assert_array_equal(np.asarray(v), np.asarray(twin.state_dict()[k]))


def test_load_fp16_variants_forward(resources):
    """fp16/mixed weight files load into float params and run the forward."""
    import jax
    for name in ('model_small_fp16.safetensors', 'model_small_mixed.safetensors'):
        models = load_safetensors(resources / name)
        assert len(models) == 1
        m = models[0]
        x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 48, 64), jnp.float32)
        y, _ = m.net.apply(m.params, x, jnp.asarray([64], jnp.int32))
        assert np.isfinite(np.asarray(y)).all()


def test_tied_weight_backfill(resources, tmp_path):
    """
    The reference writes with safetensors' save_model which stores tied/
    shared tensors only once: a second model whose weights alias the
    first keeps its metadata prefix but loses the duplicate weight keys.
    The loader must backfill from the surviving twin (reference:
    models/loaders.py:126-142).
    """
    import json
    from safetensors import safe_open
    from safetensors.numpy import load_file, save_file

    src = resources / 'overfit_bl.safetensors'
    tensors = load_file(src)
    with safe_open(src, framework='np') as f:
        meta = json.loads(f.metadata()['kraken_meta'])
    (prefix, model_meta), = meta.items()
    # duplicate the metadata under a second prefix without its weights —
    # exactly what save_model's dedup leaves behind
    meta['second-model'] = dict(model_meta)
    dedup = tmp_path / 'tied.safetensors'
    save_file(tensors, dedup, metadata={'kraken_meta': json.dumps(meta)})

    models = load_models(dedup)
    assert len(models) == 2
    sd0, sd1 = models[0].state_dict(), models[1].state_dict()
    assert set(sd0) == set(sd1)
    for k in sd0:
        np.testing.assert_array_equal(np.asarray(sd0[k]), np.asarray(sd1[k]))


def test_version_gate_multi_model(resources, tmp_path, monkeypatch, caplog):
    """Multi-model files: all-compatible loads all, all-incompatible
    returns empty and warns with the required version."""
    import logging

    from kraken_tpu.vgsl import VGSLModel

    m1 = load_models(resources / 'overfit_bl.safetensors')[0]
    m2 = load_models(resources / 'overfit_bl_newpoly.safetensors')[0]
    path = tmp_path / 'multi.safetensors'
    write_safetensors([m1, m2], path)

    assert len(load_models(path)) == 2

    monkeypatch.setattr(VGSLModel, '_kraken_min_version', '99.0.0',
                        raising=False)
    with caplog.at_level(logging.WARNING, logger='kraken_tpu.models.loaders'):
        assert load_safetensors(path) == []
    assert any('99.0.0' in rec.message for rec in caplog.records)


def test_load_coreml_legacy_no_kraken_meta(resources, tmp_path):
    """A legacy CoreML file without a kraken_meta block loads as a
    recognition model with the codec read from the top-level metadata
    key (reference: tests/test_loaders.py:182-198)."""
    from kraken_tpu.models import _coreml

    raw = (resources / 'overfit.mlmodel').read_bytes()
    spec = _coreml.parse_mlmodel(raw)
    assert 'kraken_meta' in spec.user_defined_metadata
    # strip the kraken_meta entry from the wire format by rewriting the
    # metadata dict without it
    stripped = _coreml.strip_user_metadata_key(raw, 'kraken_meta') \
        if hasattr(_coreml, 'strip_user_metadata_key') else None
    if stripped is None:
        # fall back: in-place rename keeps the protobuf lengths intact
        assert b'"kraken_meta"' not in raw  # key is a protobuf map key, not JSON
        stripped = raw.replace(b'kraken_meta', b'kraken_met_')
    legacy = tmp_path / 'legacy.mlmodel'
    legacy.write_bytes(stripped)

    models = load_coreml(legacy)
    assert len(models) == 1
    assert models[0].model_type == ['recognition']
    assert models[0].codec is not None and len(models[0].codec.c2l)
