"""
Codec merging / fine-tuning resize flows (reference: tests/test_merging.py):
the base model (merge_codec_nfd.mlmodel, trained on 0006/0007) is fine-tuned
on merger.arrow (0008/0021) under resize=fail/new/union, with and without NFD
normalization, over binary and XML datasets; assertions check which graphemes
the negotiated codec can encode afterwards.
"""
from unicodedata import normalize

import pytest

from kraken_tpu.configs import (RecognitionTrainingConfig,
                                RecognitionTrainingDataConfig)
from kraken_tpu.train import (KrakenTrainer, RecognitionDataModule,
                              RecognitionModel)


@pytest.fixture
def base_model(resources):
    return resources / 'merge_tests' / 'merge_codec_nfd.mlmodel'


def _fit(base_model, tmp_path, resize='fail', normalization=None,
         format_type='binary', data=None, resources=None):
    data_config = RecognitionTrainingDataConfig(
        training_data=data or [str(resources / 'merge_tests' / 'merger.arrow')],
        format_type=format_type,
        normalization=normalization,
        batch_size=1)
    config = RecognitionTrainingConfig(resize=resize, quit='fixed', epochs=1,
                                       lrate=1e-4,
                                       checkpoint_path=str(tmp_path / 'model'))
    module = RecognitionModel.load_from_weights(config, base_model)
    dm = RecognitionDataModule(data_config)
    trainer = KrakenTrainer(config, fast_dev_run=True)
    trainer.fit(module, dm)
    return module


def test_no_resize_fails(base_model, tmp_path, resources):
    with pytest.raises(Exception):
        _fit(base_model, tmp_path, resize='fail', resources=resources)


def test_merging_new(base_model, tmp_path, resources):
    module = _fit(base_model, tmp_path, resize='new', resources=resources)
    codec = module.net.codec
    assert len(codec.encode('1')) == 0   # unknown to both
    assert len(codec.encode('9')) == 1   # in the new dataset
    assert len(codec.encode('x')) == 0   # only in the original model → dropped by 'new'


def test_merging_union(base_model, tmp_path, resources):
    module = _fit(base_model, tmp_path, resize='union', resources=resources)
    codec = module.net.codec
    assert len(codec.encode('1')) == 0   # unknown to both
    assert len(codec.encode('9')) == 1   # in the new dataset
    assert len(codec.encode('x')) == 1   # kept from the original model


def test_merging_union_with_nfd(base_model, tmp_path, resources):
    module = _fit(base_model, tmp_path, resize='union', normalization='NFD',
                  resources=resources)
    codec = module.net.codec
    assert len(codec.encode('1')) == 0
    assert len(codec.encode('9')) == 1
    assert len(codec.encode('x')) == 1
    assert len(codec.encode('ẽ')) == 0                      # unnormalized composed form
    assert len(codec.encode(normalize('NFD', 'ẽ'))) == 2    # decomposed, in training data
    assert len(codec.encode(normalize('NFD', 'Ũ'))) == 2    # decomposed, union of both


def test_merging_new_with_nfd(base_model, tmp_path, resources):
    module = _fit(base_model, tmp_path, resize='new', normalization='NFD',
                  resources=resources)
    codec = module.net.codec
    assert len(codec.encode('1')) == 0
    assert len(codec.encode('9')) == 1
    assert len(codec.encode('x')) == 0
    assert len(codec.encode('ẽ')) == 0
    assert len(codec.encode(normalize('NFD', 'ẽ'))) == 2
    # Ũ decomposes to U + combining tilde; U is only in the original model
    assert len(codec.encode(normalize('NFD', 'Ũ'))) == 1


def test_merging_new_with_nfd_xml(base_model, tmp_path, resources):
    module = _fit(base_model, tmp_path, resize='new', normalization='NFD',
                  format_type='xml',
                  data=[str(resources / 'merge_tests' / '0014.xml')],
                  resources=resources)
    codec = module.net.codec
    assert len(codec.encode('1')) == 0   # unknown to both
    assert len(codec.encode('9')) == 1   # in the new dataset
    assert len(codec.encode('x')) == 0   # only in the original model → dropped
    assert len(codec.encode('ẽ')) == 0   # composed form not in an NFD codec
    assert len(codec.encode(normalize('NFD', 'ẽ'))) == 2
    # Ũ decomposes to U + combining tilde; U is only in the original model
    assert len(codec.encode(normalize('NFD', 'Ũ'))) == 1
    assert len(codec.encode(normalize('NFD', 'ã'))) == 2


def test_merging_union_with_nfd_xml(base_model, tmp_path, resources):
    module = _fit(base_model, tmp_path, resize='union', normalization='NFD',
                  format_type='xml',
                  data=[str(resources / 'merge_tests' / '0014.xml')],
                  resources=resources)
    codec = module.net.codec
    assert len(codec.encode('1')) == 0
    assert len(codec.encode('9')) == 1
    assert len(codec.encode('x')) == 1   # kept from the original model
    assert len(codec.encode('ẽ')) == 0
    assert len(codec.encode(normalize('NFD', 'ẽ'))) == 2
    assert len(codec.encode(normalize('NFD', 'Ũ'))) == 2
    assert len(codec.encode(normalize('NFD', 'ã'))) == 2
