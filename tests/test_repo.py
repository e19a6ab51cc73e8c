"""
Model-repository client tests against a mocked htrmopo backend
(reference logic: kraken/repo.py:35-87, kraken/kraken.py:652-773,
kraken/ketos/repo.py:108-): listing grouping by concept DOI with
newest-version retention and v1-schema preference, kraken-record
filtering, the model download path, and the publish/DOI-update metadata
assembly — all success paths, exercised offline.
"""
import json
import sys
import types
from dataclasses import dataclass, field

import pytest
from click.testing import CliRunner


@dataclass
class FakeRecord:
    doi: str
    concept_doi: str
    publication_date: str
    software_name: str = 'kraken'
    keywords: list = field(default_factory=lambda: ['kraken_pytorch'])
    model_type: list = field(default_factory=lambda: ['recognition'])
    script: list = field(default_factory=lambda: ['Latn'])
    language: list = field(default_factory=lambda: ['eng'])
    summary: str = 'a model'


LISTING = {
    # two versions of the same concept, each with v0+v1 schema records:
    # the newest (10.5281/zenodo.2) must win, via its v1 record
    '10.5281/zenodo.1': {
        'v0': FakeRecord('10.5281/zenodo.1', '10.5281/zenodo.c1', '2023-01-01'),
        'v1': FakeRecord('10.5281/zenodo.1', '10.5281/zenodo.c1', '2023-01-01',
                         summary='old version'),
    },
    '10.5281/zenodo.2': {
        'v0': FakeRecord('10.5281/zenodo.2', '10.5281/zenodo.c1', '2024-06-01',
                         summary='v0 schema'),
        'v1': FakeRecord('10.5281/zenodo.2', '10.5281/zenodo.c1', '2024-06-01',
                         summary='new version'),
    },
    # legacy record: wrong software_name but kraken_pytorch keyword → kept
    '10.5281/zenodo.3': {
        'v0': FakeRecord('10.5281/zenodo.3', '10.5281/zenodo.c3', '2022-01-01',
                         software_name='ocropus',
                         keywords=['kraken_pytorch', 'htr'],
                         model_type=['segmentation'], script=['Arab'],
                         language=['ara'], summary='legacy seg model'),
    },
    # non-kraken record → filtered out
    '10.5281/zenodo.4': {
        'v1': FakeRecord('10.5281/zenodo.4', '10.5281/zenodo.c4', '2024-01-01',
                         software_name='transkribus', keywords=['htr']),
    },
    # plain (unwrapped) record value must also be accepted
    '10.5281/zenodo.5': FakeRecord('10.5281/zenodo.5', '10.5281/zenodo.c5',
                                   '2021-05-01', model_type=['reading_order'],
                                   summary='ro model'),
}


@pytest.fixture
def fake_htrmopo(monkeypatch, tmp_path):
    mod = types.ModuleType('htrmopo')
    mod.calls = []

    def get_description(model_id, callback=None, version=None):
        mod.calls.append(('get_description', model_id, version))
        for rid, item in LISTING.items():
            if rid == model_id:
                rec = item.get('v1', item.get('v0')) if isinstance(item, dict) else item
                return rec
        raise ValueError(f'no record {model_id}')

    def get_listing(callback=None, **kwargs):
        mod.calls.append(('get_listing',))
        return LISTING

    def get_model(model_id, path=None, callback=None):
        mod.calls.append(('get_model', model_id))
        d = tmp_path / model_id.replace('/', '_')
        d.mkdir(parents=True, exist_ok=True)
        (d / 'model.safetensors').write_bytes(b'')
        return str(d)

    def publish_model(model_path, model_card, access_token, private=False,
                      callback=None):
        mod.calls.append(('publish_model', str(model_path), model_card,
                          access_token, private))
        return '10.5281/zenodo.999'

    def update_model(model_path, model_card, access_token, model_id=None,
                     private=False, callback=None):
        mod.calls.append(('update_model', str(model_path), model_card,
                          access_token, model_id, private))
        return '10.5281/zenodo.1000'

    mod.get_description = get_description
    mod.get_listing = get_listing
    mod.get_model = get_model
    mod.publish_model = publish_model
    mod.update_model = update_model
    monkeypatch.setitem(sys.modules, 'htrmopo', mod)
    return mod


def test_get_description_kraken_record(fake_htrmopo):
    from kraken_tpu import repo
    desc = repo.get_description('10.5281/zenodo.2')
    assert desc['summary'] == 'new version'
    assert desc['doi'] == '10.5281/zenodo.2'


def test_get_description_legacy_keyword_record(fake_htrmopo):
    # software_name != kraken but kraken_pytorch keyword → accepted (the
    # reference's OR filter, kraken/kraken.py:677)
    from kraken_tpu import repo
    desc = repo.get_description('10.5281/zenodo.3')
    assert desc['summary'] == 'legacy seg model'


def test_get_description_rejects_non_kraken(fake_htrmopo):
    from kraken_tpu import repo
    from kraken_tpu.exceptions import KrakenRepoException
    with pytest.raises(KrakenRepoException, match='not a kraken-compatible'):
        repo.get_description('10.5281/zenodo.4')


def test_get_description_version_passthrough(fake_htrmopo):
    from kraken_tpu import repo
    repo.get_description('10.5281/zenodo.2', version='v0')
    assert ('get_description', '10.5281/zenodo.2', 'v0') in fake_htrmopo.calls


def test_listing_groups_by_concept_and_keeps_newest(fake_htrmopo):
    from kraken_tpu import repo
    listing = repo.get_listing()
    # c1 concept: newest deposit (zenodo.2) via its v1 schema record
    assert listing['10.5281/zenodo.c1']['doi'] == '10.5281/zenodo.2'
    assert listing['10.5281/zenodo.c1']['summary'] == 'new version'
    # legacy keyword-only record kept, non-kraken record dropped
    assert '10.5281/zenodo.c3' in listing
    assert '10.5281/zenodo.c4' not in listing
    # unwrapped record values accepted
    assert listing['10.5281/zenodo.c5']['summary'] == 'ro model'
    assert len(listing) == 3


def test_listing_model_type_filter(fake_htrmopo):
    from kraken_tpu import repo
    listing = repo.get_listing(model_type='segmentation')
    assert set(listing) == {'10.5281/zenodo.c3'}
    listing = repo.get_listing(model_type='recognition')
    assert set(listing) == {'10.5281/zenodo.c1'}


def test_listing_script_language_keyword_filters(fake_htrmopo):
    from kraken_tpu import repo
    assert set(repo.get_listing(script=['Arab'])) == {'10.5281/zenodo.c3'}
    assert set(repo.get_listing(language=['eng'])) == \
        {'10.5281/zenodo.c1', '10.5281/zenodo.c5'}
    assert set(repo.get_listing(keyword=['htr'])) == {'10.5281/zenodo.c3'}
    assert repo.get_listing(script=['Hani']) == {}


def test_get_model_download(fake_htrmopo):
    from kraken_tpu import repo
    path = repo.get_model('10.5281/zenodo.2')
    assert ('get_model', '10.5281/zenodo.2') in fake_htrmopo.calls
    import os
    assert os.path.isdir(path)


def test_cli_show_success(fake_htrmopo):
    from kraken_tpu.kraken import cli
    result = CliRunner().invoke(cli, ['show', '10.5281/zenodo.2'])
    assert result.exit_code == 0
    assert 'new version' in result.output
    # script/language codes are resolved to display names in the rendered
    # table (reference rendering: kraken/kraken.py:651-724)
    assert 'Latin' in result.output
    assert 'English' in result.output


def test_show_renders_reference_table_v1():
    """The remote-metadata renderer produces the reference's rich table for
    a v1 record: resolved script/language names, creators with ORCID and
    affiliation, two-decimal metrics, datasets, and base model."""
    from rich.console import Console
    from kraken_tpu.kraken import _render_remote_description

    desc = {
        'version': 'v1', 'summary': 'print transcription model',
        'doi': '10.5281/zenodo.42', 'concept_doi': '10.5281/zenodo.c42',
        'publication_date': '2024-06-01',
        'model_type': ['recognition'],
        'language': ['eng', 'fra', 'zzz-unknown'],
        'script': ['Latn', 'Grek', 'Qxyz'],
        'keywords': ['htr', 'print'],
        'datasets': ['https://example.org/ds'],
        'metrics': {'cer': 0.0413},
        'base_model': ['10.5281/zenodo.7'],
        'software_name': 'kraken',
        'software_hints': ['segmentation=blla'],
        'license': 'Apache-2.0',
        'creators': [{'name': 'A. Scholar', 'orcid': '0000-0001-2345-6789',
                      'affiliation': 'Université de Test'}],
        'description': 'A **markdown** description.',
    }
    console = Console(record=True, width=120)
    import kraken_tpu.kraken as K
    import rich.console
    orig = rich.console.Console
    rich.console.Console = lambda *a, **k: console
    try:
        _render_remote_description(desc)
    finally:
        rich.console.Console = orig
    out = console.export_text()
    assert 'print transcription model' in out
    assert 'Latin' in out and 'Greek' in out
    assert 'Qxyz' in out            # unknown codes fall back to the code
    assert 'English' in out and 'French' in out
    assert 'cer: 0.04' in out
    assert 'A. Scholar (0000-0001-2345-6789) (Université de Test)' in out
    assert '10.5281/zenodo.7' in out


def test_show_renders_reference_table_v0():
    """v0 records render the alphabet split into printable glyphs and
    named combining marks."""
    from rich.console import Console
    from kraken_tpu.kraken import _render_remote_description

    desc = {
        'version': 'v0', 'summary': 'legacy model',
        'doi': 'x', 'concept_doi': 'y', 'publication_date': '2020-01-01',
        'model_type': ['recognition'],
        'script': ['Arab'],
        'graphemes': ['a', 'b', '́'],
        'keywords': ['kraken_pytorch'],
        'metrics': {},
        'license': 'MIT',
        'creators': [],
        'description': 'old',
    }
    console = Console(record=True, width=120)
    import rich.console
    orig = rich.console.Console
    rich.console.Console = lambda *a, **k: console
    try:
        _render_remote_description(desc)
    finally:
        rich.console.Console = orig
    out = console.export_text()
    assert 'Arabic' in out
    assert 'a b' in out
    assert 'COMBINING ACUTE ACCENT' in out


def test_cli_list_success(fake_htrmopo):
    from kraken_tpu.kraken import cli
    result = CliRunner().invoke(cli, ['list'])
    assert result.exit_code == 0
    # reference-style table: concept DOI rows carrying a tree of every
    # deposit with per-version summary/type/keywords
    assert '10.5281/zenodo.c1' in result.output
    assert '10.5281/zenodo.2' in result.output   # newest version...
    assert '10.5281/zenodo.1' in result.output   # ...and the older deposit
    assert 'new version' in result.output
    assert 'old version' in result.output
    assert 'legacy seg model' in result.output
    assert 'transkribus' not in result.output


def test_cli_list_filtered(fake_htrmopo):
    from kraken_tpu.kraken import cli
    result = CliRunner().invoke(cli, ['list', '--segmentation'])
    assert result.exit_code == 0
    assert 'legacy seg model' in result.output
    assert 'new version' not in result.output


def test_cli_get_success(fake_htrmopo):
    from kraken_tpu.kraken import cli
    result = CliRunner().invoke(cli, ['get', '10.5281/zenodo.2'])
    assert result.exit_code == 0
    assert 'Model dir:' in result.output


def test_ketos_publish_new_record(fake_htrmopo, resources, tmp_path):
    from kraken_tpu.ketos import cli
    card_path = tmp_path / 'card.json'
    card_path.write_text(json.dumps({'summary': 'test model',
                                     'license': 'Apache-2.0'}))
    result = CliRunner().invoke(cli, [
        'publish', '-a', 'tok123', '-i', str(card_path),
        str(resources / 'overfit.mlmodel')])
    assert result.exit_code == 0, result.output
    assert '10.5281/zenodo.999' in result.output
    call = next(c for c in fake_htrmopo.calls if c[0] == 'publish_model')
    _, model_path, card, token, private = call
    assert model_path.endswith('overfit.mlmodel')
    assert token == 'tok123'
    assert private is False
    # metadata assembly: user card merged with kraken defaults and the
    # model types read from the file itself
    assert card['summary'] == 'test model'
    assert card['software_name'] == 'kraken'
    assert 'kraken_pytorch' in card['keywords']
    assert card['model_type'] == ['recognition']


def test_ketos_publish_doi_update(fake_htrmopo, resources):
    from kraken_tpu.ketos import cli
    result = CliRunner().invoke(cli, [
        'publish', '-a', 'tok456', '-d', '10.5281/zenodo.2', '--private',
        str(resources / 'overfit.mlmodel')])
    assert result.exit_code == 0, result.output
    assert '10.5281/zenodo.1000' in result.output
    call = next(c for c in fake_htrmopo.calls if c[0] == 'update_model')
    _, _, card, token, model_id, private = call
    assert model_id == '10.5281/zenodo.2'
    assert private is True
    assert card['software_name'] == 'kraken'
