"""
BaselineSet class-mapping matrix (reference: tests/test_dataset.py
TestBaselineSet): instantiation, filtering, merging via shared indices,
canonical/merged mapping properties, and ctor validation failures.
"""
import numpy as np
import pytest

PAGE = '170025120000003,0074'

AUX = {'_start_separator': 0, '_end_separator': 1}


@pytest.fixture(scope='module')
def doc(resources):
    from kraken_tpu.xml import XMLPage
    return XMLPage(resources / f'{PAGE}.xml').to_container()


@pytest.fixture(scope='module')
def transforms():
    from kraken_tpu.dataset import ImageInputTransforms
    return ImageInputTransforms(batch=1, height=200, width=100, channels=1, pad=0)


def _ds(class_mapping, transforms):
    from kraken_tpu.dataset import BaselineSet
    return BaselineSet(class_mapping=class_mapping, im_transforms=transforms)


def test_simple_xml(doc, transforms):
    ds = _ds({'aux': dict(AUX),
              'baselines': {'$pag': 2, '$pac': 3, '$tip': 4, '$par': 5},
              'regions': {'$pag': 6, '$pac': 7, '$tip': 8, '$par': 9}}, transforms)
    ds.add(doc)
    ds.add(doc)
    sample = ds[0]
    assert len(ds) == 2
    assert ds.num_classes == 10
    assert sample['image'].shape == (1, 200, 100)
    assert sample['target'].shape == (ds.num_classes, 200, 100)


def test_filter_baselines(doc, transforms):
    ds = _ds({'aux': dict(AUX),
              'baselines': {'$tip': 2, '$par': 3},
              'regions': {'$pag': 4, '$pac': 5, '$tip': 6, '$par': 7}}, transforms)
    ds.add(doc)
    assert ds.num_classes == 8
    # only mapped baseline types accumulate
    mapped = set(np.concatenate([[k] * len(v) for k, v in
                                 ds.targets[0]['baselines'].items()]).tolist()) \
        if ds.targets[0]['baselines'] else set()
    assert set(ds.targets[0]['baselines']) <= {2, 3}
    assert ds[0]['target'].shape == (8, 200, 100)


def test_filter_regions(doc, transforms):
    ds = _ds({'aux': dict(AUX),
              'baselines': {'$pag': 2, '$pac': 3, '$tip': 4, '$par': 5},
              'regions': {'$pag': 6, '$pac': 7}}, transforms)
    ds.add(doc)
    assert ds.num_classes == 8
    assert set(ds.targets[0]['regions']) <= {6, 7}
    assert ds[0]['target'].shape == (8, 200, 100)


def test_merge_baselines(doc, transforms):
    # $par and $tip share index 4 -> their lines merge into one class
    ds = _ds({'aux': dict(AUX),
              'baselines': {'$pag': 2, '$pac': 3, '$par': 4, '$tip': 4},
              'regions': {'$pag': 5, '$pac': 6, '$tip': 7, '$par': 8}}, transforms)
    ds.add(doc)
    assert ds.num_classes == 9
    assert len(ds.targets[0]['baselines'][4]) == 18  # 17 $par + 1 $tip
    assert ds[0]['target'].shape == (9, 200, 100)


def test_merge_and_filter_baselines(doc, transforms):
    ds = _ds({'aux': dict(AUX),
              'baselines': {'$tip': 2, '$pac': 2},
              'regions': {'$pag': 3, '$pac': 4, '$tip': 5, '$par': 6}}, transforms)
    ds.add(doc)
    assert ds.num_classes == 7
    assert len(ds.targets[0]['baselines'][2]) == 26  # 1 $tip + 25 $pac
    assert set(ds.targets[0]['baselines']) == {2}


def test_merge_and_filter_regions(doc, transforms):
    ds = _ds({'aux': dict(AUX),
              'baselines': {'$pag': 2, '$pac': 3, '$tip': 4, '$par': 5},
              'regions': {'$tip': 6, '$pac': 6}}, transforms)
    ds.add(doc)
    assert ds.num_classes == 7
    assert len(ds.targets[0]['regions'][6]) == 2  # 1 $tip + 1 $pac
    assert set(ds.targets[0]['regions']) == {6}


def test_canonical_class_mapping_no_merging(transforms):
    cm = {'aux': dict(AUX),
          'baselines': {'$pag': 2, '$pac': 3, '$tip': 4, '$par': 5},
          'regions': {'$pag': 6, '$pac': 7, '$tip': 8, '$par': 9}}
    assert _ds(cm, transforms).canonical_class_mapping == cm


def test_canonical_class_mapping_with_merging(transforms):
    ds = _ds({'aux': dict(AUX),
              'baselines': {'$pag': 2, '$pac': 3, '$par': 4, '$tip': 4},
              'regions': {'$pag': 5, '$pac': 6, '$tip': 7, '$par': 7}}, transforms)
    canonical = ds.canonical_class_mapping
    assert canonical['baselines'] == {'$pag': 2, '$pac': 3, '$par': 4}
    assert canonical['regions'] == {'$pag': 5, '$pac': 6, '$tip': 7}
    assert canonical['aux'] == AUX


def test_merged_classes_empty(transforms):
    ds = _ds({'aux': dict(AUX),
              'baselines': {'$pag': 2, '$pac': 3, '$tip': 4, '$par': 5},
              'regions': {'$pag': 6, '$pac': 7, '$tip': 8, '$par': 9}}, transforms)
    assert ds.merged_classes == {'aux': {}, 'baselines': {}, 'regions': {}}


def test_merged_classes_with_merging(transforms):
    ds = _ds({'aux': dict(AUX),
              'baselines': {'$pag': 2, '$pac': 3, '$par': 4, '$tip': 4},
              'regions': {'$pag': 5, '$pac': 6, '$tip': 7, '$par': 7}}, transforms)
    merged = ds.merged_classes
    assert merged['baselines'] == {'$par': ['$tip']}
    assert merged['regions'] == {'$tip': ['$par']}
    assert merged['aux'] == {}


def test_empty_baselines_and_regions(doc, transforms):
    ds = _ds({'aux': dict(AUX), 'baselines': {}, 'regions': {}}, transforms)
    ds.add(doc)
    assert len(ds) == 1
    assert ds.num_classes == 2
    assert dict(ds.targets[0]['baselines']) == {}
    assert dict(ds.targets[0]['regions']) == {}


@pytest.mark.parametrize('cm', [
    {'baselines': {'$par': 2}, 'regions': {'$par': 3}},                    # no aux
    {'aux': dict(AUX), 'regions': {'$par': 2}},                            # no baselines
    {'aux': dict(AUX), 'baselines': {'$par': 2}},                          # no regions
    {'aux': {'_end_separator': 1}, 'baselines': {'$par': 2}, 'regions': {'$par': 3}},
    {'aux': {'_start_separator': 0}, 'baselines': {'$par': 2}, 'regions': {'$par': 3}},
    {'aux': dict(AUX), 'baselines': {'$par': -2}, 'regions': {'$par': 3}},  # negative
    {'aux': dict(AUX), 'baselines': {'$par': 2.5}, 'regions': {'$par': 3}},  # non-int
    {'aux': dict(AUX), 'baselines': {'$par': 1}, 'regions': {'$par': 3}},  # reserved idx
    {'aux': dict(AUX), 'baselines': {'$par': 3}, 'regions': {'$reg': 3}},  # overlap
])
def test_invalid_class_mappings(cm, transforms):
    with pytest.raises(ValueError):
        _ds(cm, transforms)
