"""
Dataset/pipeline unit tests (reference: tests/test_arrow_dataset.py,
test_dataset.py, test_lineest.py, test_binarization.py, test_train_utils.py):
Arrow compilation round trips, ground-truth datasets, centerline dewarping,
host binarization, and LR schedule construction.
"""
import numpy as np
import pytest
from PIL import Image


def _line_transforms():
    from kraken_tpu.dataset import ImageInputTransforms
    return ImageInputTransforms(1, 48, 0, 1, 0, valid_norm=False)


def test_arrow_roundtrip_xml(resources, tmp_path):
    from kraken_tpu.dataset import ArrowIPCRecognitionDataset
    from kraken_tpu.dataset.arrow import build_binary_dataset

    out = tmp_path / 'ds.arrow'
    build_binary_dataset([str(resources / '170025120000003,0074.xml')],
                         output_file=str(out), format_type='xml')
    ds = ArrowIPCRecognitionDataset(im_transforms=_line_transforms())
    ds.add(str(out))
    assert len(ds) > 0
    assert len(ds.alphabet) > 0
    sample = ds[0]
    assert sample['image'].ndim == 3       # (C, H, W)
    # without a codec, target is the transformed text itself
    assert isinstance(sample['target'], str) and sample['target']


def test_arrow_random_split(resources, tmp_path):
    from kraken_tpu.dataset import ArrowIPCRecognitionDataset
    from kraken_tpu.dataset.arrow import build_binary_dataset

    out = tmp_path / 'ds.arrow'
    build_binary_dataset([str(resources / '170025120000003,0074.xml')],
                         output_file=str(out), format_type='xml',
                         random_split=(0.8, 0.1, 0.1))
    full = ArrowIPCRecognitionDataset()
    full.add(str(out))
    train = ArrowIPCRecognitionDataset(split_filter='train')
    train.add(str(out))
    assert 0 < len(train) <= len(full)


def test_arrow_path_format(resources, tmp_path):
    from kraken_tpu.dataset import ArrowIPCRecognitionDataset
    from kraken_tpu.dataset.arrow import build_binary_dataset

    out = tmp_path / 'ds.arrow'
    build_binary_dataset([str(resources / 'merge_tests' / '0006.jpg'),
                          str(resources / 'merge_tests' / '0007.jpg')],
                         output_file=str(out), format_type='path')
    ds = ArrowIPCRecognitionDataset()
    ds.add(str(out))
    assert len(ds) == 2


def test_groundtruth_dataset(resources):
    from kraken_tpu.dataset import GroundTruthDataset
    from kraken_tpu.lib.util import parse_gt_path

    ds = GroundTruthDataset(im_transforms=_line_transforms())
    ds.add(line=parse_gt_path(str(resources / 'merge_tests' / '0008.jpg')))
    ds.encode()
    sample = ds[0]
    assert sample['image'].ndim == 3
    assert len(sample['target']) > 0


def test_centerline_dewarp():
    from kraken_tpu.lib.lineest import CenterNormalizer

    # synthetic line: bright stroke drifting vertically across the image
    img = np.zeros((60, 200), float)
    for x in range(200):
        y = 30 + int(10 * np.sin(x / 40))
        img[y - 2:y + 2, x] = 1.0
    cn = CenterNormalizer(target_height=48)
    cn.measure(img)
    out = cn.normalize(img)
    assert out.shape[0] == 48
    # after dewarping the stroke's row-profile should concentrate mid-image
    profile = out.sum(axis=1)
    assert profile.argmax() == pytest.approx(24, abs=8)


def test_scale_to_h():
    from kraken_tpu.lib.lineest import scale_to_h
    img = np.random.rand(60, 200)
    out = scale_to_h(img, 30)
    assert out.shape == (30, 100)


def test_nlbin_host(resources):
    from kraken_tpu.binarization import nlbin
    from kraken_tpu.lib.util import is_bitonal
    res = nlbin(Image.open(resources / 'input.jpg').convert('RGB')
                if (resources / 'input.jpg').exists()
                else Image.open(resources / 'bw.png').convert('RGB'))
    assert res.mode in ('1', 'L')
    assert is_bitonal(res)


def test_lr_schedules():
    from kraken_tpu.configs import RecognitionTrainingConfig
    from kraken_tpu.train.optim import build_lr_schedule

    # warmup ramps linearly to the base rate
    config = RecognitionTrainingConfig(lrate=1e-3, warmup=10, schedule='constant')
    sched = build_lr_schedule(config, steps_per_epoch=5)
    assert float(sched(0)) < float(sched(5)) <= float(sched(20))
    assert float(sched(20)) == pytest.approx(1e-3)

    # cosine decays towards cos_min_lr
    config = RecognitionTrainingConfig(lrate=1e-3, schedule='cosine',
                                       cos_t_max=10, cos_min_lr=1e-5)
    sched = build_lr_schedule(config, steps_per_epoch=1)
    assert float(sched(0)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(10)) == pytest.approx(1e-5, rel=1e-2)

    # exponential decays by gamma per epoch
    config = RecognitionTrainingConfig(lrate=1e-3, schedule='exponential', gamma=0.5)
    sched = build_lr_schedule(config, steps_per_epoch=2)
    assert float(sched(2)) == pytest.approx(5e-4, rel=1e-3)


def test_default_augmenter_shapes():
    from kraken_tpu.dataset.augmentation import DefaultAugmenter
    aug = DefaultAugmenter(seed=42)
    img = np.random.rand(1, 48, 200).astype(np.float32)
    for i in range(8):
        out = aug(img, i)
        assert out.shape == img.shape
        assert out.dtype == img.dtype
        assert np.isfinite(out).all()


def test_segmentation_augmenter_shapes():
    from kraken_tpu.dataset.augmentation import SegmentationAugmenter
    aug = SegmentationAugmenter(seed=42)
    img = np.random.rand(3, 128, 96).astype(np.float32)
    target = (np.random.rand(5, 128, 96) > 0.5).astype(np.float32)
    out_img, out_t = aug(img, target)
    assert out_img.shape == img.shape
    assert out_t.shape == target.shape


def test_training_with_augmentation(resources, tmp_path):
    from kraken_tpu.configs import (RecognitionTrainingConfig,
                                    RecognitionTrainingDataConfig)
    from kraken_tpu.train import (KrakenTrainer, RecognitionDataModule,
                                  RecognitionModel)
    config = RecognitionTrainingConfig(
        spec='[1,32,0,1 Cr3,3,4,2,2 S1(1x0)1,3 Lbx8 Do0.1,2]',
        epochs=1, lrate=1e-3, checkpoint_path=str(tmp_path / 'model'))
    data_config = RecognitionTrainingDataConfig(
        format_type='binary', augment=True,
        training_data=[str(resources / 'merge_tests' / 'base.arrow')],
        batch_size=1)
    dm = RecognitionDataModule(data_config)
    module = RecognitionModel(config)
    KrakenTrainer(config, fast_dev_run=True).fit(module, dm)
    assert module.net.codec is not None


def test_levenshtein_and_cer():
    from kraken_tpu.train.metrics import CharErrorRate, WordErrorRate, levenshtein

    assert levenshtein('kitten', 'sitting') == 3
    assert levenshtein('', 'abc') == 3
    assert levenshtein('abc', 'abc') == 0

    cer = CharErrorRate()
    cer.update('abcd', 'abcf')        # 1 sub over 4 chars
    cer.update('xyz', 'xyz')          # perfect over 3 chars
    assert cer.compute() == pytest.approx(1 / 7)

    wer = WordErrorRate()
    wer.update('the cat sat', 'the dog sat')
    assert wer.compute() == pytest.approx(1 / 3)


def test_script_attribution_ucd_exact(resources):
    """
    Per-script attribution uses exact UCD Script property ranges
    (kraken_tpu/dataset/_scripts_ranges.json, generated by
    contrib/generate_scripts.py from the regex module's Unicode tables).

    Deviation from the reference recorded here: the reference's shipped
    scripts.json is lossy — its Arabic entry covers only U+0641..U+064A, so
    most of the Arabic block (U+0621..U+063A) falls to 'Unknown' in its test
    reports. This table follows the UCD, so the arabic fixture buckets
    entirely into Arabic/Inherited/Common.
    """
    import pickle
    from collections import Counter
    from kraken_tpu.dataset.utils import _get_script

    # exact property spot checks, incl. cases the old name-prefix heuristic
    # got wrong (DEVANAGARI DANDA is Script=Common; combining marks are
    # Inherited)
    assert _get_script('a') == 'Latin'
    assert _get_script('ب') == 'Arabic'
    assert _get_script('א') == 'Hebrew'
    assert _get_script('।') == 'Common'      # DEVANAGARI DANDA
    assert _get_script('̀') == 'Inherited'   # COMBINING GRAVE ACCENT
    assert _get_script('。') == 'Common'      # IDEOGRAPHIC FULL STOP
    assert _get_script('\U0010fffe') == 'Unknown'  # unassigned

    # bucketing of the arabic golden records is total and correct
    with open(resources / 'arabic_bl_records.pkl', 'rb') as fp:
        recs = pickle.load(fp)
    text = ''.join(r['prediction'] for r in recs)
    counts = Counter(_get_script(c) for c in text)
    assert counts == {'Arabic': 1278, 'Inherited': 52, 'Common': 293}


def test_global_align_roundtrip():
    from kraken_tpu.dataset.utils import global_align
    d, algn_gt, algn_pred = global_align('abcde', 'abde')
    assert d == 1
    # alignments have equal length and reconstruct the originals
    assert ''.join(x for x in algn_gt if x) == 'abcde'
    assert ''.join(x for x in algn_pred if x) == 'abde'
    assert len(algn_gt) == len(algn_pred)


# ---------------------------------- ImageInputTransforms rule matrix
# (reference: tests/test_dataset.py TestInputTransforms)
def _check_transform_output(config, im, out):
    import numpy as np
    from kraken_tpu.lib.util import is_bitonal, pil2array
    if config['height'] != 0 and config['channels'] <= 3:
        assert out.shape[1] == config['height']
    if config['width'] != 0:
        assert out.shape[2] == config['width']
    if config['force_binarization'] or is_bitonal(pil2array(im)):
        # int cast collapses resampling grays, as the reference's check does
        assert len(np.unique(out.astype(int))) == 2
    if config['channels'] == 3:
        assert out.shape[0] == 3


@pytest.mark.parametrize('cfg,expect_cn', [
    ({'batch': 1, 'height': 48, 'width': 0, 'channels': 1, 'pad': (16, 0),
      'valid_norm': False, 'force_binarization': False}, False),
    ({'batch': 1, 'height': 48, 'width': 0, 'channels': 1, 'pad': (16, 0),
      'valid_norm': True, 'force_binarization': False}, True),
    ({'batch': 1, 'height': 48, 'width': 0, 'channels': 3, 'pad': (16, 0),
      'valid_norm': False, 'force_binarization': False}, False),
    ({'batch': 1, 'height': 48, 'width': 0, 'channels': 3, 'pad': (16, 0),
      'valid_norm': True, 'force_binarization': False}, False),
])
def test_input_transforms_rules(resources, cfg, expect_cn):
    """Ctor attributes round-trip and centerline norm activates only for
    1-channel fixed-height inputs with valid_norm."""
    from PIL import Image
    from kraken_tpu.dataset import ImageInputTransforms
    im = Image.open(resources / '000236.png')
    tf = ImageInputTransforms(**cfg)
    for k, v in cfg.items():
        assert getattr(tf, k) == v
    assert tf.centerline_norm == expect_cn
    _check_transform_output(cfg, im, tf(im))


def test_input_transforms_channel_height(resources):
    """height==1 with >3 channels means a channels-as-height line network:
    the height moves into the channel dimension."""
    from PIL import Image
    from kraken_tpu.dataset import ImageInputTransforms
    im = Image.open(resources / '000236.png')
    cfg = {'batch': 1, 'height': 1, 'width': 0, 'channels': 72, 'pad': (16, 0),
           'valid_norm': False, 'force_binarization': False}
    tf = ImageInputTransforms(**cfg)
    assert tf.channels == 1
    assert tf.height == 72
    assert not tf.centerline_norm
    out = tf(im)
    assert out.shape[0] == 72
    assert out.shape[1] == 1


def test_input_transforms_invalid_channels(resources):
    from kraken_tpu.dataset import ImageInputTransforms
    from kraken_tpu.exceptions import KrakenInputException
    with pytest.raises(KrakenInputException):
        ImageInputTransforms(batch=1, height=48, width=0, channels=4,
                             pad=(16, 0), valid_norm=False)


def test_input_transforms_uint8_bit_identical(resources):
    """The uint8 output mode (byte device uploads) must produce exactly the
    quantized float pipeline's payload: round(clip(float_ts, 0, 1)*255) ==
    uint8_ts for every pixel (inference/recognition.py dispatches this
    payload verbatim when input_transfer='uint8')."""
    import numpy as np
    from PIL import Image
    from kraken_tpu.dataset import ImageInputTransforms
    for path, cfg in [
            ('000236.png', dict(batch=1, height=48, width=0, channels=1,
                                pad=(16, 0), valid_norm=False)),
            ('000236.png', dict(batch=1, height=48, width=0, channels=1,
                                pad=(1, 0), valid_norm=True)),  # centerline norm
            ('170025120000003,0074.jpg', dict(batch=1, height=120, width=0,
                                              channels=1, pad=(16, 0),
                                              valid_norm=False))]:
        im = Image.open(resources / path)
        tf_f = ImageInputTransforms(**cfg, dtype=np.float32)
        tf_u = ImageInputTransforms(**cfg, dtype=np.uint8)
        f = tf_f(im)
        u = tf_u(im)
        assert u.dtype == np.uint8
        assert f.shape == u.shape
        q = np.round(np.clip(f, 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal(q, u)
