"""
BLLA segmentation pipeline tests: synthetic-heatmap vectorization and
polygonization behavior, plus an end-to-end smoke test of the neural
segmentation path with a random-weight U-Net.
"""
import numpy as np
import pytest
from PIL import Image
from scipy.ndimage import gaussian_filter

from kraken_tpu.lib.polygonization import calculate_polygonal_environment
from kraken_tpu.lib.vectorization import (sato_ridge, skeletonize,
                                          vectorize_lines, vectorize_regions)


@pytest.fixture(scope='module')
def synthetic_maps():
    H, W = 200, 400
    bl_map = np.zeros((H, W), np.float32)
    bl_map[50, 30:370] = 1.0
    bl_map[120, 40:350] = 1.0
    bl_map = np.clip(gaussian_filter(bl_map, 2) * 6, 0, 1)
    st_map = np.zeros_like(bl_map)
    st_map[40:60, 25:45] = 1.0
    st_map[110:130, 35:55] = 1.0
    end_map = np.zeros_like(bl_map)
    end_map[40:60, 355:375] = 1.0
    end_map[110:130, 340:360] = 1.0
    return np.stack([st_map, end_map, bl_map])


def test_sato_ridge_response(synthetic_maps):
    r = sato_ridge(synthetic_maps[2])
    # strong response on the baseline rows, none in empty space
    assert r[50, 200] > 0.17
    assert r[85, 200] < 0.05


def test_skeletonize_thin(synthetic_maps):
    mask = sato_ridge(synthetic_maps[2]) > 0.17
    skel = skeletonize(mask)
    assert skel.sum() < mask.sum() / 3
    # each column crossing the baseline has at most ~1 skeleton pixel
    assert skel[:, 200].sum() <= 2


def test_vectorize_lines(synthetic_maps):
    lines = vectorize_lines(synthetic_maps)
    assert len(lines) == 2
    ys = sorted(line[0][1] for line in lines)
    assert abs(ys[0] - 50) < 5
    assert abs(ys[1] - 120) < 5
    for line in lines:
        # oriented left-to-right by the separator maps
        assert line[0][0] < line[-1][0]
        # spans most of the drawn width
        assert line[-1][0] - line[0][0] > 250


def test_vectorize_lines_orientation_flip(synthetic_maps):
    # swapping start/end maps reverses the line direction
    flipped = synthetic_maps[(1, 0, 2), :, :]
    lines = vectorize_lines(flipped)
    assert len(lines) == 2
    for line in lines:
        assert line[0][0] > line[-1][0]


def test_vectorize_regions():
    region_map = np.zeros((200, 400), np.float32)
    region_map[30:140, 20:380] = 1.0
    regs = vectorize_regions(region_map)
    assert len(regs) == 1
    arr = np.array(regs[0])
    assert arr[:, 0].min() >= 18 and arr[:, 0].max() <= 382
    assert arr[:, 1].min() >= 28 and arr[:, 1].max() <= 142


def test_polygonal_environment():
    H, W = 200, 400
    img = np.full((H, W), 255, np.uint8)
    img[38:52, 30:370] = 60
    img[108:122, 40:350] = 60
    im = Image.fromarray(img)
    baselines = [[[30, 52], [370, 52]], [[40, 122], [350, 122]]]
    pols = calculate_polygonal_environment(im, baselines)
    assert all(p is not None for p in pols)
    arr = np.array(pols[0])
    # polygon covers the text band above the baseline
    assert arr[:, 1].min() <= 40
    assert arr[:, 1].max() >= 50
    # and does not bleed into the second line
    assert arr[:, 1].max() < 100


def test_polygonal_environment_topline():
    H, W = 200, 400
    img = np.full((H, W), 255, np.uint8)
    img[38:52, 30:370] = 60
    im = Image.fromarray(img)
    pols = calculate_polygonal_environment(im, [[[30, 38], [370, 38]]], topline=True)
    arr = np.array(pols[0])
    assert arr[:, 1].max() >= 50  # extends downward over the text


def test_polygonal_environment_tight_line_spacing():
    """Baselines ~10px apart leave only a sliver of ROI between the offset
    baseline and the neighbor's envelope; the valid region must be dilated
    (not eroded) before seam carving or such lines vanish (reference
    kraken/lib/segmentation.py:583-584 semantics)."""
    H, W = 60, 300
    img = np.full((H, W), 255, np.uint8)
    for y0 in (12, 22, 32, 42):
        img[y0:y0 + 6, 10:290] = 60
    im = Image.fromarray(img)
    baselines = [[[10, y], [290, y]] for y in (18, 28, 38, 48)]
    pols = calculate_polygonal_environment(im, baselines)
    assert all(p is not None for p in pols), pols


def test_polygonize_page_matches_per_line():
    """The device-batched page polygonizer (one XLA seam scan per page)
    returns exactly the per-line host results, including per-line
    supplementary boundary sets."""
    from kraken_tpu.lib.polygonization import gradient_feature_map, polygonize_page
    H, W = 200, 400
    img = np.full((H, W), 255, np.uint8)
    for y0 in (38, 78, 108, 148):
        img[y0:y0 + 14, 30:370] = 60
    im = Image.fromarray(img)
    baselines = [[[30, y + 14], [370, y + 14]] for y in (38, 78, 108, 148)]
    host = calculate_polygonal_environment(im, baselines)
    im_feats = gradient_feature_map(np.asarray(im))
    jobs = [(bl, baselines[:i] + baselines[i + 1:]) for i, bl in enumerate(baselines)]
    dev = polygonize_page(jobs, im_feats)
    assert dev == host


def test_device_vectorize_segmentation_equivalence():
    """SegmentationInferenceConfig(device_vectorize=True) produces the same
    Segmentation as the host path (bit-exact on matching backends)."""
    from kraken_tpu.configs import SegmentationInferenceConfig
    from kraken_tpu.inference.segmentation import prepare_segmentation, segmentation_pred
    from kraken_tpu.models import load_models
    model = load_models('tests/resources/blla_small.safetensors')[0]
    im = Image.open('tests/resources/170025120000003,0074.jpg')
    prepare_segmentation(model, SegmentationInferenceConfig(precision='32-true'))
    host = segmentation_pred(model, im)
    prepare_segmentation(model, SegmentationInferenceConfig(precision='32-true',
                                                            device_vectorize=True))
    dev = segmentation_pred(model, im)
    assert len(host.lines) == len(dev.lines)
    for a, b in zip(host.lines, dev.lines):
        assert a.baseline == b.baseline
        assert a.boundary == b.boundary


def test_uint8_input_transfer_segmentation_equivalence():
    """SegmentationInferenceConfig(input_transfer='uint8') ships the page
    as bytes and rescales on device; the quantized payload contract makes
    the resulting Segmentation identical to the float path."""
    from kraken_tpu.configs import SegmentationInferenceConfig
    from kraken_tpu.inference.segmentation import prepare_segmentation, segmentation_pred
    from kraken_tpu.models import load_models
    model = load_models('tests/resources/blla_small.safetensors')[0]
    im = Image.open('tests/resources/170025120000003,0074.jpg')
    prepare_segmentation(model, SegmentationInferenceConfig(precision='32-true'))
    ref = segmentation_pred(model, im)
    model._seg_fwd = None
    prepare_segmentation(model, SegmentationInferenceConfig(precision='32-true',
                                                            input_transfer='uint8'))
    u8 = segmentation_pred(model, im)
    assert len(ref.lines) == len(u8.lines)
    for a, b in zip(ref.lines, u8.lines):
        assert a.baseline == b.baseline
        assert a.boundary == b.boundary


def test_polygonal_environment_failure_returns_none():
    im = Image.fromarray(np.full((50, 50), 255, np.uint8))
    # degenerate single-point baseline
    pols = calculate_polygonal_environment(im, [[[10, 10], [10, 10]]])
    assert pols == [None]


def test_segmentation_end_to_end_smoke():
    """Random-weight seg model: full predict path runs and returns a
    Segmentation (content is meaningless but must be structurally valid)."""
    import jax
    from kraken_tpu.vgsl import VGSLModel
    from kraken_tpu.configs import SegmentationInferenceConfig

    model = VGSLModel(vgsl='[1,128,0,3 Cr3,3,8,2,2 Gn2 Cr3,3,16,2,2 Gn2 O2l4]',
                      rng=jax.random.PRNGKey(0))
    model.model_type = 'segmentation'
    model.user_metadata['class_mapping'] = {'aux': {'_start_separator': 0,
                                                    '_end_separator': 1},
                                            'baselines': {'default': 2},
                                            'regions': {'text': 3}}
    model.prepare_for_inference(SegmentationInferenceConfig())
    im = Image.fromarray(np.random.RandomState(0).randint(0, 255, (256, 320, 3), np.uint8))
    seg = model.predict(im)
    assert seg.type == 'baselines'
    assert isinstance(seg.lines, list)
    assert isinstance(seg.regions, dict)


def test_points_in_polygon_matches_scalar():
    """Batched crossing test agrees with the scalar predicate, including
    boundary and vertex points (both count as outside)."""
    from kraken_tpu.lib.geometry import point_in_polygon, points_in_polygon
    rng = np.random.RandomState(0)
    for _ in range(50):
        poly = rng.rand(rng.randint(3, 20), 2) * 100
        pts = rng.rand(16, 2) * 100
        pts[:2] = poly[:2]                       # vertices
        pts[2] = (poly[0] + poly[1]) / 2         # edge midpoint
        batch = points_in_polygon(pts, poly)
        scalar = np.array([point_in_polygon(p, poly) for p in pts])
        assert (batch == scalar).all()


def test_batched_cut_rays_match_scalar_sections():
    """precompute_polygon_sections (batched ray casts) is integer-identical
    to per-pair compute_polygon_section."""
    from kraken_tpu.lib.geometry import (compute_polygon_section,
                                         precompute_polygon_sections)
    rng = np.random.RandomState(1)
    for _ in range(10):
        n = rng.randint(2, 6)
        xs = np.sort(rng.randint(0, 600, n + 1))
        bl = np.stack([xs, 80 + rng.randint(-8, 8, n + 1)], 1)
        boundary = np.concatenate([bl + (0, -rng.randint(10, 30)),
                                   (bl + (0, rng.randint(10, 30)))[::-1]]).tolist()
        length = np.linalg.norm(np.diff(bl, axis=0), axis=1).sum()
        cuts, pos = [], 0.0
        while pos < length - 5:
            w = rng.rand() * 25 + 1
            cuts.append((pos, min(pos + w, length)))
            pos += w
        polys, _, _ = precompute_polygon_sections(bl.tolist(), boundary, cuts)
        for (d1, d2), p in zip(cuts, polys):
            ref = compute_polygon_section(bl.tolist(), boundary, d1, d2)
            assert list(map(list, p)) == list(map(list, ref))


def test_fused_ridge_matches_host_path(resources):
    """The fused-ridge forward (Sato + threshold on device inside the seg
    dispatch, inference/segmentation.py) produces the same detected
    baselines as the host Sato filter."""
    import warnings

    from PIL import Image
    from kraken_tpu.configs import SegmentationInferenceConfig
    from kraken_tpu.models import load_models
    from kraken_tpu.inference.segmentation import (prepare_segmentation,
                                                   segmentation_pred)

    im = Image.open(resources / '170025120000003,0074.jpg')
    segs = {}
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        for fused in (False, True):
            m = load_models(resources / 'blla_small.safetensors')[0]
            prepare_segmentation(m, SegmentationInferenceConfig(fused_ridge=fused))
            segs[fused] = segmentation_pred(m, im)
    assert len(segs[True].lines) == len(segs[False].lines)
    for a, b in zip(segs[True].lines, segs[False].lines):
        assert a.baseline == b.baseline
        assert a.boundary == b.boundary


def test_segmentation_pred_batch_quality(resources):
    """Page-batched segmentation (one dispatch per page group) detects the
    same lines as per-page prediction; geometry may differ at the shared
    width bucket's bilinear half-pixel."""
    import warnings

    import numpy as np
    from PIL import Image
    from kraken_tpu.configs import SegmentationInferenceConfig
    from kraken_tpu.models import load_models
    from kraken_tpu.inference.segmentation import (prepare_segmentation,
                                                   segmentation_pred,
                                                   segmentation_pred_batch)
    from kraken_tpu.lib.segmentation_metrics import (compute_detection_metrics,
                                                     interpolate_polyline)

    im = Image.open(resources / '170025120000003,0074.jpg')
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        m = load_models(resources / 'blla_small.safetensors')[0]
        prepare_segmentation(m, SegmentationInferenceConfig())
        single = segmentation_pred(m, im)
        batched = segmentation_pred_batch(m, [im, im])
    assert len(batched) == 2
    ref = [interpolate_polyline(np.array(l.baseline, float)) for l in single.lines]
    for seg in batched:
        pred = [interpolate_polyline(np.array(l.baseline, float)) for l in seg.lines]
        det = compute_detection_metrics(pred, ref, tol=10.0)
        assert det['f1'] >= 0.95, det


def test_process_pages_segmenter_batch(resources):
    """process_pages with a batched segmenter yields every page in order."""
    import warnings

    from PIL import Image
    from kraken_tpu.configs import (RecognitionInferenceConfig,
                                    SegmentationInferenceConfig)
    from kraken_tpu.models import load_models
    from kraken_tpu.inference.segmentation import (prepare_segmentation,
                                                   segmentation_pred,
                                                   segmentation_pred_batch)
    from kraken_tpu.pipeline import process_pages

    im = Image.open(resources / '170025120000003,0074.jpg')
    im.load()  # shared across prefetch threads: decode once up front
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        seg_model = load_models(resources / 'blla_small.safetensors')[0]
        prepare_segmentation(seg_model, SegmentationInferenceConfig())
        rec_model = load_models(resources / 'overfit_bl.safetensors')[0]
        rec_model.prepare_for_inference(RecognitionInferenceConfig(
            batch_size=8, num_line_workers=0))
        out = list(process_pages(
            [im] * 3, rec_model,
            lambda p: segmentation_pred(seg_model, p),
            segmenter_batch=lambda ps: segmentation_pred_batch(seg_model, ps),
            seg_batch=2))
    assert len(out) == 3
    for _im, seg, recs in out:
        assert len(recs) == len(seg.lines) > 0


def test_native_endpoint_linking_matches_python():
    """The C++ link_endpoint_paths must agree with the scipy fallback on
    unambiguous skeletons (identical paths); on tie-prone 2px-wide
    skeletons the native path may break equal-cost ties differently but
    must connect the same endpoint pairs."""
    import numpy as np
    from kraken_tpu import native
    import kraken_tpu.lib.vectorization as V
    if not native.available():
        pytest.skip('no C++ compiler')

    # a straight horizontal skeleton with a 2px gap (bridged via the halo)
    skel = np.zeros((32, 64), bool)
    skel[10, 5:30] = True
    skel[10, 32:60] = True
    # an isolated short diagonal segment, unreachable from the others
    for i in range(6):
        skel[20 + i, 5 + i] = True
    extrema = np.array([[10, 5], [10, 29], [10, 32], [10, 59],
                        [20, 5], [25, 10]])

    pn = native.link_paths_native(skel, extrema)
    saved = native.link_paths_native
    native.link_paths_native = lambda *a, **k: None
    try:
        pp = V._link_endpoints(skel, extrema)
    finally:
        native.link_paths_native = saved

    assert len(pn) == len(pp)
    ends = lambda paths: sorted((tuple(p[0]), tuple(p[-1])) for p in paths)
    assert ends(pn) == ends(pp)
    # equal-cost ties may resolve differently (native prefers straight
    # steps); the contract is: same pairs, same path length, every point on
    # the skeleton or its 1px halo
    import cv2
    halo = cv2.dilate(skel.astype(np.uint8), np.ones((3, 3), np.uint8)).astype(bool)
    for a, b in zip(sorted(pn, key=lambda p: tuple(map(tuple, p[[0, -1]]))),
                    sorted(pp, key=lambda p: tuple(map(tuple, p[[0, -1]])))):
        assert len(a) == len(b)
        assert halo[np.asarray(a)[:, 0], np.asarray(a)[:, 1]].all()
    # the straight pieces connect through the gap: one path spans 5..59
    spans = [(p[:, 1].min(), p[:, 1].max()) for p in pn]
    assert (5, 59) in spans
