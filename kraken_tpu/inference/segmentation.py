"""
kraken_tpu.inference.segmentation
~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~

BLLA neural page segmentation inference.

Pipeline (functional equivalent of the reference mixin
kraken/lib/vgsl/spred.py):

  host: resize page to network height → tensor
  device: jitted U-Net forward → bilinear upsample to input size → sigmoid
  host: baseline/region vectorization → seam-carve polygonization →
        region association → reading order

The forward, upsampling, and sigmoid are fused into one XLA program so only
the final heatmap stack crosses back to the host.
"""
import logging
import uuid
from typing import TYPE_CHECKING, Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kraken_tpu.containers import BaselineLine, Region, Segmentation
from kraken_tpu.dataset import ImageInputTransforms
from kraken_tpu.lib.geometry import (line_midpoint, points_in_polygon,
                                     scale_polygonal_lines, scale_regions)
from kraken_tpu.lib.polygonization import calculate_polygonal_environment, gradient_feature_map
from kraken_tpu.lib.util import is_bitonal
from kraken_tpu.lib.vectorization import vectorize_lines, vectorize_regions

if TYPE_CHECKING:
    from PIL import Image
    from kraken_tpu.vgsl import VGSLModel

logger = logging.getLogger(__name__)

__all__ = ['prepare_segmentation', 'segmentation_pred',
           'segmentation_pred_batch', 'vec_regions', 'vec_lines']


def _probe_link_mbps(device) -> float:
    """One-shot host→device bandwidth probe (4 MB byte upload, best of 2)
    used by heatmap_precision='auto' to pick the transfer policy: the
    tunnel to a remote TPU swings 2-10x between minutes but stays orders
    of magnitude below local PCIe, which is the distinction that matters."""
    import time
    x = np.zeros((4, 1024, 1024), np.uint8)
    f = jax.jit(lambda a: a.sum(dtype=jnp.int32))
    int(f(jax.device_put(jnp.asarray(x), device)))  # compile + warm
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        int(f(jax.device_put(jnp.asarray(x), device)))
        best = min(best, time.perf_counter() - t0)
    return 4 * 8 / best  # Mbit/s


def _maxpool20(x: jnp.ndarray) -> jnp.ndarray:
    """scipy.ndimage.maximum_filter(size=20, mode='reflect') on a (N, H, W)
    stack: symmetric edge padding (scipy 'reflect' == np.pad 'symmetric')
    then a VALID 20x20 max-window with scipy's origin-0 anchor (offsets
    -10..+9 for even sizes)."""
    xp = jnp.pad(x, ((0, 0), (10, 9), (10, 9)), mode='symmetric')
    return jax.lax.reduce_window(xp, -jnp.inf, jax.lax.max,
                                 (1, 20, 20), (1, 1, 1), 'VALID')


def _packbits_w(m: jnp.ndarray) -> jnp.ndarray:
    """Bit-packs a boolean (..., W) array along W, 8 pixels/byte, MSB
    first — the exact layout np.unpackbits(axis=-1) reverses."""
    w = m.shape[-1]
    w8 = -(-w // 8)
    pad = [(0, 0)] * (m.ndim - 1) + [(0, w8 * 8 - w)]
    m = jnp.pad(m, pad).reshape(*m.shape[:-1], w8, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (m * weights).sum(-1, dtype=jnp.uint8)


def prepare_segmentation(model: 'VGSLModel', config) -> None:
    """Sets up device placement and the jitted forward+upsample+sigmoid.

    With ``config.devices > 1`` the page-batch forward runs SPMD over a 1-D
    mesh — parameters replicated, the page stack sharded on its batch dim —
    so multi-page segmentation (`segmentation_pred_batch`, the pipeline's
    ``seg_batch`` fan-out) spreads over every chip instead of leaving N-1
    idle (SURVEY §2.5 TPU mapping; the reference's analog is Lightning
    device placement, kraken/lib/vgsl/model.py:518-525)."""
    from kraken_tpu.inference.recognition import _PRECISION_DTYPES, _resolve_device
    from kraken_tpu.lib.util import enable_xla_cache
    enable_xla_cache()
    model._inf_config = config
    dtype = _PRECISION_DTYPES.get(getattr(config, 'precision', '32-true'), jnp.float32)
    model._m_dtype = dtype
    n_dev = int(getattr(config, 'devices', 1) or 1)
    mesh = None
    if n_dev > 1:
        from kraken_tpu.parallel import make_mesh, batch_sharding, replicate
        available = jax.devices()
        if len(available) < n_dev:
            raise ValueError(f'devices={n_dev} requested but only '
                             f'{len(available)} jax device(s) are visible')
        mesh = make_mesh(available[:n_dev])
        repl = replicate(mesh)
        model._seg_batch_sharding = batch_sharding(mesh)
        device = available[0]
        place = lambda x: jax.device_put(x, repl)
    else:
        device = _resolve_device(config)
        model._seg_batch_sharding = None
        place = lambda x: jax.device_put(x, device)
    model._seg_mesh = mesh
    model._device = device
    cast = lambda x: place(x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x)
    model._inf_params = jax.tree.map(cast, model.params)
    # the compiled forward closes over transfer mode, dtype, and mesh:
    # rebuild when re-prepared with a different combination
    fwd_key = (getattr(config, 'input_transfer', 'float'),
               getattr(config, 'heatmap_precision', 'float32'),
               bool(getattr(config, 'fused_ridge', True)), str(dtype), n_dev)
    if getattr(model, '_seg_fwd', None) is None \
            or getattr(model, '_seg_fwd_key', None) != fwd_key:
        model._seg_fwd_key = fwd_key
        net = model.net
        cls_map = model.user_metadata.get('class_mapping') or {}
        # fused ridge: the Sato tubularity filter of every baseline channel
        # runs inside the SAME dispatch as the forward (ops/ridge._sato_core
        # over the full-precision sigmoid, pre-quantization) and only the
        # thresholded binary maps cross back — this removes the hottest
        # host step of vectorization (~150 ms/page on a 1-core host) at
        # zero extra round trips. The stand-alone device_vectorize path
        # pays one dispatch per op and loses on tunneled links; fusion
        # doesn't.
        fused_ridge = bool(getattr(config, 'fused_ridge', True))
        bl_channels = tuple(sorted(
            cls_map.get('baselines', {}).values())) if fused_ridge else ()
        ridge_threshold = float(getattr(config, 'ridge_threshold', 0.17))
        # byte page uploads: dequantize on device (the host tail produced
        # the quantized payload; values match the float pipeline exactly)
        dequant = getattr(config, 'input_transfer', 'float') == 'uint8'

        hm_prec = getattr(config, 'heatmap_precision', 'float32')
        if hm_prec == 'auto':
            # tunnel-grade link → every byte counts → packed binary masks;
            # local PCIe → keep the near-parity quantized heatmaps
            hm_prec = 'packbits' if _probe_link_mbps(device) < 500 else 'uint8'
        region_channels = tuple(sorted(cls_map.get('regions', {}).values()))
        aux = cls_map.get('aux', {})
        if hm_prec == 'packbits' and (not bl_channels
                                      or '_start_separator' not in aux
                                      or '_end_separator' not in aux):
            hm_prec = 'uint8'  # packed masks need the fused-ridge layout
        # 'uint8' quantizes the sigmoid heatmaps on device before the
        # host transfer (4x less data — the dominant cost on remote TPUs);
        # vectorization thresholds are coarse, so 1/255 quantization is
        # inconsequential, but 'float32' remains the parity-exact default
        quantize = hm_prec == 'uint8'

        if hm_prec == 'packbits':
            st_sep, end_sep = aux['_start_separator'], aux['_end_separator']

            def fwd(params, x, out_h, out_w, seq_lens=None):
                from kraken_tpu.ops.ridge import _sato_core_batch
                if dequant:
                    x = (x.astype(jnp.float32) / 255.0).astype(dtype)
                logits, _ = net.apply(params, x, seq_lens)
                logits = jax.image.resize(logits.astype(jnp.float32),
                                          (logits.shape[0], logits.shape[1], out_h, out_w),
                                          method='bilinear')
                probs = jax.nn.sigmoid(logits)
                masks = [probs[:, c] > 0.5 for c in region_channels]
                # separator orientation: the host consumes the 20x20
                # max-filtered start/end maps ONLY through sign tests of
                # their difference against +-0.2 (lib/vectorization.py
                # orientation votes), so ship the two decision masks —
                # computed from the full-precision sigmoid, one bit each
                diff = _maxpool20(probs[:, st_sep]) - _maxpool20(probs[:, end_sep])
                masks += [diff > 0.2, diff < -0.2]
                p = probs[:, jnp.array(bl_channels)]
                n, c, h, w = p.shape
                ridges = _sato_core_batch(p.reshape(n * c, h, w)).reshape(n, c, h, w)
                masks += [ridges[:, j] > ridge_threshold for j in range(c)]
                return _packbits_w(jnp.stack(masks, 1))
        else:
            def fwd(params, x, out_h, out_w, seq_lens=None):
                from kraken_tpu.ops.ridge import _sato_core_batch
                if dequant:
                    x = (x.astype(jnp.float32) / 255.0).astype(dtype)
                logits, _ = net.apply(params, x, seq_lens)
                logits = jax.image.resize(logits.astype(jnp.float32),
                                          (logits.shape[0], logits.shape[1], out_h, out_w),
                                          method='bilinear')
                probs = jax.nn.sigmoid(logits)
                heat = jnp.round(probs * 255).astype(jnp.uint8) if quantize else probs
                if bl_channels:
                    p = probs[:, jnp.array(bl_channels)]
                    n, c, h, w = p.shape
                    ridges = _sato_core_batch(p.reshape(n * c, h, w)).reshape(n, c, h, w)
                    return heat, (ridges > ridge_threshold).astype(jnp.uint8)
                return heat

        if mesh is None:
            model._seg_fwd = jax.jit(fwd, static_argnums=(2, 3))
        else:
            from kraken_tpu.parallel import replicate

            def fwd_mesh(params, x, seq_lens, out_h, out_w):
                # statics reordered to the tail so in_shardings lines up
                # with the dynamic (params, pages, seq_lens) triple
                return fwd(params, x, out_h, out_w, seq_lens)

            data = model._seg_batch_sharding
            model._seg_fwd = jax.jit(
                fwd_mesh, static_argnums=(3, 4),
                in_shardings=(replicate(mesh), data, data),
                out_shardings=data)
        model._seg_fused_channels = bl_channels
        model._seg_transfer = hm_prec
        model._seg_packed_regions = region_channels


def vec_regions(heatmap: np.ndarray, cls_map: dict, scale, **kwargs) -> dict[str, list[Region]]:
    """Vectorizes all region classes of the heatmap stack into Regions."""
    regions = {}
    for region_type, idx in cls_map['regions'].items():
        logger.debug(f'Extracting region polygons for class {region_type}')
        polygons = vectorize_regions(heatmap[idx])
        regions[region_type] = [Region(id=f'_{uuid.uuid4()}', boundary=x,
                                       tags={'type': [{'type': region_type}]})
                                for x in scale_regions(polygons, scale)]
    return regions


def vec_lines(heatmap: np.ndarray,
              cls_map: dict[str, dict[str, int]],
              scale,
              text_direction: str = 'horizontal-lr',
              regions: list = None,
              scal_im: np.ndarray = None,
              suppl_obj: list = None,
              topline: bool = False,
              raise_on_error: bool = False,
              device_vectorize: bool = False,
              bin_maps: Optional[dict] = None,
              sep_filters: Optional[tuple] = None,
              **kwargs) -> list[dict[str, Any]]:
    """
    Vectorizes and polygonizes all baseline classes of the heatmap stack.

    Args:
        device_vectorize: run the Sato ridge filter and the seam-carve DPs
            on the accelerator (ops/ridge.py, ops/seam.py) instead of the
            host; identical results, fewer host cycles per page.
        sep_filters: precomputed max-filtered (start, end) separator maps
            (supplied by the packed-binary transfer path, which runs the
            20x20 max filter on device); computed on the host otherwise.

    Returns:
        list of dicts with tags/baseline/boundary per line.
    """
    ridge_fn = None
    seam_carver = 'host'
    if device_vectorize:
        from kraken_tpu.ops.ridge import sato_ridge_device
        ridge_fn = sato_ridge_device
        seam_carver = 'device'
    st_sep = cls_map['aux']['_start_separator']
    end_sep = cls_map['aux']['_end_separator']
    if sep_filters is None:
        from kraken_tpu.lib.fastfilters import maximum_filter
        sep_filters = (maximum_filter(heatmap[st_sep], size=20),
                       maximum_filter(heatmap[end_sep], size=20))
    baselines = []
    for bl_type, idx in cls_map['baselines'].items():
        logger.debug(f'Extracting baselines for class {bl_type}')
        baselines.extend((bl_type, bl) for bl in
                         vectorize_lines(heatmap[(st_sep, end_sep, idx), :, :],
                                         text_direction=text_direction[:-3],
                                         ridge_fn=ridge_fn,
                                         sep_filters=sep_filters,
                                         bin_map=(bin_maps or {}).get(idx)))
    im_feats = gradient_feature_map(scal_im)
    regions = regions or []
    # batched midpoint-in-region tests: one vectorized crossing test per
    # region over all baselines instead of lines x regions separate calls
    mids = np.array([line_midpoint(bl) for _, bl in baselines]) \
        if baselines else np.zeros((0, 2))
    in_reg = np.stack([points_in_polygon(mids, reg) for reg in regions]) \
        if regions and len(baselines) else np.zeros((0, len(baselines)), bool)
    jobs = []
    for idx, (bl_type, bl) in enumerate(baselines):
        other = [b for _, b in baselines[:idx] + baselines[idx + 1:]]
        other.extend(reg for reg_i, reg in enumerate(regions) if in_reg[reg_i, idx])
        jobs.append((bl, other))
    from kraken_tpu.lib.polygonization import polygonize_page
    pols = polygonize_page(jobs, im_feats, topline=topline,
                           raise_on_error=raise_on_error,
                           seam_carver=seam_carver)
    lines = [(bl_type, bl, pol)
             for (bl_type, bl), pol in zip(baselines, pols) if pol is not None]
    scaled = scale_polygonal_lines([x[1:] for x in lines], scale)
    return [{'tags': {'type': [{'type': bl_type}]}, 'baseline': bl, 'boundary': pl}
            for (bl_type, _, _), (bl, pl) in zip(lines, scaled)]


def _page_resize(img: 'Image.Image', scale: tuple[int, int]) -> 'Image.Image':
    """
    Resizes a full page to the network input size ((height, width), a 0 dim
    inferred proportionally) with the same Lanczos filter the training
    transform uses. Deliberately NOT a faster resampler: trained
    segmentation nets are sensitive to the resampling spectrum of their
    inputs (box/area filtering triples the spurious-baseline count of the
    frozen blla_small fixture), so inference must match training exactly.
    """
    from kraken_tpu.dataset.transforms import _fixed_resize
    from PIL import Image as PILImage
    # the byte-exact native Lanczos (kraken_tpu/native) beats even PIL's
    # reducing_gap=3.0 approximation on this host (118 vs 165 ms on an RGB
    # page) while restoring the exact filter, so it is preferred; the gap
    # path remains the fallback without a compiler. The quality-sensitive
    # failure mode documented above is box/area filtering all the way down.
    w, h = img.size
    oh, ow = scale
    if oh == 0:
        oh = max(1, int(h * ow / w))
    elif ow == 0:
        ow = max(1, int(w * oh / h))
    if img.mode in ('L', 'RGB'):
        from kraken_tpu import native
        out = native.resize_lanczos_native(np.asarray(img), oh, ow)
        if out is not None:
            return PILImage.fromarray(out, img.mode)
    return img.resize((ow, oh), PILImage.Resampling.LANCZOS, reducing_gap=3.0)


def _compute_segmentation_maps(model: 'VGSLModel', ims: list) -> list[dict[str, Any]]:
    """
    Runs the network over one or more pages and returns per-page upsampled
    sigmoid heatmaps + metadata. Multiple pages share ONE device dispatch:
    page tensors (same network height) are width-padded to a common bucket
    and stacked on the batch dim, amortizing the per-dispatch round trip —
    the dominant fixed cost on remote/tunneled TPU links.
    """
    config = model._inf_config
    batch, channels, height, width = model.input
    padding = config.input_padding
    if isinstance(padding, int):
        padding = (padding,) * 4
    elif len(padding) == 2:
        padding = (padding[0], padding[0], padding[1], padding[1])

    transfer_u8 = getattr(config, 'input_transfer', 'float') == 'uint8'
    transforms = ImageInputTransforms(batch, height, width, channels, padding,
                                      valid_norm=False,
                                      dtype=np.uint8 if transfer_u8 else np.float32)
    pages = []
    for im in ims:
        # scaled grayscale image (pre-tensor stage of the transform pipeline)
        scal = im.convert(transforms.mode if transforms.mode != '1' else 'L')
        if transforms.scale != (0, 0):
            scal = _page_resize(scal, transforms.scale)
        scal_im = np.array(scal.convert('L'))
        # `scal` already is the mode-converted + resized page, so only the
        # pad/tensor tail of the transform pipeline remains (skips a second
        # Lanczos resize of the full page)
        tensor_im = transforms.tail(scal)
        pages.append({'im': im, 'scal_im': scal_im, 'tensor': tensor_im,
                      'padded_h': scal_im.shape[0] + padding[2] + padding[3],
                      'padded_w': scal_im.shape[1] + padding[0] + padding[1]})

    heights = {p['tensor'].shape[1] for p in pages}
    if len(heights) > 1:
        # variable-height spec: no common batch shape — run per page
        return [r for p in pages
                for r in _compute_segmentation_maps(model, [p['im']])]

    max_w = max(p['tensor'].shape[2] for p in pages)
    if getattr(config, 'width_bucketing', False) or len(pages) > 1:
        from kraken_tpu.inference.recognition import width_bucket
        max_w = width_bucket(max_w)
    mesh = getattr(model, '_seg_mesh', None)
    n_rows = len(pages)
    if mesh is not None:
        # batch dim must split evenly over the mesh; pad rows are dead
        # compute on otherwise-idle chips
        n_dev = mesh.devices.size
        n_rows = -(-n_rows // n_dev) * n_dev
    stack = np.zeros((n_rows, pages[0]['tensor'].shape[0],
                      pages[0]['tensor'].shape[1], max_w),
                     np.uint8 if transfer_u8 else np.float32)
    for i, p in enumerate(pages):
        stack[i, :, :, :p['tensor'].shape[2]] = p['tensor']
    max_padded_h = max(p['padded_h'] for p in pages)
    payload = stack if transfer_u8 else stack.astype(model._m_dtype)
    from kraken_tpu.lib import telemetry
    telemetry.record_up(payload.nbytes)
    # upsample in bucket space (static args stay bucketed), then crop the
    # padding back off on the host. Per-page valid widths thread through as
    # seq_lens so the padding-aware GroupNorm layers exclude the shared
    # width bucket's zero pad from their statistics — without this the pad
    # shifts every activation of narrower pages in the batch.
    widths = [p['tensor'].shape[2] for p in pages]
    widths += [max_w] * (n_rows - len(pages))
    if mesh is not None:
        seq_lens = jnp.asarray(widths, jnp.int32)
        out = model._seg_fwd(model._inf_params, jnp.asarray(payload),
                             seq_lens, max_padded_h, max_w)
    elif any(w != max_w for w in widths):
        x = jax.device_put(jnp.asarray(payload), model._device)
        seq_lens = jnp.asarray(widths, jnp.int32)
        out = model._seg_fwd(model._inf_params, x, max_padded_h, max_w, seq_lens)
    else:
        # unpadded batch: omit seq_lens so externally-supplied forwards
        # (e.g. the bench's torch mirror) keep their 4-arg signature
        x = jax.device_put(jnp.asarray(payload), model._device)
        out = model._seg_fwd(model._inf_params, x, max_padded_h, max_w)
    if getattr(model, '_seg_transfer', None) == 'packbits':
        packed_all = np.asarray(out)  # (n, K, h, ceil(w/8)) uint8
        telemetry.record_down(packed_all.nbytes)
        cls_map = model.user_metadata['class_mapping']
        n_classes = 1 + max(c for grp in cls_map.values() for c in grp.values())
        n_reg = len(model._seg_packed_regions)
        results = []
        for i, p in enumerate(pages):
            bits = np.unpackbits(packed_all[i], axis=-1)
            m = bits[:, :p['padded_h'], :p['padded_w']]
            m = m[:, padding[2]:m.shape[1] - padding[3] or None,
                  padding[0]:m.shape[2] - padding[1] or None]
            # boolean stand-in for the heatmap stack: region channels carry
            # their device-thresholded masks (vec_regions' >0.5 test is the
            # identity on them); baseline/separator channels are consumed
            # through bin_maps/sep_filters instead and stay empty
            heat = np.zeros((n_classes,) + m.shape[1:], bool)
            for j, c in enumerate(model._seg_packed_regions):
                heat[c] = m[j]
            sep_filters = (m[n_reg].astype(np.float32),
                           m[n_reg + 1].astype(np.float32))
            bin_maps = {c: m[n_reg + 2 + j].astype(bool)
                        for j, c in enumerate(model._seg_fused_channels)}
            results.append({'heatmap': heat,
                            'cls_map': cls_map,
                            'bounding_regions': model.user_metadata.get('bounding_regions', None),
                            'scale': np.divide(p['im'].size, heat.shape[:0:-1]),
                            'scal_im': p['scal_im'],
                            'bin_maps': bin_maps,
                            'sep_filters': sep_filters})
        return results

    if isinstance(out, tuple):
        # one async gather for both maps: a single tunnel round trip
        # instead of two sequential blocking downloads
        heat_all, ridges_all = jax.device_get((out[0], out[1]))
        heat_all, ridges_all = np.asarray(heat_all), np.asarray(ridges_all)
    else:
        heat_all, ridges_all = np.asarray(out), None
    telemetry.record_down(heat_all.nbytes +
                          (ridges_all.nbytes if ridges_all is not None else 0))

    results = []
    for i, p in enumerate(pages):
        padded_w = p['padded_w']
        bin_maps = {}
        if ridges_all is not None:
            ridges = ridges_all[i][:, :p['padded_h'], :padded_w]
            ridges = ridges[:, padding[2]:ridges.shape[1] - padding[3] or None,
                            padding[0]:ridges.shape[2] - padding[1] or None]
            bin_maps = {c: ridges[j].astype(bool)
                        for j, c in enumerate(model._seg_fused_channels)}
        heat = heat_all[i][:, :p['padded_h'], :padded_w]
        if heat.dtype == np.uint8:
            heat = heat.astype(np.float32) / 255.0
        # strip padding
        heat = heat[:, padding[2]:heat.shape[1] - padding[3] or None,
                    padding[0]:heat.shape[2] - padding[1] or None]
        scale = np.divide(p['im'].size, heat.shape[:0:-1])
        results.append({'heatmap': heat,
                        'cls_map': model.user_metadata['class_mapping'],
                        'bounding_regions': model.user_metadata.get('bounding_regions', None),
                        'scale': scale,
                        'scal_im': p['scal_im'],
                        'bin_maps': bin_maps})
    return results


def _compute_segmentation_map(model: 'VGSLModel', im: 'Image.Image') -> dict[str, Any]:
    """Runs the network and returns upsampled sigmoid heatmaps + metadata."""
    return _compute_segmentation_maps(model, [im])[0]


def segmentation_pred_batch(model: 'VGSLModel', ims: list) -> list[Segmentation]:
    """
    Segments several pages with ONE network dispatch (width-bucketed page
    batch; `_compute_segmentation_maps`), then vectorizes each page on the
    host. Heatmaps can differ from single-page prediction at the last
    bilinear half-pixel (the shared width bucket changes the upsample
    grid), like `width_bucketing`; detection quality is floor-tested.
    Worth it when the per-dispatch latency is large relative to the
    forward (remote/tunneled links, many small pages).
    """
    retss = _compute_segmentation_maps(model, ims)
    return [_vectorize_page(model, im, rets) for im, rets in zip(ims, retss)]


def segmentation_pred(model: 'VGSLModel', im: 'Image.Image') -> Segmentation:
    """
    Runs full-page baseline segmentation: heatmaps → regions → lines →
    region association → reading order.
    """
    if model.input[1] == 1 and model.one_channel_mode == '1' and not is_bitonal(im):
        logger.warning(f'Binary-input model applied to a non-bitonal image (mode {im.mode}); '
                       'expect severely degraded segmentation quality')
    rets = _compute_segmentation_map(model, im)
    return _vectorize_page(model, im, rets)


def _vectorize_page(model: 'VGSLModel', im: 'Image.Image', rets: dict) -> Segmentation:
    """Host half of page segmentation: regions → lines → association → RO."""
    config = model._inf_config
    regions = vec_regions(**rets)

    line_regs = []
    suppl_obj = []
    for cls, regs in regions.items():
        line_regs.extend(regs)
        if rets['bounding_regions'] is not None and cls in rets['bounding_regions']:
            suppl_obj.extend(regs)
    # back to network scale for polygonization
    suppl_obj = scale_regions([x.boundary for x in suppl_obj], tuple(1 / rets['scale']))
    line_regs = scale_regions([x.boundary for x in line_regs], tuple(1 / rets['scale']))

    lines = vec_lines(**rets,
                      regions=line_regs,
                      text_direction=config.text_direction,
                      suppl_obj=suppl_obj,
                      topline=bool(model.user_metadata.get('topline', False)),
                      raise_on_error=config.raise_on_error,
                      device_vectorize=getattr(config, 'device_vectorize', False))

    script_detection = len(rets['cls_map']['baselines']) > 1

    blls = []
    flat_regions = [reg for regs in regions.values() for reg in regs]
    line_mids = np.array([line_midpoint(line['baseline']) for line in lines]) \
        if lines else np.zeros((0, 2))
    reg_hits = np.stack([points_in_polygon(line_mids, reg.boundary)
                         for reg in flat_regions]) \
        if flat_regions and lines else np.zeros((0, len(lines)), bool)
    for line_i, line in enumerate(lines):
        containing = [reg.id for reg_i, reg in enumerate(flat_regions)
                      if reg_hits[reg_i, line_i]]
        blls.append(BaselineLine(id=f'_{uuid.uuid4()}',
                                 baseline=line['baseline'],
                                 boundary=line['boundary'],
                                 tags=line['tags'],
                                 regions=containing))
    if blls:
        ro = config.baseline_ro_fn(lines=blls, regions=flat_regions,
                                   text_direction=config.text_direction[-2:])
        blls = [blls[idx] for idx in ro]

    return Segmentation(text_direction=config.text_direction,
                        imagename=getattr(im, 'filename', None),
                        type='baselines',
                        lines=blls,
                        regions=regions,
                        script_detection=script_detection,
                        line_orders=[])
