"""
kraken_tpu.configs
~~~~~~~~~~~~~~~~~~

Layered configuration objects (reference: kraken/configs/base.py). Each
config consumes its keyword arguments and passes the rest up, so subclasses
compose. Inference configs carry injectable function members (CTC decoder,
reading-order functions) exactly like the reference so behaviour can be
swapped without subclassing.

TPU-specific defaults: `precision` accepts 'bf16-true'/'bf16-mixed' (the
natural TPU dtypes) in addition to the reference's names, and `device`
selects a JAX device ('tpu', 'cpu', 'tpu:N').
"""
from collections import defaultdict


class _Counter:
    """Stateful counter for auto-assigned class mapping labels."""

    def __init__(self, start=0):
        self.value = start

    def __call__(self):
        self.value += 1
        return self.value


class Config:
    """
    Base configuration.

    Args:
        precision: numerical precision for inference/training
                   ('32-true', 'bf16-true', 'bf16-mixed', '16-true', ...)
        accelerator: 'auto', 'tpu', or 'cpu'
        device: device selector ('auto', 'cpu', 'tpu', 'tpu:N')
        batch_size: batch size for all operations
        raise_on_error: raise exceptions instead of skipping failed inputs
        num_threads: host-side thread pool size
    """

    def __init__(self, **kwargs):
        self.precision = kwargs.pop('precision', '32-true')
        self.accelerator = kwargs.pop('accelerator', 'auto')
        self.device = kwargs.pop('device', 'auto')
        # number of devices for data-parallel execution: >1 builds a 1-D
        # mesh with parameters replicated and batches sharded on the
        # leading dim (SURVEY §2.5 TPU mapping of Lightning's devices=)
        self.devices = kwargs.pop('devices', 1)
        self.batch_size = kwargs.pop('batch_size', 1)
        self.compile_config = kwargs.pop('compile', None)
        self.raise_on_error = kwargs.pop('raise_on_error', False)
        self.num_threads = kwargs.pop('num_threads', 1)
        if kwargs:
            import logging
            logging.getLogger(__name__).warning(f'Ignoring unknown configuration parameters: {sorted(kwargs)}')

    def __repr__(self):
        return f'{type(self).__name__}({vars(self)})'


class RecognitionInferenceConfig(Config):
    """
    Text recognition inference configuration.

    Args:
        temperature: softmax temperature applied to logits
        return_logits: attach raw logits to emitted records
        return_line_image: attach the extracted line image to records
        padding: horizontal padding added around extracted lines
        num_line_workers: host workers for parallel line extraction
        no_legacy_polygons: force the new polygon extractor
        decoder: CTC decoding function (softmax outputs → label runs)
        bidi_reordering: reorder output into logical order via UAX #9;
                         'L'/'R' force a base direction
        text_direction: principal text direction for serialization
    """

    def __init__(self, **kwargs):
        from kraken_tpu.ops import ctc
        self.temperature = kwargs.pop('temperature', 1.0)
        self.return_logits = kwargs.pop('return_logits', False)
        self.return_line_image = kwargs.pop('return_line_image', False)
        self.padding = kwargs.pop('padding', 16)
        self.num_line_workers = kwargs.pop('num_line_workers', 2)
        self.no_legacy_polygons = kwargs.pop('no_legacy_polygons', False)
        self.linetype = kwargs.pop('linetype', None)
        self.decoder = kwargs.pop('decoder', ctc.greedy_decoder)
        self.bidi_reordering = kwargs.pop('bidi_reordering', True)
        self.text_direction = kwargs.pop('text_direction', 'horizontal-tb')
        # 'uint8' ships line batches as bytes, rescaled on device (halves the
        # host->device upload on remote TPUs); 'packed' additionally strips
        # the bucket/batch padding from the wire: the byte lines travel as
        # ONE dense width-concatenated atlas plus a per-line offset/width
        # vector, and a gather inside the forward jit rebuilds the exact
        # padded batch on device (bit-identical activations to 'uint8',
        # ~35-45% fewer bytes on real pages); 'float' is parity-exact
        self.input_transfer = kwargs.pop('input_transfer', 'float')
        # 'device' moves polygonal line extraction into the recognition
        # forward jit (inference.extraction): the host ships native-
        # resolution strip crops + per-line sampling grids, and a fused
        # gather-warp cuts/dewarps/resizes/masks the lines on the TPU —
        # no host warping and no resized-tensor upload. Falls back to
        # 'host' automatically for unsupported combinations (bbox/legacy
        # centerline models, RGB inputs, SPMD meshes, return_line_image).
        # Equivalence pinned in tests/test_extraction.py; 'host' is the
        # reference-parity-exact default.
        self.line_extraction = kwargs.pop('line_extraction', 'host')
        # undecoded batches kept in flight before the engine blocks on the
        # oldest one: 1 = classic double-buffering (decode batch k while
        # k+1 uploads/computes); higher values bridge longer device/link
        # latencies at the cost of per-page completion latency
        self.device_pipeline_depth = kwargs.pop('device_pipeline_depth', 1)
        # exact conv+maxpool space-to-depth phase fusion
        # (nn.layers.FusedConvPool). Measured 12% SLOWER than XLA's native
        # conv schedule on v5e (docs/architecture.md), so off by default;
        # kept selectable for other TPU generations.
        self.fuse_conv_pools = kwargs.pop('fuse_conv_pools', False)
        # LSTM recurrence implementation: 'scan' (lax.scan, default) or
        # 'pallas' (ops/lstm.py fused kernel, VMEM-resident carry) — bench
        # scripts/bench_lstm_pallas.py before switching; see
        # docs/architecture.md for measurements
        self.lstm_backend = kwargs.pop('lstm_backend', 'scan')
        super().__init__(**kwargs)


class SegmentationInferenceConfig(Config):
    """
    Layout analysis inference configuration.

    Args:
        text_direction: principal text direction
        legacy_*: parameters of the legacy bbox page segmenter
        bbox_ro_fn / baseline_ro_fn: injectable reading-order functions
    """

    def __init__(self, **kwargs):
        from kraken_tpu.lib import geometry
        self.text_direction = kwargs.pop('text_direction', 'horizontal-lr')
        self.legacy_scale = kwargs.pop('legacy_scale', None)
        self.legacy_maxcolseps = kwargs.pop('legacy_maxcolseps', 2)
        self.legacy_black_colseps = kwargs.pop('legacy_black_colseps', False)
        self.legacy_no_hlines = kwargs.pop('legacy_no_hlines', True)
        self.bbox_line_padding = kwargs.pop('bbox_line_padding', 0)
        self.input_padding = kwargs.pop('input_padding', 0)
        self.bbox_ro_fn = kwargs.pop('bbox_ro_fn', geometry.reading_order)
        self.baseline_ro_fn = kwargs.pop('baseline_ro_fn', geometry.polygonal_reading_order)
        # pad page widths up to a geometric bucket before the jitted forward
        # (bounds the compile cache on mixed-size page batches; off by default
        # because the zero-padded border perturbs edge activations slightly
        # relative to the reference's exact-width computation)
        self.width_bucketing = kwargs.pop('width_bucketing', False)
        # 'uint8' quantizes heatmaps on device before the host transfer
        # (4x less data over remote-TPU links); 'float32' is parity-exact.
        # 'packbits' goes further: every map the host vectorizer actually
        # consumes is computed ON DEVICE as a binary mask (region masks
        # >0.5, separator-orientation masks from the max-filtered
        # start/end difference, thresholded ridge maps) and bit-packed
        # 8 pixels/byte before the transfer (~10x less data than 'uint8';
        # requires fused_ridge and a baseline class_mapping, else it
        # degrades to 'uint8'). 'auto' probes the host->device bandwidth
        # once at prepare time and picks 'packbits' on tunnel-grade links
        # (<500 Mbps), 'uint8' on local PCIe.
        self.heatmap_precision = kwargs.pop('heatmap_precision', 'float32')
        # run the baseline-vectorization hot spots on the accelerator: the
        # Sato ridge filter as fused XLA convolutions (ops/ridge.py) and all
        # of a page's seam-carve DPs batched into one scan (ops/seam.py).
        # Results match the host path; worthwhile when host cores are scarce
        # relative to the accelerator (off by default — each map/batch is an
        # extra device round trip, which a remote TPU tunnel makes costly)
        self.device_vectorize = kwargs.pop('device_vectorize', False)
        # fuse the Sato ridge filter of every baseline channel into the SAME
        # device dispatch as the network forward, transferring only the
        # thresholded binary maps (inference/segmentation.py). Unlike
        # device_vectorize this adds no round trips, so it wins even on
        # tunneled links (~150 ms/page of host filtering removed); disable
        # for bit-exact parity with the host Sato filter (atol 1e-5 conv
        # differences can flip isolated near-threshold pixels)
        self.fused_ridge = kwargs.pop('fused_ridge', True)
        self.ridge_threshold = kwargs.pop('ridge_threshold', 0.17)
        # 'uint8' ships the page tensor as bytes and rescales on device —
        # the payload is the float pipeline's exactly (pages are natively
        # 8-bit; contract shared with the recognition engine's
        # input_transfer), and the on-device dequantization matches the
        # host float path to within 1 ulp of float32 (Segmentation
        # equality on the parity fixture is regression-tested) — at a half
        # (vs bf16) / quarter (vs fp32) upload, the dominant per-dispatch
        # cost on remote TPU links
        self.input_transfer = kwargs.pop('input_transfer', 'float')
        super().__init__(**kwargs)


class TrainingDataConfig:
    """
    Generic training data configuration.

    Args:
        training_data / evaluation_data / test_data: input file lists
        partition: train/validation split when no explicit eval data is given
        num_workers: host data-loading workers
        augment: enable augmentation
        batch_size: batch size
    """

    def __init__(self, **kwargs):
        self.training_data = kwargs.pop('training_data', None)
        self.evaluation_data = kwargs.pop('evaluation_data', None)
        self.test_data = kwargs.pop('test_data', None)
        self.partition = kwargs.pop('partition', 0.9)
        self.num_workers = kwargs.pop('num_workers', 1)
        self.augment = kwargs.pop('augment', False)
        self.batch_size = kwargs.pop('batch_size', 1)
        if kwargs:
            import logging
            logging.getLogger(__name__).warning(f'Ignoring unknown configuration parameters: {sorted(kwargs)}')


class SegmentationTrainingDataConfig(TrainingDataConfig):
    """
    Segmentation training data configuration: format type, line/region class
    mappings (auto-assigning by default; labels 0/1 are reserved for the
    start/end separator channels), topline flag.
    """

    def __init__(self, **kwargs):
        counter = _Counter(start=1)
        self.format_type = kwargs.pop('format_type', 'xml')
        self.line_class_mapping = kwargs.pop('line_class_mapping', defaultdict(counter))
        self.region_class_mapping = kwargs.pop('region_class_mapping', defaultdict(counter))
        self.topline = kwargs.pop('topline', False)
        self.line_width = kwargs.pop('line_width', 4)
        # (left/right, top/bottom) padding around the page image
        # (reference: ketos/segmentation.py --pad)
        self.padding = kwargs.pop('padding', (0, 0))
        super().__init__(**kwargs)


class RecognitionTrainingDataConfig(TrainingDataConfig):
    """
    Recognition training data configuration: format type (xml/path/binary),
    optional explicit codec, line type filter, binary dataset split flag.
    """

    def __init__(self, **kwargs):
        self.binary_dataset_split = kwargs.pop('binary_dataset_split', False)
        self.format_type = kwargs.pop('format_type', 'xml')
        self.linetype = kwargs.pop('linetype', None)
        self.pad = kwargs.pop('pad', 16)
        self.codec = kwargs.pop('codec', None)
        self.normalization = kwargs.pop('normalization', None)
        self.normalize_whitespace = kwargs.pop('normalize_whitespace', True)
        self.reorder = kwargs.pop('reorder', True)
        super().__init__(**kwargs)


class TrainingConfig(Config):
    """
    Generic training configuration: optimizer, schedule, early stopping,
    checkpointing (reference: configs/base.py:288-376).
    """

    def __init__(self, **kwargs):
        self.epochs = kwargs.pop('epochs', -1)
        self.completed_epochs = kwargs.pop('completed_epochs', 0)
        self.freq = kwargs.pop('freq', 1.0)
        self.checkpoint_path = kwargs.pop('checkpoint_path', 'model')
        self.weights_format = kwargs.pop('weights_format', 'safetensors')
        self.optimizer = kwargs.pop('optimizer', 'AdamW')
        self.lrate = kwargs.pop('lrate', 1e-5)
        self.momentum = kwargs.pop('momentum', 0.9)
        self.weight_decay = kwargs.pop('weight_decay', 0.0)
        self.gradient_clip_val = kwargs.pop('gradient_clip_val', 1.0)
        self.accumulate_grad_batches = kwargs.pop('accumulate_grad_batches', 1)
        self.schedule = kwargs.pop('schedule', 'constant')
        self.warmup = kwargs.pop('warmup', 0)
        self.step_size = kwargs.pop('step_size', 10)
        self.gamma = kwargs.pop('gamma', 0.1)
        self.rop_factor = kwargs.pop('rop_factor', 0.1)
        self.rop_patience = kwargs.pop('rop_patience', 5)
        self.cos_t_max = kwargs.pop('cos_t_max', 10)
        self.cos_min_lr = kwargs.pop('cos_min_lr', 1e-6)
        self.quit = kwargs.pop('quit', 'fixed')
        # retain only the K best epoch checkpoints by validation metric
        # (reference: ModelCheckpoint(save_top_k=10),
        # kraken/ketos/recognition.py:199-205); <=0 keeps everything
        self.save_top_k = kwargs.pop('save_top_k', 10)
        self.min_epochs = kwargs.pop('min_epochs', 0)
        self.lag = kwargs.pop('lag', 10)
        self.min_delta = kwargs.pop('min_delta', 0.0)
        # rematerialize the forward on backward (jax.checkpoint): trades
        # FLOPs for HBM so large page/line batches fit on one chip
        self.remat = kwargs.pop('remat', False)
        # experiment logger backend ('tensorboard'/'wandb'/None) and an
        # optional jax-profiler trace directory for the first epoch
        self.loggers = kwargs.pop('loggers', None)
        self.profile_dir = kwargs.pop('profile_dir', None)
        super().__init__(**kwargs)


# named VGSL presets accepted anywhere a spec string is (`-s tpu`):
# 'default' is the reference's CNN+3xBiLSTM-200 architecture; 'tpu' replaces
# the narrow conv stack with MXU-width (128-channel) strided convolutions —
# measured 78.6 TF/s sustained (40% of v5e bf16 peak) vs the default's
# 49 TF/s at the same latency, i.e. ~1.7x the model compute per line
# (docs/architecture.md MFU experiments)
RECOGNITION_SPEC_PRESETS = {
    'default': ('[1,120,0,1 Cr3,13,32 Do0.1,2 Mp2,2 Cr3,13,32 Do0.1,2 Mp2,2 '
                'Cr3,9,64 Do0.1,2 Mp2,2 Cr3,9,64 Do0.1,2 S1(1x0)1,3 Lbx200 '
                'Do0.1,2 Lbx200 Do0.1,2 Lbx200 Do]'),
    'tpu': ('[1,120,0,1 Cr3,7,128,2,2 Gn32 Cr3,7,128,2,2 Gn32 '
            'Cr3,7,128,2,2 Gn32 S1(1x0)1,3 Lbx200 Do0.1,2 Lbx200 Do0.1,2 '
            'Lbx200 Do]'),
    # 'tpu-attn' swaps the BiLSTM stack for rotary-attention encoder blocks
    # (`Te`, a TPU grammar extension) behind the space-to-depth conv
    # frontend. Measured on v5e (docs/architecture.md): best-in-grid
    # small-batch latency (~23% below 'default' at batch 32 — recurrence
    # latency gone) and 1.4x 'default' throughput at batch 512; at large
    # batch the s2d conv stack dominates either sequence tail, so
    # LSTM-vs-attention is throughput-neutral there and the choice is
    # about latency, parallel training semantics, and model family.
    'tpu-attn': ('[1,120,0,1 S1(30x4)1,3 Cr3,13,32 Do0.1,2 Mp2,2 '
                 'Cr3,13,32 Do0.1,2 Mp2,2 Cr3,9,64 Do0.1,2 Mp2,2 '
                 'Cr3,9,64 Do0.1,2 S1(1x0)1,3 Cl1,1,256 Te8,256,1024 '
                 'Te8,256,1024 Te8,256,1024 Te8,256,1024 Do0.1,2]'),
}


class RecognitionTrainingConfig(TrainingConfig):
    """Recognition-specific training configuration."""

    def __init__(self, **kwargs):
        spec = kwargs.pop('spec', 'default')
        self.spec = RECOGNITION_SPEC_PRESETS.get(spec, spec)
        self.append = kwargs.pop('append', None)
        self.resize = kwargs.pop('resize', 'fail')
        # keep all but the output layer frozen for the first N steps
        self.freeze_backbone = kwargs.pop('freeze_backbone', 0)
        kwargs.setdefault('lrate', 1e-3)
        kwargs.setdefault('optimizer', 'AdamW')
        super().__init__(**kwargs)


class SegmentationTrainingConfig(TrainingConfig):
    """Segmentation-specific training configuration."""

    def __init__(self, **kwargs):
        self.spec = kwargs.pop('spec', '[1,1800,0,3 Cr7,7,64,2,2 Gn32 Cr3,3,128,2,2 Gn32 Cr3,3,128 Gn32 '
                                       'Cr3,3,256 Gn32]')
        self.resize = kwargs.pop('resize', 'fail')
        self.topline = kwargs.pop('topline', False)
        self.dice_weight = kwargs.pop('dice_weight', 0.5)
        # tolerance (px) for baseline-detection validation matching
        self.bl_tol = kwargs.pop('bl_tol', 25.0)
        kwargs.setdefault('lrate', 2e-4)
        super().__init__(**kwargs)


class ReadingOrderTrainingConfig(TrainingConfig):
    """Reading-order model training configuration."""

    def __init__(self, **kwargs):
        self.level = kwargs.pop('level', 'baselines')
        self.reading_order = kwargs.pop('reading_order', 'line_implicit')
        kwargs.setdefault('lrate', 1e-3)
        super().__init__(**kwargs)


class PretrainingConfig(TrainingConfig):
    """Wav2Vec2-style pretraining configuration."""

    def __init__(self, **kwargs):
        self.spec = kwargs.pop('spec', '[1,120,0,1 Cr3,13,32 Do0.1,2 Mp2,2 Cr3,13,32 Do0.1,2 Mp2,2 '
                                       'Cr3,9,64 Do0.1,2 Mp2,2 Cr3,9,64 Do0.1,2 S1(1x0)1,3 '
                                       'W{w2v}128,2,0.115,32 Lbx200 Do0.1,2 Lbx200 Do0.1,2 Lbx200 Do]')
        self.mask_width = kwargs.pop('mask_width', 4)
        self.mask_prob = kwargs.pop('mask_prob', 0.5)
        self.num_negatives = kwargs.pop('num_negatives', 100)
        self.logit_temp = kwargs.pop('logit_temp', 0.1)
        super().__init__(**kwargs)
