"""
Multi-chip (virtual 8-device CPU mesh) tests: data-parallel train steps and
the driver's dryrun entry point.
"""
import numpy as np
import pytest


def test_mesh_devices():
    import jax
    assert len(jax.devices()) == 8, 'conftest must force 8 virtual CPU devices'


def test_data_parallel_train_step():
    import jax
    import jax.numpy as jnp
    from kraken_tpu.configs import RecognitionTrainingConfig
    from kraken_tpu.parallel import make_mesh, make_train_step, replicate, shard_batch
    from kraken_tpu.train.optim import build_optimizer
    from kraken_tpu.vgsl import VGSLModel

    mesh = make_mesh(jax.devices())
    model = VGSLModel(vgsl='[1,16,0,1 Cr3,3,4,2,2 S1(1x0)1,3 Lbx8 O1c6]',
                      rng=jax.random.PRNGKey(0))
    tx = build_optimizer(RecognitionTrainingConfig(lrate=1e-3))
    step = make_train_step(model.net, tx, loss='ctc', mesh=mesh)
    rng = np.random.RandomState(0)
    batch = {'image': rng.rand(16, 1, 16, 64).astype(np.float32),
             'seq_lens': np.full(16, 64, np.int32),
             'target': rng.randint(1, 6, (16, 4)).astype(np.int32),
             'target_lens': np.full(16, 4, np.int32)}
    sharded = shard_batch(batch, mesh)
    repl = replicate(mesh)
    params = jax.device_put(model.params, repl)
    opt_state = jax.device_put(tx.init(model.params), repl)
    params, opt_state, loss = step(params, opt_state, sharded,
                                   jax.device_put(jax.random.PRNGKey(1), repl))
    assert np.isfinite(float(loss))
    # replicated parameters stay consistent across devices
    leaf = jax.tree.leaves(params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device():
    """The sharded step computes the same update as an unsharded one."""
    import jax
    import jax.numpy as jnp
    from kraken_tpu.configs import RecognitionTrainingConfig
    from kraken_tpu.parallel import make_mesh, make_train_step, replicate, shard_batch
    from kraken_tpu.train.optim import build_optimizer
    from kraken_tpu.vgsl import VGSLModel

    model = VGSLModel(vgsl='[1,16,0,1 Cr3,3,4,2,2 S1(1x0)1,3 O1c6]',
                      rng=jax.random.PRNGKey(0))
    tx = build_optimizer(RecognitionTrainingConfig(lrate=1e-3))
    rng = np.random.RandomState(1)
    batch = {'image': rng.rand(8, 1, 16, 64).astype(np.float32),
             'seq_lens': np.full(8, 64, np.int32),
             'target': rng.randint(1, 6, (8, 4)).astype(np.int32),
             'target_lens': np.full(8, 4, np.int32)}
    key = jax.random.PRNGKey(2)

    single = make_train_step(model.net, tx, loss='ctc')
    p1, _, l1 = single(model.params, tx.init(model.params),
                       {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = make_mesh(jax.devices())
    repl = replicate(mesh)
    sharded_step = make_train_step(model.net, tx, loss='ctc', mesh=mesh)
    p2, _, l2 = sharded_step(jax.device_put(model.params, repl),
                             jax.device_put(tx.init(model.params), repl),
                             shard_batch(batch, mesh),
                             jax.device_put(key, repl))
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)

def test_sharded_inference_matches_single_device():
    """make_infer_fn over an 8-device mesh equals the unsharded forward."""
    import jax
    import jax.numpy as jnp
    from kraken_tpu.parallel import make_infer_fn, make_mesh, replicate
    from jax.sharding import NamedSharding, PartitionSpec as P
    from kraken_tpu.vgsl import VGSLModel

    model = VGSLModel(vgsl='[1,16,0,1 Cr3,3,4,2,2 S1(1x0)1,3 Lbx8 O1c6]',
                      rng=jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    x = rng.rand(16, 1, 16, 64).astype(np.float32)
    lens = np.full(16, 64, np.int32)

    logits, olens = model.net.apply(model.params, jnp.asarray(x), jnp.asarray(lens))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1).squeeze(2)
    ref_labels = np.asarray(jnp.argmax(probs, axis=1))
    ref_confs = np.asarray(jnp.max(probs, axis=1))

    mesh = make_mesh(jax.devices())
    fn = make_infer_fn(model.net, mesh)
    data = NamedSharding(mesh, P('data'))
    labels, confs, olens2 = fn(jax.device_put(model.params, replicate(mesh)),
                               jax.device_put(jnp.asarray(x), data),
                               jax.device_put(jnp.asarray(lens), data))
    np.testing.assert_array_equal(np.asarray(labels), ref_labels)
    np.testing.assert_allclose(np.asarray(confs), ref_confs, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(olens2), np.asarray(olens))


def test_sharded_inference_engine_matches_golden(resources):
    """
    recognition_pred with devices=8 shards line batches over the mesh and
    reproduces the single-device golden predictions, including the ragged
    (batch % devices != 0) padding path.
    """
    import dataclasses
    from PIL import Image
    from kraken_tpu.configs import RecognitionInferenceConfig
    from kraken_tpu.containers import BaselineLine, Segmentation
    from kraken_tpu.models import load_models

    BL_GOLD = '.ܗ ܣܗܐ  ܕ ܣ   ܗ ܕܗܗ ܟܕܗܣ    ܠ  ܐ .ܣܕܐܣ. ܗ '
    im = Image.open(resources / '000236.png')
    line = BaselineLine(id='l0', baseline=[[0, 10], [2543, 10]],
                        boundary=[[0, 0], [2543, 0], [2543, 155], [0, 155]])
    seg = Segmentation(type='baselines', imagename=resources / 'bw.png',
                       text_direction='horizontal-lr', script_detection=False,
                       lines=[dataclasses.replace(line, id=f'l{i}') for i in range(3)])

    vmodel = load_models(resources / 'overfit.mlmodel')[0]
    vmodel.prepare_for_inference(RecognitionInferenceConfig(
        batch_size=3, num_line_workers=0, padding=1, devices=8))
    assert vmodel._mesh is not None and vmodel._mesh.devices.size == 8
    records = list(vmodel.predict(im, seg))
    assert len(records) == 3
    assert all(r.prediction == BL_GOLD for r in records)


def test_ketos_train_devices_cli(resources, tmp_path):
    """ketos train --devices 8 runs the mesh-sharded training path."""
    from click.testing import CliRunner
    from kraken_tpu.ketos import cli as ketos_cli

    train_manifest = tmp_path / 'train.lst'
    train_manifest.write_text('\n'.join([
        str(resources / '000236.png'),
        str(resources / 'merge_tests' / '0006.jpg'),
        str(resources / 'merge_tests' / '0007.jpg'),
        str(resources / 'merge_tests' / '0008.jpg')]))
    eval_manifest = tmp_path / 'eval.lst'
    eval_manifest.write_text(str(resources / 'merge_tests' / '0021.jpg'))

    result = CliRunner().invoke(ketos_cli, [
        'train', '-N', '1', '-o', str(tmp_path / 'model'),
        '-s', '[1,32,0,1 Cr3,3,4,2,2 S1(1x0)1,3 Lbx8]',
        '--devices', '8', '-B', '2', '-f', 'path',
        '--training-data', str(train_manifest),
        '--evaluation-data', str(eval_manifest)])
    assert result.exit_code == 0, result.output
    assert (tmp_path / 'model_best.safetensors').exists()


def test_sharded_segmentation_matches_single_device(resources):
    """
    prepare_segmentation with devices=8 runs the page-batch forward SPMD
    over the mesh (parameters replicated, pages sharded on the batch dim)
    and must reproduce the single-device segmentation exactly, including
    the ragged (1 page on 8 devices) padding path.
    """
    from PIL import Image
    from kraken_tpu.configs import SegmentationInferenceConfig
    from kraken_tpu.inference.segmentation import (prepare_segmentation,
                                                   segmentation_pred,
                                                   segmentation_pred_batch)
    from kraken_tpu.models import load_models

    im = Image.open(resources / 'input.webp')
    im = im.resize((im.width // 3, im.height // 3))

    single = load_models(resources / 'blla_small.safetensors')[0]
    prepare_segmentation(single, SegmentationInferenceConfig())
    ref = segmentation_pred(single, im)

    sharded = load_models(resources / 'blla_small.safetensors')[0]
    prepare_segmentation(sharded, SegmentationInferenceConfig(devices=8))
    assert sharded._seg_mesh is not None and sharded._seg_mesh.devices.size == 8
    got = segmentation_pred(sharded, im)
    assert len(ref.lines) > 0
    assert [l.baseline for l in got.lines] == [l.baseline for l in ref.lines]
    assert [l.boundary for l in got.lines] == [l.boundary for l in ref.lines]

    # the 2-page batched path (the pipeline's seg_batch fan-out) over the
    # same mesh: per-page results must match the single-device batched run
    # (compared batch-to-batch because the shared width bucket legitimately
    # shifts the upsample grid vs the single-page path)
    ref_batch = segmentation_pred_batch(single, [im, im.copy()])
    got_batch = segmentation_pred_batch(sharded, [im, im.copy()])
    for got_seg, ref_seg in zip(got_batch, ref_batch):
        assert [l.baseline for l in got_seg.lines] == \
            [l.baseline for l in ref_seg.lines]


def _per_device_flops(n_devices: int, batch_size: int = 16) -> float:
    """Per-device FLOPs of the compiled DP train step on an n-device mesh
    (XLA cost analysis of the SPMD partition — deterministic, unlike
    wall-clock on a single-core host)."""
    import jax
    import jax.numpy as jnp
    from kraken_tpu.configs import RecognitionTrainingConfig
    from kraken_tpu.parallel import make_mesh, make_train_step, replicate, shard_batch
    from kraken_tpu.train.optim import build_optimizer
    from kraken_tpu.vgsl import VGSLModel

    model = VGSLModel(vgsl='[1,16,0,1 Cr3,3,4,2,2 S1(1x0)1,3 Lbx8 O1c6]',
                      rng=jax.random.PRNGKey(0))
    tx = build_optimizer(RecognitionTrainingConfig(lrate=1e-3))
    rng = np.random.RandomState(0)
    batch = {'image': rng.rand(batch_size, 1, 16, 64).astype(np.float32),
             'seq_lens': np.full(batch_size, 64, np.int32),
             'target': rng.randint(1, 6, (batch_size, 4)).astype(np.int32),
             'target_lens': np.full(batch_size, 4, np.int32)}
    mesh = make_mesh(jax.devices()[:n_devices])
    step = make_train_step(model.net, tx, loss='ctc', mesh=mesh)
    repl = replicate(mesh)
    args = (jax.device_put(model.params, repl),
            jax.device_put(tx.init(model.params), repl),
            shard_batch(batch, mesh),
            jax.device_put(jax.random.PRNGKey(1), repl))
    compiled = step.lower(*args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis['flops'])


def test_dp_per_device_flops_scale():
    """
    Multi-device scaling leg (SPMD correctness-of-parallelism): the
    compiled train step's per-device FLOPs must drop ~1/N as the mesh
    grows — a wall-clock curve is meaningless on this single-core host,
    but XLA's partition cost analysis exactly detects accidental
    replication (flops would stay flat) or serialization.
    """
    base = _per_device_flops(1)
    curve = {n: _per_device_flops(n) / base for n in (2, 4, 8)}
    # allow generous headroom for collective/bookkeeping overhead; the
    # failure mode being caught is ratio ~1.0 (replicated compute)
    assert curve[2] < 0.65, curve
    assert curve[4] < 0.40, curve
    assert curve[8] < 0.25, curve


def test_sharded_inference_flops_scale():
    """Recognition inference SPMD forward partitions per-device compute
    ~1/N over the mesh (the `kraken ocr --devices` path)."""
    import jax
    import jax.numpy as jnp
    from kraken_tpu.parallel import make_mesh, replicate, batch_sharding
    from kraken_tpu.vgsl import VGSLModel

    model = VGSLModel(vgsl='[1,16,0,1 Cr3,3,4,2,2 S1(1x0)1,3 Lbx8 O1c6]',
                      rng=jax.random.PRNGKey(0))
    x = np.random.RandomState(0).rand(16, 1, 16, 64).astype(np.float32)
    lens = np.full(16, 64, np.int32)

    def flops(n):
        mesh = make_mesh(jax.devices()[:n])
        repl = replicate(mesh)
        data = batch_sharding(mesh)
        fwd = jax.jit(lambda p, im, sl: model.net.apply(p, im, sl),
                      in_shardings=(repl, data, data))
        args = (jax.device_put(model.params, repl),
                jax.device_put(jnp.asarray(x), data),
                jax.device_put(jnp.asarray(lens), data))
        analysis = fwd.lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis['flops'])

    base = flops(1)
    curve = {n: flops(n) / base for n in (2, 8)}
    assert curve[2] < 0.65, curve
    assert curve[8] < 0.25, curve
