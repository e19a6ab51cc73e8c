#!/usr/bin/env python
"""
Overlays the raw class heatmaps of a segmentation model over input images
(reference: kraken/contrib/heatmap_overlay.py).
"""
import click


@click.command()
@click.option('-i', '--model', type=click.Path(exists=True), required=True)
@click.option('--suffix', default='.heat.png')
@click.argument('files', nargs=-1, type=click.Path(exists=True))
def cli(model, suffix, files):
    import numpy as np
    from PIL import Image
    from kraken_tpu.configs import SegmentationInferenceConfig
    from kraken_tpu.inference.segmentation import _compute_segmentation_map, prepare_segmentation
    from kraken_tpu.models import load_models

    net = [m for m in load_models(model) if 'segmentation' in m.model_type][0]
    prepare_segmentation(net, SegmentationInferenceConfig())
    for fname in files:
        im = Image.open(fname)
        rets = _compute_segmentation_map(net, im)
        heat = rets['heatmap']
        # colorize class argmax over the heatmap stack
        classes = heat.argmax(axis=0)
        strength = heat.max(axis=0)
        rng = np.random.RandomState(42)
        palette = rng.randint(0, 255, (heat.shape[0], 3), np.uint8)
        rgb = palette[classes] * strength[..., None]
        overlay = Image.fromarray(rgb.astype(np.uint8)).convert('RGBA')
        overlay.putalpha(128)
        base = im.convert('RGBA').resize(overlay.size)
        out = Image.alpha_composite(base, overlay)
        out_name = fname + suffix
        out.convert('RGB').save(out_name)
        click.echo(f'Wrote {out_name}')


if __name__ == '__main__':
    cli()
