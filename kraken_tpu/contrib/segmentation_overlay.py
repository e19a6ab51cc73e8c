#!/usr/bin/env python
"""
Draws segmentation output (baselines + boundaries + regions) over page
images (reference: kraken/contrib/segmentation_overlay.py).
"""
import click


@click.command()
@click.option('-i', '--model', type=click.Path(exists=True), default=None,
              help='Segmentation model; heuristic/XML input when omitted.')
@click.option('-f', '--format-type', type=click.Choice(['xml', 'alto', 'page', 'image']),
              default='image')
@click.option('--suffix', default='.overlay.png')
@click.argument('files', nargs=-1, type=click.Path(exists=True))
def cli(model, format_type, suffix, files):
    from PIL import Image, ImageDraw
    from kraken_tpu.configs import SegmentationInferenceConfig

    for fname in files:
        if format_type != 'image':
            from kraken_tpu.xml import XMLPage
            doc = XMLPage(fname, filetype=format_type)
            seg = doc.to_container()
            im = Image.open(doc.imagename).convert('RGB')
        else:
            from kraken_tpu.tasks import SegmentationTaskModel
            task = SegmentationTaskModel.load_model(model)
            im = Image.open(fname).convert('RGB')
            seg = task.predict(im, SegmentationInferenceConfig())
        draw = ImageDraw.Draw(im, 'RGBA')
        for regs in (seg.regions or {}).values():
            for reg in regs:
                draw.polygon([tuple(p) for p in reg.boundary],
                             outline=(0, 0, 255, 255), width=2)
        for line in seg.lines:
            if getattr(line, 'boundary', None):
                draw.polygon([tuple(p) for p in line.boundary],
                             fill=(0, 255, 0, 64), outline=(0, 128, 0, 255))
            if getattr(line, 'baseline', None):
                draw.line([tuple(p) for p in line.baseline],
                          fill=(255, 0, 0, 255), width=3)
        out = fname + suffix
        im.save(out)
        click.echo(f'Wrote {out}')


if __name__ == '__main__':
    cli()
